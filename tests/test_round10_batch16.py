"""Differential / property twins for round-10 batch 16."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"
WEEK_US = 7 * 86_400_000_000


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_referential_orphans_twin(spark):
    li = _fetch(
        f"SELECT l_orderkey, l_partkey, l_suppkey"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    o_keys = {
        k for (k,) in _fetch(
            f"SELECT o_orderkey FROM read_parquet('{SF}/orders.parquet')"
        )
    }
    p_keys = {
        k for (k,) in _fetch(
            f"SELECT p_partkey FROM read_parquet('{SF}/part.parquet')"
        )
    }
    s_keys = {
        k for (k,) in _fetch(
            f"SELECT s_suppkey FROM read_parquet('{SF}/supplier.parquet')"
        )
    }
    oc = _fetch(f"SELECT o_custkey FROM read_parquet('{SF}/orders.parquet')")
    c_keys = {
        k for (k,) in _fetch(
            f"SELECT c_custkey FROM read_parquet('{SF}/customer.parquet')"
        )
    }
    rows = {
        r["relationship"]: (r["n_child"], r["n_orphans"])
        for r in all_queries()["dq_referential_orphans"](spark, SF).collect()
    }
    assert rows["lineitem->orders"] == (
        len(li), sum(1 for ok, _p, _s in li if ok not in o_keys),
    )
    assert rows["lineitem->part"] == (
        len(li), sum(1 for _o, pk, _s in li if pk not in p_keys),
    )
    assert rows["lineitem->supplier"] == (
        len(li), sum(1 for _o, _p, sk in li if sk not in s_keys),
    )
    assert rows["orders->customer"] == (
        len(oc), sum(1 for (ck,) in oc if ck not in c_keys),
    )


def test_cohort_ltv_twin(spark):
    ev = _fetch(
        f"SELECT user_id, event_type, epoch_us(ts), FLOOR(value * 1e6)"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    per_user = defaultdict(list)
    for uid, et, us, v in ev:
        per_user[uid].append((et, us, int(v)))
    cells = Counter()
    cohort_users = Counter()
    for uid, rows_u in per_user.items():
        t0s = [us for et, us, _v in rows_u if et == "signup"]
        if not t0s:
            continue
        t0 = min(t0s)
        cohort = t0 // WEEK_US
        cohort_users[cohort] += 1
        for et, us, v in rows_u:
            if et == "purchase" and us >= t0:
                cells[(cohort, (us - t0) // WEEK_US)] += v
    expect = []
    for cohort in sorted({c for c, _a in cells}):
        cum = 0
        for age in sorted(a for c, a in cells if c == cohort):
            cum += cells[(cohort, age)]
            expect.append((cohort, age, cohort_users[cohort], cum))
    rows = [
        (r["cohort_week"], r["age_weeks"], r["n_users"], r["cum_rev_micro"])
        for r in all_queries()["agg_cohort_ltv_curve"](spark, SF).collect()
    ]
    assert rows == expect
    # cumulative revenue is monotone within each cohort by construction
    assert len(rows) > 0


def test_window_distinct_twin(spark):
    from datetime import timedelta

    ev = _fetch(
        f"SELECT ts, event_type, user_id FROM read_parquet('{SF}/events.parquet')"
    )
    seen = defaultdict(set)
    for ts, et, uid in ev:
        w = ts.replace(
            minute=ts.minute - ts.minute % 15, second=0, microsecond=0
        )
        seen[(w, et)].add(uid)
    expect = {k: len(v) for k, v in seen.items()}
    rows = {
        (r["window_start"], r["event_type"]): r["n_users"]
        for r in all_queries()["stream_window_distinct"](spark, SF).collect()
    }
    assert rows == expect
