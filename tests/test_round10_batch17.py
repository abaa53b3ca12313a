"""Differential / property twins for round-10 batch 17."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_pk_audit_twin(spark):
    tables = {
        "customer.c_custkey": ("customer", "c_custkey"),
        "documents.doc_id": ("documents", "doc_id"),
        "events.event_id": ("events", "event_id"),
        "orders.o_orderkey": ("orders", "o_orderkey"),
        "part.p_partkey": ("part", "p_partkey"),
    }
    rows = {
        r["pk"]: (r["n_rows"], r["n_distinct"], r["is_unique"])
        for r in all_queries()["dq_primary_key_audit"](spark, SF).collect()
    }
    assert set(rows) == set(tables)
    for pk, (tbl, key) in tables.items():
        (n, d), = _fetch(
            f"SELECT COUNT(*), COUNT(DISTINCT {key})"
            f" FROM read_parquet('{SF}/{tbl}.parquet')"
        )
        assert rows[pk] == (n, d, n == d)
    # the generated tables keep their declared keys unique
    assert all(v[2] for v in rows.values())


def test_return_rate_twin(spark):
    li = _fetch(
        f"SELECT l_partkey, l_returnflag, FLOOR(l_extendedprice * 100)"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    brands = dict(
        _fetch(
            f"SELECT p_partkey, p_brand FROM read_parquet('{SF}/part.parquet')"
        )
    )
    per = defaultdict(lambda: [0, 0, 0])
    for pk, rf, cents in li:
        st = per[brands[pk]]
        st[0] += 1
        if rf == "R":
            st[1] += 1
            st[2] += int(cents)
    rows = {
        r["brand"]: (
            r["n_lineitems"], r["n_returned"],
            r["return_rate_x1e6"], r["returned_cents"],
        )
        for r in all_queries()["agg_return_rate_by_brand"](spark, SF).collect()
    }
    assert set(rows) == set(per)
    for b, (n, ret, cents) in per.items():
        assert rows[b] == (n, ret, 10**6 * ret // n, cents)


def test_ship_latency_twin(spark):
    lat = _fetch(
        f"""
        SELECT o.o_orderpriority,
               (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // {DAY_US}
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/orders.parquet') o
          ON o.o_orderkey = l.l_orderkey
        """
    )
    per = defaultdict(list)
    for pri, d in lat:
        per[pri].append(d)
    rows = {
        r["priority"]: (r["n_lineitems"], r["p50"], r["p90"], r["p99"])
        for r in all_queries()["win_ship_latency_percentiles"](spark, SF).collect()
    }
    assert set(rows) == set(per)
    for pri, ds in per.items():
        ds.sort()
        n = len(ds)
        pcts = tuple(ds[(p * n + 99) // 100 - 1] for p in (50, 90, 99))
        assert rows[pri] == (n, *pcts)
        # order statistics are monotone
        assert rows[pri][1] <= rows[pri][2] <= rows[pri][3]
