"""Differential / property twins for round-10 batch 20."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"
GAP_US = 5 * 60 * 1_000_000


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_session_depth_twin(spark):
    ev = _fetch(
        f"SELECT user_id, epoch_us(ts), event_id"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    per_user = defaultdict(list)
    for uid, us, eid in ev:
        per_user[uid].append((us, eid))
    hist = Counter()
    for rows_u in per_user.values():
        rows_u.sort()
        depth, prev = 0, None
        for us, _eid in rows_u:
            if prev is None or us - prev > GAP_US:
                if depth:
                    hist[depth] += 1
                depth = 0
            depth += 1
            prev = us
        hist[depth] += 1
    rows = {
        r["depth"]: r["n_sessions"]
        for r in all_queries()["agg_session_depth_histogram"](spark, SF).collect()
    }
    assert rows == dict(hist)
    # total events reconcile: sum(depth * sessions) == corpus events
    assert sum(d * n for d, n in rows.items()) == len(ev)


def test_oov_rate_twin(spark):
    docs = _fetch(
        f"SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    )
    df = Counter()
    for _s, t in docs:
        df.update(t.split(" "))
    vocab = {
        w for w, _c in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    }
    per = defaultdict(lambda: [0, 0])
    for s, t in docs:
        for w in t.split(" "):
            per[s][0] += 1
            if w not in vocab:
                per[s][1] += 1
    rows = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate_x1e6"])
        for r in all_queries()["text_oov_rate_by_source"](spark, SF).collect()
    }
    assert set(rows) == set(per)
    for s, (n, oov) in per.items():
        assert rows[s] == (n, oov, 10**6 * oov // n)
