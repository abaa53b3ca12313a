"""Differential twins for the round-8 batch-3 operators."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.queries.round8_batch3 import (
    _BLOOM_K,
    _BLOOM_M,
    _HOLT_A,
    _HOLT_B,
    _PERM_B,
    _SRC_A,
    _SRC_B,
)

SF = "/root/testdata/sf0.001"


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_permutation_test_twin(spark):
    qs = all_queries()
    [row] = qs["agg_permutation_test"](spark, SF).collect()
    con = duckdb.connect()
    pool = con.execute(
        f"""SELECT doc_id, n_chars, source = '{_SRC_A}' AS in_a
            FROM read_parquet('{SF}/documents.parquet')
            WHERE source IN ('{_SRC_A}', '{_SRC_B}')"""
    ).fetchall()
    con.close()
    n_a = sum(1 for *_, a in pool if a)
    n_b = len(pool) - n_a
    sa = sum(c for _, c, a in pool if a)
    sb = sum(c for _, c, a in pool if not a)
    obs = abs(sa / n_a - sb / n_b)
    n_extreme = n_valid = 0
    for b in range(_PERM_B):
        pn = ps = 0
        st = sum(c for _, c, _ in pool)
        for doc_id, c, _ in pool:
            if _h8(f"{doc_id}@{b}") % 2 == 0:
                pn += 1
                ps += c
        if pn == 0 or pn == len(pool):
            continue
        n_valid += 1
        if abs(ps / pn - (st - ps) / (len(pool) - pn)) >= obs:
            n_extreme += 1
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    assert row["obs_diff"] == pytest.approx(math.floor(obs * 1e6) / 1e6, abs=2e-6)
    assert row["n_extreme"] == n_extreme
    assert row["p_value"] == pytest.approx(
        round((1 + n_extreme) / (1 + n_valid), 6), abs=2e-6
    )
    assert 0 < row["p_value"] <= 1


def test_holt_linear_twin(spark):
    qs = all_queries()
    got = {
        r["event_type"]: (r["n_days"], r["level"], r["trend"], r["forecast_1"])
        for r in qs["ts_holt_linear"](spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*)
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY event_type, day ORDER BY event_type, day"""
    ).fetchall()
    con.close()
    series: dict[str, list[float]] = {}
    for et, _, n in rows:
        series.setdefault(et, []).append(float(n))
    for et, ys in series.items():
        level, trend = ys[1], ys[1] - ys[0]
        for y in ys[2:]:
            new_level = _HOLT_A * y + (1 - _HOLT_A) * (level + trend)
            trend = _HOLT_B * (new_level - level) + (1 - _HOLT_B) * trend
            level = new_level
        n_days, gl, gt, gf = got[et]
        assert n_days == len(ys)
        assert gl == pytest.approx(math.floor(level * 1e6) / 1e6, abs=2e-6)
        assert gt == pytest.approx(math.floor(trend * 1e6) / 1e6, abs=2e-6)
        assert gf == pytest.approx(
            math.floor((level + trend) * 1e6) / 1e6, abs=2e-6
        )


def test_bloom_membership_twin(spark):
    qs = all_queries()
    rows = qs["sketch_bloom_membership"](spark, SF).collect()
    con = duckdb.connect()
    sig = con.execute(
        f"""SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       string_split(text, ' '))), ' ')) AS h
            FROM read_parquet('{SF}/documents.parquet')"""
    ).fetchall()
    con.close()
    existing = {h for d, h in sig if d % 10 != 0}
    incoming = {d: h for d, h in sig if d % 10 == 0}
    bits = {
        _h8(f"{h}#{j}") % _BLOOM_M for h in existing for j in range(_BLOOM_K)
    }
    assert len(rows) == len(incoming)
    for r in rows:
        h = incoming[r["doc_id"]]
        expect_hit = all(
            _h8(f"{h}#{j}") % _BLOOM_M in bits for j in range(_BLOOM_K)
        )
        expect_exact = h in existing
        assert r["bloom_hit"] == expect_hit
        assert r["is_dup_exact"] == expect_exact
        # the Bloom guarantee itself
        assert r["no_false_negative"]
        if expect_exact:
            assert r["bloom_hit"]
