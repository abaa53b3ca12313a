"""Semantic tests for lm_fuzzy.py — pure-Python twins over the same
parquet. Oracle parity is covered by tests/test_contract.py."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries


def test_bigram_lm_matches_python_twin(spark, sf_dir):
    out = all_queries()["lm_bigram_score"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {int(r.doc_id): r.text.split(" ") for r in docs.itertuples()}
    c1: Counter = Counter()
    c2: Counter = Counter()
    for t in toks.values():
        c1.update(t)
        c2.update(zip(t, t[1:]))
    v = len(c1)
    by_id = out.set_index("doc_id")
    assert len(out) == sum(1 for t in toks.values() if len(t) >= 2)
    for doc_id, t in list(toks.items())[:10]:
        if len(t) < 2:
            assert doc_id not in by_id.index
            continue
        pairs = list(zip(t, t[1:]))
        expect = sum(
            math.log((c2[p] + 0.5) / (c1[p[0]] + 0.5 * v)) for p in pairs
        ) / len(pairs)
        row = by_id.loc[doc_id]
        assert row["n_bigrams"] == len(pairs)
        assert row["avg_logp"] == pytest.approx(expect, abs=2e-4)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_recovers_corrupted_names(spark, sf_dir):
    out = all_queries()["join_fuzzy"](spark, sf_dir).toPandas()
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    names = sorted(set(part["p_name"]))
    # every emitted pair really is within edit distance 1
    for r in out.itertuples():
        assert _lev(r.probe, r.matched) <= 1
        assert r.dist == _lev(r.probe, r.matched)
    # every corrupted name links back to its origin at distance exactly 1
    pairs = set(zip(out["probe"], out["matched"]))
    for name in names:
        pos = int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % len(name)
        probe = name[:pos] + name[pos + 1 :]
        assert (probe, name) in pairs
