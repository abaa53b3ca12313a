"""Semantic tests for the round-4 curation additions (curation_extra.py) —
differential twins in pure Python/pandas over the same parquet, plus the
invariants each operator promises. Oracle parity itself is covered by
tests/test_contract.py (every registered name)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries

GAP_US = 6 * 3600 * 1_000_000


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_sessionize_gap_invariants(spark, sf_dir):
    """Within a session all consecutive gaps are <=6h; consecutive sessions
    of one user are separated by >6h; event counts are conserved."""
    out = all_queries()["etl_sessionize"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    assert out["n_events"].sum() == len(ev)

    for user, g in ev.groupby("user_id"):
        ts = (
            g.sort_values(["ts", "event_id"])["ts"]
            .astype("datetime64[ns]")
            .astype("int64")
            .to_numpy()
        )
        # expected session boundaries from the raw stream
        starts = [0] + [
            i for i in range(1, len(ts)) if ts[i] - ts[i - 1] > GAP_US * 1000
        ]
        expect_n = len(starts)
        sess = out[out["user_id"] == user].sort_values("session_no")
        assert len(sess) == expect_n, f"user {user}"
        # session extents match the raw boundaries
        bounds = starts + [len(ts)]
        for k in range(expect_n):
            lo, hi = bounds[k], bounds[k + 1]
            row = sess.iloc[k]
            assert row["session_start"].value == ts[lo]
            assert row["session_end"].value == ts[hi - 1]
            assert row["n_events"] == hi - lo


def _md5_u32(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def test_sample_weighted_matches_numpy_twin(spark, sf_dir):
    """The selected set is exactly the Efraimidis–Spirakis top-100 computed
    independently in pure Python from the same parquet."""
    docs = _docs(sf_dir)
    keys = {
        int(r.doc_id): math.log((_md5_u32(str(int(r.doc_id))) + 1) / 2**32)
        / int(r.n_chars)
        for r in docs.itertuples()
    }
    expect = set(
        sorted(keys, key=lambda d: (-keys[d], d))[:100]
    )
    got = set(
        r.doc_id
        for r in all_queries()["sample_weighted"](spark, sf_dir).collect()
    )
    assert got == expect


def test_sample_weighted_prefers_heavier_docs(spark, sf_dir):
    """Size-biased sampling: the mean length of sampled docs exceeds the
    corpus mean (the whole point of weighting by n_chars)."""
    docs = _docs(sf_dir)
    got = all_queries()["sample_weighted"](spark, sf_dir).toPandas()
    assert got["n_chars"].mean() > docs["n_chars"].mean()


def test_domain_quota_caps_and_picks_longest(spark, sf_dir):
    out = all_queries()["sample_domain_quota"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    assert (out.groupby("source").size() <= 5).all()
    for src, g in out.groupby("source"):
        pool = docs[docs["source"] == src].sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        )
        expect = set(pool.head(5)["doc_id"])
        assert set(g["doc_id"]) == expect, src


def test_interleave_is_bijective_round_robin(spark, sf_dir):
    out = all_queries()["etl_interleave"](spark, sf_dir).toPandas()
    n = len(out)
    assert sorted(out["pos"]) == list(range(n))
    srcs = sorted(out["source"].unique())
    sidx = {s: i for i, s in enumerate(srcs)}
    # position encodes the source index: pos % n_src == sidx(source)
    assert (
        out["pos"] % len(srcs) == out["source"].map(sidx)
    ).all()


def test_feat_hashing_tf_conserves_tokens(spark, sf_dir):
    out = all_queries()["feat_hashing_tf"](spark, sf_dir).toPandas()
    assert out["bucket"].between(0, 63).all()
    docs = _docs(sf_dir)
    sampled = docs[docs["doc_id"] % 20 == 0]
    n_toks = sum(
        len([t for t in re.split(r"[^a-z]+", txt.lower()) if t])
        for txt in sampled["text"]
    )
    assert out["tf"].sum() == n_toks
    # spot-check one document's full vector against a Python twin
    row = sampled.iloc[0]
    toks = [t for t in re.split(r"[^a-z]+", row["text"].lower()) if t]
    expect = Counter(_md5_u32(t) % 64 for t in toks)
    got = {
        int(r.bucket): int(r.tf)
        for r in out[out["doc_id"] == row["doc_id"]].itertuples()
    }
    assert got == dict(expect)


def test_char_entropy_matches_numpy_twin(spark, sf_dir):
    out = all_queries()["text_char_entropy"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    sampled = docs[docs["doc_id"] % 20 == 0]
    assert set(out["doc_id"]) == set(sampled["doc_id"])
    by_id = dict(zip(out["doc_id"], out["entropy"]))
    for r in sampled.head(5).itertuples():
        counts = Counter(r.text)
        n = sum(counts.values())
        expect = -sum((c / n) * math.log(c / n) for c in counts.values())
        assert by_id[int(r.doc_id)] == pytest.approx(expect, abs=2e-6)
        # entropy of text over alphabet A is bounded by ln|A|
        assert 0.0 <= by_id[int(r.doc_id)] <= math.log(len(counts)) + 1e-9


def test_mode_per_group_matches_pandas(spark, sf_dir):
    out = all_queries()["agg_mode_per_group"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    counts = (
        docs.groupby(["source", "lang"]).size().reset_index(name="cnt")
    )
    for src, g in counts.groupby("source"):
        top = g.sort_values(["cnt", "lang"], ascending=[False, True]).iloc[0]
        row = out[out["source"] == src].iloc[0]
        assert row["mode_lang"] == top["lang"]
        assert row["n_docs"] == top["cnt"]


def test_token_budget_plan_invariants(spark, sf_dir):
    """Weights sum to ~1, quotas sum to <= budget, rates are capped at 1,
    and the temperature upweights small sources vs proportional."""
    out = all_queries()["plan_token_budget"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    toks = docs.assign(t=docs["text"].str.split(" ").str.len()).groupby("source")["t"].sum()
    for r in out.itertuples():
        assert r.tokens == toks[r.source]
        assert 0 < r.sampling_rate <= 1.0
    assert abs(out["weight"].sum() - 1.0) <= 1e-3
    assert out["quota_tokens"].sum() <= 500000
    # temperature < 1 compresses shares: smallest source's weight must
    # exceed its proportional share, largest must fall below
    total = toks.sum()
    small, large = toks.idxmin(), toks.idxmax()
    w = out.set_index("source")["weight"]
    assert w[small] > toks[small] / total
    assert w[large] < toks[large] / total
