"""Semantic tests for curation_rules.py — pure-Python twins. Oracle
parity is covered by tests/test_contract.py."""

from __future__ import annotations

import zlib

import pandas as pd
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries

STOPS = {"the", "a", "of", "to", "and", "in"}


def test_gopher_rules_match_python_twin(spark, sf_dir):
    out = all_queries()["filter_gopher_rules"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(out) == len(docs)
    by_id = out.set_index("doc_id")
    for r in docs.head(5).itertuples():
        words = r.text.split(" ")
        mwl = sum(len(w) for w in words) / len(words)
        stop_frac = sum(1 for w in words if w in STOPS) / len(words)
        row = by_id.loc[int(r.doc_id)]
        assert row["n_words"] == len(words)
        assert row["mean_word_len"] == pytest.approx(mwl, abs=1e-6)
        assert row["stopword_frac"] == pytest.approx(stop_frac, abs=1e-6)
        assert row["passes"] == (
            20 <= len(words) <= 100000 and 3.0 <= mwl <= 10.0 and stop_frac >= 0.01
        )


def test_cdc_apply_matches_pandas_twin(spark, sf_dir):
    out = all_queries()["etl_cdc_apply"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    got = dict(zip(out["user_id"], out["value"]))
    expect = {}
    for user, g in ev.groupby("user_id"):
        last = g.sort_values(["ts", "event_id"]).iloc[-1]
        if last["event_type"] != "purchase":
            expect[user] = round(float(last["value"]), 6)
    assert got == expect


def test_markov_transitions_match_pandas_twin(spark, sf_dir):
    out = all_queries()["agg_markov_transitions"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    from collections import Counter

    pairs: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        pairs.update(zip(seq, seq[1:]))
    got = {(r.prev, r.curr): (r.n, r.p) for r in out.itertuples()}
    assert set(got) == set(pairs)
    for (p_, c_), n in pairs.items():
        row_total = sum(v for (pp, _), v in pairs.items() if pp == p_)
        assert got[(p_, c_)][0] == n
        assert got[(p_, c_)][1] == pytest.approx(n / row_total, abs=1e-6)
    # rows of the transition matrix sum to 1
    sums = out.groupby("prev")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_compression_ratio_matches_zlib_twin(spark, sf_dir):
    out = all_queries()["text_compression_ratio"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sampled = docs[docs["doc_id"] % 20 == 0]
    assert set(out["doc_id"]) == set(sampled["doc_id"])
    by_id = out.set_index("doc_id")
    for r in sampled.head(5).itertuples():
        b = r.text.encode("utf-8")
        row = by_id.loc[int(r.doc_id)]
        assert row["n_bytes"] == len(b)
        assert row["ratio"] == pytest.approx(
            len(zlib.compress(b, 6)) / len(b), abs=1e-6
        )
    # redundant word-soup text compresses well below 1 — except tiny
    # documents, where zlib's fixed header overhead can push past 1
    assert (out[out["n_bytes"] > 200]["ratio"] < 1.0).all()
