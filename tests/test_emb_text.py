"""Semantic tests for emb_text_extra.py (TTR + PCA). TTR oracle parity
is covered by tests/test_contract.py; PCA is rows-only with the numpy
differential twin here."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries


def test_ttr_matches_python_twin(spark, sf_dir):
    out = all_queries()["text_ttr"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sampled = docs[docs["doc_id"] % 20 == 0]
    by_id = out.set_index("doc_id")
    assert set(out["doc_id"]) == set(sampled["doc_id"])
    for r in sampled.head(5).itertuples():
        counts = Counter(r.text.split(" "))
        row = by_id.loc[int(r.doc_id)]
        assert row["n_tokens"] == sum(counts.values())
        assert row["n_types"] == len(counts)
        assert row["ttr"] == pytest.approx(len(counts) / sum(counts.values()), abs=1e-6)
        hapax = sum(1 for c in counts.values() if c == 1)
        assert row["hapax_ratio"] == pytest.approx(hapax / len(counts), abs=1e-6)


def test_pca_matches_numpy_twin(spark, sf_dir):
    out = all_queries()["emb_pca_project"](spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:8]
    comps = vecs[:, order].T
    expect = (x - mean) @ comps.T
    proj_cols = [f"proj_{j}" for j in range(8)]
    got = out.set_index("vec_id").loc[emb["vec_id"]][proj_cols].to_numpy()
    # components are sign-ambiguous: align each column's sign first
    for j in range(8):
        if np.dot(got[:, j], expect[:, j]) < 0:
            expect[:, j] = -expect[:, j]
    assert np.allclose(got, expect, atol=1e-4)
    # explained variance decreases along components
    var = got.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(7))
    # projection preserves the top-subspace variance better than random
    # projection would: top-8 PCA variance >= 8/64 of total variance
    assert var.sum() >= x.var(axis=0).sum() * 8 / 64
