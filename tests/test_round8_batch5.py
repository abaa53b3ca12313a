"""Differential twins for the round-8 batch-5 operators."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.queries.round8_batch5 import _NEYMAN_N

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, lang, n_chars, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_soft_dedup_twin(spark):
    qs = all_queries()
    got = {
        r["doc_id"]: (r["cluster_size"], r["weight"], r["effective_tokens"])
        for r in qs["curation_soft_dedup_weights"](spark, SF).collect()
    }
    corpus = []
    for doc_id, _, _, _, text in _docs():
        corpus.append((doc_id, text))
        if doc_id % 3 == 0:
            corpus.append((doc_id + 1_000_000, text))
    sizes: dict[str, int] = {}
    fp = {}
    for doc_id, text in corpus:
        h = hashlib.md5(
            " ".join(sorted(set(text.split(" ")))).encode()
        ).hexdigest()
        fp[doc_id] = (h, len(text.split(" ")))
        sizes[h] = sizes.get(h, 0) + 1
    assert len(got) == len(corpus)
    total_mass: dict[str, float] = {}
    for doc_id, (h, nt) in fp.items():
        cs, w, et = got[doc_id]
        assert cs == sizes[h]
        assert w == pytest.approx(round(1.0 / sizes[h], 6), abs=2e-6)
        assert et == pytest.approx(
            math.floor(nt / sizes[h] * 1e6) / 1e6, abs=2e-6
        )
        total_mass[h] = total_mass.get(h, 0.0) + w
    # gradient mass sums to ~1 per cluster — the SoftDedup invariant
    for h, mass in total_mass.items():
        assert mass == pytest.approx(1.0, abs=1e-4)


def test_neyman_twin(spark):
    qs = all_queries()
    rows = qs["sample_stratified_neyman"](spark, SF).collect()
    docs = _docs()
    strata: dict[str, list[tuple[int, int]]] = {}
    for doc_id, source, _, n_chars, _ in docs:
        strata.setdefault(source, []).append((doc_id, n_chars))
    sh = {}
    for src, ds in strata.items():
        n = len(ds)
        s1 = sum(c for _, c in ds)
        s2 = sum(c * c for _, c in ds)
        sh[src] = math.sqrt(n * s2 - s1 * s1) / n
    t = sum(len(ds) * sh[s] for s, ds in strata.items())
    expect_sel = {}
    for src, ds in strata.items():
        n_alloc = min(int(math.floor(_NEYMAN_N * len(ds) * sh[src] / t)), len(ds))
        ranked = sorted(
            ds, key=lambda x: (hashlib.md5(str(x[0]).encode()).hexdigest(), x[0])
        )
        expect_sel[src] = (n_alloc, {d for d, _ in ranked[:n_alloc]})
    by_src: dict[str, set[int]] = {}
    for r in rows:
        assert r["n_alloc"] == expect_sel[r["source"]][0]
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    for src, (n_alloc, sel) in expect_sel.items():
        assert by_src.get(src, set()) == sel, src


def test_mutual_information_twin(spark):
    qs = all_queries()
    [row] = qs["agg_mutual_information"](spark, SF).collect()
    docs = _docs()
    joint: dict[tuple[str, str], int] = {}
    for _, source, lang, _, _ in docs:
        joint[(source, lang)] = joint.get((source, lang), 0) + 1
    n = len(docs)
    ns: dict[str, int] = {}
    nl: dict[str, int] = {}
    for (s, l_), c in joint.items():
        ns[s] = ns.get(s, 0) + c
        nl[l_] = nl.get(l_, 0) + c
    mi = sum(
        math.floor(c / n * math.log(c * n / (ns[s] * nl[l_])) * 1e12)
        for (s, l_), c in joint.items()
    )
    hs = sum(
        math.floor(-c / n * math.log(c / n) * 1e12) for c in ns.values()
    )
    hl = sum(
        math.floor(-c / n * math.log(c / n) * 1e12) for c in nl.values()
    )
    assert row["n_docs"] == n
    assert row["mi_nats"] == pytest.approx(mi / 1e12, abs=1e-9)
    assert row["h_source"] == pytest.approx(hs / 1e12, abs=1e-9)
    assert row["h_lang"] == pytest.approx(hl / 1e12, abs=1e-9)
    assert row["nmi"] == pytest.approx(
        math.floor(mi / min(hs, hl) * 1e6) / 1e6, abs=2e-6
    )
    # information-theoretic sanity: 0 <= MI <= min(H)
    assert 0 <= row["mi_nats"] <= min(row["h_source"], row["h_lang"]) + 1e-9
