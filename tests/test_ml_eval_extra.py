"""Semantic tests for the ML-eval/experimentation/governance batch
(queries/ml_eval_extra.py) plus scan_fixedwidth — pure-Python
differential twins over the same parquet and the invariants each
operator promises. Oracle parity is covered by tests/test_contract.py.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _hash_long(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


def test_kfold_partition_and_determinism(spark, sf_dir):
    """Folds 0..4 partition the corpus exactly, agree with the md5
    arithmetic, and don't move when rows are appended (hash stability —
    the property rand() folds lack)."""
    out = all_queries()["split_kfold"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    assert len(out) == len(docs)
    assert set(out["fold"]) <= set(range(5))
    for r in out.head(50).itertuples():
        assert r.fold == _hash_long(r.doc_id) % 5


def test_confusion_matrix_cells(spark, sf_dir):
    """Cell counts equal a pandas recompute of the same heuristic."""
    out = {
        (r.label, r.pred): r.n
        for r in all_queries()["agg_confusion_matrix"](spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    docs = _docs(sf_dir)
    expect = Counter(
        (
            "en" if lang == "en" else "other",
            "en" if "the" in text.split(" ") else "other",
        )
        for lang, text in zip(docs["lang"], docs["text"])
    )
    assert out == dict(expect)
    assert sum(out.values()) == len(docs)


def test_entropy_matches_python(spark, sf_dir):
    """Per-user entropy equals -sum(p ln p) over the event-type histogram."""
    out = {
        r.user_id: r
        for r in all_queries()["agg_entropy_by_group"](spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    ev = _events(sf_dir)
    for user, g in ev.groupby("user_id"):
        cnt = Counter(g["event_type"])
        n = sum(cnt.values())
        h = -sum((c / n) * math.log(c / n) for c in cnt.values())
        assert out[user].n_events == n
        assert abs(out[user].entropy - round(h, 4)) <= 1e-9, (user, h)


def test_ab_test_z_matches_python(spark, sf_dir):
    """The pooled two-proportion z reproduces from a per-user pandas fold
    with the same hash-variant assignment."""
    row = all_queries()["agg_ab_test"](spark, sf_dir).toPandas().iloc[0]
    ev = _events(sf_dir)
    conv = ev.groupby("user_id")["event_type"].apply(
        lambda s: int((s == "purchase").any())
    )
    n = [0, 0]
    c = [0, 0]
    for user, cv in conv.items():
        v = _hash_long(user) % 2
        n[v] += 1
        c[v] += cv
    pa, pb = c[0] / n[0], c[1] / n[1]
    pooled = (c[0] + c[1]) / (n[0] + n[1])
    se = math.sqrt(pooled * (1 - pooled) * (1 / n[0] + 1 / n[1]))
    assert (row.n_a, row.n_b) == (n[0], n[1])
    assert abs(row.rate_a - round(pa, 4)) <= 1e-9
    assert abs(row.rate_b - round(pb, 4)) <= 1e-9
    if se > 0:
        assert abs(row.z - round((pa - pb) / se, 4)) <= 1e-9


def test_profile_drift_welch_z(spark, sf_dir):
    """Welch z between the two order periods reproduces from pandas."""
    row = all_queries()["dq_profile_drift"](spark, sf_dir).toPandas().iloc[0]
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cut = pd.Timestamp("1998-01-01")
    a = od.loc[od["o_orderdate"] < cut, "o_totalprice"]
    b = od.loc[od["o_orderdate"] >= cut, "o_totalprice"]
    z = (b.mean() - a.mean()) / math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert abs(row.drift_z - round(z, 4)) <= 1e-4


def test_k_anonymize_suppression(spark, sf_dir):
    """Every surviving QI pair has >=3 docs; every sub-k pair is masked;
    doc set is conserved."""
    out = all_queries()["etl_k_anonymize"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    sizes = docs.groupby(["lang", "source"]).size()
    by_doc = docs.set_index("doc_id")
    for r in out.itertuples():
        lang, source = by_doc.loc[r.doc_id, ["lang", "source"]]
        if sizes[(lang, source)] < 3:
            assert (r.lang_anon, r.source_anon) == ("*", "*"), r
        else:
            assert (r.lang_anon, r.source_anon) == (lang, source), r
    survivors = out[out["lang_anon"] != "*"]
    surv_sizes = Counter(zip(survivors["lang_anon"], survivors["source_anon"]))
    assert all(v >= 3 for v in surv_sizes.values())


def test_readability_matches_python(spark, sf_dir):
    """Flesch terms reproduce from a pure-Python regex recompute."""
    out = {
        r.doc_id: r
        for r in all_queries()["text_readability"](spark, sf_dir)
        .toPandas()
        .head(500)
        .itertuples()
    }
    docs = _docs(sf_dir).set_index("doc_id")
    for doc_id, r in list(out.items())[:100]:
        text = docs.loc[doc_id, "text"]
        words = len(text.split(" "))
        syl = len(re.findall(r"[aeiouy]+", text))
        assert r.words == words and r.syllables == syl
        flesch = 206.835 - 1.015 * words - 84.6 * (syl / words)
        assert abs(r.flesch - math.floor(flesch * 1000) / 1000) <= 1e-9


def test_jaccard_neighbors_brute_force(spark, sf_dir):
    """Top-20 neighbor-Jaccard pairs agree with an adjacency-set brute
    force over the same co-purchase graph."""
    out = all_queries()["graph_jaccard_neighbors"](spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    orders_of = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        orders_of[p].add(o)
    cand = defaultdict(int)
    parts_in = defaultdict(list)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        parts_in[o].append(p)
    for o, parts in parts_in.items():
        ps = sorted(set(parts))
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1 :]:
                cand[(p1, p2)] += 1
    scored = sorted(
        (
            (
                round(c / (len(orders_of[p1]) + len(orders_of[p2]) - c), 4),
                p1,
                p2,
            )
            for (p1, p2), c in cand.items()
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = [(r.jaccard, r.p1, r.p2) for r in out.itertuples()]
    assert got == scored


def test_fixedwidth_roundtrip(spark, sf_dir):
    """Parsed fixed-width records equal the source table; every record is
    exactly 38 bytes (layout drift would change rec_len)."""
    out = all_queries()["scan_fixedwidth"](spark, sf_dir).toPandas()
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    assert set(out["rec_len"]) == {38}
    got = sorted(map(tuple, out[["n_nationkey", "n_name", "n_regionkey"]].values))
    want = sorted(map(tuple, nation[["n_nationkey", "n_name", "n_regionkey"]].values))
    assert got == want


def test_stratified_exact_counts_and_determinism(spark, sf_dir):
    """Exactly 10 per language; the picks equal a python md5-rank
    recompute (reproducible sampling — the property rand() lacks)."""
    out = all_queries()["sample_stratified_exact"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    assert out.groupby("lang").size().eq(10).all()
    for lang, g in docs.groupby("lang"):
        ranked = sorted(
            g["doc_id"],
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )[:10]
        got = sorted(out.loc[out["lang"] == lang, "doc_id"])
        assert got == sorted(ranked), lang


def test_column_crypto_roundtrip_and_determinism(spark, sf_dir):
    """Ciphertext is deterministic (ECB, fixed key), never equals the
    plaintext, and decrypts back to the original for every row."""
    out = all_queries()["etl_column_crypto"](spark, sf_dir).toPandas()
    assert out["roundtrip_ok"].all()
    docs = _docs(sf_dir).set_index("doc_id")
    for r in out.head(50).itertuples():
        assert r.source_ct != docs.loc[r.doc_id, "source"]
    out2 = all_queries()["etl_column_crypto"](spark, sf_dir).toPandas()
    a = out.sort_values("doc_id")["source_ct"].tolist()
    b = out2.sort_values("doc_id")["source_ct"].tolist()
    assert a == b  # deterministic ciphertext: joinable/groupable
    # equal plaintexts produce equal ciphertexts (the ECB linkability
    # trade-off the docstring documents)
    merged = out.set_index("doc_id").join(docs[["source"]])
    cts = merged.groupby("source")["source_ct"].nunique()
    assert (cts == 1).all()


def test_auc_matches_sklearn_free_numpy(spark, sf_dir):
    """The rank-sum AUC equals a direct pairwise-probability estimate
    computed in numpy (P(score_pos > score_neg) with the same total
    order), and calibration bins partition the corpus."""
    import numpy as np

    from sdg_data_catalog_spark.operators.scoring import classify_embeddings  # noqa: F401

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.array(emb["embedding"].tolist(), dtype="float64")
    w = np.array(
        [((((i + 17) * 2654435761) % 1000003) % 97 - 48) / 48.0 for i in range(1, 65)]
    )
    p = 1.0 / (1.0 + np.exp(-(mat @ w)))
    y = (emb["label"] % 2).to_numpy()
    ids = emb["vec_id"].to_numpy()
    order = np.lexsort((ids, p))
    ranks = np.empty(len(p), dtype="int64")
    ranks[order] = np.arange(1, len(p) + 1)
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    auc = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    row = all_queries()["agg_roc_auc"](spark, sf_dir).toPandas().iloc[0]
    assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
    assert abs(row.auc - math.floor(auc * 1e6) / 1e6) <= 1e-9

    bins = all_queries()["agg_calibration_bins"](spark, sf_dir).toPandas()
    assert bins["n"].sum() == len(emb)
    assert set(bins["bin"]) <= set(range(10))
    for r in bins.itertuples():
        sel = np.minimum(np.floor(p * 10), 9) == r.bin
        assert r.n == int(sel.sum())
        assert abs(r.pos_rate - y[sel].mean()) <= 1e-9


def test_balanced_classes_equal_counts(spark, sf_dir):
    """Every class is cut to exactly the minority size."""
    out = all_queries()["sample_balanced_classes"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    m = docs.groupby("lang").size().min()
    assert set(out["n"]) == {m}
    assert set(out["lang"]) == set(docs["lang"])


def test_pr_curve_monotone_recall(spark, sf_dir):
    """Recall is non-increasing in the threshold; counts are consistent
    (tp+fn = n_pos at every threshold)."""
    out = (
        all_queries()["agg_pr_curve"](spark, sf_dir)
        .toPandas()
        .sort_values("threshold")
    )
    n_pos = (out["tp"] + out["fn"]).unique()
    assert len(n_pos) == 1
    rec = out["recall"].tolist()
    assert all(a >= b - 1e-12 for a, b in zip(rec, rec[1:]))


def test_gdpr_erasure_latest_clean_history_retained(spark, sf_dir):
    """After the erasure publish: LATEST contains ZERO erased users, the
    prior version still contains them (history until retention), and the
    census balances."""
    import hashlib as _h

    from sdg_data_catalog_spark.queries.registry import all_queries
    from sdg_data_catalog_spark.sources.atomic import read_latest, read_version
    from sdg_data_catalog_spark.sources.formats import io_dir

    out = all_queries()["etl_gdpr_erasure"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    erased = {
        u for u in ev["user_id"].unique()
        if _h.md5(str(u).encode()).hexdigest()[0] == "0"
    }
    assert (out["rows_before"] - out["rows_after"] == out["rows_erased"]).all()
    assert out["rows_erased"].sum() == int(ev["user_id"].isin(erased).sum())
    root = io_dir(sf_dir, "gdpr_events", fresh=False)
    latest_users = {
        r.user_id for r in read_latest(spark, root).select("user_id").distinct().collect()
    }
    assert not (latest_users & erased)
    v0_users = {
        r.user_id for r in read_version(spark, root, 0).select("user_id").distinct().collect()
    }
    assert erased <= v0_users


def test_gini_matches_numpy(spark, sf_dir):
    """Per-source Gini equals the numpy rank-identity recompute and sits
    in [0, 1)."""
    import numpy as np

    out = {
        r.source: r
        for r in all_queries()["agg_gini_concentration"](spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    docs = _docs(sf_dir)
    for source, g in docs.groupby("source"):
        x = g.sort_values(["n_chars", "doc_id"])["n_chars"].to_numpy(dtype="int64")
        n = len(x)
        gini = 2.0 * (np.arange(1, n + 1) * x).sum() / (n * x.sum()) - (n + 1.0) / n
        r = out[source]
        assert r.n_docs == n
        assert abs(r.gini - math.floor(gini * 1e6) / 1e6) <= 1e-9
        assert 0 <= r.gini < 1
