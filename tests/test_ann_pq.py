"""PQ ANN correctness: deterministic training, valid encodings,
self-retrieval, and recall against the oracle-checked brute force."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from sdg_data_catalog_spark.operators import pq
from sdg_data_catalog_spark.queries.registry import all_queries


def test_adc_self_code_is_optimal_hypothesis():
    """Theorem: a vector's own PQ code minimizes its ADC distance over
    ALL possible codes — ADC(q, code(q)) = Σ_s min_c ||q_s − c||², each
    subspace independently at its minimum. Property-tested over random
    codebooks and vectors."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def run(seed):
        rng = np.random.default_rng(seed)
        m, k, dsub = 4, 8, 3
        books = rng.normal(size=(m, k, dsub))
        q = rng.normal(size=m * dsub)
        # ADC LUT for q
        lut = np.stack(
            [
                ((books[s] - q[s * dsub : (s + 1) * dsub][None, :]) ** 2).sum(axis=1)
                for s in range(m)
            ]
        )
        self_code = lut.argmin(axis=1)
        self_adc = lut[np.arange(m), self_code].sum()
        for _ in range(20):
            other = rng.integers(0, k, size=m)
            assert self_adc <= lut[np.arange(m), other].sum() + 1e-12

    run()


def test_codebook_training_is_deterministic():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(300, 32))
    b1 = pq.train_codebooks(x, m=8, k=16, seed=42)
    b2 = pq.train_codebooks(x, m=8, k=16, seed=42)
    assert b1.shape == (8, 16, 4)
    assert np.array_equal(b1, b2)
    # a different seed moves the centroids (init actually matters)
    b3 = pq.train_codebooks(x, m=8, k=16, seed=43)
    assert not np.array_equal(b1, b3)


def test_encoding_quantizes_to_nearest_centroid(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(64, 16))
    books = pq.train_codebooks(x, m=4, k=8, seed=1)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r.codes for r in pq.encode(df, "embedding", books).collect()}
    for i, row in enumerate(x):
        for s in range(4):
            sub = row[s * 4 : (s + 1) * 4]
            d2 = ((books[s] - sub[None, :]) ** 2).sum(axis=1)
            assert out[i][s] == int(d2.argmin())
            assert 0 <= out[i][s] < 8


def test_ivfpq_self_retrieval_and_recall(spark, sf_dir):
    """IVF-PQ prunes to 4 of 16 cells yet keeps self-retrieval perfect
    (the query's own cell is always probed first) and recall comparable
    to flat PQ — measured 0.52 at sf0.001 / 0.44 at sf0.01, gated at
    0.3; that's the IVF trade: ~25% of the corpus scanned."""
    r = all_queries()["sim_ann_ivfpq_topk"](spark, sf_dir).collect()
    bf = all_queries()["sim_knn_bruteforce"](spark, sf_dir).collect()
    pqtop, bftop = defaultdict(set), defaultdict(set)
    self_rank1 = 0
    per_query = defaultdict(int)
    for x in r:
        per_query[x.query_id] += 1
        if x.vec_id == x.query_id:
            self_rank1 += x.rnk == 1
        else:
            pqtop[x.query_id].add(x.vec_id)
    for x in bf:
        bftop[x.q_id].add(x.neighbor_id)
    assert self_rank1 == 10
    assert all(c == 10 for c in per_query.values())
    recalls = [len(bftop[q] & pqtop[q]) / len(bftop[q]) for q in bftop]
    assert sum(recalls) / len(recalls) >= 0.3


def test_pq_self_retrieval_and_recall(spark, sf_dir):
    """Every query retrieves ITSELF at rank 1 (ADC self-distance is the
    quantization error, far below cross-vector distances), and the PQ
    top-10 recovers a substantial share of the exact cosine top-5 —
    random vectors are the hardest case for PQ; measured ~0.42 mean
    recall at sf0.001, gated at 0.3."""
    pqr = all_queries()["sim_ann_pq_topk"](spark, sf_dir).collect()
    bf = all_queries()["sim_knn_bruteforce"](spark, sf_dir).collect()
    pqtop, bftop = defaultdict(set), defaultdict(set)
    self_rank1 = 0
    for r in pqr:
        if r.vec_id == r.query_id:
            self_rank1 += r.rnk == 1
        else:
            pqtop[r.query_id].add(r.vec_id)
    for r in bf:
        bftop[r.q_id].add(r.neighbor_id)
    assert self_rank1 == 10
    recalls = [len(bftop[q] & pqtop[q]) / len(bftop[q]) for q in bftop]
    assert sum(recalls) / len(recalls) >= 0.3


def test_rerank_bilinear_matches_numpy(spark, sf_dir):
    """Both retrieval stages and the final rank order reproduce from a
    numpy recompute with the same integer-derived weights."""
    import numpy as np
    import pandas as pd

    from sdg_data_catalog_spark.queries.ann_pq import _RERANK_Q, _RERANK_T
    from sdg_data_catalog_spark.queries.registry import all_queries

    out = (
        all_queries()["sim_rerank_bilinear"](spark, sf_dir)
        .toPandas()
        .sort_values("rerank")
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.array(emb["embedding"].tolist(), dtype="float64")
    ids = emb["vec_id"].to_numpy()
    s1 = mat @ np.array(_RERANK_Q)
    s2 = mat @ np.array(_RERANK_T)
    order = np.lexsort((ids, -s1))[:20]
    refined = sorted(
        ((round(-s2[i], 6), ids[i]) for i in order),
    )
    want_ids = [int(vid) for _, vid in refined]
    assert out["vec_id"].tolist() == want_ids
    by_id = {ids[i]: (s1[i], s2[i]) for i in order}
    for r in out.itertuples():
        w1, w2 = by_id[r.vec_id]
        assert abs(r.stage1_score - round(w1, 6)) <= 1e-6
        assert abs(r.stage2_score - round(w2, 6)) <= 1e-6


def test_indexed_topk_equals_in_memory_path(spark, sf_dir):
    """Persist→scan loses nothing: the indexed query path returns exactly
    the in-memory IVF-PQ path's rows (same oracle, same answer)."""
    from sdg_data_catalog_spark.queries.registry import all_queries

    qs = all_queries()
    mem = sorted(
        tuple(r) for r in qs["sim_ann_ivfpq_topk"](spark, sf_dir).collect()
    )
    idx = sorted(
        tuple(r) for r in qs["sim_ann_indexed_topk"](spark, sf_dir).collect()
    )
    assert mem == idx and len(idx) > 0


def test_indexed_topk_scan_is_partition_pruned(spark, sf_dir):
    """The n_probe cell restriction must reach the parquet scan as a
    PARTITION filter on cell_id — the pruning that makes the persisted
    index pay off at scale (scan touches n_probe/n_cells of the files)."""
    from sdg_data_catalog_spark.queries.registry import all_queries

    df = all_queries()["sim_ann_indexed_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "Scan parquet" in l or "PartitionFilters" in l]
    assert any(
        "PartitionFilters" in l and "cell_id" in l for l in plan.splitlines()
    ), "cell_id not in PartitionFilters:\n" + "\n".join(scan_lines)


def test_ann_index_census_matches_assignment(spark, sf_dir):
    """The persisted code table's per-cell census equals a fresh
    assignment count — the sink wrote every vector exactly once."""
    from sdg_data_catalog_spark.operators import similarity as sim
    from sdg_data_catalog_spark.queries.ann_pq import N_CELLS, _normalized
    from sdg_data_catalog_spark.queries.registry import all_queries

    census = {
        int(r.cell_id): int(r.n_vectors)
        for r in all_queries()["sink_ann_index"](spark, sf_dir).collect()
    }
    unit = _normalized(spark, sf_dir)
    fresh = (
        sim.ivf_assign(unit, N_CELLS)
        .groupBy("cell_id")
        .count()
        .collect()
    )
    want = {int(r.cell_id): int(r["count"]) for r in fresh}
    assert census == want
    assert sum(census.values()) == unit.count()


def test_incremental_upsert_equals_batch_build(spark, sf_dir):
    """Frozen-codebook invariant: the two-batch incremental index holds
    EXACTLY the batch build's rows (vec_id, cell_id, codes) — not just
    the same census."""
    import os

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ann_index_dir,
        _ensure_ann_index,
        etl_ann_index_upsert,
    )
    from sdg_data_catalog_spark.queries.registry import all_queries

    etl_ann_index_upsert(spark, sf_dir).collect()  # builds the _incr dir
    batch_dir = _ensure_ann_index(spark, sf_dir)

    def rows(path):
        return sorted(
            (int(r.vec_id), int(r.cell_id), tuple(r.codes))
            for r in spark.read.parquet(os.path.join(path, "codes")).collect()
        )

    incr = rows(_ann_index_dir(sf_dir) + "_incr")
    batch = rows(batch_dir)
    assert incr == batch and len(batch) > 0


def test_upserted_index_equals_batch_build(spark, sf_dir):
    """Incremental ≡ batch: the base+append code table holds exactly the
    rows a one-shot full build encodes — same vec_ids, same cells, same
    PQ codes. A vector missing from either batch, double-appended, or
    encoded under drifted codebooks fails here."""
    import os

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ensure_ann_index,
        _ensure_ann_upsert_index,
    )

    up = spark.read.parquet(
        os.path.join(_ensure_ann_upsert_index(spark, sf_dir), "codes")
    )
    full = spark.read.parquet(
        os.path.join(_ensure_ann_index(spark, sf_dir), "codes")
    )
    canon = lambda df: sorted(  # noqa: E731
        (int(r.vec_id), int(r.cell_id), tuple(r.codes)) for r in df.collect()
    )
    a, b = canon(up), canon(full)
    assert a == b and len(a) > 0


def test_upserted_topk_equals_indexed_path(spark, sf_dir):
    """The query path cannot tell the incrementally-maintained index from
    the batch-built one."""
    from sdg_data_catalog_spark.queries.registry import all_queries

    qs = all_queries()
    idx = sorted(
        tuple(r) for r in qs["sim_ann_indexed_topk"](spark, sf_dir).collect()
    )
    ups = sorted(
        tuple(r) for r in qs["sim_ann_upserted_topk"](spark, sf_dir).collect()
    )
    assert idx == ups and len(ups) > 0


def test_upserted_topk_scan_is_partition_pruned(spark, sf_dir):
    """Appending files inside cell partitions must not break the n_probe
    partition pruning the layout exists for."""
    from sdg_data_catalog_spark.queries.registry import all_queries

    df = all_queries()["sim_ann_upserted_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PartitionFilters" in l and "cell_id" in l for l in plan.splitlines()
    ), plan[:2000]


def test_upsert_appends_without_rewriting_base_files(spark, sf_dir):
    """Append-only contract: rebuilding from scratch, the files written by
    the base job are byte-identical after the upsert lands (the
    incremental job may only ADD files)."""
    import glob
    import os
    import shutil

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ann_upsert_dir,
        _ensure_ann_upsert_index,
        _ivfpq_parts,
        _write_ann_meta,
    )
    from pyspark.sql import functions as F

    out = _ann_upsert_dir(sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    codes_dir = os.path.join(out, "codes")
    cents, books, base = _ivfpq_parts(
        spark, sf_dir, subset=F.col("vec_id") % 5 != 0
    )
    base.write.partitionBy("cell_id").mode("overwrite").parquet(codes_dir)
    snap = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(codes_dir, "**", "*.parquet"), recursive=True)
    }
    _write_ann_meta(spark, out, cents, books)
    _, _, arriving = _ivfpq_parts(spark, sf_dir, subset=F.col("vec_id") % 5 == 0)
    arriving.write.partitionBy("cell_id").mode("append").parquet(codes_dir)
    with open(os.path.join(out, "_ANN_UPSERT_v1"), "w") as fh:
        fh.write("v1")
    after = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(codes_dir, "**", "*.parquet"), recursive=True)
    }
    assert set(snap) <= set(after) and len(after) > len(snap)
    for p, meta in snap.items():
        assert after[p] == meta, f"base file rewritten: {p}"


def test_upsert_multi_wave_appends_and_queries(spark, sf_dir):
    """Repeated incremental ingest (r11 verdict #4): base build (60%),
    query, wave 1 append (20%), query, wave 2 append (20%), query — with
    byte-identity of every pre-existing file asserted after EACH wave
    (appends may only ADD files, across arbitrarily many waves with
    queries interleaved), the mid-wave query answering exactly what an
    in-memory build over the same vector subset answers, and the final
    directory's top-k equal to the one-shot batch index's. Proves the
    marker/layout convention supports an ongoing ingest loop, not just
    the single base+upsert wave the registered pair exercises."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ensure_ann_index,
        _ivfpq_parts,
        _ivfpq_query_luts,
        _ivfpq_score,
        _write_ann_meta,
    )
    from sdg_data_catalog_spark.queries.scale_ops import _SCRATCH, _sf_name

    out = os.path.join(_SCRATCH, _sf_name(sf_dir), "ann_ivfpq_multiwave")
    shutil.rmtree(out, ignore_errors=True)
    codes_dir = os.path.join(out, "codes")

    cents, books, base = _ivfpq_parts(
        spark, sf_dir, subset=F.col("vec_id") % 5 >= 2
    )
    base.write.partitionBy("cell_id").mode("overwrite").parquet(codes_dir)
    _write_ann_meta(spark, out, cents, books)
    luts, probes = _ivfpq_query_luts(spark, sf_dir, cents, books)

    def snap():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(
                os.path.join(codes_dir, "**", "*.parquet"), recursive=True
            )
        }

    def query_dir(path):
        enc = spark.read.parquet(path).select(
            "vec_id", F.col("cell_id").cast("long").alias("cell_id"), "codes"
        )
        return sorted(
            tuple(r) for r in _ivfpq_score(spark, enc, luts, probes, 16).collect()
        )

    def query_mem(subset):
        _, _, enc = _ivfpq_parts(spark, sf_dir, subset=subset)
        return sorted(
            tuple(r) for r in _ivfpq_score(spark, enc, luts, probes, 16).collect()
        )

    assert query_dir(codes_dir) == query_mem(F.col("vec_id") % 5 >= 2)

    prev = snap()
    for wave, subset in ((1, F.col("vec_id") % 5 == 1), (2, F.col("vec_id") % 5 == 0)):
        _, _, arriving = _ivfpq_parts(spark, sf_dir, subset=subset)
        arriving.write.partitionBy("cell_id").mode("append").parquet(codes_dir)
        cur = snap()
        assert set(prev) <= set(cur) and len(cur) > len(prev)
        for p, meta in prev.items():
            assert cur[p] == meta, f"wave {wave} rewrote pre-existing file {p}"
        prev = cur
        if wave == 1:
            assert query_dir(codes_dir) == query_mem(F.col("vec_id") % 5 != 0)

    final = query_dir(codes_dir)
    batch = query_dir(os.path.join(_ensure_ann_index(spark, sf_dir), "codes"))
    assert final == batch and len(batch) > 0
    shutil.rmtree(out, ignore_errors=True)


def test_stream_ingest_codes_equal_batch_build(spark, sf_dir):
    """The streamed index holds exactly the batch build's rows (vec_id,
    cell_id, codes), the staging zone landed >= 3 wave files, the
    checkpointed source processed them in >= 3 micro-batches (one file
    per trigger), and re-running the registered query is idempotent
    (the checkpoint marker prevents double ingest)."""
    import glob
    import os

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ann_stream_dir,
        _ensure_ann_index,
    )
    from sdg_data_catalog_spark.queries.registry import all_queries

    qs = all_queries()
    census1 = sorted(tuple(r) for r in qs["stream_ann_ingest"](spark, sf_dir).collect())
    out = _ann_stream_dir(sf_dir)

    staged = glob.glob(os.path.join(out, "staging", "*.parquet"))
    assert len(staged) >= 3
    offsets = glob.glob(os.path.join(out, "_chk", "offsets", "*"))
    assert len(offsets) >= 3, f"expected >=3 micro-batches, saw {len(offsets)}"

    canon = lambda path: sorted(  # noqa: E731
        (int(r.vec_id), int(r.cell_id), tuple(r.codes))
        for r in spark.read.parquet(path).collect()
    )
    streamed = canon(os.path.join(out, "codes"))
    batch = canon(os.path.join(_ensure_ann_index(spark, sf_dir), "codes"))
    assert streamed == batch and len(batch) > 0

    census2 = sorted(tuple(r) for r in qs["stream_ann_ingest"](spark, sf_dir).collect())
    assert census2 == census1


def test_streamed_topk_equals_indexed_path(spark, sf_dir):
    """The query path cannot tell the stream-maintained index from the
    batch-built one, and the probe restriction still prunes partitions."""
    from sdg_data_catalog_spark.queries.registry import all_queries

    qs = all_queries()
    idx = sorted(
        tuple(r) for r in qs["sim_ann_indexed_topk"](spark, sf_dir).collect()
    )
    st = sorted(
        tuple(r) for r in qs["sim_ann_streamed_topk"](spark, sf_dir).collect()
    )
    assert idx == st and len(st) > 0
    plan = (
        qs["sim_ann_streamed_topk"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert any(
        "PartitionFilters" in l and "cell_id" in l for l in plan.splitlines()
    ), plan[:2000]


def test_compaction_one_file_per_cell_and_lossless(spark, sf_dir):
    """The OPTIMIZE contract: pre-compaction the upsert layout holds ≥2
    files in at least one cell (base + appended wave); the published
    compacted snapshot holds EXACTLY one file per cell; and the row
    multiset is preserved (per-cell counts equal the audit's n_total,
    and the full (vec_id, cell_id) set is identical)."""
    import glob
    import os

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ensure_ann_compacted,
        _ensure_ann_upsert_index,
    )
    from sdg_data_catalog_spark.queries.registry import all_queries

    src = _ensure_ann_upsert_index(spark, sf_dir)
    cell_files = {}
    for d in glob.glob(os.path.join(src, "codes", "cell_id=*")):
        cell_files[d] = glob.glob(os.path.join(d, "*.parquet"))
    assert any(len(fs) >= 2 for fs in cell_files.values()), (
        "upsert layout should hold multi-file cells pre-compaction"
    )

    vdir = _ensure_ann_compacted(spark, sf_dir)
    for d in glob.glob(os.path.join(vdir, "cell_id=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d

    census = (
        all_queries()["sink_ann_index_compact"](spark, sf_dir)
        .toPandas()
        .set_index("cell_id")
    )
    audit = (
        all_queries()["catalog_ann_index_audit"](spark, sf_dir)
        .toPandas()
        .set_index("cell_id")
    )
    assert (census["n_files"] == 1).all()
    assert census["n_vectors"].sort_index().equals(
        audit["n_total"].sort_index()
    ), "compaction changed per-cell row counts"
    before = {
        (r.vec_id, r.cell_id)
        for r in spark.read.parquet(os.path.join(src, "codes")).collect()
    }
    after = {(r.vec_id, r.cell_id) for r in spark.read.parquet(vdir).collect()}
    assert before == after


def test_compaction_is_atomic_and_idempotent(spark, sf_dir):
    """The publish machinery holds for the ANN snapshot: LATEST points at
    the compacted version, a re-run short-circuits to the same dir with
    zero file churn, and the compacted top-k equals the multi-file
    upserted path's answer row-for-row."""
    import glob
    import os

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ann_compact_root,
        _ensure_ann_compacted,
    )
    from sdg_data_catalog_spark.queries.registry import all_queries
    from sdg_data_catalog_spark.sources.atomic import latest_version

    vdir = _ensure_ann_compacted(spark, sf_dir)
    root = _ann_compact_root(sf_dir)
    cur = latest_version(root)
    assert cur is not None and cur[0] == vdir
    # version = upsert marker mtime_ns (the content-freshness signal)
    import os as _os

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ANN_UPSERT_VERSION,
        _ensure_ann_upsert_index,
    )

    src = _ensure_ann_upsert_index(spark, sf_dir)
    marker = _os.path.join(src, f"_ANN_UPSERT_{_ANN_UPSERT_VERSION}")
    assert cur[1] == _os.stat(marker).st_mtime_ns
    snap = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True)
    }
    assert _ensure_ann_compacted(spark, sf_dir) == vdir
    after = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True)
    }
    assert snap == after, "idempotent re-run must not rewrite snapshot files"

    compacted = (
        all_queries()["sim_ann_compacted_topk"](spark, sf_dir)
        .orderBy("query_id", "rnk")
        .collect()
    )
    upserted = (
        all_queries()["sim_ann_upserted_topk"](spark, sf_dir)
        .orderBy("query_id", "rnk")
        .collect()
    )
    assert [tuple(r) for r in compacted] == [tuple(r) for r in upserted]


def test_compaction_refreshes_when_source_rebuilt(spark, sf_dir):
    """The ADVICE-flagged staleness hazard: a rebuilt upsert index with an
    UNCHANGED version string but different content must invalidate the
    compacted snapshot. Rebuilds rewrite the marker file, so bumping its
    mtime (what any rmtree+rebuild does) must make the next ensure publish
    a NEW version; an untouched marker must keep short-circuiting."""
    import os

    from sdg_data_catalog_spark.queries.ann_pq import (
        _ANN_UPSERT_VERSION,
        _ann_compact_root,
        _ensure_ann_compacted,
        _ensure_ann_upsert_index,
    )
    from sdg_data_catalog_spark.sources.atomic import latest_version

    vdir = _ensure_ann_compacted(spark, sf_dir)
    root = _ann_compact_root(sf_dir)
    v_before = latest_version(root)[1]
    assert _ensure_ann_compacted(spark, sf_dir) == vdir  # untouched: cached

    src = _ensure_ann_upsert_index(spark, sf_dir)
    marker = os.path.join(src, f"_ANN_UPSERT_{_ANN_UPSERT_VERSION}")
    os.utime(marker)  # simulate a rebuild finishing now
    vdir2 = _ensure_ann_compacted(spark, sf_dir)
    v_after = latest_version(root)[1]
    assert v_after > v_before and vdir2 != vdir
    # and the refreshed snapshot is itself stable again
    assert _ensure_ann_compacted(spark, sf_dir) == vdir2


def test_fused_assign_encode_bit_matches_unfused_chain(spark, sf_dir):
    """r15 fused kernel pin: _ivfpq_assign_encode (one Arrow pass doing
    normalize -> cell assign -> residual PQ encode) must emit EXACTLY the
    rows of the retired three-stage chain (_normalized -> ivf_assign ->
    _ivfpq_encode) — same vec_id/cell_id/codes, compared as exact
    integers over the full embeddings table, across a multi-partition
    repartition so per-batch boundaries differ between the two paths."""
    from pyspark.sql import functions as F

    from sdg_data_catalog_spark.operators import similarity as sim
    from sdg_data_catalog_spark.queries.ann_pq import (
        N_CELLS,
        _ivfpq_assign_encode,
        _ivfpq_codebooks,
        _ivfpq_encode,
        _normalized,
    )
    from sdg_data_catalog_spark.catalog import table

    cents, cents_df, books = _ivfpq_codebooks(spark, sf_dir)
    fused = {
        int(r.vec_id): (int(r.cell_id), tuple(r.codes))
        for r in _ivfpq_assign_encode(
            table(spark, sf_dir, "embeddings").repartition(7), cents, books
        ).collect()
    }
    unfused_src = sim.ivf_assign(
        _normalized(spark, sf_dir), N_CELLS, centroids=cents_df
    )
    unfused = {
        int(r.vec_id): (int(r.cell_id), tuple(r.codes))
        for r in _ivfpq_encode(unfused_src, cents, books).collect()
    }
    assert fused == unfused and len(fused) > 0
