"""Deduplication operators for training-data pipelines.

The reference never dedups (SURVEY.md §2.7 `dedup` row: duplicate paper
downloads are possible, papers_download.py). At 100 TB dedup is mandatory;
this module provides the standard ladder:

  exact        sha256(text) group — one shuffle on a 32-byte key
  fingerprint  canonical-token-set md5 (functions/text.py) — catches
               reorder/dup-token variants
  n-gram Jaccard  exact set similarity via shingle inverted index —
               O(sum_sh df^2) pair generation; use df capping at scale
  MinHash+LSH  sketch + band bucketing — the scale path: candidate pairs
               cost ~O(docs x bands), no all-pairs term
  SimHash      64->16-bit fingerprint, hamming-ball pairing

Every hash derives from md5 (functions/hashing.py) so results are engine-
and cluster-size-independent; Spark's builtin hash() would not be
reproducible against an external oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sdg_data_catalog_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_K,
    MINHASH_P,
    md5_int,
    minhash_value,
    simhash_bit_weight,
)

SHINGLE_N = 3


def _widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition UP to the session's core count — only when
    the input is narrower (a single small parquet file plans ~6 read
    splits, leaving 26 of 32 cores idle through every Python-UDF stage).
    At real scale the source already has >= cores partitions and this is a
    no-op, so the extra shuffle of raw text is never paid where it would
    actually cost something."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_expr(text: Column, n: int = SHINGLE_N) -> Column:
    """Token n-gram shingles as strings; empty array when too short
    (guard needed: sequence(1, 0) is a DESCENDING range in Spark)."""
    toks = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingle_sets(corpus: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shs: array<string>) — each doc's DISTINCT shingle set,
    computed in an Arrow-vectorized pandas UDF.

    Measured (sf0.1, 20k docs): the pure-SQL `shingle_expr` path takes
    ~4 s because higher-order functions (transform + lambda) run in the
    interpreted expression evaluator, outside whole-stage codegen; the
    Arrow batch UDF does the same work in 0.9 s. Values are identical
    (same single-space split), so DuckDB oracles built on the SQL
    formulation stay valid."""

    @pandas_udf("array<string>")
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            w = t.split(" ") if t else []
            if len(w) < n:
                out.append([])
            else:
                out.append(list(dict.fromkeys(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))))
        return pd.Series(out)

    return _widen(corpus.select("doc_id", "text")).select(
        "doc_id", _sh(F.col("text")).alias("shs")
    )


def shingles(corpus: DataFrame, n: int = SHINGLE_N, max_df: int | None = None) -> DataFrame:
    """(doc_id, sh) distinct shingle occurrences. ``max_df`` drops shingles
    present in more than max_df docs — the standard pruning that bounds the
    inverted-index join blowup at scale (hot shingles contribute O(df^2)
    candidate pairs but carry no dedup signal)."""
    sh = shingle_sets(corpus, n).select("doc_id", F.explode("shs").alias("sh"))
    if max_df is not None:
        hot = sh.groupBy("sh").count().filter(F.col("count") > max_df).select("sh")
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    return sh


def exact_dedup_groups(corpus: DataFrame) -> DataFrame:
    """sha256(text) → (text_hash, first doc id, group size). Deterministic
    survivor (min id), unlike dropDuplicates."""
    return (
        corpus.select("doc_id", F.sha2(F.col("text"), 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("group_size"))
    )


def jaccard_pairs(
    corpus: DataFrame, threshold: float, n: int = SHINGLE_N, max_df: int | None = None
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join:
    explode shingles → equi-join on shingle → count common → |A∪B| from
    per-doc set sizes. One wide shuffle on the shingle key; AQE splits
    skewed shingles."""
    sh = shingles(corpus, n, max_df)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _block_pair_counts(rows_a, rows_b, same):
    """numpy set-intersection kernel over ONE block pair (r15: factored
    out of jaccard_pairs_blocked while A/B-ing a blocked dedup_containment
    — that rewrite was measured slower and rejected, see the query's
    docstring; the factoring keeps the kernel reusable and the jaccard
    path byte-identical). Returns (ka, kb, common, na_k, nb_k) int64
    arrays: the two doc ids,
    their distinct-shingle intersection size, and each side's
    distinct-shingle count, with same-block pairs already reduced to the
    ka < kb orientation. All counts are exact integers; postings sort by
    shared int shingle ids, searchsorted range match, ragged expansion,
    bincount-style unique — identical to the pre-refactor inline body."""
    ids_a = np.fromiter((r["doc_id"] for r in rows_a), dtype=np.int64, count=len(rows_a))
    ids_b = np.fromiter((r["doc_id"] for r in rows_b), dtype=np.int64, count=len(rows_b))
    la = [r["shs"] for r in rows_a]
    lb = [r["shs"] for r in rows_b]
    na = np.array([len(x) for x in la], dtype=np.int64)
    nb = np.array([len(x) for x in lb], dtype=np.int64)
    # shared int ids for this block pair's shingle vocabulary
    _, inv = np.unique(np.concatenate(la + lb), return_inverse=True)
    ca, cb = inv[: na.sum()], inv[na.sum() :]
    ra = np.repeat(np.arange(len(la)), na)
    rb = np.repeat(np.arange(len(lb)), nb)
    ordb = np.argsort(cb, kind="stable")
    cb_s, rb_s = cb[ordb], rb[ordb]
    lo = np.searchsorted(cb_s, ca, "left")
    hi = np.searchsorted(cb_s, ca, "right")
    cnt = hi - lo
    tot = int(cnt.sum())
    if tot == 0:
        return None
    # ragged expansion: A-posting i matches B rows rb_s[lo[i]:hi[i]]
    a_rep = np.repeat(ra, cnt)
    starts = np.repeat(lo, cnt)
    offs = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    b_idx = rb_s[starts + offs]
    uk, common = np.unique(a_rep * len(lb) + b_idx, return_counts=True)
    ia, ib = uk // len(lb), uk % len(lb)
    ka, kb = ids_a[ia], ids_b[ib]
    if same:
        keep = ka < kb
        ia, ib, ka, kb, common = ia[keep], ib[keep], ka[keep], kb[keep], common[keep]
    if not len(ka):
        return None
    return ka, kb, common, na[ia], nb[ib]


def _blocked_pairs_frame(corpus: DataFrame, n: int, n_blocks: int) -> DataFrame:
    """(rows_a, rows_b, same_block) block-pair frame shared by the blocked
    set-intersection operators: docs hash into n_blocks blocks, the
    B(B+1)/2 block pairs join (each block replicated B times — the only
    shuffle)."""
    docs = shingle_sets(corpus, n).filter(F.size("shs") > 0)
    blk = docs.select(
        "doc_id", "shs", F.pmod(F.xxhash64("doc_id"), F.lit(n_blocks)).alias("blk")
    )
    # The block-pair self-join references `blocks` twice; without a lineage
    # cut each reference re-expands the corpus scan + shingling (audited 4
    # document scans per query at sf0.001 — at 100 TB, 4 corpus passes).
    # One materialization of the B-row block table costs one corpus pass
    # and the self-join then reads local partitions.
    blocks = (
        blk.groupBy("blk")
        .agg(F.collect_list(F.struct("doc_id", "shs")).alias("rows"))
        .localCheckpoint(eager=True)
    )
    a = blocks.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = blocks.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    return (
        a.join(b, F.col("blk_a") <= F.col("blk_b"))
        .withColumn("same_block", F.col("blk_a") == F.col("blk_b"))
        .select("rows_a", "rows_b", "same_block")
    )


def jaccard_pairs_blocked(
    corpus: DataFrame, threshold: float, n: int = SHINGLE_N, n_blocks: int = 16
) -> DataFrame:
    """Exact n-gram Jaccard pairs via BLOCKED set intersection — same
    results as `jaccard_pairs`, ~4× faster when shingle document
    frequencies are high (low-entropy corpora).

    Why: the inverted-index join materializes Σ_sh df² candidate rows
    through a shuffle (11 M rows at sf0.1 on the synthetic 20-word
    vocabulary) and then hash-aggregates ~4.4 M (doc_a, doc_b) groups.
    Here each doc's distinct shingle set stays in-row; docs hash into B
    blocks; the B(B+1)/2 block pairs join (each block replicated B times
    — the only shuffle), and one numpy pass per block pair counts all
    intersections: postings sorted by shingle id, searchsorted range
    match, ragged expansion, bincount-style unique. Counts are exact
    integers, so `jaccard = common/(|A|+|B|-common)` needs no fp slack —
    bit-identical to the SQL oracle.

    Scale: replication cost is O(N·B); B is chosen so a block's shingle
    sets fit executor memory ((N/B)·shingles·bytes) while B(B+1)/2 block
    pairs keep every core busy (B=16 → 136 tasks; measured 1.82 s at B=8
    vs 1.67 s at B=12-16 on 32 cores at sf0.1, degrading again at B≥24 as
    replication dominates). For corpora where even that is unaffordable,
    the MinHash-LSH ladder (`minhash_band_pairs`) is the candidate-pruning
    path. Measured at sf0.1: 2.9 s steady vs 11.7 s for the inverted-index
    join (/root/repo/PERF.md). r15: the per-block-pair intersection body
    moved verbatim into _block_pair_counts so containment_pairs_blocked
    shares it; the jaccard math here is unchanged."""

    def intersect(batches):
        for pdf in batches:
            oa, ob, oj = [], [], []
            for rows_a, rows_b, same in zip(pdf["rows_a"], pdf["rows_b"], pdf["same_block"]):
                got = _block_pair_counts(rows_a, rows_b, same)
                if got is None:
                    continue
                ka, kb, common, na_k, nb_k = got
                jac = common / (na_k + nb_k - common)
                keep = jac >= threshold
                lo_, hi_ = np.minimum(ka, kb), np.maximum(ka, kb)
                oa.extend(lo_[keep])
                ob.extend(hi_[keep])
                oj.extend(np.round(jac[keep], 6))
            yield pd.DataFrame(
                {
                    "doc_a": pd.Series(oa, dtype="int64"),
                    "doc_b": pd.Series(ob, dtype="int64"),
                    "jaccard": pd.Series(oj, dtype="float64"),
                }
            )

    return _blocked_pairs_frame(corpus, n, n_blocks).mapInPandas(
        intersect, "doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE"
    )


def minhash_signatures_sql(corpus: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """K minhash values per doc via explode + grouped MIN — the declarative
    formulation that mirrors the DuckDB oracle twin 1:1. Kept as the
    differential-test reference for the vectorized form below."""
    sh = shingles(corpus, n)
    x = sh.withColumn("xp", md5_int(F.col("sh")) % F.lit(MINHASH_P))
    aggs = [F.min(minhash_value(F.col("xp"), i)).alias(f"h{i}") for i in range(MINHASH_K)]
    return x.groupBy("doc_id").agg(*aggs)


def minhash_signatures(corpus: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """K minhash values per doc as columns h0..h{K-1}, computed entirely
    in-row by one Arrow-batched mapInPandas pass: shingle → md5 → K affine
    mins in vectorized numpy. No explode (the declarative form materializes
    ~50 shingle rows per doc), no JVM↔shuffle round for the grouped MIN —
    signatures never leave their partition, which is exactly the property
    that matters at 100 TB (the only shuffle in the whole MinHash+LSH path
    is then the band-bucket equi-join on the signatures). Measured ~2×
    faster than the explode+MIN form at sf0.1; values are bit-identical
    (differential-tested) because the arithmetic is the same pinned
    constants mod the same sub-2^30 prime — A·x + B < 2^60 fits int64 in
    numpy exactly as in the JVM and DuckDB.

    Docs with fewer than ``n`` tokens have no shingles and emit no row,
    matching the grouped formulation (GROUP BY over zero rows)."""
    import hashlib

    from collections.abc import Iterator

    a = np.array(MINHASH_A, dtype=np.int64).reshape(-1, 1)
    b = np.array(MINHASH_B, dtype=np.int64).reshape(-1, 1)
    cols = ["doc_id"] + [f"h{i}" for i in range(MINHASH_K)]
    schema = "doc_id BIGINT, " + ", ".join(f"h{i} BIGINT" for i in range(MINHASH_K))

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            out = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                w = t.split(" ") if t else []
                if len(w) < n:
                    continue  # no shingles → no signature row
                shs = dict.fromkeys(
                    " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
                )
                xs = np.fromiter(
                    (
                        int(md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
                        for s in shs
                    ),
                    dtype=np.int64,
                )
                hs = ((a * xs + b) % MINHASH_P).min(axis=1)
                out.append((doc_id, *hs.tolist()))
            yield pd.DataFrame(out, columns=cols)

    return _widen(corpus.select("doc_id", "text")).mapInPandas(sig_batches, schema)


def minhash_band_pairs(corpus: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of LSH_ROWS consecutive
    minhashes. Join cost is per-bucket, not all-pairs — the 100 TB path."""
    # one corpus pass for the signatures; the band self-join below would
    # otherwise re-expand the scan+signature subtree per side (audited 4
    # document scans per query)
    sigs = minhash_signatures(corpus, n).localCheckpoint(eager=True)
    band_keys = [
        F.concat_ws(
            "|",
            F.lit(str(b)),
            *[F.col(f"h{b * LSH_ROWS + j}").cast("string") for j in range(LSH_ROWS)],
        )
        for b in range(LSH_BANDS)
    ]
    bands = sigs.select("doc_id", F.explode(F.array(*band_keys)).alias("band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def connected_components(pairs: DataFrame, max_iters: int = 10) -> DataFrame:
    """(doc_id, component) — connected components over an undirected
    near-dup pair list; component = MIN doc_id reachable from the node.
    This is the rung of the dedup ladder the pair generators feed: a
    near-dup GROUP decision ("keep component representative, drop the
    rest"), not just a pair list.

    Algorithm: iterative min-label propagation. Each node starts as its
    own label; every round each node takes the min of its and its
    neighbors' labels; stop when a round changes nothing. Rounds needed =
    graph diameter (near-dup clusters are shallow — dup clusters of size
    k have diameter ≤ k and k is small; the planted corpus converges in
    2). Each round is one equi-join on node id + one groupBy — both
    hash-partitioned on the same key, so AQE reuses the partitioning.
    The round count is checked on the driver via a 1-row count, and
    `localCheckpoint` cuts lineage so plan size stays constant across
    rounds. For adversarial deep-chain graphs at scale, use
    `connected_components_star` below — O(log n) rounds, same output
    (differential-tested equal); this propagation form wins on shallow
    dedup graphs by doing cheaper rounds.

    If the graph diameter exceeds ``max_iters`` (propagation has NOT
    converged after the final round), silently returning the drifting
    labels would be a wrong answer — instead this detects exhaustion and
    falls back to `connected_components_star`, which converges in
    O(log n) rounds regardless of diameter.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    changed = 1
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:  # diameter > max_iters: labels are still drifting
        return connected_components_star(pairs)
    return labels


def connected_components_star(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """(doc_id, component) via alternating large-star/small-star — the
    O(log n)-round connected-components algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14; public
    algorithm). Same output contract as `connected_components`.

    Why a second implementation: min-label propagation converges in
    diameter rounds — perfect for shallow dedup clusters, punishing for
    adversarial chains (a 10⁶-node chain = 10⁶ shuffles). Star operations
    halve tree heights instead:

      large-star: per node u, connect every LARGER neighbor to
        m = min(N(u) ∪ {u});
      small-star: per node u, connect every neighbor ≤ u (and u) to m.

    Each round is one groupBy per star op on the node id; at fixpoint the
    edge set is a star per component: every node points at its component
    min. Convergence is checked with an order-insensitive edge-set
    signature (sum of per-edge hashes) — one tiny agg, no driver-side
    edge materialization."""
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("u").alias("doc_id"))
        .union(edges.select("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(e: DataFrame) -> tuple:
        r = e.select(
            F.xxhash64(F.least("u", "v"), F.greatest("u", "v")).alias("eh")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(eh)").alias("h"),  # order-insensitive, overflow-free
        ).collect()[0]
        return (r["n"], r["h"])

    def _star(e: DataFrame, large: bool) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        grouped = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
        m = F.array_min(F.array_append(F.col("nbrs"), F.col("u")))
        if large:
            targets = F.filter(F.col("nbrs"), lambda x: x > F.col("u"))
        else:
            targets = F.array_append(
                F.filter(F.col("nbrs"), lambda x: x <= F.col("u")), F.col("u")
            )
        return (
            grouped.select(F.explode(targets).alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    sig = _sig(edges)
    for _ in range(max_rounds):
        edges = _star(_star(edges, large=True), large=False).localCheckpoint(eager=True)
        new_sig = _sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    # fixpoint: every edge is (node, component-min); isolated-after-merge
    # nodes (the minima themselves) label as their own component
    labels = edges.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("doc_id"), "component"
    )
    return nodes.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )


def simhash(corpus: DataFrame, bits: int = 16) -> DataFrame:
    """tf-weighted SimHash over tokens → (doc_id, simhash int)."""
    tf = (
        corpus.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("x", md5_int(F.col("w")))
    )
    sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(F.col("tf") * simhash_bit_weight(F.col("x"), b)).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    value: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        value = value + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sums.select("doc_id", value.alias("simhash"))


def simhash_pairs(corpus: DataFrame, max_hamming: int = 2, bits: int = 16) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming — all-pairs
    self-join reference form. Quadratic in doc count: kept ONLY as the
    differential-test twin for `simhash_pairs_blocked` (the registered,
    scale-correct form). Do not register or run this at scale."""
    s = simhash(corpus, bits)
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", F.expr("bit_count(a.simhash ^ b.simhash)"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("hamming").cast("int").alias("hamming"),
        )
    )


def simhash_pairs_blocked(
    corpus: DataFrame, max_hamming: int = 2, bits: int = 16
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via pigeonhole
    chunk blocking — the 100 TB form.

    The h-bit fingerprint is split into (max_hamming + 1) contiguous
    chunks; two fingerprints within hamming distance d must agree EXACTLY
    on at least one chunk (pigeonhole: d differing bits can dirty at most
    d of the d+1 chunks). Candidate generation is therefore an EQUI-join
    on (chunk_index, chunk_value) — per-bucket cost, no all-pairs term —
    followed by an exact hamming verify on the surviving candidates.
    This is the standard near-dup detection design (Manku et al.,
    "Detecting Near-Duplicates for Web Crawling", WWW'07).
    Differential-tested equal to `simhash_pairs` in tests."""
    n_chunks = max_hamming + 1
    chunk_bits = (bits + n_chunks - 1) // n_chunks
    mask = (1 << chunk_bits) - 1
    # one corpus pass for the fingerprints; the chunk self-join would
    # otherwise re-expand the scan+tf+simhash subtree per side (audited 4
    # document scans per query)
    s = simhash(corpus, bits).localCheckpoint(eager=True)
    chunk = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("ci"),
                    F.shiftright(F.col("simhash"), i * chunk_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("cv"),
                )
                for i in range(n_chunks)
            ]
        )
    )
    ck = s.select("doc_id", "simhash", chunk.alias("c")).select(
        "doc_id", "simhash", "c.ci", "c.cv"
    )
    a, b = ck.alias("a"), ck.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )


def decontaminate(corpus: DataFrame, eval_docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Benchmark decontamination: drop every corpus document sharing ANY
    token n-gram with the evaluation set (the standard pretraining hygiene
    step — eval contamination via verbatim n-gram overlap).

    Scale shape: the eval side is small by definition (a benchmark), so
    its DISTINCT shingle set broadcasts; candidate detection is then a
    map-side semi join on the exploded corpus shingles — no shuffle of the
    corpus text, one shuffle of the (doc_id) contamination list for the
    final anti join. Corpus side cost is O(total shingles), the same pass
    the MinHash signatures already make."""
    ev = (
        eval_docs.select(F.explode(shingle_expr(F.col("text"), n)).alias("sh"))
        .distinct()
    )
    contaminated = (
        corpus.select("doc_id", F.explode(shingle_expr(F.col("text"), n)).alias("sh"))
        .join(F.broadcast(ev), "sh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return corpus.join(contaminated, "doc_id", "left_anti")
