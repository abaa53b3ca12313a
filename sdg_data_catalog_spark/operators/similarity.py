"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a deterministic
random-hyperplane LSH bucketing as the scale path (candidates only within a
bucket — turns O(N^2) into O(N^2 / 2^planes) expected).

All math is built-in higher-order functions (zip_with/aggregate) — JVM-side,
no Python. Products are cast float→double BEFORE multiplying so results are
bit-identical to an external double-precision oracle.

Replaces/extends SURVEY.md §4.3 item 2 (embedding ANN top-k).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIM = 64
N_PLANES = 8


def round6(x: float) -> float:
    """Half-away-from-zero rounding to 6 dp — the repo's cross-engine
    convention (DuckDB ROUND and Spark F.round are both HALF_UP/away).
    Python's built-in round() is banker's (half-even): a value landing
    exactly on a 1e-6 half-boundary would hash-mismatch the oracle."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — the float chain every SQL oracle
    pins. NOTE r14: an unrolled left-assoc element_at chain
    (bit-identical order, whole-stage codegen'd) was A/B'd and
    REJECTED: it wins where the generated method stays JIT-compilable
    (isolated microbench 1.5×, sim_knn_bruteforce 23.0 → 18.6 s at the
    100× replica) but loses wherever the fused stage's method grows
    past HotSpot's JIT size threshold and runs as uncompiled bytecode
    (sim_ann_lsh_topk 2.45 → 5.49, sim_ann_recall_eval 1.39 → 4.94,
    dedup_semantic 4.99 → 5.44, ml_knn_label_eval 1.78 → 2.51 at
    sf0.1) — unpredictable per consumer, so the interpreted HOF fold
    stays. Hot pair-scoring paths use the Arrow per-dimension fold
    instead (unit_cos_pairs below — same chain, vectorized across
    rows)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _topk_rank(scored: DataFrame, k: int) -> DataFrame:
    """Global (q_id) top-k rank + 6-dp rounding over raw cosine doubles —
    the exact window the oracles pin (cos DESC, neighbor_id ASC)."""
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def raw_cos_topk_pairs(
    candidates: DataFrame,
    q_rows: list[tuple[int, list[float], int | None]],
    k: int,
) -> DataFrame:
    """Per-Arrow-batch top-k (q_id, neighbor_id, cos_sim) candidate pairs
    against a bounded, already-collected query panel, scoring with the
    DIRECT-form cosine dot(q,c) / (norm(q)·norm(c)) — the exact float
    chain `cosine()` produces and the sim_knn/eval_pr oracles pin (NOT
    rank_mrr's unit-vector form, which `unit_cos_pairs` serves).

    r15 (guide §4.2, the unit_cos_pairs precedent): the former expression
    form evaluated the interpreted 64-dim HOF fold once per (query,
    candidate) pair — 23.0 s at the 100× replica for sim_knn_bruteforce
    alone. This form streams candidates through ONE Arrow pass,
    accumulating dot and norm² per DIMENSION across the whole batch
    (vectorized across pairs, ordered across dims), so every accumulated
    double rounds exactly like the JVM's sequential left fold:
    dot = (((0+q₁c₁)+q₂c₂)+…), norm² likewise, then ONE divide by
    (√nq·√nc) — same three IEEE ops, same order, identical bits. numpy's
    += is a separate multiply-then-add per dimension (no FMA
    contraction). Query norms use the same pure-Python left fold.

    Bit-identity of the downstream RANK: the emitted cos doubles are
    bit-identical to the retired expression's, and the (cos DESC,
    neighbor_id ASC) ordering is total (ids distinct), so the global
    top-k is invariant under the per-batch pre-filter applied here: the
    kernel keeps only each batch's k best rows per query (lexsort on
    (-cos, id) — negation is exact), a strict superset of the global
    winners, cutting the Python→JVM boundary and the rank exchange from
    N·|Q| rows to batches·k·|Q|. Pinned in tests/test_r15_arrow_kernels.py.

    q_rows: (q_id, embedding, None) tuples, bounded by design (collected
    eagerly by callers — the ivf_assign / unit_cos_pairs convention;
    callers return an empty frame instead when no queries exist). The
    IVF variant with the same-cell candidate restriction is the fused
    kernel inside ivf_topk (assignment + scoring in one pass).

    No-NaN contract: a non-finite cosine (zero-norm or NaN input) would
    sort differently here (numpy orders NaN last) than in Spark SQL
    (NaN > +Inf), so the kernel asserts finiteness and fails loud
    instead of silently diverging from the oracle convention."""
    import numpy as np
    import pandas as pd

    q_ids = np.asarray([int(q[0]) for q in q_rows], dtype=np.int64)
    qmat = np.asarray(
        [[float(v) for v in q[1]] for q in q_rows], dtype=np.float64
    )
    qn = []
    for q in q_rows:
        acc = 0.0
        for x in q[1]:  # sequential left fold — the oracle's norm chain
            fx = float(x)
            acc += fx * fx
        qn.append(math.sqrt(acc))
    qn = np.asarray(qn, dtype=np.float64)
    n_q = len(q_ids)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n = len(pdf)
            nacc = np.zeros(n, dtype=np.float64)
            for d in range(mat.shape[1]):  # ordered across dims
                nacc += mat[:, d] * mat[:, d]
            cn = np.sqrt(nacc)
            dm = np.zeros((n, n_q), dtype=np.float64)
            for d in range(mat.shape[1]):  # ordered across dims
                dm += mat[:, d, None] * qmat[None, :, d]
            cos = dm / (qn[None, :] * cn[:, None])
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            out_q, out_id, out_cos = [], [], []
            for j in range(n_q):
                vidx = np.nonzero(ids != q_ids[j])[0]
                if not len(vidx):
                    continue
                cj = cos[vidx, j]
                if not np.isfinite(cj).all():
                    raise ValueError(
                        "raw_cos_topk_pairs: non-finite cosine (zero-norm or "
                        "NaN embedding) — numpy and Spark SQL order NaN "
                        "differently, so the rank would silently diverge"
                    )
                order = np.lexsort((ids[vidx], -cj))[:k]
                out_q.append(np.full(len(order), q_ids[j], dtype=np.int64))
                out_id.append(ids[vidx][order])
                out_cos.append(cj[order])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_id),
                    "cos_sim": np.concatenate(out_cos),
                }
            )

    return candidates.select("vec_id", "embedding").mapInPandas(
        score, "q_id long, neighbor_id long, cos_sim double"
    )


def knn_bruteforce(embeddings: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    queries is expected to be small and is COLLECTED eagerly at
    DataFrame-build time (bounded by design — the ivf_assign /
    unit_cos_pairs convention; an empty query set returns an empty frame
    with the declared schema, preserving the retired lazy form's
    semantics). Candidates stream partition-parallel through the
    raw_cos_topk_pairs Arrow kernel (bit-identical direct-form cosine —
    see its docstring) and rank via the global window top-k. Output:
    (q_id, neighbor_id, rank, cos_sim). The retired expression form is
    kept as knn_bruteforce_expr for differential tests."""
    rows = queries.select("vec_id", "embedding").collect()
    if not rows:
        return embeddings.sparkSession.createDataFrame(
            [], "q_id long, neighbor_id long, rank int, cos_sim double"
        )
    q_rows = sorted(
        ((int(r["vec_id"]), list(r["embedding"]), None) for r in rows),
        key=lambda t: t[0],
    )
    scored = raw_cos_topk_pairs(embeddings, q_rows, k)
    return _topk_rank(scored, k)


def knn_bruteforce_expr(
    embeddings: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """The retired broadcast-join + interpreted-HOF-cosine form of
    knn_bruteforce — kept only as the differential-test reference for
    the Arrow kernel (tests/test_r15_arrow_kernels.py)."""
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        cand.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_emb"), F.col("c_emb")))
        .select("q_id", "neighbor_id", "cos_sim")
    )
    return _topk_rank(scored, k)


def unit_cos_pairs(
    embeddings: DataFrame,
    anchor_max: int,
    candidates_from: int | None = None,
) -> DataFrame:
    """(anchor_id, a_label, cand_id, c_label, cos) for every
    (anchor, candidate) pair — anchors are vec_id < `anchor_max`,
    candidates are vec_id >= `candidates_from` (default: anchor_max;
    pass 0 for the whole corpus and filter self-pairs downstream). cos
    is the unit-vector dot with the SQL convention's exact float chain.

    r14 (guide §4.2, the ivf_assign precedent): the former expression
    form evaluated the 64-dim normalize + cosine per pair in the
    interpreted HOF evaluator (rank_mrr: 106 s at the 100× replica) —
    and the unrolled-expression alternative generated methods past
    HotSpot's JIT size limit, running as uncompiled bytecode (slower
    still; measured, see OPTIMIZATION_r14.md). This form streams
    candidates through ONE Arrow pass and accumulates cos per DIMENSION
    across the whole batch (vectorized across pairs, ordered across
    dims) — bit-identical to the sequential left fold the oracles pin:
    nrm = (((0+x₁²)+x₂²)+…), u = x/nrm, cos = (((0+u₁q₁)+u₂q₂)+…).
    The ≤`anchor_max` anchor rows are a bounded driver collect (the
    ivf_assign centroid convention) — NOTE this collect runs EAGERLY at
    DataFrame-build time (a Spark job per call), and an empty anchor set
    raises here instead of lazily yielding an empty result like the
    retired expression form; callers invoke pairs() per use knowingly.
    Their unit vectors are computed with the same pure-Python left fold
    (IEEE doubles, identical bits).
    numpy's += here is a separate multiply then add per dimension — no
    FMA contraction — so every intermediate rounds exactly like the
    JVM chain."""
    import numpy as np
    import pandas as pd

    if candidates_from is None:
        candidates_from = anchor_max
    src = embeddings.select("vec_id", "label", "embedding")
    anchors = sorted(
        src.filter(F.col("vec_id") < anchor_max).collect(),
        key=lambda r: int(r["vec_id"]),
    )
    if not anchors:
        raise ValueError("unit_cos_pairs: no anchor rows (vec_id < anchor_max)")
    a_ids = np.asarray([int(r["vec_id"]) for r in anchors], dtype=np.int64)
    a_labels = np.asarray([int(r["label"]) for r in anchors], dtype=np.int64)
    qu = []
    for r in anchors:
        xs = [float(v) for v in r["embedding"]]
        acc = 0.0
        for x in xs:  # sequential left fold — the oracle's chain
            acc += x * x
        nrm = math.sqrt(acc)
        qu.append([x / nrm for x in xs])
    qu = np.asarray(qu, dtype=np.float64)  # (A, DIM)
    n_anchors = len(a_ids)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n = len(pdf)
            acc = np.zeros(n, dtype=np.float64)
            for d in range(mat.shape[1]):  # ordered across dims
                acc += mat[:, d] * mat[:, d]
            u = mat / np.sqrt(acc)[:, None]
            cos = np.zeros((n, n_anchors), dtype=np.float64)
            for d in range(mat.shape[1]):  # ordered across dims
                cos += u[:, d, None] * qu[None, :, d]
            cand_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cand_labels = pdf["label"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "anchor_id": np.tile(a_ids, n),
                    "a_label": np.tile(a_labels, n),
                    "cand_id": np.repeat(cand_ids, n_anchors),
                    "c_label": np.repeat(cand_labels, n_anchors),
                    "cos": cos.reshape(-1),
                }
            )

    cands = src.filter(F.col("vec_id") >= candidates_from)
    return cands.mapInPandas(
        score,
        "anchor_id long, a_label long, cand_id long, c_label long, cos double",
    )


def _plane_component(i: Column | int, j: int) -> Column:
    """Deterministic pseudo-random plane weight in [-1, 1]: pure int64
    arithmetic reproducible in any engine (no RNG, no stored planes)."""
    i_col = i if isinstance(i, Column) else F.lit(i)
    return ((((i_col + F.lit(17 * (j + 1))) * F.lit(2654435761)) % F.lit(1000003)) % F.lit(97) - F.lit(48)) / F.lit(48.0)


def plane_dot(emb: Column, j: int) -> Column:
    # NOTE r14: the unrolled literal-weight chain was A/B'd and
    # REJECTED (sim_ann_lsh_bucket 0.92 → 2.79 s at sf0.1 — 8 unrolled
    # plane chains in one stage blow the JIT method-size limit; see
    # dot() note).
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: F.element_at(emb, i).cast("double") * _plane_component(i, j),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(emb: Column, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket id in [0, 2^n_planes)."""
    bucket: Column = F.lit(0).cast("bigint")
    for j in range(n_planes):
        bucket = bucket + F.when(plane_dot(emb, j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(embeddings: DataFrame, k: int = 1, n_planes: int = N_PLANES) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to LSH-bucket
    collisions. The bucket equi-join shuffles on the bucket key only —
    this is what survives when N makes brute force quadratic."""
    with_bucket = embeddings.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding"), n_planes).alias("bucket")
    )
    a = with_bucket.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "bucket"
    )
    b = with_bucket.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "bucket"
    )
    scored = a.join(b, "bucket").filter(F.col("q_id") != F.col("neighbor_id")).withColumn(
        "cos_sim", cosine(F.col("q_emb"), F.col("c_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def cosine_neardup_pairs(
    embeddings: DataFrame, threshold: float, n_blocks: int = 8
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold — exact all-pairs
    via BLOCK-MATRIX multiply, not a per-pair expression join.

    The naive form (theta-join + per-pair cosine expression) evaluates an
    interpreted 64-dim dot product N²/2 times — measured 93 s for N=2000 at
    sf0.1, and quadratic from there. Here rows hash into B blocks, the B(B+1)/2
    block pairs join (tiny shuffle: each block replicated B times), and each
    block pair runs one vectorized numpy GEMM inside mapInPandas — the same
    flops through BLAS instead of the expression interpreter (~100× faster).

    GEMM reorders float additions, so candidates are taken with a small
    slack and every emitted pair's cosine is recomputed with sequential
    summation — bit-identical to the SQL oracle's list_sum.

    Scale: B scales with N so a block fits executor memory (rows·dim·8B);
    replication cost is O(N·B). For N where even that is unaffordable, LSH
    bucketing (ann_lsh_* operators) is the candidate-pruning path.
    """
    import numpy as np
    import pandas as pd

    dim = 64

    def _ids_mat(rows) -> tuple:
        ids = np.fromiter((r["vec_id"] for r in rows), dtype=np.int64, count=len(rows))
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        return ids, mat

    def _seq_cos(ea, eb) -> float:
        # sequential left-to-right sums: bit-identical to DuckDB/Spark SQL
        d = na = nb = 0.0
        for x, y in zip(ea, eb):
            d += x * y
        for x in ea:
            na += x * x
        for y in eb:
            nb += y * y
        import math

        return d / (math.sqrt(na) * math.sqrt(nb))

    def gemm(batches):
        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for rows_a, rows_b, same in zip(pdf["rows_a"], pdf["rows_b"], pdf["same_block"]):
                ids_a, A = _ids_mat(rows_a)
                ids_b, B = _ids_mat(rows_b)
                An = A / np.linalg.norm(A, axis=1, keepdims=True)
                Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
                S = An @ Bn.T
                ia, ib = np.nonzero(S >= threshold - 1e-9)  # slack for fp reorder
                ka, kb = ids_a[ia], ids_b[ib]
                if same:
                    # each unordered pair appears twice (and self-pairs once):
                    # keep the (low, high) orientation only
                    keep = ka < kb
                    ia, ib, ka, kb = ia[keep], ib[keep], ka[keep], kb[keep]
                for i, j, lo, hi in zip(ia, ib, np.minimum(ka, kb), np.maximum(ka, kb)):
                    c = _seq_cos(A[i], B[j])  # exact sequential recompute
                    if c >= threshold:
                        out_a.append(lo)
                        out_b.append(hi)
                        out_s.append(round6(c))
            yield pd.DataFrame({"id_a": pd.Series(out_a, dtype="int64"),
                                "id_b": pd.Series(out_b, dtype="int64"),
                                "cos_sim": pd.Series(out_s, dtype="float64")})

    e = embeddings.select(
        "vec_id", "embedding", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).alias("blk")
    )
    blocks = e.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("rows")
    )
    a = blocks.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = blocks.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    pairs = (
        a.join(b, F.col("blk_a") <= F.col("blk_b"))
        .withColumn("same_block", F.col("blk_a") == F.col("blk_b"))
        .select("rows_a", "rows_b", "same_block")
    )
    return pairs.mapInPandas(gemm, "id_a BIGINT, id_b BIGINT, cos_sim DOUBLE")


def ivf_centroids(embeddings: DataFrame, n_cells: int = 16) -> DataFrame:
    """Deterministic coarse-quantizer codebook: the first `n_cells` vectors
    (by vec_id) act as centroids (k-means would converge them; determinism
    matters more than centroid quality for the operator contract)."""
    return (
        embeddings.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid"))
    )


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 16,
    n_probe: int = 1,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization: each vector keeps its `n_probe` nearest L2
    cells (n_probe=1 — the index-build default — is the argmin cell;
    queries pass n_probe>1 to widen the search). The ≤`n_cells` centroids
    are collected (bounded by design) and broadcast into ONE Arrow-batched
    map pass — NO crossJoin, NO shuffle, NO window, and the per-row float
    work runs as n_cells×dim numpy column ops instead of interpreted
    higher-order expressions. The previous crossJoin+row_number form
    shuffled N×n_cells rows carrying full embedding arrays just to pick
    each vector's minimum (35 s+ for 200k×16 at the curation-scale tier;
    this form is sub-second). Ordering semantics are identical:
    per-dimension accumulation reproduces the sequential left fold, and a
    stable argsort ties to (dist2 ASC, cell_id ASC), the exact ROW_NUMBER
    ordering the oracles pin. Pass `centroids`
    explicitly when assigning a query set so both sides share ONE codebook
    (quantizing queries against query-derived centroids would silently
    break cell agreement).

    Contract notes: the output `embedding` column is ALWAYS
    `array<double>` — inputs of narrower element types (array<float>) are
    widened by the numpy pass (the old crossJoin form preserved the input
    type). An empty centroid table raises instead of silently emitting
    zero rows."""
    import numpy as np
    import pandas as pd

    cents = centroids if centroids is not None else ivf_centroids(embeddings, n_cells)
    rows = sorted(cents.collect(), key=lambda r: int(r["cell_id"]))  # ≤ n_cells
    if not rows:
        raise ValueError(
            "ivf_assign: empty centroid table (n_cells=0 or empty corpus) — "
            "every vector would silently vanish from the assignment"
        )
    cell_ids = np.asarray([int(r["cell_id"]) for r in rows], dtype=np.int64)
    cmat = np.asarray(
        [[float(v) for v in r["centroid"]] for r in rows], dtype=np.float64
    )
    probe = min(n_probe, len(cell_ids))

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n = len(pdf)
            d2 = np.empty((n, len(cell_ids)), dtype=np.float64)
            for c in range(len(cell_ids)):
                # per-dimension accumulation = the sequential left fold the
                # SQL oracles pin (vectorized across ROWS, ordered across
                # dims — bit-identical to acc += (x_d - c_d)^2 per row)
                acc = np.zeros(n, dtype=np.float64)
                for d in range(mat.shape[1]):
                    diff = mat[:, d] - cmat[c, d]
                    acc += diff * diff
                d2[:, c] = acc
            # stable sort on d2 keeps ascending cell order on exact ties —
            # the (dist2 ASC, cell_id ASC) ROW_NUMBER ordering
            order = np.argsort(d2, axis=1, kind="stable")[:, :probe]
            idx = np.repeat(np.arange(n), probe)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[idx],
                    "embedding": [mat[i] for i in idx],
                    "cell_id": cell_ids[order.reshape(-1)],
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        _assign, "vec_id long, embedding array<double>, cell_id long"
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 1,
) -> DataFrame:
    """IVF approximate top-k: exact cosine ranking restricted to vectors in
    the query's `n_probe` nearest cells. The index side is assigned to its
    single argmin cell; the query side fans out to n_probe cells, so the
    candidate join stays an equi-join on cell_id — the shuffle moves each
    indexed vector once, versus N× for brute force — and raising n_probe
    trades compute for recall. `queries` takes any (vec_id, embedding)
    DataFrame like knn_bruteforce; it defaults to vec_id < 10 of the corpus
    (the registered demo query set). A candidate is indexed in exactly one
    cell, so multi-probe never produces duplicate (query, candidate) rows.
    Recall vs the exact baseline is asserted in
    tests/test_dedup_similarity.py."""
    import numpy as np
    import pandas as pd

    cents = ivf_centroids(embeddings, n_cells)
    qbase = queries if queries is not None else embeddings.filter(F.col("vec_id") < 10)
    # r15 (guide §4.2): cell assignment AND same-cell cosine scoring are
    # FUSED into one Arrow pass — the former plan ran ivf_assign's
    # mapInPandas, shipped every (embedding, cell_id) row back to the
    # JVM, equi-joined the ≤|queries|·n_probe query rows on cell_id, and
    # evaluated the interpreted HOF cosine per surviving pair; here the
    # ≤n_cells centroids and the assigned query panel are bounded eager
    # collects (the ivf_assign convention; empty queries → empty frame),
    # candidates cross the Python boundary exactly once, and each query
    # scores ONLY its own cell's candidate subset (the same pair set the
    # equi-join produced — an unfused kernel that scored every candidate
    # against all queries and masked after was measured SLOWER than the
    # join it replaced: 2.43 → 4.45 s at the 100× replica; this fused
    # form is the one that wins, see OPTIMIZATION_r15.md). Bit-identity:
    # the cell argmin is ivf_assign's exact per-dimension fold + stable
    # first-tie argmin, and the cosine is the direct-form per-dimension
    # fold raw_cos_topk_pairs pins (ivf_assign widened to float64, which
    # numpy reproduces exactly), so the (cos DESC, neighbor_id ASC) rank
    # over raw doubles is unchanged; the per-batch top-k pre-filter is
    # safe because the ordering is total. A candidate lives in exactly
    # ONE cell, so multi-probe still cannot duplicate (query, candidate)
    # rows.
    c_rows = sorted(cents.collect(), key=lambda r: int(r["cell_id"]))
    if not c_rows:
        raise ValueError(
            "ivf_topk: empty centroid table (n_cells=0 or empty corpus)"
        )
    cell_ids = np.asarray([int(r["cell_id"]) for r in c_rows], dtype=np.int64)
    cmat = np.asarray(
        [[float(v) for v in r["centroid"]] for r in c_rows], dtype=np.float64
    )
    q_rows = ivf_assign(qbase, n_cells, n_probe=n_probe, centroids=cents).collect()
    if not q_rows:
        return embeddings.sparkSession.createDataFrame(
            [], "q_id long, neighbor_id long, rank int, cos_sim double"
        )
    panel = sorted(
        (
            (int(r["vec_id"]), [float(v) for v in r["embedding"]], int(r["cell_id"]))
            for r in q_rows
        ),
        key=lambda t: (t[0], t[2]),
    )
    q_ids = np.asarray([t[0] for t in panel], dtype=np.int64)
    qmat = np.asarray([t[1] for t in panel], dtype=np.float64)
    q_cells = np.asarray([t[2] for t in panel], dtype=np.int64)
    qn = []
    for t in panel:
        acc = 0.0
        for x in t[1]:  # sequential left fold — the oracle's norm chain
            acc += x * x
        qn.append(math.sqrt(acc))
    qn = np.asarray(qn, dtype=np.float64)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n = len(pdf)
            # ivf_assign's exact assignment math: per-dim fold, stable
            # first-min tie = ascending cell_id on exact ties
            d2 = np.empty((n, len(cell_ids)), dtype=np.float64)
            for c in range(len(cell_ids)):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(mat.shape[1]):  # ordered across dims
                    diff = mat[:, d] - cmat[c, d]
                    acc += diff * diff
                d2[:, c] = acc
            if not np.isfinite(d2).all():
                raise ValueError(
                    "ivf_topk: non-finite centroid distance (NaN/Inf "
                    "embedding) — numpy argmin and Spark SQL order NaN "
                    "differently"
                )
            cand_cells = cell_ids[np.argmin(d2, axis=1)]
            nacc = np.zeros(n, dtype=np.float64)
            for d in range(mat.shape[1]):  # ordered across dims
                nacc += mat[:, d] * mat[:, d]
            cn = np.sqrt(nacc)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            out_q, out_id, out_cos = [], [], []
            for j in range(len(q_ids)):
                vidx = np.nonzero(
                    (cand_cells == q_cells[j]) & (ids != q_ids[j])
                )[0]
                if not len(vidx):
                    continue
                sub = mat[vidx]
                dj = np.zeros(len(vidx), dtype=np.float64)
                for d in range(sub.shape[1]):  # ordered across dims
                    dj += sub[:, d] * qmat[j, d]
                cj = dj / (qn[j] * cn[vidx])
                if not np.isfinite(cj).all():
                    raise ValueError(
                        "ivf_topk: non-finite cosine (zero-norm embedding) "
                        "— numpy and Spark SQL order NaN differently, so "
                        "the rank would silently diverge"
                    )
                order = np.lexsort((ids[vidx], -cj))[:k]
                out_q.append(np.full(len(order), q_ids[j], dtype=np.int64))
                out_id.append(ids[vidx][order])
                out_cos.append(cj[order])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_id),
                    "cos_sim": np.concatenate(out_cos),
                }
            )

    scored = embeddings.select("vec_id", "embedding").mapInPandas(
        score, "q_id long, neighbor_id long, cos_sim double"
    )
    return _topk_rank(scored, k)


# --- embedding compression (storage-side scale levers) --------------------

RP_DIM = 16
RP_SEED = 7


def rp_matrix() -> list[list[int]]:
    """Deterministic ±1 (Achlioptas-style) Johnson-Lindenstrauss projection
    matrix, RP_DIM × DIM, pinned by seed: the Spark literal arrays AND the
    DuckDB oracle SQL are both generated from this one constant, so the two
    sides cannot drift."""
    import numpy as np

    rng = np.random.default_rng(RP_SEED)
    return (rng.integers(0, 2, size=(RP_DIM, DIM)) * 2 - 1).tolist()


def project_rp(embeddings: DataFrame) -> DataFrame:
    """Random-projection compression DIM→RP_DIM: out_j = <emb, R_j> with
    literal ±1 rows — pure JVM expression tree (16 zip_with dots), no
    Python, no shuffle. Adds orig_norm and proj_norm (scaled by
    1/sqrt(RP_DIM) so E[proj_norm] ≈ orig_norm — the JL contract that makes
    the compressed vectors usable for candidate generation in ANN)."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    projs = [
        dot(e, F.array(*[F.lit(float(v)) for v in row])) for row in rp_matrix()
    ]
    proj_sq = sum((p * p for p in projs[1:]), projs[0] * projs[0])
    return embeddings.select(
        "vec_id",
        "label",
        norm(e).alias("orig_norm"),
        (F.sqrt(proj_sq) / F.lit(float(RP_DIM) ** 0.5)).alias("proj_norm"),
    )


def quantize_int8(embeddings: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale = max|x|/127,
    code_i = floor(x_i/scale + 0.5) — 4× storage cut before ANN at 100 TB.
    floor(x+0.5) (not round()) so the Spark and oracle halves share one
    exactly-specified tie rule. Emits per-vector reconstruction error
    (mse, max_abs_err) — scalar columns, never the array codes (driver
    canonicalization is scalar-only)."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    amax = F.aggregate(
        F.transform(e, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.greatest(amax, F.lit(1e-30)) / F.lit(127.0)
    err = F.transform(e, lambda x: x - F.floor(x / scale + F.lit(0.5)) * scale)
    # err is a derived array referenced three times (the mse dot uses it
    # twice, max_abs_err's transform once): project it as a real column
    # first so the non-cheap transform chain is materialized once instead
    # of being inlined and re-evaluated per reference (CollapseProject
    # keeps the alias because it is non-cheap and multiply-referenced)
    staged = embeddings.select("vec_id", "label", err.alias("__err"))
    err_c = F.col("__err")
    return staged.select(
        "vec_id",
        "label",
        (dot(err_c, err_c) / F.lit(float(DIM))).alias("mse"),
        F.aggregate(
            F.transform(err_c, lambda x: F.abs(x)),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_abs_err"),
    )


def mmr_select(
    embeddings: DataFrame,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein
    SIGIR'98): greedily pick argmax lam*rel(d) - (1-lam)*max_{s∈S} sim(d,s).

    The deployment shape for "give me k RELEVANT but NON-REDUNDANT
    exemplars" (dedup-aware retrieval, eval-set curation, prompt-example
    selection). MMR is inherently sequential in k, so the distributed
    part is the candidate retrieval — relevance against the corpus
    mean-vector query scores partition-parallel and TakeOrderedAndProject
    keeps the top-`pool` — and only that pool (pool ≤ 100 rows of 64-d
    vectors, a few KB) comes to the driver for the greedy loop. At 100 TB
    the retrieval is the same brute-force/ANN surface as sim_knn/sim_ann_*
    and the greedy cost stays O(k·pool) regardless of corpus size.

    Deterministic: relevance ties break by vec_id, greedy ties by
    (score, -vec_id) with fixed float64 math. Output:
    (rank, vec_id, relevance, mmr_score)."""
    import numpy as np

    # distributed: corpus mean as the query (posexplode → 64-group avg —
    # partial-aggregated map-side; 64 rows reach the driver)
    mean_rows = (
        embeddings.select(F.posexplode("embedding").alias("i", "v"))
        .groupBy("i")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    q_vec = np.zeros(64, dtype="float64")
    for r in mean_rows:
        q_vec[r["i"]] = r["m"]
    q_lit = F.array(*[F.lit(float(x)) for x in q_vec])
    pool_df = (
        embeddings.select(
            "vec_id",
            "embedding",
            cosine(F.col("embedding"), q_lit).alias("relevance"),
        )
        .orderBy(F.col("relevance").desc(), F.col("vec_id").asc())
        .limit(pool)
    )
    rows = pool_df.collect()  # ≤ pool rows — the documented driver bound
    ids = [r["vec_id"] for r in rows]
    rel = np.array([r["relevance"] for r in rows], dtype="float64")
    mat = np.array([r["embedding"] for r in rows], dtype="float64")
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    chosen: list[int] = []
    scores: list[float] = []
    remaining = list(range(len(ids)))
    for _ in range(min(k, len(ids))):
        best_i, best_s = None, None
        for i in remaining:
            red = max((sims[i][j] for j in chosen), default=0.0)
            s = lam * rel[i] - (1.0 - lam) * red
            if best_s is None or s > best_s or (s == best_s and ids[i] < ids[best_i]):
                best_i, best_s = i, s
        chosen.append(best_i)
        scores.append(best_s)
        remaining.remove(best_i)
    spark = embeddings.sparkSession
    out = [
        (r + 1, int(ids[i]), round6(float(rel[i])), round6(float(scores[r])))
        for r, i in enumerate(chosen)
    ]
    return spark.createDataFrame(
        out, "rank INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE"
    )


def mmr_select_exact(
    embeddings: DataFrame,
    qvec: list[float],
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
) -> DataFrame:
    """`mmr_select` with every float operation pinned to a sequential
    left fold so an external SQL oracle reproduces the selection
    bit-for-bit: the query vector is a fixed literal (no corpus-mean
    aggregate whose partial-agg order is schedule-dependent), relevance
    is the JVM fold cosine, and the driver-side greedy computes pairwise
    cosines with explicit Python loops over float64 (numpy's BLAS matmul
    and 8-way-unrolled sums combine in a different order and can drift
    the last ulp across ties). Same dataflow bound as mmr_select: only
    the ≤`pool`-row retrieval result reaches the driver."""
    q_lit = F.array(*[F.lit(float(x)) for x in qvec])
    pool_df = (
        embeddings.select(
            "vec_id",
            "embedding",
            cosine(F.col("embedding"), q_lit).alias("relevance"),
        )
        .orderBy(F.col("relevance").desc(), F.col("vec_id").asc())
        .limit(pool)
    )
    rows = pool_df.collect()  # ≤ pool rows — the documented driver bound
    ids = [int(r["vec_id"]) for r in rows]
    rel = [float(r["relevance"]) for r in rows]
    vecs = [[float(x) for x in r["embedding"]] for r in rows]

    def _fold_dot(a: list[float], b: list[float]) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    import math as _math

    norms = [_math.sqrt(_fold_dot(v, v)) for v in vecs]
    n = len(ids)
    sims = [
        [
            _fold_dot(vecs[i], vecs[j]) / (norms[i] * norms[j])
            if i != j
            else 1.0
            for j in range(n)
        ]
        for i in range(n)
    ]
    chosen: list[int] = []
    scores: list[float] = []
    remaining = list(range(n))
    for _ in range(min(k, n)):
        best_i, best_s = None, None
        for i in remaining:
            red = max((sims[i][j] for j in chosen), default=0.0)
            s = lam * rel[i] - (1.0 - lam) * red
            if best_s is None or s > best_s or (s == best_s and ids[i] < ids[best_i]):
                best_i, best_s = i, s
        chosen.append(best_i)
        scores.append(best_s)
        remaining.remove(best_i)
    spark = embeddings.sparkSession
    out = [
        (r + 1, ids[i], round6(rel[i]), round6(scores[r]))
        for r, i in enumerate(chosen)
    ]
    return spark.createDataFrame(
        out, "rank INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE"
    )
