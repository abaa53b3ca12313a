"""Quantized per-label integer embedding moments — the shared Arrow
kernel behind emb_diversity_by_label and emb_centroid_drift.

Both ops reduce an N×DIM embedding table to per-label EXACT integer
moments of the fixed-point image q_d = ROUND(x_d · Q): diversity needs
(n, Σq_d per dim, Σ‖q‖²), drift needs the same split by an md5 half.
The r14 expression form (64 unrolled element_at+round columns into a
65/130-state hash aggregate) is value-identical but pays a per-query
codegen-compile constant that dominates at sf0.1 (emb_diversity_by_label
0.71 → 1.95 s, the one disclosed r14 regression) and a wide row through
the aggregate at scale. Here ONE mapInPandas pass quantizes the batch in
numpy and PARTIALLY AGGREGATES it per (label[, half]) before anything
crosses the Python→JVM boundary (guide §2.3 "aggregate before you
shuffle" + §4.2): the kernel emits ≤ |labels|·(batches) tiny rows of
int64 partial sums, and the final Spark groupBy sums those. Every sum is
integer arithmetic — associative, order-free — so the only equivalence
that needs an argument is the per-element quantization itself:

ROUND(double) in Spark (BigDecimal.valueOf → setScale(0, HALF_UP)) and
DuckDB (round-half-away-from-zero) both round the double VALUE half away
from zero. The kernel reproduces that as sign(v) · (floor(|v|) + (frac ≥
0.5)), where frac = |v| − floor(|v|) is EXACT in float64 for |v| < 2^52
(the subtraction is representable), so the ≥ 0.5 comparison decides ties
on the true double value — bit-identical to both engines, with no
floor(v+0.5) boundary artifact (v+0.5 can round UP to the boundary for
v one ulp below it). Pinned in tests/test_r15_moments_kernel.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def _round_half_away(v):
    """Vectorized ROUND-half-away-from-zero of a float64 array → int64,
    matching Spark F.round(double) / DuckDB ROUND (see module doc)."""
    import numpy as np

    a = np.abs(v)
    f = np.floor(a)
    r = np.where((a - f) >= 0.5, f + 1.0, f)
    return (np.sign(v) * r).astype(np.int64)


def label_moment_partials(
    emb: DataFrame, q: int, dim: int, with_half: bool = False
) -> DataFrame:
    """Per-(label[, half]) PARTIAL integer moments of the quantized
    embeddings, one row per group per Arrow batch:

        (label[, half], n, s0..s{dim-1}, ssq)

    n = row count, s_d = Σ q_d (int64), ssq = Σ Σ_d q_d² (int64 — q ≤
    Q·max|x| so the in-row square sum is far below 2^63). with_half adds
    the md5(vec_id)-derived half bit (first 8 hex chars as int, mod 2 —
    the exact image of Spark's conv(substring(md5(...),1,8),16,10) % 2
    and DuckDB's ('0x' || substr(md5(...),1,8))::BIGINT % 2).

    Callers MUST finish with groupBy(label).sum(...) — integer sums are
    associative, so the partial split is exact by construction."""
    import numpy as np
    import pandas as pd

    cols = ["vec_id", "label", "embedding"] if with_half else ["label", "embedding"]

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            qm = _round_half_away(mat * float(q))
            labs = pdf["label"].to_numpy(dtype=np.int64)
            if with_half:
                halves = np.fromiter(
                    (
                        int(hashlib.md5(str(int(v)).encode()).hexdigest()[:8], 16) % 2
                        for v in pdf["vec_id"]
                    ),
                    dtype=np.int64,
                    count=len(pdf),
                )
                keys = labs * 2 + halves
            else:
                keys = labs
            uniq, inv = np.unique(keys, return_inverse=True)
            order = np.argsort(inv, kind="stable")
            bounds = np.searchsorted(inv[order], np.arange(len(uniq)))
            s = np.add.reduceat(qm[order], bounds, axis=0)  # (g, dim) int64
            rsq = (qm * qm).sum(axis=1)  # int64, exact
            ssq = np.add.reduceat(rsq[order], bounds)
            n = np.bincount(inv)
            out = {}
            if with_half:
                out["label"] = uniq // 2
                out["half"] = (uniq % 2).astype(np.int32)
            else:
                out["label"] = uniq
            out["n"] = n.astype(np.int64)
            for d in range(dim):
                out[f"s{d}"] = s[:, d]
            out["ssq"] = ssq
            yield pd.DataFrame(out)

    schema = "label long, "
    if with_half:
        schema += "half int, "
    schema += "n long, " + ", ".join(f"s{d} long" for d in range(dim)) + ", ssq long"
    return emb.select(*cols).mapInPandas(partials, schema)
