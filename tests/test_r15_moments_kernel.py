"""r15 moments kernel (operators/moments.py): the numpy half-away
quantization must be BIT-identical to Spark F.round(double)·cast(bigint)
(and DuckDB ROUND) — including exact .5 ties, negatives, and values one
ulp below a tie — and the per-batch partial integer sums must reproduce
a pure-Python exact reference (integer sums are associative, so equality
is exact, not approx).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from sdg_data_catalog_spark.operators.moments import (
    _round_half_away,
    label_moment_partials,
)

_DIM = 8
_Q = 1000

# adversarial pre-quantization values: exact .5 ties both signs, one-ulp
# neighbors of a tie, zero/negative zero, plus generic irrationals
_EDGE = [
    0.0025,  # ·1000 = 2.5 exactly (0.0025 is inexact but 2.5-ish: check real product)
    -0.0025,
    0.0015,
    -0.0015,
    0.5 / _Q,
    -0.5 / _Q,
    math.nextafter(0.5, 0.0) / _Q,
    math.nextafter(0.5, 1.0) / _Q,
    0.0,
    -0.0,
    1.0 / 3.0,
    -2.0 / 7.0,
    0.9999995,
    -0.9999995,
]


def test_round_half_away_matches_spark_round(spark):
    v = np.asarray(_EDGE, dtype=np.float64) * float(_Q)
    got = _round_half_away(v)
    rows = spark.createDataFrame(
        [(float(x),) for x in _EDGE], "x double"
    ).select(
        (F.round(F.col("x").cast("double") * _Q)).cast("bigint").alias("q")
    ).collect()
    expect = [r["q"] for r in rows]
    assert got.tolist() == expect


def _mk_emb(spark, n: int):
    rows = []
    for i in range(n):
        xs = [
            ((i * 31 + d * 17) % 2000) / 999.5 - 1.0 if (i + d) % 5 else 0.0025
            for d in range(_DIM)
        ]
        rows.append((i, i % 3, xs))
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )


def _py_quant(x: float) -> int:
    v = x * float(_Q)
    a = abs(v)
    f = math.floor(a)
    r = f + 1 if (a - f) >= 0.5 else f
    return int(math.copysign(r, v)) if v != 0 else 0


def test_partials_sum_to_exact_reference(spark):
    n = 47
    emb = _mk_emb(spark, n).repartition(5)  # multi-batch partials
    parts = label_moment_partials(emb, _Q, _DIM)
    agg = parts.groupBy("label").agg(
        F.sum("n").alias("n"),
        *[F.sum(f"s{d}").alias(f"s{d}") for d in range(_DIM)],
        F.sum("ssq").alias("ssq"),
    )
    got = {r["label"]: r.asDict() for r in agg.collect()}
    ref: dict[int, dict] = {}
    for r in _mk_emb(spark, n).collect():
        q = [_py_quant(x) for x in r.embedding]
        e = ref.setdefault(
            r.label, {"n": 0, "ssq": 0, **{f"s{d}": 0 for d in range(_DIM)}}
        )
        e["n"] += 1
        e["ssq"] += sum(v * v for v in q)
        for d in range(_DIM):
            e[f"s{d}"] += q[d]
    for lab, e in ref.items():
        for k, v in e.items():
            assert got[lab][k] == v, (lab, k)


def test_partials_half_split_matches_md5(spark):
    n = 31
    emb = _mk_emb(spark, n).repartition(3)
    parts = label_moment_partials(emb, _Q, _DIM, with_half=True)
    agg = parts.groupBy("label", "half").agg(F.sum("n").alias("n")).collect()
    got = {(r["label"], r["half"]): r["n"] for r in agg}
    ref: dict[tuple, int] = {}
    for i in range(n):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2
        ref[(i % 3, h)] = ref.get((i % 3, h), 0) + 1
    assert got == ref
    # the Spark expression both engines pin computes the same half bit
    sp = (
        spark.range(n)
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 2
            ).alias("h")
        )
        .collect()
    )
    for i, r in enumerate(sp):
        assert r["h"] == int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2
