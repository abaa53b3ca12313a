"""Perceptual image hashing (dHash) + banded hamming near-dup join.

The image-side analog of the text dedup ladder (operators/dedup.py):
`dedup_simhash_pairs` finds near-dup *text* by pigeonholed hamming joins
over simhash bits; re-posted/re-encoded *images* need the same shape over
a perceptual hash. dHash (difference hash) is the standard cheap one:
grayscale → 9×8 block-mean downsample → one bit per horizontal neighbor
pair (left > right) → 64 bits. Identical images hash identically; small
edits (re-encode, brightness, slight crop) flip few bits.

Scale design (the 100 TB story):
- hashing is map-side mapInPandas over Arrow batches — decode stays in
  the worker, only 8 bytes per image leave it;
- candidate generation is the pigeonhole band join: 64 bits → 4 bands of
  16; any pair within hamming ≤ 3 shares at least one exact band
  (4 bands, 3 flipped bits can corrupt at most 3), so candidates come
  from an EQUI-join on (band_idx, band_value) — never an all-pairs scan;
- verification is `bit_count(h1 XOR h2)` — JVM-side popcount.

Decode uses the self-contained PNG codec (operators/imagecodec.py), the
pinned deterministic path (ADVICE r3: payload bytes must not depend on
the environment).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

N_BANDS = 4
BAND_BITS = 16
MAX_HAMMING = N_BANDS - 1  # pigeonhole guarantee for the band join


def dhash64(gray_9x8) -> int:
    """64-bit dHash from a 9x8 grayscale array (row-major, bit 63 first)."""
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if gray_9x8[y][x] > gray_9x8[y][x + 1] else 0)
    return bits


def dhash_image(rgb) -> int:
    """dHash of an HxWx3 uint8 array: luma → 9x8 block mean → dhash64."""
    import numpy as np

    arr = rgb.astype("float64")
    gray = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    h, w = gray.shape
    # block-mean resample to 9 cols x 8 rows (edges get the remainder)
    ys = [round(i * h / 8) for i in range(9)]
    xs = [round(i * w / 9) for i in range(10)]
    cells = [
        [
            float(gray[ys[y] : max(ys[y + 1], ys[y] + 1),
                       xs[x] : max(xs[x + 1], xs[x] + 1)].mean())
            for x in range(9)
        ]
        for y in range(8)
    ]
    return dhash64(cells)


def phash_media(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media(media_id, payload) → (media_id, phash) via Arrow batches.

    phash is surfaced as a signed BIGINT (two's complement of the 64-bit
    hash) so all downstream band/XOR math stays in JVM integer codegen."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_data_catalog_spark.operators.imagecodec import png_decode

        for pdf in batches:
            hashes = []
            for payload in pdf[payload_col]:
                h = dhash_image(png_decode(bytes(payload)))
                hashes.append(h - (1 << 64) if h >= 1 << 63 else h)  # to signed
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": hashes})

    schema = StructType(
        [StructField("media_id", LongType()), StructField("phash", LongType())]
    )
    return media.select("media_id", payload_col).mapInPandas(hash_batch, schema)


def neardup_pairs(hashed: DataFrame, max_hamming: int = MAX_HAMMING) -> DataFrame:
    """(media_id, phash) → candidate pairs within `max_hamming` bits.

    Explode each hash into its 4 16-bit bands, equi-join on
    (band_idx, band_value), dedup the (a, b) candidate set, verify with
    popcount(XOR). max_hamming must stay < N_BANDS for the pigeonhole
    guarantee (asserted)."""
    assert max_hamming < N_BANDS, "pigeonhole bound: need max_hamming < bands"
    bands = hashed.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("phash"), i * BAND_BITS)
                        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", "b.band_idx", "b.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id1"),
            F.col("b.media_id").alias("id2"),
            F.col("a.phash").alias("h1"),
            F.col("b.phash").alias("h2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cand.select("id1", "id2", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
