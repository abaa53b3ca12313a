"""Multimodal column surface: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches.

The reference's only binary-ish asset handling is the gzip'd PDF sink with
post-download validation (scrapping/papers_download.py:136-150). A
training-data engine needs the general shape: a `media` table whose payload
is a binary column plus a typed metadata struct, with decode / feature
extraction / resize / frame sampling as `mapInPandas` operators so the
heavy bytes never leave the JVM→Arrow→pandas batch path (no per-row Python,
no driver collect).

The decode step is a DETERMINISTIC FAKE (this container ships no
image/audio codecs): payload bytes are hashed into pixel statistics. The
Spark-side plumbing — binary columns in Arrow batches, struct metadata,
batch-shaped UDF signatures, size-aware partitioning — is real and tested.
A real codec drops into `_decode_payload` behind the same signature.

At 100 TB: media payloads dominate row size, so batch sizing is controlled
with ``spark.sql.execution.arrow.maxRecordsPerBatch`` and files should be
written with a small row-group target; metadata-only queries must prune the
payload column (scan ReadSchema excludes `payload` — asserted in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Deterministic metadata derivation (doc_id → media shape). Kept as plain
# int math so the DuckDB oracle can reproduce it exactly.
MEDIA_TYPES = ("image", "audio", "video")
FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}


def as_media(documents: DataFrame) -> DataFrame:
    """documents → media table: (media_id, payload binary, meta struct).

    Payload is the UTF-8 document text (a stand-in blob the oracle can
    rebuild with ``encode(text)``); metadata is derived from doc_id with
    pure integer math. Real ingestion would read payloads via
    ``spark.read.format('binaryFile')`` and parse headers in the decode UDF.
    """
    ordinal = (F.col("doc_id") % 3 + 1).cast("int")
    t = F.element_at(F.array(*(F.lit(m) for m in MEDIA_TYPES)), ordinal)
    meta = F.struct(
        t.alias("media_type"),
        F.element_at(
            F.array(*(F.lit(x) for x in FORMATS.values())), ordinal
        ).alias("format"),
        (64 + (F.col("doc_id") % 97) * 8).cast("int").alias("width"),
        (64 + (F.col("doc_id") % 53) * 8).cast("int").alias("height"),
        ((F.col("doc_id") % 29 + 1) * 1000).cast("int").alias("duration_ms"),
        (8 + F.col("doc_id") % 24).cast("int").alias("n_frames"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Sample every-``every``-th frame index per video — pure built-ins
    (sequence + explode), no UDF: frame selection is a plan, not Python."""
    vids = media.filter(F.col("meta.media_type") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
    return vids.select(
        "media_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode(idx).alias("frame_idx"),
    )


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("byte_hist", ArrayType(IntegerType())),
    ]
)

HIST_BINS = 16


def decode_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """Decode + feature-extract in Arrow batches (mapInPandas).

    Stand-in decode: 16-bin byte histogram + mean byte value straight off
    the payload. A real pipeline imports the codec ONCE before the batch
    loop (same pattern as model broadcast in operators/scoring.py) and
    emits pixel/spectrogram features with this exact signature. Decoder
    memory is bounded by re-chunking INSIDE the UDF — not by mutating the
    session-wide Arrow batch conf as a side effect of building the plan.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # real codec init goes here (once per task, not per row)
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):  # decoder-side re-chunk
                chunk = pdf.iloc[lo : lo + batch_size]
                out = []
                for mid, mtype, payload in zip(
                    chunk["media_id"], chunk["media_type"], chunk["payload"]
                ):
                    arr = np.frombuffer(payload, dtype=np.uint8)
                    hist = np.bincount(arr >> 4, minlength=HIST_BINS)[:HIST_BINS]
                    out.append(
                        (mid, mtype, len(arr), float(arr.mean()), hist.astype(int).tolist())
                    )
                yield pd.DataFrame(out, columns=[f.name for f in DECODE_SCHEMA.fields])

    return media.select(
        "media_id", F.col("meta.media_type").alias("media_type"), "payload"
    ).mapInPandas(decode, DECODE_SCHEMA)


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-resize → re-encode one image payload.

    Codec ladder: PNG payloads ALWAYS go through the self-contained
    stdlib-zlib codec (operators/imagecodec.py) so the output bytes — and
    therefore any sha-based differential check — are identical on every
    environment, with or without Pillow (Pillow's PNG encoder emits
    different-but-valid bytes, which made `mm_resize` results
    environment-dependent). Baseline JPEG payloads likewise decode through
    the self-contained codec (operators/jpegcodec.py) and re-encode as PNG
    (lossless output side — resizing shouldn't add a second generation
    loss); since round 6 that includes PROGRESSIVE (SOF2) JPEG — the
    codec ladder no longer has an environment-dependent branch for any
    Huffman JPEG process. Since round 9, WebP LOSSLESS (VP8L) payloads
    decode through the self-contained operators/webpcodec.py (bit-exact
    against libwebp's own decoder in tests/test_webpcodec.py).
    Remaining formats (lossy VP8, arithmetic-coded JPEG) fall back to
    Pillow when importable; otherwise NotImplementedError naming the
    missing codec. Errors are raised lazily per batch — plan
    construction never fails."""
    data = bytes(payload)
    from sdg_data_catalog_spark.operators import imagecodec

    if data[:8] == imagecodec._PNG_SIG:
        arr = imagecodec.png_decode(data)
        return imagecodec.png_encode(
            imagecodec.resize_nearest(arr, width, height)
        )
    if data[:2] == b"\xff\xd8":
        from sdg_data_catalog_spark.operators import jpegcodec

        try:
            arr = jpegcodec.jpeg_decode(data)
        except ValueError:
            arr = None  # e.g. arithmetic-coded — try Pillow below
        if arr is not None:
            return imagecodec.png_encode(
                imagecodec.resize_nearest(arr, width, height)
            )
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from sdg_data_catalog_spark.operators import webpcodec

        try:
            arr = webpcodec.webp_decode(data)
        except (NotImplementedError, ValueError):
            # lossy VP8 (DCT path) raises NotImplementedError; valid-but-
            # unsupported containers (animated ANMF nesting, VP8X-only,
            # future VP8L versions) raise ValueError — both fall back to
            # Pillow below, mirroring the JPEG ladder.
            arr = None
        if arr is not None:
            return imagecodec.png_encode(
                imagecodec.resize_nearest(arr, width, height)
            )
    try:
        import io

        from PIL import Image  # noqa: PLC0415 — probed at task runtime
    except ImportError:
        raise NotImplementedError(
            "no codec for this payload (not PNG, Pillow unavailable); "
            "plug PIL/ffmpeg here"
        ) from None
    try:
        img = Image.open(io.BytesIO(data))
        buf = io.BytesIO()
        img.resize((width, height), Image.NEAREST).save(buf, format="PNG")
        return buf.getvalue()
    except Exception as exc:
        raise NotImplementedError(f"no codec for this payload: {exc}") from exc


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize over Arrow batches (mapInPandas): each payload is
    decoded, nearest-neighbor-resized to (width, height), and re-encoded as
    PNG; the metadata width/height are rewritten to match. Codec selection
    happens inside the task (see _resize_payload) so the same plan runs
    wherever the cluster image ships Pillow and still works codec-free on
    PNG payloads."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", media.schema["payload"].dataType),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        _resize_payload(p, width, height) for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.select(
        "media_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).mapInPandas(resize, schema)


# Backwards-compatible name: the round-1/2 stub is now the real operator.
resize_stub = resize_media


def as_png_media(
    documents: DataFrame, side: int = 24, key_mod: int | None = None
) -> DataFrame:
    """documents → media table whose payloads are REAL (tiny) PNGs, built
    deterministically from doc_id with the self-contained codec: an RGB
    gradient whose phase is doc_id-dependent. Exercises the full
    decode→transform→encode path end-to-end without any external codec or
    fixture files. Payload bytes are deterministic (fixed zlib level), so
    differential tests can recompute them locally.

    key_mod: render from doc_id % key_mod instead of doc_id — gives a
    corpus with repeated images (each distinct pattern appears
    ~rows/key_mod times) for the near-dup operators, while media_id stays
    the unique doc_id."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from sdg_data_catalog_spark.operators.imagecodec import png_encode

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                key = int(did) % key_mod if key_mod else int(did)
                payloads.append(png_encode(synthetic_image(key, side)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("png").alias("format"),
        F.lit(side).cast("int").alias("width"),
        F.lit(side).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
        F.lit(1).cast("int").alias("n_frames"),
    )
    return (
        documents.select("doc_id")
        .mapInPandas(render, out_schema)
        .withColumn("meta", meta)
    )


def as_jpeg_media(
    documents: DataFrame, side: int = 24, quality: int = 90,
    key_mod: int | None = None,
) -> DataFrame:
    """documents → media table whose payloads are REAL baseline JPEGs,
    built deterministically from doc_id with the self-contained codec
    (operators/jpegcodec.py). Subsampling alternates 4:4:4 / 4:2:0 by
    image-key parity so both decoder MCU shapes are exercised in the
    registered query, not just in unit tests. Payload bytes are
    deterministic, so differential tests recompute them exactly.

    key_mod: render from doc_id % key_mod instead of doc_id (same contract
    as as_png_media) — bounds the distinct-payload universe so oracle
    queries can join a finite constant table of expected outputs."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_data_catalog_spark.operators.jpegcodec import jpeg_encode

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                key = int(did) % key_mod if key_mod else int(did)
                sub = "420" if key % 2 else "444"
                payloads.append(
                    jpeg_encode(synthetic_image(key, side), quality, sub)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("jpeg").alias("format"),
        F.lit(side).cast("int").alias("width"),
        F.lit(side).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
        F.lit(1).cast("int").alias("n_frames"),
    )
    return (
        documents.select("doc_id")
        .mapInPandas(render, out_schema)
        .withColumn("meta", meta)
    )


def synthetic_image(doc_id: int, side: int = 24):
    """The deterministic RGB test pattern for doc_id (shared by the Spark
    path and the differential pytest twin)."""
    import numpy as np

    y, x = np.mgrid[0:side, 0:side]
    r = (x * 255 // max(side - 1, 1) + doc_id * 37) % 256
    g = (y * 255 // max(side - 1, 1) + doc_id * 11) % 256
    b = ((x + y) * 255 // max(2 * side - 2, 1) + doc_id * 53) % 256
    return np.stack([r, g, b], axis=2).astype("uint8")


def synthetic_samples(doc_id: int):
    """The deterministic int16 PCM test signal for doc_id (shared by the
    Spark path, the DuckDB oracle's closed form, and the pytest twin):
    n = 64 + doc_id % 64 samples, sample_i = ((doc_id*7 + i*13) % 251) - 125.
    Pure integer math, so every downstream stat (sum of squares, peak) is
    EXACT on both engines."""
    import numpy as np

    n = 64 + doc_id % 64
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 7 + i * 13) % 251 - 125).astype(np.int16)


def as_wav_media(documents: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """documents → media table whose payloads are REAL RIFF/WAVE PCM16
    bytes (operators/audiocodec.py), built deterministically from doc_id.
    The audio analog of as_png_media: exercises binary container build +
    parse end-to-end with zero external codecs."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_data_catalog_spark.operators.audiocodec import wav_encode

        for pdf in batches:
            payloads = [
                wav_encode(synthetic_samples(int(did)), sample_rate)
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )
    return documents.select("doc_id").mapInPandas(render, out_schema)


def wav_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media(media_id, payload) → exact integer PCM stats via real WAV
    parsing in Arrow batches: (media_id, sample_rate, n_samples, sum_sq,
    peak_abs). All four stats are exact integers — no float leaves the
    worker, so a closed-form oracle can reproduce them bit-for-bit."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from sdg_data_catalog_spark.operators.audiocodec import wav_decode

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sample_rate", "n_samples", "sum_sq", "peak_abs")}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                samples, rate = wav_decode(bytes(payload))
                s = samples.astype(np.int64)
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s))
                rows["sum_sq"].append(int((s * s).sum()))
                rows["peak_abs"].append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(rows)

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", IntegerType()),
            StructField("sum_sq", LongType()),
            StructField("peak_abs", IntegerType()),
        ]
    )
    return media.select("media_id", payload_col).mapInPandas(stats, schema)


def wav_vad(
    media: DataFrame,
    window: int = 32,
    threshold: int = 160_000,
    payload_col: str = "payload",
) -> DataFrame:
    """media(media_id, payload) → energy voice-activity census per clip:
    decode the WAV payload, split into `window`-sample frames (last frame
    may be partial), flag a frame active when its exact integer energy
    Σs² ≥ threshold, and report (n_windows, n_active, max_run,
    n_segments) where runs are maximal streaks of consecutive active
    frames. All outputs are exact small integers, so a closed-form SQL
    oracle can replay the windowing and gaps-and-islands arithmetic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from sdg_data_catalog_spark.operators.audiocodec import wav_decode

        for pdf in batches:
            rows = {
                k: []
                for k in ("media_id", "n_windows", "n_active", "max_run", "n_segments")
            }
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                samples, _rate = wav_decode(bytes(payload))
                s = samples.astype(np.int64)
                n_windows = (len(s) + window - 1) // window
                active = []
                for w in range(n_windows):
                    chunk = s[w * window : (w + 1) * window]
                    active.append(int((chunk * chunk).sum()) >= threshold)
                max_run = n_segments = cur = 0
                for a in active:
                    if a:
                        cur += 1
                        if cur == 1:
                            n_segments += 1
                        max_run = max(max_run, cur)
                    else:
                        cur = 0
                rows["media_id"].append(mid)
                rows["n_windows"].append(n_windows)
                rows["n_active"].append(sum(active))
                rows["max_run"].append(max_run)
                rows["n_segments"].append(n_segments)
            yield pd.DataFrame(rows)

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_windows", IntegerType()),
            StructField("n_active", IntegerType()),
            StructField("max_run", IntegerType()),
            StructField("n_segments", IntegerType()),
        ]
    )
    return media.select("media_id", payload_col).mapInPandas(run, schema)


def wav_downsample(media: DataFrame, factor: int = 2, payload_col: str = "payload") -> DataFrame:
    """media(media_id, payload) → media with every payload decoded,
    decimated by `factor` (keep samples 0, factor, 2·factor, …), and
    re-encoded at rate/factor — the transform-and-reencode audio rung
    (the image analog is resize_media). Real bytes in, real bytes out,
    inside Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_data_catalog_spark.operators.audiocodec import (
            wav_decode,
            wav_encode,
        )

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                samples, rate = wav_decode(bytes(payload))
                out.append((mid, wav_encode(samples[::factor], rate // factor)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )
    return media.select("media_id", payload_col).mapInPandas(run, schema)
