"""Round-10 operator batch 15: count overdispersion, backfill planning,
audio silence trimming, and permissive malformed-CSV scanning.

- ``agg_negbin_overdispersion`` — is the daily event-count series more
  variable than Poisson allows? Per event type: exact integer moments
  of the daily census, the variance/mean dispersion ratio as a
  FLOOR(10⁶·) image, and the index-of-dispersion test D = (n−1)·s²/m̄
  against its ~2σ chi-square bound — decided entirely on integer
  images. The time-series twin of text_burstiness, and the check that
  says 'use a negative-binomial model, not Poisson'.
- ``plan_backfill_batches`` — turn the missing-day census into a
  backfill PLAN: per event type, maximal runs of absent days (gaps-and-
  islands over the expected day range) split into ≤7-day jobs — the
  batch list an orchestrator actually schedules. Run math is exact
  integer arithmetic; per-run job explosion is bounded by run length.
- ``mm_wav_silence_trim`` — trim leading/trailing low-energy windows
  (the VAD threshold) and RE-ENCODE through the real RIFF/WAVE codec:
  decode → window energies → first/last active window → slice → encode
  → re-parse, all in one Arrow pass; reported sample counts are exact
  integers the closed-form oracle replays bit-for-bit. The transform
  rung beside mm_wav_downsample.
- ``scan_csv_permissive`` — the malformed-input contract: a CSV with
  deterministically corrupted rows (every doc_id % 7 == 3 carries a
  non-numeric field) is written and read back under PERMISSIVE mode
  with a corrupt-record column; the op reports good/corrupt counts and
  the checksum of the surviving rows — schema-on-read resilience, hash-
  checked.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000
_VAD_WINDOW = 32
_VAD_THRESH = 160_000
_BATCH_DAYS = 7


@register(
    "agg_negbin_overdispersion",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               epoch_us(ts) // {_DAY_US} AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY event_type, day
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(y) AS HUGEINT) AS s1,
               CAST(SUM(y * y) AS HUGEINT) AS s2
        FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(FLOOR(1e6 * (CAST(n * s2 - s1 * s1 AS DOUBLE)
                             / (CAST(n AS DOUBLE) * (n - 1)))
                      / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                AS BIGINT) AS dispersion_x1e6,
           CAST(FLOOR(1e6 * (CAST(n * s2 - s1 * s1 AS DOUBLE)
                             / (CAST(n AS DOUBLE) * (n - 1)))
                      / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(n AS DOUBLE) - 1)) AS BIGINT)
             > CAST(FLOOR(1e6 * ((CAST(n AS DOUBLE) - 1)
                      + 2 * sqrt(2 * (CAST(n AS DOUBLE) - 1)))) AS BIGINT)
             AS overdispersed
    FROM m ORDER BY event_type
    """,
)
def agg_negbin_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion test per event type on the daily count
    series: sample variance over mean (Poisson ⇒ ≈1) as a FLOOR(10⁶·)
    image, and D = (n−1)·s²/m̄ compared against (n−1) + 2√(2(n−1)) —
    both sides imaged, so the verdict is an integer comparison. Exact
    decimal moments from one grouped pass over the bounded daily
    census; overdispersion ⇒ negative-binomial (not Poisson) modeling
    downstream."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr(
            f"CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US} AS BIGINT)"
        ).alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    d38 = "decimal(38,0)"
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("y").cast(d38).alias("s1"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("s2"),
    )
    disp = (
        "(CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))"
        " / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.expr(f"CAST(FLOOR(1e6 * {disp}) AS BIGINT)").alias(
            "dispersion_x1e6"
        ),
        (
            F.expr(
                f"CAST(FLOOR(1e6 * {disp} * (CAST(n AS DOUBLE) - 1)) AS BIGINT)"
            )
            > F.expr(
                "CAST(FLOOR(1e6 * ((CAST(n AS DOUBLE) - 1)"
                " + 2 * sqrt(2 * (CAST(n AS DOUBLE) - 1)))) AS BIGINT)"
            )
        ).alias("overdispersed"),
    ).orderBy("event_type")


@register(
    "plan_backfill_batches",
    oracle=f"""
    WITH bounds AS (
        SELECT event_type,
               MIN(epoch_us(ts) // {_DAY_US}) AS d0,
               MAX(epoch_us(ts) // {_DAY_US}) AS d1
        FROM events GROUP BY event_type
    ),
    observed AS (
        SELECT DISTINCT event_type, epoch_us(ts) // {_DAY_US} AS day
        FROM events
    ),
    expected AS (
        SELECT b.event_type, unnest(generate_series(b.d0, b.d1)) AS day
        FROM bounds b
    ),
    missing AS (
        SELECT e.event_type, e.day
        FROM expected e LEFT JOIN observed o
          ON o.event_type = e.event_type AND o.day = e.day
        WHERE o.day IS NULL
    ),
    runs AS (
        SELECT event_type, grp,
               MIN(day) AS run_start, MAX(day) AS run_end,
               COUNT(*) AS run_len
        FROM (
            SELECT event_type, day,
                   day - ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY day) AS grp
            FROM missing
        ) GROUP BY event_type, grp
    ),
    jobs AS (
        SELECT event_type,
               run_start + (unnest(generate_series(
                   0, (run_len - 1) // {_BATCH_DAYS})) * {_BATCH_DAYS})
                 AS batch_start,
               run_end
        FROM runs
    )
    SELECT event_type,
           CAST(batch_start AS BIGINT) AS batch_start_day,
           CAST(LEAST(batch_start + {_BATCH_DAYS - 1}, run_end) AS BIGINT)
             AS batch_end_day,
           CAST(LEAST(batch_start + {_BATCH_DAYS - 1}, run_end)
                - batch_start + 1 AS BIGINT) AS n_days
    FROM jobs
    ORDER BY event_type, batch_start_day
    """,
)
def plan_backfill_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner: per event type, the missing days inside that
    type's observed [min, max] day range (expected-series anti-join),
    grouped into maximal runs (gaps-and-islands) and split into ≤7-day
    jobs — the concrete batch list an orchestrator schedules. The
    corpus-sized work is one grouped day census; expected-day explosion
    and every window run on the bounded daily/type tables."""
    ev = table(spark, sf_dir, "events")
    day = F.expr(
        f"CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US} AS BIGINT)"
    )
    observed = (
        ev.select("event_type", day.alias("day"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bounds = observed.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    expected = bounds.select(
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    missing = expected.join(observed, ["event_type", "day"], "left_anti")
    w = Window.partitionBy("event_type").orderBy("day")
    runs = (
        missing.withColumn("grp", F.col("day") - F.row_number().over(w))
        .groupBy("event_type", "grp")
        .agg(
            F.min("day").alias("run_start"),
            F.max("day").alias("run_end"),
            F.count(F.lit(1)).alias("run_len"),
        )
    )
    jobs = runs.select(
        "event_type",
        "run_end",
        F.explode(
            F.expr(
                f"transform(sequence(0, (run_len - 1) DIV {_BATCH_DAYS}),"
                f" i -> run_start + i * {_BATCH_DAYS})"
            )
        ).alias("batch_start"),
    )
    return jobs.select(
        "event_type",
        F.col("batch_start").cast("bigint").alias("batch_start_day"),
        F.least(F.col("batch_start") + (_BATCH_DAYS - 1), F.col("run_end"))
        .cast("bigint")
        .alias("batch_end_day"),
        (
            F.least(F.col("batch_start") + (_BATCH_DAYS - 1), F.col("run_end"))
            - F.col("batch_start")
            + 1
        )
        .cast("bigint")
        .alias("n_days"),
    ).orderBy("event_type", "batch_start_day")


@register(
    "mm_wav_silence_trim",
    oracle=f"""
    WITH samp AS (
        SELECT doc_id,
               i // {_VAD_WINDOW} AS w,
               (doc_id * 7 + i * 13) % 251 - 125 AS s
        FROM (
          SELECT doc_id,
                 unnest(generate_series(0, 64 + doc_id % 64 - 1)) AS i
          FROM documents
        )
    ),
    win AS (
        SELECT doc_id, w, SUM(s * s) >= {_VAD_THRESH} AS active,
               COUNT(*) AS wlen
        FROM samp GROUP BY doc_id, w
    ),
    span AS (
        SELECT doc_id,
               MIN(CASE WHEN active THEN w END) AS w_first,
               MAX(CASE WHEN active THEN w END) AS w_last,
               CAST(SUM(wlen) AS INTEGER) AS orig_samples,
               CAST(MAX(w) + 1 AS INTEGER) AS n_windows
        FROM win GROUP BY doc_id
    )
    SELECT span.doc_id AS media_id,
           CAST(ANY_VALUE(span.orig_samples) AS INTEGER) AS orig_samples,
           CAST(SUM(CASE WHEN span.w_first IS NOT NULL
                          AND win.w BETWEEN span.w_first AND span.w_last
                     THEN win.wlen ELSE 0 END) AS INTEGER)
             AS trimmed_samples,
           CAST(ANY_VALUE(COALESCE(span.w_first, span.n_windows))
                AS INTEGER) AS n_lead_windows,
           CAST(ANY_VALUE(CASE WHEN span.w_first IS NULL THEN 0
                     ELSE span.n_windows - 1 - span.w_last END) AS INTEGER)
             AS n_trail_windows
    FROM span JOIN win ON win.doc_id = span.doc_id
    GROUP BY span.doc_id ORDER BY media_id
    """,
)
def mm_wav_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence trimming through the REAL audio path: decode each WAV
    payload, flag 32-sample windows below the VAD energy threshold,
    drop leading/trailing inactive windows, RE-ENCODE the trimmed PCM
    and re-parse it — the decode→transform→encode→verify loop inside
    one Arrow pass, with exact integer sample counts the closed-form
    oracle replays (an all-silent clip trims to zero samples and the
    codec round-trips that too). Only 4 ints per clip leave the
    workers."""
    import pandas as pd

    from sdg_data_catalog_spark.operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").select("doc_id")
    media = MM.as_wav_media(docs)

    def trim(batches):
        import numpy as np

        from sdg_data_catalog_spark.operators.audiocodec import (
            wav_decode,
            wav_encode,
        )

        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "media_id",
                    "orig_samples",
                    "trimmed_samples",
                    "n_lead_windows",
                    "n_trail_windows",
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = wav_decode(bytes(payload))
                s = samples.astype(np.int64)
                n_windows = (len(s) + _VAD_WINDOW - 1) // _VAD_WINDOW
                active = [
                    int(
                        (
                            s[w * _VAD_WINDOW : (w + 1) * _VAD_WINDOW] ** 2
                        ).sum()
                    )
                    >= _VAD_THRESH
                    for w in range(n_windows)
                ]
                if any(active):
                    w_first = active.index(True)
                    w_last = n_windows - 1 - active[::-1].index(True)
                    sliced = samples[
                        w_first * _VAD_WINDOW : min(
                            (w_last + 1) * _VAD_WINDOW, len(samples)
                        )
                    ]
                    lead, trail = w_first, n_windows - 1 - w_last
                else:
                    sliced = samples[:0]
                    lead, trail = n_windows, 0
                back, _ = wav_decode(wav_encode(sliced, rate))
                rows["media_id"].append(mid)
                rows["orig_samples"].append(len(s))
                rows["trimmed_samples"].append(len(back))
                rows["n_lead_windows"].append(lead)
                rows["n_trail_windows"].append(trail)
            yield pd.DataFrame(rows)

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("orig_samples", IntegerType()),
            StructField("trimmed_samples", IntegerType()),
            StructField("n_lead_windows", IntegerType()),
            StructField("n_trail_windows", IntegerType()),
        ]
    )
    return (
        media.select("media_id", "payload")
        .mapInPandas(trim, schema)
        .orderBy("media_id")
    )


@register(
    "scan_csv_permissive",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CASE WHEN doc_id % 7 <> 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_good,
           CAST(SUM(CASE WHEN doc_id % 7 <> 3 THEN n_chars ELSE 0 END)
                AS BIGINT) AS sum_good_chars
    FROM documents
    """,
)
def scan_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read resilience: a CSV where every doc_id % 7 == 3 row
    carries a non-numeric second field is WRITTEN to scratch and read
    back under PERMISSIVE mode with a _corrupt_record column — the
    malformed rows must surface as corrupt (not crash the scan, not
    silently drop), everything else must parse. The op reports the
    good/corrupt census and the checksum of surviving n_chars, all
    pinned by the oracle's closed-form corruption rule. This is the
    contract real ingest depends on when upstream files rot."""
    from sdg_data_catalog_spark.sources.formats import io_dir

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    path = io_dir(sf_dir, "docs_csv_malformed")
    line = F.concat_ws(
        ",",
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 7 == 3, F.lit("not_a_number")).otherwise(
            F.col("n_chars").cast("string")
        ),
    )
    docs.select(line.alias("value")).write.text(path)
    back = (
        spark.read.schema("doc_id BIGINT, n_chars BIGINT, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.col("_corrupt_record").isNull().cast("bigint"))
        .cast("bigint")
        .alias("n_good"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("n_chars")).otherwise(0)
        )
        .cast("bigint")
        .alias("sum_good_chars"),
    )
