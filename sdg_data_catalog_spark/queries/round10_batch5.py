"""Round-10 operator batch 5: binary-classifier MCC, pairwise ROUGE,
LSH band-configuration sweep, and audio voice-activity windows.

- ``agg_mcc`` — Matthews correlation coefficient for the deterministic
  threshold classifier (the single-number binary metric robust to class
  imbalance, unlike accuracy/F1): TP/TN/FP/FN are exact integer counts
  from one conditional aggregate; only the final normalized quotient is
  a double, rounded.
- ``eval_rouge_pairs`` — ROUGE-1/ROUGE-2 recall and F1 between adjacent
  documents (candidate d vs reference d+1; the summarization-eval twin
  of ``eval_bleu_pairs``). Clipped gram matches are per-gram MINs of two
  exact counts, and the F1 image is computed in PURE integer arithmetic
  ((2'000'000·m) DIV (ct+rt)) — no float anywhere in the checked path.
- ``dedup_lsh_band_sweep`` — the LSH tuning sweep a dedup pipeline runs
  before committing to a banding: for each (bands b, rows r) split of
  the 16-hash minhash signature (16×1, 8×2, 4×4), the number of
  non-singleton buckets, the candidate-pair mass Σ C(n,2), and the
  largest bucket. Candidate counts come from bucket OCCUPANCY aggregates
  — pairs are never materialized, so the sweep's cost is one signature
  pass plus one groupBy per config regardless of how hot the buckets
  are. The S-curve threshold (1/b)^(1/r) is a config CONSTANT emitted as
  the same literal on both engines (never computed with pow() at query
  time, which could differ by an ulp across engines).
- ``mm_audio_vad`` — energy voice-activity detection over the REAL
  RIFF/WAVE path: payloads are decoded (operators/audiocodec.py), split
  into 32-sample windows, a window is active when its exact integer
  energy Σs² ≥ the threshold; per clip the op reports window/active
  counts, the longest active run, and the number of active segments.
  The oracle replays the closed-form PCM formula and the gaps-and-
  islands run arithmetic in SQL — the codec round-trip, the windowing,
  and the run-length logic are all inside the checked path.

Reference analog: none direct — SURVEY §2.11 north-star surface (the
reference pipeline has no eval/LSH-tuning/audio stage to port).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.functions.hashing import MINHASH_K
from sdg_data_catalog_spark.queries.registry import register

_VAD_WINDOW = 32
_VAD_THRESH = 160_000  # Σs² per 32-sample window; E[s²]≈5.2k ⇒ ~166k/window

# (bands, rows) splits of the 16-hash signature swept by the band tuner;
# threshold image FLOOR(1e6·(1/b)^(1/r)) precomputed HERE so both engines
# emit the identical literal (pow() at query time can ulp-differ).
_LSH_CONFIGS = tuple(
    (b, MINHASH_K // b, int(1e6 * (1.0 / b) ** (b / MINHASH_K)))
    for b in (16, 8, 4)
)


@register(
    "agg_mcc",
    oracle="""
    WITH cm AS (
        SELECT
          CAST(SUM(CASE WHEN value > 250 AND event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN value > 250 AND event_type <> 'click' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN value <= 250 AND event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          CAST(SUM(CASE WHEN value <= 250 AND event_type <> 'click' THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM events
    )
    SELECT tp, fp, fn, tn,
           ROUND(CAST(tp * tn - fp * fn AS DOUBLE)
                 / sqrt(CAST((tp + fp) AS DOUBLE) * (tp + fn)
                        * (tn + fp) * (tn + fn)), 6) AS mcc
    FROM cm
    """,
)
def agg_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the agg_accuracy threshold rule
    (pred = value>250, actual = event_type='click'). The numerator
    tp·tn−fp·fn and every marginal are exact int64 (counts ≤ corpus rows,
    products ≤ n² < 2^63 at any tested SF); one double division at the
    end, rounded to 6 places on both engines. One corpus pass, map-side
    partials, 1-row output."""
    ev = table(spark, sf_dir, "events")
    pred = F.col("value") > 250
    act = F.col("event_type") == "click"
    cm = ev.agg(
        F.sum((pred & act).cast("bigint")).alias("tp"),
        F.sum((pred & ~act).cast("bigint")).alias("fp"),
        F.sum((~pred & act).cast("bigint")).alias("fn"),
        F.sum((~pred & ~act).cast("bigint")).alias("tn"),
    )
    mcc = F.round(
        (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")).cast("double")
        / F.sqrt(
            (F.col("tp") + F.col("fp")).cast("double")
            * (F.col("tp") + F.col("fn"))
            * (F.col("tn") + F.col("fp"))
            * (F.col("tn") + F.col("fn"))
        ),
        6,
    )
    return cm.select("tp", "fp", "fn", "tn", mcc.alias("mcc"))


@register(
    "eval_rouge_pairs",
    oracle="""
    WITH pairs AS (
        SELECT c.doc_id, c.text AS cand, r.text AS ref
        FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
        WHERE c.doc_id % 10 = 5
    ),
    grams AS (
        SELECT doc_id, n, g, side, COUNT(*) AS c FROM (
          SELECT doc_id, 1 AS n, unnest(string_split(cand, ' ')) AS g,
                 'c' AS side FROM pairs
          UNION ALL
          SELECT doc_id, 1, unnest(string_split(ref, ' ')), 'r' FROM pairs
          UNION ALL
          SELECT doc_id, 2,
                 unnest(list_transform(
                     generate_series(1, len(string_split(cand, ' ')) - 1),
                     i -> array_to_string(string_split(cand, ' ')[i:i+1], ' '))),
                 'c'
          FROM pairs
          UNION ALL
          SELECT doc_id, 2,
                 unnest(list_transform(
                     generate_series(1, len(string_split(ref, ' ')) - 1),
                     i -> array_to_string(string_split(ref, ' ')[i:i+1], ' '))),
                 'r'
          FROM pairs
        ) GROUP BY doc_id, n, g, side
    ),
    piv AS (
        SELECT doc_id, n, g,
               SUM(CASE WHEN side = 'c' THEN c ELSE 0 END) AS cc,
               SUM(CASE WHEN side = 'r' THEN c ELSE 0 END) AS rc
        FROM grams GROUP BY doc_id, n, g
    ),
    prec AS (
        SELECT doc_id, n,
               CAST(SUM(LEAST(cc, rc)) AS BIGINT) AS m,
               CAST(SUM(cc) AS BIGINT) AS ct,
               CAST(SUM(rc) AS BIGINT) AS rt
        FROM piv GROUP BY doc_id, n
    )
    SELECT p1.doc_id,
           p1.m AS match1, p1.ct AS ctotal1, p1.rt AS rtotal1,
           p2.m AS match2, p2.ct AS ctotal2, p2.rt AS rtotal2,
           CAST(2000000 * p1.m // (p1.ct + p1.rt) AS BIGINT) AS rouge1_f_x1e6,
           CAST(CASE WHEN p2.ct + p2.rt = 0 THEN 0
                     ELSE 2000000 * p2.m // (p2.ct + p2.rt) END AS BIGINT)
             AS rouge2_f_x1e6
    FROM prec p1
    JOIN prec p2 ON p2.doc_id = p1.doc_id AND p2.n = 2
    WHERE p1.n = 1
    ORDER BY p1.doc_id
    """,
)
def eval_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/2 recall+F1 between adjacent documents (candidate d,
    reference d+1; every doc_id%10==5 as the fixed sample rule — disjoint
    from eval_bleu_pairs' %10==0 sample). Per-gram clipped matches
    min(cand, ref) are exact integers and the F1 surfaces as the exact
    integer image (2e6·m) DIV (ct+rt) — this op has NO float step at all.
    Work shape: in-row gram explode → one partial-agg shuffle keyed by
    (doc, n, gram) → doc-grain rollup; the pair join is a shifted
    self-join on doc_id (no fan-out)."""
    docs = table(spark, sf_dir, "documents")
    cand = docs.filter(F.col("doc_id") % 10 == 5).select(
        "doc_id", F.col("text").alias("cand")
    )
    ref = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("ref")
    )
    pairs = cand.join(ref, "doc_id").localCheckpoint(eager=False)

    sides = []
    for src_col, side in (("cand", "c"), ("ref", "r")):
        uni = pairs.select(
            "doc_id",
            F.lit(1).alias("n"),
            F.explode(F.split(src_col, " ")).alias("g"),
            F.lit(side).alias("side"),
        )
        bi = pairs.select(
            "doc_id",
            F.lit(2).alias("n"),
            # guard: a 1-token side would make sequence(1, 0) descend and
            # slice(_, 0, 2) throw; the oracle's generate_series(1, 0) is
            # empty and so must this be (r13 shingle-hazard sweep)
            F.explode(
                F.expr(
                    f"CASE WHEN size(split({src_col}, ' ')) >= 2 THEN"
                    f" transform(sequence(1, size(split({src_col}, ' ')) - 1),"
                    f" i -> concat_ws(' ', slice(split({src_col}, ' '), i, 2)))"
                    f" ELSE array() END"
                )
            ).alias("g"),
            F.lit(side).alias("side"),
        )
        sides.extend([uni, bi])
    grams = sides[0]
    for s in sides[1:]:
        grams = grams.unionAll(s)
    prec = (
        grams.groupBy("doc_id", "n", "g", "side")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n", "g")
        .agg(
            F.sum(F.when(F.col("side") == "c", F.col("c")).otherwise(0)).alias("cc"),
            F.sum(F.when(F.col("side") == "r", F.col("c")).otherwise(0)).alias("rc"),
        )
        .groupBy("doc_id", "n")
        .agg(
            F.sum(F.least("cc", "rc")).cast("bigint").alias("m"),
            F.sum("cc").cast("bigint").alias("ct"),
            F.sum("rc").cast("bigint").alias("rt"),
        )
    )
    p1 = prec.filter(F.col("n") == 1).select(
        "doc_id",
        F.col("m").alias("match1"),
        F.col("ct").alias("ctotal1"),
        F.col("rt").alias("rtotal1"),
    )
    p2 = prec.filter(F.col("n") == 2).select(
        "doc_id",
        F.col("m").alias("match2"),
        F.col("ct").alias("ctotal2"),
        F.col("rt").alias("rtotal2"),
    )
    rouge1 = F.expr(
        "CAST(2000000 * match1 DIV (ctotal1 + rtotal1) AS BIGINT)"
    )
    rouge2 = F.expr(
        "CAST(CASE WHEN ctotal2 + rtotal2 = 0 THEN 0"
        " ELSE 2000000 * match2 DIV (ctotal2 + rtotal2) END AS BIGINT)"
    )
    return (
        p1.join(p2, "doc_id")
        .select(
            "doc_id",
            "match1",
            "ctotal1",
            "rtotal1",
            "match2",
            "ctotal2",
            "rtotal2",
            rouge1.alias("rouge1_f_x1e6"),
            rouge2.alias("rouge2_f_x1e6"),
        )
        .orderBy("doc_id")
    )


def _lsh_sweep_oracle_sql() -> str:
    from sdg_data_catalog_spark.queries.dedup_similarity import (
        _CORPUS_SQL,
        _SHINGLE_SQL,
        _SIG_SQL,
        _XP_SQL,
    )

    band_selects = []
    for b, r, thr in _LSH_CONFIGS:
        for bi in range(b):
            key = " || '|' || ".join(
                f"CAST(h{bi * r + j} AS VARCHAR)" for j in range(r)
            )
            band_selects.append(
                f"SELECT {b} AS cfg_bands, {r} AS cfg_rows, {thr} AS thresh_x1e6, "
                f"'{bi}|' || {key} AS band_key, doc_id FROM sig"
            )
    bands = " UNION ALL ".join(band_selects)
    return f"""
    WITH {_CORPUS_SQL},
    {_SHINGLE_SQL},
    {_XP_SQL},
    {_SIG_SQL},
    bands AS ({bands}),
    occ AS (
        SELECT cfg_bands, cfg_rows, thresh_x1e6, band_key,
               COUNT(*) AS n
        FROM bands GROUP BY cfg_bands, cfg_rows, thresh_x1e6, band_key
    )
    SELECT cfg_bands, cfg_rows, thresh_x1e6,
           CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_buckets,
           CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_candidate_pairs,
           CAST(MAX(n) AS BIGINT) AS max_bucket
    FROM occ
    GROUP BY cfg_bands, cfg_rows, thresh_x1e6
    ORDER BY cfg_rows
    """


@register("dedup_lsh_band_sweep", oracle=_lsh_sweep_oracle_sql())
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding tuner: sweep the (bands, rows) splits of the pinned
    16-hash minhash signature over the near-dup corpus and report, per
    config, the bucket census that decides the banding — hot buckets,
    candidate-pair mass Σ C(n,2), and the worst bucket (the skew signal
    that says 'salt or re-band before you join'). Candidate pairs are
    counted from bucket OCCUPANCY, never materialized: cost per config is
    one groupBy over the docs-sized signature table, so the sweep is safe
    to run even where the committed banding would explode (exactly the
    situation it exists to detect). The signature table is built once
    (one corpus scan) and localCheckpointed; each config is an in-row
    band explode over it. The S-curve threshold ≈(1/b)^(1/r) is emitted
    as a precomputed literal on both engines."""
    from sdg_data_catalog_spark.operators import dedup as D
    from sdg_data_catalog_spark.queries.dedup_similarity import (
        _near_dup_corpus,
    )

    docs = table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(_near_dup_corpus(docs)).localCheckpoint(
        eager=True
    )
    per_cfg = []
    for b, r, thr in _LSH_CONFIGS:
        keys = F.array(
            *[
                F.concat_ws(
                    "|",
                    F.lit(str(bi)),
                    *[F.col(f"h{bi * r + j}").cast("string") for j in range(r)],
                )
                for bi in range(b)
            ]
        )
        per_cfg.append(
            sig.select(
                F.lit(b).alias("cfg_bands"),
                F.lit(r).alias("cfg_rows"),
                F.lit(thr).alias("thresh_x1e6"),
                F.explode(keys).alias("band_key"),
            )
        )
    bands = per_cfg[0]
    for p in per_cfg[1:]:
        bands = bands.unionAll(p)
    occ = bands.groupBy(
        "cfg_bands", "cfg_rows", "thresh_x1e6", "band_key"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        occ.groupBy("cfg_bands", "cfg_rows", "thresh_x1e6")
        .agg(
            F.sum((F.col("n") >= 2).cast("bigint")).alias("n_hot_buckets"),
            F.sum(F.expr("n * (n - 1) DIV 2")).cast("bigint").alias(
                "n_candidate_pairs"
            ),
            F.max("n").cast("bigint").alias("max_bucket"),
        )
        .orderBy("cfg_rows")
    )


@register(
    "mm_audio_vad",
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
        SELECT doc_id, w, SUM(s * s) AS ss
        FROM samp GROUP BY doc_id, w
    ),
    flag AS (
        SELECT doc_id, w, (ss >= {_VAD_THRESH}) AS active FROM win
    ),
    isl AS (
        SELECT doc_id, w, active,
               w - ROW_NUMBER() OVER (PARTITION BY doc_id, active ORDER BY w)
                 AS grp
        FROM flag
    ),
    runs AS (
        SELECT doc_id, grp, COUNT(*) AS rl
        FROM isl WHERE active GROUP BY doc_id, grp
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INTEGER) AS n_windows,
               CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS INTEGER)
                 AS n_active
        FROM flag GROUP BY doc_id
    )
    SELECT agg.doc_id AS media_id, agg.n_windows, agg.n_active,
           CAST(COALESCE(MAX(runs.rl), 0) AS INTEGER) AS max_run,
           CAST(COUNT(runs.grp) AS INTEGER) AS n_segments
    FROM agg LEFT JOIN runs ON runs.doc_id = agg.doc_id
    GROUP BY agg.doc_id, agg.n_windows, agg.n_active
    ORDER BY media_id
    """,
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy VAD over real WAV payloads: build (as_wav_media) → decode →
    32-sample window energies → active flags → run-length census, all
    inside one Arrow batch pass (operators/multimodal.wav_vad). Window
    energies are exact int64 (≤ 32·125² = 500k), so the closed-form
    oracle reproduces every flag and run length bit-for-bit; only ~5 ints
    per clip leave the workers. The run-length logic (longest active run,
    segment count) is the part unit tests usually get wrong at window
    boundaries — here it is inside the external hash check."""
    from sdg_data_catalog_spark.operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").select("doc_id")
    media = MM.as_wav_media(docs)
    return MM.wav_vad(media, window=_VAD_WINDOW, threshold=_VAD_THRESH).orderBy(
        "media_id"
    )
