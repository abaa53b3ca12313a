"""Round-8 operator batch 21: randomness/autocorrelation diagnostics and
a PII exposure report.

- ``agg_runs_test`` — Wald-Wolfowitz runs test per daily event series:
  is the sequence of above/below-median days random, or does it cluster
  (regimes, weekly waves, incident streaks)? The distribution-free
  randomness gate run before trusting i.i.d.-assuming monitors.
- ``agg_durbin_watson`` — Durbin-Watson statistic of the ts_forecast_ols
  residuals per series: DW ≈ 2 means the trend model left no serial
  correlation; DW → 0 means the OLS confidence intervals are lies.
  The standard regression post-fit diagnostic.
- ``curation_pii_risk_report`` — per-source PII exposure rollup over
  the text_pii_redact detectors (emails / phones / IPv4): document hit
  rates, counts per category, density per 10k chars, and a tiered
  verdict — the compliance dashboard a release review actually reads
  (row-level redaction exists; the REPORT is what gets signed off).

Determinism: runs/DW reduce to exact integer day-table images (medians
by integer cross-multiplication, residuals as FLOOR(e·10⁶), the scale
cancelling in DW); the PII report is integer counts with one final
density division; tier verdicts compare integer cross-products.

Reference analog: none direct — SURVEY §2.11 north-star surface (the
reference ingests scraped author emails with no scrubbing stage at
all, paper_processing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000

_DAILY_SQL = f"""
daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
)
"""


@register(
    "agg_runs_test",
    oracle=f"""
    WITH {_DAILY_SQL},
    med AS (
      SELECT event_type,
             MIN(CASE WHEN cum * 2 >= n THEN y END) AS m
      FROM (
        SELECT event_type, y,
               CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY y
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM (SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM daily GROUP BY event_type, y))
      GROUP BY event_type
    ),
    signs AS (
      SELECT d.event_type, d.day,
             CASE WHEN d.y > md.m THEN 1 ELSE 0 END AS s
      FROM daily d JOIN med md ON md.event_type = d.event_type
      WHERE d.y <> md.m
    ),
    runs AS (
      SELECT event_type,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2,
             CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND prev <> s
                               THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM (SELECT event_type, s,
                   LAG(s) OVER (PARTITION BY event_type ORDER BY day) AS prev
            FROM signs)
      GROUP BY event_type
    )
    SELECT event_type, n1, n2, r AS n_runs,
           ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) AS z
    FROM runs ORDER BY event_type
    """,
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on each event type's daily counts
    dichotomized at the series median (ties to the median are dropped,
    the standard treatment): R runs of above/below against
    E[R] = 2n₁n₂/(n₁+n₂) + 1 and its exact variance; |z| > 2 means the
    series clusters (regimes/waves) and i.i.d.-assuming alerting is
    miscalibrated. Medians are integer order statistics over the
    bounded per-type day census; the run count is one LAG over the
    observation-window-sized day table; z is one identical double
    chain, ROUND 1e-6."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)  # median census + sign walk consume it
    )
    cen = daily.groupBy("event_type", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    med = (
        cen.select(
            "event_type",
            "y",
            F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
            F.sum("cnt").over(w_all).cast("bigint").alias("n"),
        )
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("y"))).alias("m")
        )
    )
    signs = (
        daily.join(F.broadcast(med), "event_type")
        .filter(F.col("y") != F.col("m"))
        .select(
            "event_type",
            "day",
            F.when(F.col("y") > F.col("m"), 1).otherwise(0).alias("s"),
        )
    )
    w_day = Window.partitionBy("event_type").orderBy("day")
    runs = (
        signs.select(
            "event_type", "s", F.lag("s").over(w_day).alias("prev")
        )
        .groupBy("event_type")
        .agg(
            F.sum("s").cast("bigint").alias("n1"),
            F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
            (
                1
                + F.sum(
                    F.when(
                        F.col("prev").isNotNull()
                        & (F.col("prev") != F.col("s")),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("bigint")
            .alias("r"),
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    mu = 2.0 * n1d * n2d / (F.col("n1") + F.col("n2")) + 1
    var = (
        2.0
        * n1d
        * n2d
        * (2.0 * n1d * n2d - F.col("n1") - F.col("n2"))
        / (
            (F.col("n1") + F.col("n2")).cast("double")
            * (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2") - 1)
        )
    )
    return runs.select(
        "event_type",
        "n1",
        "n2",
        F.col("r").alias("n_runs"),
        F.round((F.col("r") - mu) / F.sqrt(var), 6).alias("z"),
    ).orderBy("event_type")


@register(
    "agg_durbin_watson",
    oracle=f"""
    WITH {_DAILY_SQL},
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(day) AS BIGINT) AS sd, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(day * y) AS BIGINT) AS sdy,
             CAST(SUM(day * day) AS BIGINT) AS sdd
      FROM daily GROUP BY event_type
    ),
    res AS (
      SELECT d.event_type,
             ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day)
               AS rn,
             CAST(FLOOR((d.y
               - ((CAST(s.sy AS DOUBLE) / s.n)
                  + (CAST(s.n * s.sdy - s.sd * s.sy AS DOUBLE)
                     / CAST(s.n * s.sdd - s.sd * s.sd AS DOUBLE))
                    * (d.day - CAST(s.sd AS DOUBLE) / s.n))) * 1e6)
               AS BIGINT) AS e
      FROM daily d JOIN s ON s.event_type = d.event_type
    )
    SELECT a.event_type,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_days,
           ROUND(CAST(SUM(CAST(a.e - b.e AS HUGEINT) * (a.e - b.e))
                      AS DOUBLE)
                 / (SELECT SUM(CAST(r2.e AS HUGEINT) * r2.e) FROM res r2
                    WHERE r2.event_type = a.event_type), 6) AS dw
    FROM res a JOIN res b
      ON b.event_type = a.event_type AND b.rn = a.rn - 1
    GROUP BY a.event_type ORDER BY a.event_type
    """,
)
def agg_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation diagnostic of the
    ts_forecast_ols residuals per event series: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ²,
    ≈2 for white residuals, →0 under positive autocorrelation (the
    trend fit is missing structure and its standard errors are
    overconfident). Residuals are FLOOR(e·10⁶) integer images of the
    exact-integer-sufficient-statistic OLS fit (the scale cancels in
    the ratio); numerator and denominator are exact decimal sums over
    the bounded day table, DW one double division, ROUND 1e-6."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)  # OLS stats + residual walk consume it
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("day").cast("bigint").alias("sd"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("day") * F.col("y")).cast("bigint").alias("sdy"),
        F.sum(F.col("day") * F.col("day")).cast("bigint").alias("sdd"),
    )
    slope = (
        F.col("n") * F.col("sdy") - F.col("sd") * F.col("sy")
    ).cast("double") / (
        F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    ).cast("double")
    fit = (F.col("sy").cast("double") / F.col("n")) + slope * (
        F.col("day") - F.col("sd").cast("double") / F.col("n")
    )
    w_day = Window.partitionBy("event_type").orderBy("day")
    res = (
        daily.join(F.broadcast(s), "event_type")
        .select(
            "event_type",
            "day",
            F.floor((F.col("y") - fit) * 1e6).cast("bigint").alias("e"),
        )
        .select(
            "event_type",
            "e",
            F.lag("e").over(w_day).alias("prev"),
        )
    )
    agg = res.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(
            F.when(
                F.col("prev").isNotNull(),
                ((F.col("e") - F.col("prev")).cast("decimal(19,0)")
                 * (F.col("e") - F.col("prev"))).cast("decimal(38,0)"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("num"),
        F.sum(
            (F.col("e").cast("decimal(19,0)") * F.col("e")).cast(
                "decimal(38,0)"
            )
        ).alias("den"),
    )
    return agg.select(
        "event_type",
        "n_days",
        F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6)
        .alias("dw"),
    ).orderBy("event_type")


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "curation_pii_risk_report",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id, source, n_chars,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' contact u' || doc_id || '@mail'
                         || (doc_id % 7) || '.org or 555-01'
                         || (doc_id % 10) || '-'
                         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                         || ' ip 10.0.' || (doc_id % 256) || '.1'
                    ELSE text END AS t
        FROM documents
    ),
    hits AS (
      SELECT source, length(t) AS n_chars,
             len(regexp_extract_all(t, '{_PII_EMAIL}')) AS e,
             len(regexp_extract_all(t, '{_PII_PHONE}')) AS p,
             len(regexp_extract_all(t, '{_PII_IPV4}')) AS i
      FROM seeded
    ),
    agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_pii,
             CAST(SUM(e) AS BIGINT) AS n_emails,
             CAST(SUM(p) AS BIGINT) AS n_phones,
             CAST(SUM(i) AS BIGINT) AS n_ips,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM hits GROUP BY source
    )
    SELECT source, n_docs, docs_with_pii, n_emails, n_phones, n_ips,
           ROUND(CAST(n_emails + n_phones + n_ips AS DOUBLE) * 10000
                 / total_chars, 6) AS pii_per_10k_chars,
           CASE WHEN docs_with_pii * 100 > n_docs * 50 THEN 'high'
                WHEN docs_with_pii * 100 > n_docs * 10 THEN 'medium'
                ELSE 'low' END AS risk_tier
    FROM agg ORDER BY source
    """,
)
def curation_pii_risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure rollup over the text_pii_redact
    detectors: document hit rate, per-category counts, PII density per
    10k characters, and a tiered verdict (>50% of docs = high, >10% =
    medium) — the compliance REPORT a release review signs off on
    (row-level redaction already exists; this is the audit that decides
    whether a source needs it). One-third of documents are salted with
    the deterministic doc_id-derived PII (same expression both engines)
    so the report exercises mixed-exposure sources. The density
    denominator is the length of the text actually scanned (post-salt),
    so pii_per_10k_chars measures exactly what its name claims. The
    detectors are codegen'd regexp counts — map-side, no shuffle beyond
    the |sources|-row aggregate; tier verdicts compare integer
    cross-products (docs_with_pii·100 > n_docs·50), immune to float
    thresholds."""
    docs = table(spark, sf_dir, "documents")
    salted = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@mail"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".org or 555-01"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ),
    ).otherwise(F.col("text"))
    hits = docs.select(
        "source",
        # density denominator = the text actually scanned (post-salt), so
        # pii_per_10k_chars measures what its name says (r8 ADVICE); for
        # unsalted docs length(text) == n_chars by fixture construction.
        F.length(salted).alias("n_chars"),
        F.regexp_count(salted, F.lit(_PII_EMAIL)).alias("e"),
        F.regexp_count(salted, F.lit(_PII_PHONE)).alias("p"),
        F.regexp_count(salted, F.lit(_PII_IPV4)).alias("i"),
    )
    agg = hits.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("e") + F.col("p") + F.col("i") > 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("docs_with_pii"),
        F.sum("e").cast("bigint").alias("n_emails"),
        F.sum("p").cast("bigint").alias("n_phones"),
        F.sum("i").cast("bigint").alias("n_ips"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    tier = (
        F.when(F.col("docs_with_pii") * 100 > F.col("n_docs") * 50, "high")
        .when(F.col("docs_with_pii") * 100 > F.col("n_docs") * 10, "medium")
        .otherwise("low")
    )
    return agg.select(
        "source",
        "n_docs",
        "docs_with_pii",
        "n_emails",
        "n_phones",
        "n_ips",
        F.round(
            (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")).cast(
                "double"
            )
            * 10000
            / F.col("total_chars"),
            6,
        ).alias("pii_per_10k_chars"),
        tier.alias("risk_tier"),
    ).orderBy("source")
