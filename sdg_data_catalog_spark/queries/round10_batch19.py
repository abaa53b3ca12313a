"""Round-10 operator batch 19: week-over-week growth and utility-driven
budget allocation.

- ``ts_week_over_week_growth`` — the BI staple: weekly event counts per
  type with week-over-week growth as an exact integer permille image
  ((1000·(cur−prev)) DIV prev) — no float ratio anywhere — plus the
  streak-friendly direction flag. One grouped pass to the bounded
  weekly census; the lag runs on that census partitioned by type.
- ``curation_budget_by_utility`` — close the data-valuation loop:
  allocate a 1M-token training budget across sources proportionally to
  max(influence, 0) from the SAME leave-one-source-out machinery as
  curation_loo_influence (negative-influence sources get nothing),
  capped at each source's actual token mass, with largest-remainder
  rounding so the allocations sum exactly to min(budget, capacity).
  The step that turns 20 diagnostic numbers into a sampling plan.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_WEEK_US = 7 * 86_400_000_000
_TOKEN_BUDGET = 1_000_000
_PROBE_MOD = 97


@register(
    "ts_week_over_week_growth",
    oracle=f"""
    WITH weekly AS (
        SELECT event_type,
               epoch_us(ts) // {_WEEK_US} AS week,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, week
    ),
    lagged AS (
        SELECT event_type, week, n,
               LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev
        FROM weekly
    )
    SELECT event_type, CAST(week AS BIGINT) AS week, n,
           CAST(prev AS BIGINT) AS prev_n,
           CAST(CASE WHEN prev IS NULL OR prev = 0 THEN NULL
                ELSE (1000 * (n - prev)) // prev END AS BIGINT)
             AS wow_permille,
           CASE WHEN prev IS NULL THEN NULL ELSE n > prev END AS grew
    FROM lagged
    ORDER BY event_type, week
    """,
)
def ts_week_over_week_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: weekly counts (one grouped
    corpus pass), the previous week via LAG over the bounded weekly
    census partitioned by type, growth as the exact integer permille
    image (1000·Δ) DIV prev (floor semantics on both engines — no float
    ratio can ulp-flip), NULL on the first week. The trend table every
    weekly business review starts from."""
    ev = table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.expr(
            f"CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV {_WEEK_US} AS BIGINT)"
        ).alias("week"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    lagged = weekly.withColumn("prev", F.lag("n").over(w))
    return lagged.select(
        "event_type",
        F.col("week").cast("bigint").alias("week"),
        "n",
        F.col("prev").cast("bigint").alias("prev_n"),
        F.expr(
            "CAST(CASE WHEN prev IS NULL OR prev = 0 THEN NULL"
            " ELSE (1000 * (n - prev)) DIV prev END AS BIGINT)"
        ).alias("wow_permille"),
        F.when(F.col("prev").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.col("n") > F.col("prev"))
        .alias("grew"),
    ).orderBy("event_type", "week")


def _budget_oracle() -> str:
    return f"""
    WITH w AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    sw AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM w GROUP BY source, word
    ),
    gw0 AS (SELECT word, CAST(SUM(c) AS BIGINT) AS g FROM sw GROUP BY word),
    gw AS (SELECT word, g,
                  CAST(SUM(g) OVER () AS BIGINT) AS n,
                  CAST(COUNT(*) OVER () AS BIGINT) AS v
           FROM gw0),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM sw GROUP BY source),
    probe AS (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE doc_id % {_PROBE_MOD} = 0
    ),
    sources AS (SELECT DISTINCT source FROM sw),
    expanded AS (
        SELECT p.word, s.source, COALESCE(sw.c, 0) AS c
        FROM probe p
        CROSS JOIN sources s
        LEFT JOIN sw ON sw.word = p.word AND sw.source = s.source
    ),
    loo AS (
        SELECT e.source,
               CAST(SUM(CAST(FLOOR(1000000 * ln(
                   (CAST(gw.g - e.c AS DOUBLE) + 1)
                   / (gw.n - st.ns + gw.v))) AS BIGINT)) AS BIGINT)
                 AS loo_logp
        FROM expanded e
        JOIN gw ON gw.word = e.word
        JOIN st ON st.source = e.source
        GROUP BY e.source
    ),
    base AS (
        SELECT CAST(SUM(CAST(FLOOR(1000000 * ln(
                   (CAST(gw.g AS DOUBLE) + 1) / (gw.n + gw.v)))
                 AS BIGINT)) AS BIGINT) AS base_logp
        FROM probe p JOIN gw ON gw.word = p.word
    ),
    util AS (
        SELECT loo.source, st.ns AS tokens,
               GREATEST(base.base_logp - loo.loo_logp, 0) AS u
        FROM loo JOIN st ON st.source = loo.source, base
    ),
    tot AS (
        SELECT source, tokens, u,
               CAST(SUM(u) OVER () AS BIGINT) AS tu
        FROM util
    ),
    raw AS (
        SELECT source, tokens, u,
               CASE WHEN tu = 0 THEN 0
                    ELSE LEAST(({_TOKEN_BUDGET} * u) // tu, tokens) END
                 AS base_alloc,
               CASE WHEN tu = 0 THEN 0
                    ELSE ({_TOKEN_BUDGET} * u) % tu END AS rem
        FROM tot
    ),
    shortfall AS (
        SELECT source, tokens, u, base_alloc, rem,
               LEAST({_TOKEN_BUDGET},
                     CAST(SUM(CASE WHEN u > 0 THEN tokens ELSE 0 END)
                          OVER () AS BIGINT))
                 - CAST(SUM(base_alloc) OVER () AS BIGINT) AS gap,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
        FROM raw
    )
    SELECT source, tokens, CAST(u AS BIGINT) AS utility_x1e6,
           CAST(base_alloc
                + CASE WHEN rk <= gap AND base_alloc < tokens AND u > 0
                       THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
    FROM shortfall ORDER BY source
    """


@register("curation_budget_by_utility", oracle=_budget_oracle())
def curation_budget_by_utility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Utility-proportional token-budget allocation: the LOO influence
    numbers (same census machinery as curation_loo_influence) clipped
    at zero become weights; each source gets budget·u/Σu tokens by
    integer floor division, capped at its own token mass; the
    largest-remainder top-up (+1 to the biggest remainders, skipping
    capped and zero-utility sources) closes the rounding gap toward
    min(budget, positive-utility capacity). Every allocation step is
    integer arithmetic — the plan cannot drift between engines. Output:
    per source, token mass, clipped utility, allocated tokens.

    (Exact largest-remainder with caps is a one-round approximation
    when a +1 would breach a cap — with a 10⁶ budget over 20 sources
    the gap is < 20 tokens and the identity Σalloc ≤ budget holds by
    construction; the property test pins both.)"""
    docs = table(spark, sf_dir, "documents")
    sw = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    gw = sw.groupBy("word").agg(F.sum("c").cast("bigint").alias("g"))
    st = sw.groupBy("source").agg(F.sum("c").cast("bigint").alias("ns"))
    tot_gw = gw.agg(
        F.sum("g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    probe = (
        docs.filter(F.col("doc_id") % _PROBE_MOD == 0)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .localCheckpoint(eager=True)
    )
    sources = sw.select("source").distinct()
    expanded = (
        probe.crossJoin(F.broadcast(sources))
        .join(F.broadcast(sw), ["word", "source"], "left")
        .select("word", "source", F.coalesce("c", F.lit(0)).alias("c"))
    )
    loo = (
        expanded.join(F.broadcast(gw), "word")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot_gw))
        .groupBy("source")
        .agg(
            F.sum(
                F.floor(
                    1_000_000
                    * F.log(
                        ((F.col("g") - F.col("c")).cast("double") + 1)
                        / (F.col("n") - F.col("ns") + F.col("v"))
                    )
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("loo_logp")
        )
    )
    base = (
        probe.join(F.broadcast(gw), "word")
        .crossJoin(F.broadcast(tot_gw))
        .agg(
            F.sum(
                F.floor(
                    1_000_000
                    * F.log(
                        (F.col("g").cast("double") + 1)
                        / (F.col("n") + F.col("v"))
                    )
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("base_logp")
        )
    )
    util = (
        loo.join(st, "source")
        .crossJoin(F.broadcast(base))
        .select(
            "source",
            F.col("ns").alias("tokens"),
            F.greatest(
                F.col("base_logp") - F.col("loo_logp"), F.lit(0)
            ).alias("u"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)  # 20 rows; windows below are free
    )
    wp = Window.partitionBy(F.spark_partition_id())
    tot = util.select(
        "source", "tokens", "u", F.sum("u").over(wp).cast("bigint").alias("tu")
    )
    raw = tot.select(
        "source",
        "tokens",
        "u",
        F.expr(
            f"CASE WHEN tu = 0 THEN 0"
            f" ELSE LEAST(({_TOKEN_BUDGET} * u) DIV tu, tokens) END"
        ).alias("base_alloc"),
        F.expr(
            f"CASE WHEN tu = 0 THEN 0"
            f" ELSE ({_TOKEN_BUDGET} * u) % tu END"
        ).alias("rem"),
    )
    rk = F.row_number().over(
        Window.partitionBy(F.spark_partition_id()).orderBy(
            F.col("rem").desc(), "source"
        )
    )
    shortfall = raw.select(
        "source",
        "tokens",
        "u",
        "base_alloc",
        "rem",
        (
            F.least(
                F.lit(_TOKEN_BUDGET),
                F.sum(F.when(F.col("u") > 0, F.col("tokens")).otherwise(0))
                .over(wp)
                .cast("bigint"),
            )
            - F.sum("base_alloc").over(wp).cast("bigint")
        ).alias("gap"),
    ).withColumn("rk", rk)
    return shortfall.select(
        "source",
        "tokens",
        F.col("u").cast("bigint").alias("utility_x1e6"),
        (
            F.col("base_alloc")
            + F.when(
                (F.col("rk") <= F.col("gap"))
                & (F.col("base_alloc") < F.col("tokens"))
                & (F.col("u") > 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    ).orderBy("source")
