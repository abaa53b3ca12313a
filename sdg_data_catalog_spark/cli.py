"""Command-line parity layer: the reference's three entry points
re-expressed over this engine, plus a generic runner for every
registered operator.

The reference is driven by three CLIs (SURVEY.md §3):

- ``python dataset_ner/paper_processing.py -p xml/ -t 8`` — XML papers →
  SQLite papers + 'data'-paragraph candidates (paper_processing.py:185-228)
- ``python dataset_ner/wrapper_ner.py -as LTP -bf 0.05 -na out.jsonl``
  — NER scoring + active-learning export (wrapper_ner.py:78-155)
- ``python scrapping/papers_download.py -s 0 -n 100`` — dedup-against-disk
  + pooled fetch + status markers (papers_download.py:154-171)

Here: ``python -m sdg_data_catalog_spark {ingest|ner|scrape|query|list}``.
Same knobs (paths, strategy, batch fraction, offsets), Spark execution:
`-t/--num_threads` disappears because parallelism comes from input
partitions, and the SQLite sink becomes a DQ-gated atomic versioned
parquet publish. Every command prints ONE JSON summary line on stdout.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Active-learning strategy → registered rank_al_* operator
# (reference strategies: active_learning.py; LTP is the reference default).
AL_STRATEGIES = {
    "LC": "rank_al_lc",
    "NLC": "rank_al_nlc",
    "LTP": "rank_al_ltp",
    "TE": "rank_al_te",
    "MTE": "rank_al_mte",
    "MTP": "rank_al_mtp",
    "LONG": "rank_al_long",
}

_ARTICLE_XPATHS = {
    "title": "xpath_string(value, '/article/front/title')",
    "abstract": "xpath_string(value, '/article/front/abstract/p')",
    "authors": "xpath(value, '/article/front/contrib[@contrib-type=\"author\"]/name/text()')",
}


def _get_spark(app: str) -> SparkSession:
    from sdg_data_catalog_spark.session import get_spark

    return get_spark(app)


def _parse_articles(xml: DataFrame) -> DataFrame:
    """JVM-side xpath projection of CERMXML-shaped articles (the scan_xml
    parse, factored for directory ingestion): one row per article with
    title/abstract/authors, paper_id derived from the title suffix."""
    authors = F.expr(_ARTICLE_XPATHS["authors"])
    return xml.select(
        F.expr(_ARTICLE_XPATHS["title"]).alias("title"),
        F.expr(_ARTICLE_XPATHS["abstract"]).alias("abstract"),
        F.array_join(authors, "|").alias("authors"),
        F.size(authors).alias("n_authors"),
    ).withColumn(
        "paper_id",
        F.regexp_extract("title", r"-(\d+)$", 1).cast("bigint"),
    )


def cmd_ingest(args: argparse.Namespace) -> dict[str, Any]:
    """E1 parity: papers + 'data'-paragraph candidates, atomically
    published. With --path, ingest a directory of article XML files; with
    --sf-dir, render the synthetic articles first (the scan_xml
    generator) so the full pipeline is demonstrable offline."""
    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.queries.registry import all_queries
    from sdg_data_catalog_spark.sources.atomic import publish

    spark = _get_spark("sdg-ingest")
    if args.path:
        xml = spark.read.text(args.path)
        papers = _parse_articles(xml)
        paragraphs = papers.select(
            "paper_id", F.explode(F.split("abstract", r"\.\s+")).alias("paragraph")
        )
    else:
        # scan_xml renders + parses the synthetic corpus; reuse it verbatim
        parsed = all_queries()["scan_xml"](spark, args.sf_dir)
        papers = parsed.withColumnRenamed("doc_id", "paper_id")
        # paragraph candidates from the full document text (the reference
        # inserts one row per paragraph containing 'data',
        # paper_processing.py:170-182)
        docs = table(spark, args.sf_dir, "documents")
        paragraphs = docs.select(
            F.col("doc_id").alias("paper_id"),
            F.explode(F.split("text", r"\.\s+")).alias("paragraph"),
        )
    candidates = paragraphs.filter(F.col("paragraph").contains(args.keyword))
    papers_root = os.path.join(args.output, "papers")
    cand_root = os.path.join(args.output, "paragraph_candidates")
    publish(papers, papers_root, 0)
    publish(candidates, cand_root, 0)
    return {
        "command": "ingest",
        "papers": papers.count(),
        "paragraph_candidates": candidates.count(),
        "papers_root": papers_root,
        "candidates_root": cand_root,
    }


def cmd_ner(args: argparse.Namespace) -> dict[str, Any]:
    """E2 parity (scoring + active-learning branch): model scores over the
    corpus, a strategy-ranked annotation batch exported as JSONL, and a
    JSON performance report — wrapper_ner.py's `-as/-bf/-na/-rn` knobs."""
    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.queries.registry import all_queries

    strategy = args.strategy.upper()
    if strategy not in AL_STRATEGIES:
        raise SystemExit(
            f"unknown strategy {args.strategy!r}; pick from {sorted(AL_STRATEGIES)}"
        )
    spark = _get_spark("sdg-ner")
    qs = all_queries()
    n_docs = table(spark, args.sf_dir, "documents").count()
    batch = max(1, math.ceil(args.batch_fraction * n_docs))
    # the rank_al_* operators rank the top K=25 most informative docs
    # (queries/ranking.py); a batch fraction asking for more is capped
    # there and surfaced in the summary as `batch_capped`
    from sdg_data_catalog_spark.queries.ranking import K as _RANK_K

    ranked = qs[AL_STRATEGIES[strategy]](spark, args.sf_dir).limit(batch)
    # Prodigy-ish JSONL export (wrapper_ner.py:67-74): one object per
    # suggested annotation. The batch is bounded by -bf, so a driver-side
    # single-file write is the faithful (and safe) sink here.
    rows = ranked.collect()
    os.makedirs(os.path.dirname(os.path.abspath(args.new_annotations)), exist_ok=True)
    with open(args.new_annotations, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r.asDict(), default=str) + "\n")
    report = {
        "strategy": strategy,
        "batch_size": len(rows),
        "corpus_docs": n_docs,
    }
    for metric in ("agg_accuracy", "agg_prf"):
        out = qs[metric](spark, args.sf_dir).collect()
        report[metric] = [r.asDict() for r in out]
    os.makedirs(os.path.dirname(os.path.abspath(args.report_name)), exist_ok=True)
    with open(args.report_name, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2, default=str)
    return {
        "command": "ner",
        "strategy": strategy,
        "exported": len(rows),
        "batch_capped": batch > _RANK_K,
        "annotations": args.new_annotations,
        "report": args.report_name,
    }


def cmd_scrape(args: argparse.Namespace) -> dict[str, Any]:
    """E3 parity: candidate records minus the already-fetched ledger
    (papers_download.py:37-65's dedup-against-disk, as a left-anti join),
    a bounded fetch fan-out (mapInPandas; deterministic offline stub —
    swap for urllib in a networked deployment), and a status-ledger
    append so the next run skips everything already attempted."""
    import pandas as pd

    from sdg_data_catalog_spark.catalog import table

    spark = _get_spark("sdg-scrape")
    ledger_dir = os.path.join(args.output, "status")
    docs = (
        table(spark, args.sf_dir, "documents")
        .select("doc_id", "source")
        .filter(F.col("doc_id") >= args.start_from)
        .orderBy("doc_id")
        .limit(args.max_records)
    )
    if os.path.isdir(ledger_dir) and any(
        f.endswith(".parquet") for f in os.listdir(ledger_dir)
    ):
        seen = spark.read.parquet(ledger_dir).select("doc_id")
        todo = docs.join(seen, "doc_id", "left_anti")
    else:
        todo = docs
    plan = todo.select(
        "doc_id",
        F.concat(
            F.lit("https://papers.example.org/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id"),
            F.lit(".pdf"),
        ).alias("url"),
    )

    def _fetch(batches):
        for pdf in batches:
            status = (pdf["doc_id"] % 5 != 0).map({True: 200, False: 404})
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "url": pdf["url"], "status": status.astype("int32")}
            )

    fetched = plan.mapInPandas(_fetch, "doc_id BIGINT, url STRING, status INT")
    fetched.write.mode("append").parquet(ledger_dir)
    ledger = spark.read.parquet(ledger_dir)
    attempted = fetched.count()
    return {
        "command": "scrape",
        "attempted": attempted,
        "ok": fetched.filter(F.col("status") == 200).count(),
        "ledger_rows": ledger.count(),
        "ledger": ledger_dir,
    }


def cmd_query(args: argparse.Namespace) -> dict[str, Any]:
    """Generic operator runner: any registered query by name, with
    optional plan print and file sink — the engine's `spark-sql`-ish
    front door."""
    from sdg_data_catalog_spark.queries.registry import all_queries

    qs = all_queries()
    if args.name not in qs:
        raise SystemExit(f"unknown query {args.name!r}; see `list`")
    spark = _get_spark(f"sdg-query-{args.name}")
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    summary: dict[str, Any] = {
        "command": "query",
        "name": args.name,
        "columns": df.columns,
    }
    if args.output:
        writer = df.write.mode("overwrite")
        if args.format == "parquet":
            writer.parquet(args.output)
        elif args.format == "jsonl":
            writer.json(args.output)
        else:
            # escape='"' matches the read-back options below (and RFC 4180);
            # Spark's default escape '\\' would mis-parse quoted fields on
            # read-back and inflate the row count
            writer.option("header", True).option("escape", '"').csv(args.output)
        summary["output"] = args.output
    else:
        for r in df.limit(args.show).collect():
            print(json.dumps(r.asDict(), default=str), file=sys.stderr)
    summary["rows"] = df.count()
    return summary


# Plan-audit default set: the bench headline queries (the plans whose
# quality the 100 TB argument rests on).
AUDIT_DEFAULT = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q18_large_orders",
    "join_fk",
    "win_rownum_topk",
    "agg_rollup",
    "topk_global",
)


def cmd_audit(args: argparse.Namespace) -> dict[str, Any]:
    """Plan lint over registered operators (default: the bench headline
    set): builds each plan WITHOUT executing it and flags the
    antipatterns that don't survive scale — unbounded cartesians and
    row-at-a-time Python UDFs (plans/inspect.py::lint)."""
    from sdg_data_catalog_spark.plans.inspect import lint_df
    from sdg_data_catalog_spark.queries.registry import all_queries

    qs = all_queries()
    names = args.names or list(AUDIT_DEFAULT)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = _get_spark("sdg-audit")
    flagged: dict[str, list[str]] = {}
    for name in names:
        findings = lint_df(qs[name](spark, args.sf_dir))
        if findings:
            flagged[name] = findings
        print(
            f"{name}\t{'FLAGGED: ' + '; '.join(findings) if findings else 'clean'}",
            file=sys.stderr,
        )
    return {
        "command": "audit",
        "audited": len(names),
        "clean": len(names) - len(flagged),
        "flagged": flagged,
    }


def cmd_sql(args: argparse.Namespace) -> dict[str, Any]:
    """Ad-hoc SQL front door (`spark-sql` parity): register every catalog
    table as a temp view over the chosen sf_dir and run one statement
    through Spark SQL — the same Catalyst planning path the registered
    operators use, opened to arbitrary queries. The view names match the
    DuckDB oracle views (region nation customer supplier part orders
    lineitem events documents embeddings), so any oracle SQL from
    `oracle_sql()` is runnable here verbatim (dialect differences aside)."""
    from sdg_data_catalog_spark.catalog import TABLES, table

    spark = _get_spark("sdg-sql")
    for t in TABLES:
        table(spark, args.sf_dir, t).createOrReplaceTempView(t)
    df = spark.sql(args.statement)
    if args.explain:
        df.explain("formatted")
    summary: dict[str, Any] = {"command": "sql", "columns": df.columns}
    if args.output:
        writer = df.write.mode("overwrite")
        if args.format == "parquet":
            writer.parquet(args.output)
        elif args.format == "jsonl":
            writer.json(args.output)
        else:
            # escape='"' matches the read-back options below (and RFC 4180);
            # Spark's default escape '\\' would mis-parse quoted fields on
            # read-back and inflate the row count
            writer.option("header", True).option("escape", '"').csv(args.output)
        summary["output"] = args.output
        # Count what was written rather than re-executing the user's
        # statement a second time (heavy ad-hoc SQL would otherwise run
        # twice — once for the sink, once for the count). Read-back counts
        # are only trustworthy for parquet: a zero-row json/csv output has
        # no schema to infer (AnalysisException), and csv rows containing
        # embedded newlines miscount without multiLine. For those formats
        # count the written files through the parquet-free path: jsonl/csv
        # read back with the sunk DataFrame's own schema and multiLine-safe
        # options; fall back to df.count() if the read-back fails.
        try:
            reader = spark.read
            if args.format == "parquet":
                written = reader.parquet(args.output)
            elif args.format == "jsonl":
                written = reader.schema(df.schema).json(args.output)
            else:
                written = (
                    reader.schema(df.schema)
                    .option("header", True)
                    .option("multiLine", True)
                    .option("escape", '"')
                    .csv(args.output)
                )
            summary["rows"] = written.count()
        except Exception:  # zero-row non-parquet output: nothing to infer
            summary["rows"] = df.count()
    else:
        shown = df.limit(args.show).collect()
        for r in shown:
            print(json.dumps(r.asDict(), default=str), file=sys.stderr)
        # One execution total: if the limit was not hit we already know the
        # exact row count from the collected page; only fall back to a
        # count() when the page filled (result may be larger than shown).
        summary["rows"] = len(shown) if len(shown) < args.show else df.count()
    return summary


def cmd_list(_args: argparse.Namespace) -> dict[str, Any]:
    from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries

    qs, oracles = all_queries(), all_oracles()
    for name in sorted(qs):
        kind = "oracle" if name in oracles else "rows-only"
        print(f"{name}\t{kind}", file=sys.stderr)
    return {"command": "list", "queries": len(qs), "oracles": len(oracles)}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sdg_data_catalog_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    default_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ing = sub.add_parser("ingest", help="papers + paragraph candidates (E1)")
    ing.add_argument("-p", "--path", help="directory of article XML files")
    ing.add_argument("--sf-dir", default=default_sf)
    ing.add_argument("-o", "--output", required=True)
    ing.add_argument("--keyword", default="data")
    ing.set_defaults(fn=cmd_ingest)

    ner = sub.add_parser("ner", help="scoring + active-learning export (E2)")
    ner.add_argument("--sf-dir", default=default_sf)
    ner.add_argument("-as", "--active_learning_strategy", dest="strategy", default="LTP")
    ner.add_argument("-bf", "--batch_fraction", type=float, default=0.05)
    ner.add_argument("-na", "--new_annotations", default="AL_generated_data_to_annotate.jsonl")
    ner.add_argument("-rn", "--report_name", default="report_1.json")
    ner.set_defaults(fn=cmd_ner)

    scr = sub.add_parser("scrape", help="ledger-dedup'd bounded fetch (E3)")
    scr.add_argument("--sf-dir", default=default_sf)
    scr.add_argument("-o", "--output", required=True)
    scr.add_argument("-s", "--start_from", type=int, default=0)
    scr.add_argument("-n", "--max_records", type=int, default=100)
    scr.set_defaults(fn=cmd_scrape)

    q = sub.add_parser("query", help="run any registered operator")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=default_sf)
    q.add_argument("--show", type=int, default=10)
    q.add_argument("--explain", action="store_true")
    q.add_argument("--output")
    q.add_argument("--format", choices=("parquet", "jsonl", "csv"), default="parquet")
    q.set_defaults(fn=cmd_query)

    sq = sub.add_parser("sql", help="run ad-hoc SQL over the catalog views")
    sq.add_argument("statement")
    sq.add_argument("--sf-dir", default=default_sf)
    sq.add_argument("--show", type=int, default=10)
    sq.add_argument("--explain", action="store_true")
    sq.add_argument("--output")
    sq.add_argument("--format", choices=("parquet", "jsonl", "csv"), default="parquet")
    sq.set_defaults(fn=cmd_sql)

    ls = sub.add_parser("list", help="list registered operators")
    ls.set_defaults(fn=cmd_list)

    au = sub.add_parser("audit", help="plan-lint operators (no execution)")
    au.add_argument("names", nargs="*", help="query names (default: headline set)")
    au.add_argument("--sf-dir", default=default_sf)
    au.set_defaults(fn=cmd_audit)
    return p


def main(argv: list[str] | None = None) -> dict[str, Any]:
    args = build_parser().parse_args(argv)
    summary = args.fn(args)
    print(json.dumps(summary, default=str))
    return summary


if __name__ == "__main__":
    main()
