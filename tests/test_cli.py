"""CLI parity layer: each reference entry point's analog runs end-to-end
and produces the artifacts the reference's CLI produces (SURVEY.md §3)."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from sdg_data_catalog_spark.cli import main


def test_ingest_publishes_papers_and_candidates(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ingested")
    summary = main(["ingest", "--sf-dir", sf_dir, "-o", out])
    assert summary["papers"] > 0
    from sdg_data_catalog_spark.sources.atomic import read_latest

    papers = read_latest(spark, summary["papers_root"])
    assert {"paper_id", "title", "abstract"} <= set(papers.columns)
    cands = read_latest(spark, summary["candidates_root"])
    # every candidate paragraph contains the keyword (the E1 filter)
    assert cands.filter(~cands["paragraph"].contains("data")).count() == 0
    assert summary["paragraph_candidates"] == cands.count()


def test_ner_exports_jsonl_and_report(spark, sf_dir, tmp_path):
    na = str(tmp_path / "al" / "batch.jsonl")
    rn = str(tmp_path / "al" / "report.json")
    summary = main(
        ["ner", "--sf-dir", sf_dir, "-as", "LTP", "-bf", "0.02", "-na", na, "-rn", rn]
    )
    lines = [json.loads(line) for line in open(na)]
    assert len(lines) == summary["exported"] > 0
    assert all("doc_id" in obj for obj in lines)
    report = json.load(open(rn))
    assert report["strategy"] == "LTP"
    assert report["agg_accuracy"] and report["agg_prf"]
    # batch honors the fraction: ceil(0.02 * corpus)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    import math

    assert summary["exported"] == min(math.ceil(0.02 * len(docs)), 25)


def test_ner_rejects_unknown_strategy(sf_dir, tmp_path):
    with pytest.raises(SystemExit):
        main(["ner", "--sf-dir", sf_dir, "-as", "NOPE",
              "-na", str(tmp_path / "x.jsonl"), "-rn", str(tmp_path / "r.json")])


def test_scrape_is_incremental(spark, sf_dir, tmp_path):
    out = str(tmp_path / "scraped")
    first = main(["scrape", "--sf-dir", sf_dir, "-o", out, "-n", "40"])
    assert first["attempted"] == 40
    # second run over the same window: ledger anti-join leaves nothing
    second = main(["scrape", "--sf-dir", sf_dir, "-o", out, "-n", "40"])
    assert second["attempted"] == 0
    assert second["ledger_rows"] == 40
    # widening the window fetches only the new tail
    third = main(["scrape", "--sf-dir", sf_dir, "-o", out, "-n", "60"])
    assert third["attempted"] == 20
    ledger = pd.read_parquet(out + "/status")
    assert ledger["doc_id"].nunique() == 60
    # the deterministic fetch stub marks doc_id % 5 == 0 as 404
    assert set(ledger[ledger["doc_id"] % 5 == 0]["status"]) == {404}


def test_query_runner_and_list(sf_dir, tmp_path, capsys):
    out = str(tmp_path / "q")
    summary = main(
        ["query", "agg_histogram", "--sf-dir", sf_dir, "--output", out]
    )
    assert summary["rows"] > 0
    assert pd.read_parquet(out)["n"].sum() > 0
    listing = main(["list"])
    assert listing["queries"] >= 250


def test_sql_front_door(sf_dir, tmp_path):
    """Ad-hoc SQL runs over the catalog views and sinks to parquet; the
    result matches the same aggregation done through pandas."""
    out = str(tmp_path / "sql_out")
    summary = main(
        [
            "sql",
            "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang",
            "--sf-dir",
            sf_dir,
            "--output",
            out,
        ]
    )
    assert summary["rows"] == 5
    got = pd.read_parquet(out).set_index("lang")["n"].to_dict()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert got == docs["lang"].value_counts().to_dict()
