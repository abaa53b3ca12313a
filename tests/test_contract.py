"""Driver-contract conformance: entry() runs, every query runs, every oracle
matches DuckDB on sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from sdg_data_catalog_spark.oracle_check import compare
from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable, non-empty schema


def _params():
    qs = all_queries()
    return sorted(qs)


@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qs, oracles = all_queries(), all_oracles()
    df = qs[name](spark, sf_dir)
    if name not in oracles:
        # rows-only contract: runs and has a stable schema
        assert df.columns
        df.count()
        return
    err = compare(name, df, oracles[name], duck)
    assert err is None, f"{name}: {err}"
