"""Differential / property twins for round-10 batch 18."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_crosstab_residuals_twin(spark):
    docs = _fetch(
        f"SELECT source, lang FROM read_parquet('{SF}/documents.parquet')"
    )
    cell = Counter(docs)
    row_n, col_n = Counter(), Counter()
    for (s, l), o in cell.items():
        row_n[s] += o
        col_n[l] += o
    n = sum(cell.values())
    rows = {
        (r["source"], r["lang"]): (r["o"], r["resid_x1e3"], r["notable"])
        for r in all_queries()["agg_crosstab_residuals"](spark, SF).collect()
    }
    assert set(rows) == set(cell)
    for (s, l), o in cell.items():
        e = row_n[s] * col_n[l] / n
        r = math.floor(1000.0 * (o - e) / math.sqrt(e))
        assert rows[(s, l)] == (o, r, abs(r) > 2000)
    # residuals over the whole table are centered: both signs occur
    signs = {r[1] > 0 for r in rows.values()}
    assert signs == {True, False}


def test_balanced_downsample_twin(spark):
    docs = _fetch(
        f"SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')"
    )
    per_lang = defaultdict(list)
    for did, lang in docs:
        per_lang[lang].append(did)
    m = min(len(v) for v in per_lang.values())
    rows = {
        r["lang"]: (r["n_kept"], r["kept_id_sum"], r["kept_checksum"])
        for r in all_queries()["sample_balanced_downsample"](spark, SF).collect()
    }
    assert set(rows) == set(per_lang)
    for lang, ids in per_lang.items():
        kept = sorted(
            ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )[:m]
        chk = sum(
            int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
            % 1_000_000_007
            for d in kept
        )
        assert rows[lang] == (m, sum(kept), chk)
    # every language lands on exactly the same count: balanced by design
    assert len({v[0] for v in rows.values()}) == 1
