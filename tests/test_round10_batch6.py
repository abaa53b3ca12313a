"""Differential / property twins for round-10 batch 6."""

from __future__ import annotations

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


def test_simpson_diversity_twin(spark):
    docs = _fetch(
        f"SELECT lang, text FROM read_parquet('{SF}/documents.parquet')"
    )
    per_lang = defaultdict(Counter)
    for lang, text in docs:
        per_lang[lang].update(text.split(" "))
    rows = {
        r["lang"]: (r["n_tokens"], r["n_types"], r["simpson_x1e9"])
        for r in all_queries()["agg_simpson_diversity"](spark, SF).collect()
    }
    assert set(rows) == set(per_lang)
    for lang, c in per_lang.items():
        n = sum(c.values())
        num = sum(v * (v - 1) for v in c.values())
        assert rows[lang] == (n, len(c), 10**9 * num // (n * (n - 1)))


def test_lambda_sweep_twin(spark):
    """Sequential replay of the held-out JM sweep; also pins that the
    flagged winner maximizes the summed log-score."""
    docs = dict(
        _fetch(f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')")
    )
    c2, c1 = Counter(), Counter()
    for did, text in docs.items():
        if did % 2 != 0:
            continue
        w = text.split(" ")
        c1.update(w)
        c2.update(zip(w, w[1:]))
    nn, vv = float(sum(c1.values())), float(len(c1))
    sums = {lx: 0 for lx in (2, 4, 6, 8)}
    n_scored = 0
    for did, text in docs.items():
        if did % 2 != 1:
            continue
        w = text.split(" ")
        for bg in zip(w, w[1:]):
            n_scored += 1
            ca, cb = c1[bg[0]], c1[bg[1]]
            for lx in sums:
                p = (lx / 10.0) * ((c2[bg] / ca) if ca > 0 else 0.0) + (
                    (10 - lx) / 10.0
                ) * (cb + 1) / (nn + vv)
                sums[lx] += math.floor(1e6 * math.log(p))
    rows = {
        r["lambda_x10"]: (r["n_scored"], r["sum_logp_x1e6"], r["is_best"])
        for r in all_queries()["lm_lambda_sweep"](spark, SF).collect()
    }
    best = max(sums.values())
    for lx, s in sums.items():
        assert rows[lx] == (n_scored, s, int(s == best))
    assert sum(v[2] for v in rows.values()) >= 1


def test_krippendorff_twin(spark):
    """Replay alpha from raw ratings; also pins the closed-form identity
    against the definitional coincidence-matrix computation."""
    vals = [
        v
        for (v,) in _fetch(
            f"SELECT value FROM read_parquet('{SF}/events.parquet')"
        )
    ]

    def rate(v, s):
        if v < 100 + s:
            return "view"
        if v < 200 + s:
            return "click"
        if v < 300 + s:
            return "signup"
        if v < 400 + s:
            return "purchase"
        return "error"

    units = [(rate(v, 0), rate(v, 50), rate(v, -50)) for v in vals]
    n = len(units)
    ssq = sum(
        sum(Counter(u)[c] ** 2 for c in set(u)) for u in units
    )
    s_c = Counter()
    for u in units:
        s_c.update(u)
    alpha_closed = 1 - ((9 * n - ssq) * (3 * n - 1)) / (
        2 * (9 * n * n - sum(v * v for v in s_c.values()))
    )
    row = all_queries()["eval_krippendorff_alpha"](spark, SF).collect()[0]
    assert row["n"] == n
    assert row["sum_ssq"] == ssq
    assert row["do_num2"] == 9 * n - ssq
    assert abs(row["alpha"] - round(alpha_closed, 6)) <= 1e-6
    assert -1.0 <= row["alpha"] <= 1.0


def test_hhi_twin(spark):
    rev = _fetch(
        f"""
        SELECT s.s_nationkey, l.l_suppkey,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1e6)
                        AS BIGINT)) AS r
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/supplier.parquet') s
          ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
        """
    )
    names = dict(
        _fetch(
            f"SELECT n_nationkey, n_name FROM read_parquet('{SF}/nation.parquet')"
        )
    )
    per_nation = defaultdict(list)
    for nk, _sk, r in rev:
        per_nation[names[nk]].append(r)
    rows = {
        r["nation"]: (r["n_suppliers"], r["rev_total_micro"], r["hhi"])
        for r in all_queries()["agg_hhi_concentration"](spark, SF).collect()
    }
    assert set(rows) == set(per_nation)
    for nation, revs in per_nation.items():
        tot = sum(revs)
        hhi = sum(v * v for v in revs) / (float(tot) * float(tot))
        got = rows[nation]
        assert got[0] == len(revs)
        assert got[1] == float(tot)
        assert abs(got[2] - round(hhi, 9)) <= 1e-9
        # HHI of n equal shares is 1/n — the floor for any split
        assert got[2] >= 1.0 / len(revs) - 1e-9
