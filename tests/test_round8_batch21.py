"""Differential twins for the round-8 batch-21 operators."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"

_DAY_US = 86_400_000_000


def _daily():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, epoch_us(ts) // {_DAY_US}, COUNT(*)
            FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    daily = defaultdict(dict)
    for et, d, y in rows:
        daily[et][d] = y
    return daily


def test_runs_test_twin(spark):
    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["agg_runs_test"](spark, SF).collect()}
    for et, series in _daily().items():
        days = sorted(series)
        ys = sorted(series.values())
        med = ys[math.ceil(len(ys) / 2) - 1]
        signs = [1 if series[d] > med else 0 for d in days if series[d] != med]
        n1 = sum(signs)
        n2 = len(signs) - n1
        r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        mu = 2.0 * n1 * n2 / (n1 + n2) + 1
        var = (
            2.0
            * n1
            * n2
            * (2.0 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        z = (r - mu) / math.sqrt(var)
        got = rows[et]
        assert got["n1"] == n1 and got["n2"] == n2
        assert got["n_runs"] == r
        assert abs(got["z"] - z) <= 1e-5


def test_durbin_watson_twin(spark):
    qs = all_queries()
    rows = {
        r["event_type"]: r for r in qs["agg_durbin_watson"](spark, SF).collect()
    }
    for et, series in _daily().items():
        days = sorted(series)
        n = len(days)
        sd = sum(days)
        sy = sum(series[d] for d in days)
        sdy = sum(d * series[d] for d in days)
        sdd = sum(d * d for d in days)
        slope = (n * sdy - sd * sy) / (n * sdd - sd * sd)
        es = [
            math.floor(
                (series[d] - (sy / n + slope * (d - sd / n))) * 1e6
            )
            for d in days
        ]
        num = sum((a - b) ** 2 for a, b in zip(es[1:], es))
        den = sum(e * e for e in es)
        got = rows[et]
        assert got["n_days"] == n
        assert abs(got["dw"] - num / den) <= 1e-5
        assert 0.0 <= got["dw"] <= 4.0  # DW's range by construction


def test_pii_report_twin(spark):
    qs = all_queries()
    rows = {
        r["source"]: r
        for r in qs["curation_pii_risk_report"](spark, SF).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"""SELECT doc_id, source, n_chars, text
            FROM read_parquet('{SF}/documents.parquet')"""
    ).fetchall()
    con.close()
    em = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ph = re.compile(r"\b\d{3}[- ]\d{3}[- ]\d{4}\b")
    ip = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for doc_id, src, n_chars, text in docs:
        if doc_id % 3 == 0:
            t = (
                f"{text} contact u{doc_id}@mail{doc_id % 7}.org or "
                f"555-01{doc_id % 10}-{doc_id % 10000:04d} "
                f"ip 10.0.{doc_id % 256}.1"
            )
        else:
            t = text
        e = len(em.findall(t))
        p = len(ph.findall(t))
        i = len(ip.findall(t))
        a = agg[src]
        a[0] += 1
        a[1] += 1 if e + p + i > 0 else 0
        a[2] += e
        a[3] += p
        a[4] += i
        a[5] += len(t)  # denominator = text actually scanned (post-salt)
    for src, (n, dw, e, p, i, ch) in agg.items():
        r = rows[src]
        assert r["n_docs"] == n
        assert r["docs_with_pii"] == dw
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (e, p, i)
        assert abs(r["pii_per_10k_chars"] - round((e + p + i) * 10000 / ch, 6)) <= 1e-9
        tier = "high" if dw * 100 > n * 50 else "medium" if dw * 100 > n * 10 else "low"
        assert r["risk_tier"] == tier
    # the doc_id % 3 salting makes every source 'medium' exposure here
    assert all(r["risk_tier"] == "medium" for r in rows.values())
