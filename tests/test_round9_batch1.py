"""Differential twins for the round-9 batch-1 operators — each op
recomputed in pure Python from the raw parquet (duckdb only as a reader)
and compared value-for-value at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _h15(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def test_mix_temperature_twin(spark):
    rows = {
        r["source"]: r
        for r in all_queries()["curation_mix_temperature"](spark, SF).collect()
    }
    sz = defaultdict(int)
    nd = defaultdict(int)
    for _id, _t, src, n_chars in _docs():
        sz[src] += n_chars
        nd[src] += 1
    total = sum(sz.values())
    imgs = {s: math.floor(math.exp(0.7 * math.log(v / total)) * 1e9) for s, v in sz.items()}
    zsum = sum(imgs.values())
    budget = 10_000_000
    for s in sz:
        r = rows[s]
        assert r["n_docs"] == nd[s]
        assert r["n_chars_total"] == sz[s]
        assert abs(r["p_natural"] - round(sz[s] / total, 6)) <= 1e-9
        assert abs(r["q_temp"] - round(imgs[s] / zsum, 6)) <= 1e-9
        assert abs(
            r["effective_epochs"] - round(imgs[s] / zsum * budget / sz[s], 6)
        ) <= 1e-9
    # weights are a distribution and temperature flattens: max natural share
    # >= max tempered share (tau < 1 moves mass toward small sources)
    assert abs(sum(r["q_temp"] for r in rows.values()) - 1.0) < 1e-4
    p = {s: sz[s] / total for s in sz}
    q = {s: imgs[s] / zsum for s in sz}
    assert max(q.values()) <= max(p.values()) + 1e-9


def test_doremi_twin(spark):
    rows = {
        r["source"]: r
        for r in all_queries()["curation_doremi_weights"](spark, SF).collect()
    }
    sp = defaultdict(int)
    sr = defaultdict(int)
    nd = defaultdict(int)
    for doc_id, _t, src, _n in _docs():
        sp[src] += _h15(f"{doc_id}:proxy", 4001)
        sr[src] += _h15(f"{doc_id}:ref", 3001)
        nd[src] += 1
    imgs = {
        s: math.floor(math.exp((sp[s] - sr[s]) / (nd[s] * 1000.0)) * 1e9)
        for s in nd
    }
    zsum = sum(imgs.values())
    for s in nd:
        r = rows[s]
        assert r["n_docs"] == nd[s]
        assert abs(r["avg_proxy_nats"] - round(sp[s] / (nd[s] * 1000.0), 6)) <= 1e-9
        assert abs(r["excess_nats"] - round((sp[s] - sr[s]) / (nd[s] * 1000.0), 6)) <= 1e-9
        assert abs(r["domain_weight"] - round(imgs[s] / zsum, 6)) <= 1e-9
    assert abs(sum(r["domain_weight"] for r in rows.values()) - 1.0) < 1e-4


def test_cartography_twin(spark):
    rows = {
        r["region"]: r
        for r in all_queries()["curation_cartography"](spark, SF).collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_s1, sum_var_img
    for doc_id, _t, _s, _n in _docs():
        hs = [_h15(f"{doc_id}#{k}", 1000) for k in range(5)]
        s1, s2 = sum(hs), sum(h * h for h in hs)
        var_num = 5 * s2 - s1 * s1
        if 16 * var_num >= 25 * 999 * 999:
            region = "ambiguous"
        elif 2 * s1 >= 4995:
            region = "easy"
        else:
            region = "hard"
        a = agg[region]
        a[0] += 1
        a[1] += s1
        a[2] += math.floor(math.sqrt(var_num) / 4995 * 1e6)
    assert set(rows) == set(agg)
    for region, (n, ss1, svar) in agg.items():
        r = rows[region]
        assert r["n_docs"] == n
        assert abs(r["avg_confidence"] - round(ss1 / (n * 4995.0), 6)) <= 1e-9
        assert abs(r["avg_variability"] - round(svar / (n * 1e6), 6)) <= 1e-9
    # region semantics: easy region's confidence must exceed hard's
    if "easy" in rows and "hard" in rows:
        assert rows["easy"]["avg_confidence"] > rows["hard"]["avg_confidence"]


def test_code_detect_twin(spark):
    import re

    rows = {
        r["source"]: r
        for r in all_queries()["text_code_detect"](spark, SF).collect()
    }
    sym_re = re.compile(r"[{}()\[\];=<>]")
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # n_docs, code, sym, n, kw
    for doc_id, text, src, _n in _docs():
        t = text
        if doc_id % 4 == 0:
            t = (
                f"{text} def f{doc_id}(x): return (x * {doc_id % 7});"
                f" // id={doc_id} {{arr[{doc_id % 5}]}};"
            )
        sym = len(sym_re.findall(t))
        kw = (" def " in t) + ("return" in t) + ("import " in t)
        n = len(t)
        a = agg[src]
        a[0] += 1
        a[1] += 1 if (40 * sym > n and kw >= 1) else 0
        a[2] += sym
        a[3] += n
        a[4] += kw
    for src, (ndocs, ncode, sym, n, kw) in agg.items():
        r = rows[src]
        assert r["n_docs"] == ndocs
        assert r["n_code_docs"] == ncode
        assert abs(r["sym_per_1k_chars"] - round(sym * 1000 / n, 6)) <= 1e-9
        assert r["kw_hits"] == kw
    # salting puts SOME code docs in the corpus (doc_id % 4 may correlate
    # with the source assignment, so per-source presence isn't guaranteed)
    assert sum(r["n_code_docs"] for r in rows.values()) > 0


def test_unicode_audit_twin(spark):
    import re

    rows = {
        r["source"]: r
        for r in all_queries()["dq_unicode_audit"](spark, SF).collect()
    }
    letters = re.compile("[A-Za-z]")
    digits = re.compile("[0-9]")
    nonascii = re.compile("[^\x00-\x7f]")
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])
    for doc_id, text, src, _n in _docs():
        t = text
        if doc_id % 5 == 0:
            t = text + " café 中文语料 naïve résumé" + (" ��" if doc_id % 10 == 0 else "")
        repl = t.count("�")
        a = agg[src]
        a[0] += 1
        a[1] += len(t)
        a[2] += len(letters.findall(t))
        a[3] += len(digits.findall(t))
        a[4] += len(nonascii.findall(t))
        a[5] += repl
        a[6] += 1 if repl > 0 else 0
    for src, (ndocs, n, al, dg, na, repl, moji) in agg.items():
        r = rows[src]
        assert r["n_docs"] == ndocs
        assert r["n_chars"] == n
        assert abs(r["ascii_letter_ratio"] - round(al / n, 6)) <= 1e-9
        assert abs(r["digit_ratio"] - round(dg / n, 6)) <= 1e-9
        assert abs(r["non_ascii_per_10k"] - round(na * 10000 / n, 6)) <= 1e-9
        assert r["replacement_chars"] == repl
        assert r["docs_with_mojibake"] == moji
    assert sum(r["replacement_chars"] for r in rows.values()) > 0
