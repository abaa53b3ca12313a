"""Differential / property twins for round-10 batch 11."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.functions.text import STOPWORDS
from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_rake_twin(spark):
    docs = _fetch(
        f"SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    )
    stop = set(STOPWORDS)
    phrases = []  # (source, phrase) occurrences
    for src, text in docs:
        run = []
        for w in text.split(" ") + ["|"]:
            if w in stop or w == "|":
                if run:
                    phrases.append((src, " ".join(run)))
                run = []
            else:
                run.append(w)
    freq, deg = Counter(), Counter()
    for _src, p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    wscore = {w: math.floor(1e6 * deg[w] / freq[w]) for w in freq}
    pscore = {}
    occurrences = Counter(phrases)
    for (src, p), n in occurrences.items():
        pscore[(src, p)] = (n, sum(wscore[w] for w in p.split(" ")))
    top = defaultdict(list)
    for (src, p), (n, s) in pscore.items():
        top[src].append((-s, p, n))
    expect = {}
    for src, entries in top.items():
        entries.sort()
        expect[src] = [(p, n, -negs) for negs, p, n in entries[:5]]
    rows = defaultdict(list)
    for r in all_queries()["text_keyword_rake"](spark, SF).collect():
        rows[r["source"]].append((r["phrase"], r["n_occurrences"], r["score_x1e6"]))
    assert dict(rows) == expect
    # multi-word phrases must surface (degree rewards them) or RAKE
    # degenerated to word frequency
    assert any(" " in p for v in rows.values() for p, _n, _s in v)


def test_lorenz_twin(spark):
    lens = sorted(
        nc
        for (nc,) in _fetch(
            f"SELECT n_chars FROM read_parquet('{SF}/documents.parquet')"
        )
    )
    n, total = len(lens), sum(lens)
    rows = {
        r["decile"]: (r["n_docs_cut"], r["cum_chars"], r["share_x1e6"])
        for r in all_queries()["agg_lorenz_curve"](spark, SF).collect()
    }
    prev_share = -1
    for d in range(1, 11):
        k = d * n // 10
        cum = sum(lens[:k])
        assert rows[d] == (k, cum, 10**6 * cum // total)
        assert rows[d][2] >= prev_share
        prev_share = rows[d][2]
    # Lorenz curve lies under the diagonal (inequality exists)
    assert rows[5][2] <= 500_000
    assert rows[10][1] == total


def test_spectral_peak_twin(spark):
    daily = dict(
        _fetch(
            f"SELECT epoch_us(ts) // 86400000000, COUNT(*)"
            f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
        )
    )
    n = len(daily)
    sy = sum(daily.values())
    syy = sum(v * v for v in daily.values())
    mean = sy / n
    var = syy / n - mean * mean
    expect = {}
    for lag in range(1, 15):
        pairs = [(daily[d], daily[d - lag]) for d in daily if d - lag in daily]
        sxy = sum(a * b for a, b in pairs)
        r = (sxy / len(pairs) - mean * mean) / var
        expect[lag] = (len(pairs), math.floor(1e6 * r))
    peak = max(v[1] for lag, v in expect.items() if lag >= 2)
    rows = {
        r["lag"]: (r["n_pairs"], r["r_x1e6"], r["is_peak"])
        for r in all_queries()["ts_spectral_peak"](spark, SF).collect()
    }
    for lag, (np_, r_img) in expect.items():
        assert rows[lag] == (np_, r_img, lag >= 2 and r_img == peak)
    assert sum(1 for v in rows.values() if v[2]) >= 1


def test_quality_corr_twin(spark):
    docs = [
        t
        for (t,) in _fetch(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
        )
    ]
    stop = set(STOPWORDS)
    feats = []
    for t in docs:
        w = t.split(" ")
        feats.append((len(w), sum(1 for x in w if x in stop), len(set(w))))

    def pearson(i, j):
        n = len(feats)
        sx = sum(f[i] for f in feats)
        sy = sum(f[j] for f in feats)
        sxx = sum(f[i] * f[i] for f in feats)
        syy = sum(f[j] * f[j] for f in feats)
        sxy = sum(f[i] * f[j] for f in feats)
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    rows = {
        r["pair"]: r["pearson"]
        for r in all_queries()["dq_quality_corr_matrix"](spark, SF).collect()
    }
    assert abs(rows["n_tokens~n_stopwords"] - round(pearson(0, 1), 6)) <= 1e-6
    assert abs(rows["n_tokens~n_unique"] - round(pearson(0, 2), 6)) <= 1e-6
    assert abs(rows["n_stopwords~n_unique"] - round(pearson(1, 2), 6)) <= 1e-6
    # length-derived features must correlate strongly positively
    assert rows["n_tokens~n_unique"] > 0.5
