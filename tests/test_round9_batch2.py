"""Differential twins for the round-9 batch-2 operators."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _h15(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_pass_at_k_twin(spark):
    rows = {
        r["task_id"]: r for r in all_queries()["eval_pass_at_k"](spark, SF).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for doc_id, _t, _s in _docs():
        task = doc_id % 40
        ok = _h15(f"{doc_id}:pass", 100) < 10 + task * 7 % 60
        agg[task][0] += 1
        agg[task][1] += 1 if ok else 0
    for task, (n, c) in agg.items():
        r = rows[task]
        assert (r["n"], r["c"]) == (n, c)
        assert abs(r["pass_at_1"] - round(c / n, 6)) <= 1e-9
        if c == 0:
            exp5 = 0.0
        elif n - c < 5:
            exp5 = 1.0
        else:
            prod = 1.0
            for i in range(5):
                prod *= (n - c - i) / (n - i)
            exp5 = round(1.0 - prod, 6)
        assert abs(r["pass_at_5"] - exp5) <= 1e-9
        # estimator sanity: pass@5 >= pass@1 always
        assert r["pass_at_5"] >= r["pass_at_1"] - 1e-9


def test_bradley_terry_twin(spark):
    rows = {
        r["model"]: r for r in all_queries()["rank_bradley_terry"](spark, SF).collect()
    }
    con = duckdb.connect()
    ids = [
        e
        for (e,) in con.execute(
            f"SELECT event_id FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    con.close()
    pairs = defaultdict(lambda: [0, 0])  # (i,j) -> [n, w_i]
    for e in ids:
        a, b = e % 6, (e // 6) % 6
        if a == b:
            continue
        a_wins = _h15(f"{e}:bt", 1000) < 500 + 60 * (a - b)
        i, j = min(a, b), max(a, b)
        pairs[(i, j)][0] += 1
        pairs[(i, j)][1] += 1 if (a_wins if a < b else not a_wins) else 0
    wins = defaultdict(lambda: [0, 0])
    for (i, j), (n, wi) in pairs.items():
        wins[i][0] += wi
        wins[i][1] += n
        wins[j][0] += n - wi
        wins[j][1] += n
    g = dict.fromkeys(wins, 1.0)
    for _ in range(3):
        d = defaultdict(int)
        for (i, j), (n, _wi) in pairs.items():
            d[i] += math.floor(n / (g[i] + g[j]) * 1e9)
            d[j] += math.floor(n / (g[j] + g[i]) * 1e9)
        g = {m: wins[m][0] * 1e9 / d[m] for m in wins}
    imgs = {m: math.floor(g[m] * 1e9) for m in g}
    zsum = sum(imgs.values())
    for m in wins:
        r = rows[f"m{m}"]
        assert (r["games"], r["wins"]) == (wins[m][1], wins[m][0])
        assert abs(r["bt_score"] - round(imgs[m] / zsum, 6)) <= 1e-9
        rank = 1 + sum(
            1
            for o in imgs
            if imgs[o] > imgs[m] or (imgs[o] == imgs[m] and o < m)
        )
        assert r["rank"] == rank
    # skill gradient was built in: the strongest model id should outrank
    # the weakest by fitted score
    assert rows["m5"]["bt_score"] > rows["m0"]["bt_score"]


def test_blocking_keys_twin(spark):
    out = all_queries()["dedup_blocking_keys"](spark, SF).collect()
    blocks = defaultdict(list)
    for doc_id, text, _s in _docs():
        key = " ".join(sorted(set(text.split(" ")))[:5])
        blocks[key].append(doc_id)
    expect = sorted(
        (
            (k, len(v), min(v), len(v) * (len(v) - 1) // 2)
            for k, v in blocks.items()
            if len(v) >= 2
        ),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    got = [
        (r["block_key"], r["n_docs"], r["min_doc_id"], r["candidate_pairs"])
        for r in out
    ]
    assert got == expect


def test_context_sweep_twin(spark):
    rows = {
        r["context_len"]: r
        for r in all_queries()["plan_context_length_sweep"](spark, SF).collect()
    }
    toks = [len(t.split(" ")) for _id, t, _s in _docs()]
    for L in (512, 2048, 8192):
        padded = sum((t + L - 1) // L for t in toks)
        total = sum(toks)
        r = rows[L]
        assert r["n_docs"] == len(toks)
        assert r["total_tokens"] == total
        assert r["seqs_padded"] == padded
        assert r["seqs_packed"] == (total + L - 1) // L
        assert abs(
            r["padding_waste_ratio"] - round(1.0 - total / (padded * L), 6)
        ) <= 1e-9
    # economics sanity: packing never needs more sequences than padding,
    # and padding waste grows with context length on fixed short docs
    assert rows[8192]["padding_waste_ratio"] >= rows[512]["padding_waste_ratio"]


def test_vocab_marginal_gain_twin(spark):
    out = all_queries()["agg_vocab_marginal_gain"](spark, SF).collect()
    first = {}
    sources = set()
    for _id, text, src in _docs():
        sources.add(src)
        for w in text.split(" "):
            if w not in first or src < first[w]:
                first[w] = src
    gain = defaultdict(int)
    for w, s in first.items():
        gain[s] += 1
    cum = 0
    expect = []
    for s in sorted(sources):
        cum += gain[s]
        expect.append((s, gain[s], cum))
    got = [(r["source"], r["new_types"], r["cumulative_types"]) for r in out]
    assert got == expect
    # diminishing returns: the first source contributes the most new types
    assert expect[0][1] == max(g for _s, g, _c in expect)
