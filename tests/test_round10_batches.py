"""Differential / property twins for the round-10 operator batches."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _docs(cols="doc_id, text, source"):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {cols} FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _h15(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def test_pack_sequences_twin(spark):
    """Single-threaded replay of concat-and-split packing: the two-level
    block cumsum must equal the sequential prefix sum exactly."""
    rows = sorted(_docs())
    cum = 0
    per_source = defaultdict(lambda: [0, 0, 0])  # docs, tokens, split
    for _doc_id, text, source in rows:
        nt = len(text.split(" "))
        start, end = cum, cum + nt
        cum = end
        st = per_source[source]
        st[0] += 1
        st[1] += nt
        st[2] += int(start // 256 != (end - 1) // 256)
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["n_split_docs"])
        for r in (
            all_queries()["plan_pack_sequences"](spark, SF).collect()
        )
    }
    assert got == {s: tuple(v) for s, v in per_source.items()}


def test_elo_batched_recovers_skill_gradient(spark):
    """The synthetic tournament gives higher model ids a win-rate edge
    (+60 per id step); batched Elo must recover the exact id ordering."""
    rows = all_queries()["eval_elo_batched"](spark, SF).collect()
    by_model = {r["model"]: (r["rating_x1e6"], r["rank"]) for r in rows}
    assert len(by_model) == 6
    ratings = [by_model[m][0] for m in range(6)]
    assert ratings == sorted(ratings), "rating must increase with model id"
    assert [by_model[m][1] for m in range(6)] == [6, 5, 4, 3, 2, 1]


def test_plackett_luce_recovers_skill_gradient(spark):
    """Same ground-truth property for the 3-way ranking fit."""
    rows = all_queries()["rank_plackett_luce"](spark, SF).collect()
    by_model = {r["model"]: (r["strength_x1e6"], r["rank"]) for r in rows}
    strengths = [by_model[m][0] for m in range(6)]
    assert strengths == sorted(strengths)
    assert [by_model[m][1] for m in range(6)] == [6, 5, 4, 3, 2, 1]


def test_elo_batched_is_epoch_order_free():
    """The defining property of BATCHED Elo: within an epoch, the update
    depends only on per-pair match counts, never on match order. Replay
    the update from shuffled match lists and compare."""
    import random

    matches = [(e % 3, (h := _h15(f"{i}:m", 30)) % 6, h // 6 % 5, i % 2)
               for e, i in ((i % 3, i) for i in range(500))]
    matches = [(e, a, (a + 1 + b) % 6, w) for e, a, b, w in matches]

    def run(ms):
        r = [1000.0] * 6
        for epoch in range(3):
            delta = [0] * 6
            for e, a, b, w in ms:
                if e != epoch:
                    continue
                ea = 1 / (1 + 10 ** ((r[b] - r[a]) / 400))
                import math

                ta = math.floor(1e9 * (1 - ea)) if w else math.floor(-1e9 * ea)
                eb = 1 / (1 + 10 ** ((r[a] - r[b]) / 400))
                tb = math.floor(1e9 * (1 - eb)) if not w else math.floor(-1e9 * eb)
                delta[a] += ta
                delta[b] += tb
            r = [r[m] + 16 * delta[m] / 1e9 for m in range(6)]
        return r

    base = run(matches)
    for seed in (1, 2, 3):
        shuffled = matches[:]
        random.Random(seed).shuffle(shuffled)
        assert run(shuffled) == base


def test_wav_stats_twin(spark):
    """Recompute the PCM stats locally through the REAL codec path
    (encode → decode → stats) for a sample of docs."""
    import numpy as np

    from sdg_data_catalog_spark.operators.audiocodec import wav_decode, wav_encode
    from sdg_data_catalog_spark.operators.multimodal import synthetic_samples

    rows = {
        r["media_id"]: (r["n_samples"], r["sum_sq"], r["peak_abs"])
        for r in all_queries()["mm_wav_stats"](spark, SF).collect()
    }
    for did in (0, 1, 63, 250, 499):
        back, _ = wav_decode(wav_encode(synthetic_samples(did)))
        s = back.astype(np.int64)
        assert rows[did] == (len(s), int((s * s).sum()), int(np.abs(s).max()))


def test_substring_spans_twin(spark):
    """Brute-force shingle census over the raw parquet."""
    docs = _docs("doc_id, text")
    owners = defaultdict(set)
    per_doc = {}
    for doc_id, text in docs:
        w = text.split(" ")
        shingles = [" ".join(w[i : i + 8]) for i in range(len(w) - 7)]
        if not shingles:
            continue
        per_doc[doc_id] = shingles
        for s in set(shingles):
            owners[s].add(doc_id)
    expect = {
        d: (len(sh), sum(1 for s in sh if len(owners[s]) > 1))
        for d, sh in per_doc.items()
    }
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup_shingles"])
        for r in all_queries()["dedup_substring_spans"](spark, SF).collect()
    }
    assert got == expect


def test_submodular_facility_is_greedy_optimal_per_step(spark):
    """Replay the greedy brute-force: at every step the chosen candidate
    must have the maximal marginal gain (ties to the smaller id), and
    the reported running coverage must match."""
    docs = _docs("doc_id, text")
    words = {d: set(t.split(" ")) for d, t in docs}
    cands = [d for d in words if d < 320 and d % 20 == 0]
    ov = {
        (d, c): len(words[d] & words[c])
        for d in words
        for c in cands
        if words[d] & words[c]
    }
    cov = defaultdict(int)
    chosen, expect = set(), []
    for _step in range(3):
        gains = {}
        for c in cands:
            if c in chosen:
                continue
            gains[c] = sum(
                max(ov.get((d, c), 0) - cov[d], 0) for d in words
            )
        best = max(gains, key=lambda c: (gains[c], -c))
        chosen.add(best)
        for d in words:
            cov[d] = max(cov[d], ov.get((d, best), 0))
        expect.append((best, gains[best], sum(cov.values())))
    rows = all_queries()["curation_submodular_facility"](spark, SF).collect()
    got = [(r["chosen"], r["gain"], r["total_cov"]) for r in rows]
    assert got == expect


def test_chao1_and_good_turing_twins(spark):
    """Frequency-of-frequencies identities recomputed from raw counts."""
    import math

    docs = _docs("lang, text")
    wc = Counter()
    for lang, text in docs:
        for w in text.split(" "):
            wc[(lang, w)] += 1
    fof = Counter()
    for (lang, _w), c in wc.items():
        fof[(lang, c)] += 1
    langs = sorted({lang for lang, _ in wc})
    chao = {
        r["lang"]: (r["d_distinct"], r["f1"], r["f2"], r["chao1_x1000"])
        for r in all_queries()["agg_chao1_richness"](spark, SF).collect()
    }
    for lang in langs:
        d = sum(v for (lg, _), v in fof.items() if lg == lang)
        f1, f2 = fof.get((lang, 1), 0), fof.get((lang, 2), 0)
        c1000 = math.floor(1000 * (d + f1 * (f1 - 1) / (2 * (f2 + 1))))
        assert chao[lang] == (d, f1, f2, c1000), lang
    gt = all_queries()["agg_good_turing"](spark, SF).collect()
    for r in gt:
        lang, rr = r["lang"], r["r"]
        fr = fof[(lang, rr)]
        fr1 = fof.get((lang, rr + 1), 0)
        assert r["f_r"] == fr and r["f_r1"] == fr1
        assert r["rstar_x1e6"] == math.floor(1e6 * (rr + 1) * fr1 / fr)


def test_maxsim_is_true_maxsim(spark):
    """Brute-force MaxSim for one query over a doc sample."""
    docs = dict((d, t) for d, t, _ in _docs())

    def emb(w):
        return [
            _h15(f"{w}:e{k}", 1000) - 500 for k in range(8)
        ]

    q_tokens = ("data", "query", "filter", "join")
    rows = [
        r
        for r in all_queries()["sim_maxsim_late_interaction"](spark, SF).collect()
        if r["qid"] == 0
    ]
    assert len(rows) == 10
    for r in rows[:3]:
        text_words = set(docs[r["doc_id"]].split(" "))
        score = 0
        for t in q_tokens:
            et = emb(t)
            score += max(
                sum(a * b for a, b in zip(et, emb(w))) for w in text_words
            )
        assert score == r["maxsim"]


def test_bleu_pairs_twin(spark):
    """Reference BLEU-2 implementation over the sampled pairs."""
    import math

    docs = dict((d, t) for d, t, _ in _docs())
    rows = all_queries()["eval_bleu_pairs"](spark, SF).collect()
    assert rows, "sample rule must select pairs"
    for r in rows[:5]:
        cand = docs[r["doc_id"]].split(" ")
        ref = docs[r["doc_id"] + 1].split(" ")
        out = {}
        for n in (1, 2):
            cg = Counter(
                " ".join(cand[i : i + n]) for i in range(len(cand) - n + 1)
            )
            rg = Counter(
                " ".join(ref[i : i + n]) for i in range(len(ref) - n + 1)
            )
            clipped = sum(min(c, rg.get(g, 0)) for g, c in cg.items())
            out[n] = (clipped, sum(cg.values()))
        assert (r["match1"], r["total1"]) == out[1]
        assert (r["match2"], r["total2"]) == out[2]
        if out[1][0] and out[2][0]:
            bp = min(0.0, 1.0 - len(ref) / len(cand))
            expect = math.floor(
                1e6
                * math.exp(
                    bp
                    + 0.5
                    * (
                        math.log(out[1][0] / out[1][1])
                        + math.log(out[2][0] / out[2][1])
                    )
                )
            )
            assert r["bleu2_x1e6"] == expect


def test_editdistance_blocked_finds_all_ed1_pairs(spark):
    """Brute-force completeness: the deletion-neighborhood join must find
    EVERY vocabulary pair at edit distance 1 (the pigeonhole-style
    guarantee of FastSS blocking), and nothing else."""

    def ed1(u, v):
        if abs(len(u) - len(v)) > 1 or u == v:
            return False
        if len(u) == len(v):
            return sum(a != b for a, b in zip(u, v)) == 1
        s, t = (u, v) if len(u) < len(v) else (v, u)
        for i in range(len(t)):
            if t[:i] + t[i + 1 :] == s:
                return True
        return False

    vocab = sorted({w for _d, t, _s in _docs() for w in t.split(" ")})
    expect = {
        (u, v)
        for i, u in enumerate(vocab)
        for v in vocab[i + 1 :]
        if ed1(u, v)
    }
    rows = all_queries()["join_editdistance_blocked"](spark, SF).collect()
    got = {(r["word_a"], r["word_b"]) for r in rows}
    assert got == expect
    assert all(r["dist"] == 1 for r in rows)


def test_zipf_fit_twin(spark):
    """OLS replay over the floored-log rank/frequency images."""
    import math

    wc = Counter()
    for lang, text in _docs("lang, text"):
        for w in text.split(" "):
            wc[(lang, w)] += 1
    by_lang = defaultdict(list)
    for (lang, w), c in wc.items():
        by_lang[lang].append((c, w))
    rows = {
        r["lang"]: (r["n"], r["slope_x1e6"], r["intercept_x1e6"])
        for r in all_queries()["agg_zipf_fit"](spark, SF).collect()
    }
    for lang, counts in by_lang.items():
        top = sorted(counts, key=lambda t: (-t[0], t[1]))[:30]
        pts = [
            (
                math.floor(1e6 * math.log(r + 1)),
                math.floor(1e6 * math.log(c)),
            )
            for r, (c, _w) in enumerate(top)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = math.floor(1e6 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
        intercept = math.floor((sy - slope * sx / 1e6) / n)
        assert rows[lang] == (n, slope, intercept), lang
