"""Differential / property twins for round-10 batch 5 (agg_mcc,
eval_rouge_pairs, dedup_lsh_band_sweep, mm_audio_vad)."""

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


def test_mcc_twin(spark):
    """MCC recomputed from raw confusion counts in Python."""
    (n_tp, n_fp, n_fn, n_tn), = _fetch(
        f"""
        SELECT
          SUM(CASE WHEN value > 250 AND event_type = 'click' THEN 1 ELSE 0 END),
          SUM(CASE WHEN value > 250 AND event_type <> 'click' THEN 1 ELSE 0 END),
          SUM(CASE WHEN value <= 250 AND event_type = 'click' THEN 1 ELSE 0 END),
          SUM(CASE WHEN value <= 250 AND event_type <> 'click' THEN 1 ELSE 0 END)
        FROM read_parquet('{SF}/events.parquet')
        """
    )
    row = all_queries()["agg_mcc"](spark, SF).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (
        n_tp, n_fp, n_fn, n_tn,
    )
    mcc = (n_tp * n_tn - n_fp * n_fn) / math.sqrt(
        (n_tp + n_fp) * (n_tp + n_fn) * (n_tn + n_fp) * (n_tn + n_fn)
    )
    assert abs(row["mcc"] - round(mcc, 6)) <= 1e-6
    assert -1.0 <= row["mcc"] <= 1.0


def _grams(words, n):
    return Counter(
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    )


def test_rouge_pairs_twin(spark):
    """Brute-force ROUGE-1/2 over the sampled adjacent pairs."""
    texts = dict(
        _fetch(f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')")
    )
    expect = {}
    for did, text in texts.items():
        if did % 10 != 5 or did + 1 not in texts:
            continue
        cw, rw = text.split(" "), texts[did + 1].split(" ")
        out = [did]
        for n in (1, 2):
            cg, rg = _grams(cw, n), _grams(rw, n)
            m = sum(min(c, rg[g]) for g, c in cg.items())
            ct, rt = sum(cg.values()), sum(rg.values())
            out += [m, ct, rt]
        expect[did] = tuple(out[1:])
    rows = all_queries()["eval_rouge_pairs"](spark, SF).collect()
    assert {r["doc_id"] for r in rows} == set(expect)
    for r in rows:
        m1, ct1, rt1, m2, ct2, rt2 = expect[r["doc_id"]]
        assert (
            r["match1"], r["ctotal1"], r["rtotal1"],
            r["match2"], r["ctotal2"], r["rtotal2"],
        ) == (m1, ct1, rt1, m2, ct2, rt2)
        assert r["rouge1_f_x1e6"] == 2_000_000 * m1 // (ct1 + rt1)
        exp2 = 0 if ct2 + rt2 == 0 else 2_000_000 * m2 // (ct2 + rt2)
        assert r["rouge2_f_x1e6"] == exp2
        # F1 bounded by min of the two one-sided rates
        assert 0 <= r["rouge1_f_x1e6"] <= 1_000_000


def test_lsh_band_sweep_twin(spark):
    """Brute-force the bucket census per banding config from minhash
    signatures recomputed in pure Python (same pinned constants)."""
    from sdg_data_catalog_spark.functions.hashing import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_K,
        MINHASH_P,
    )

    docs = _fetch(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    )
    corpus = [(d, t) for d, t in docs] + [
        (d + 1_000_000, t.split(" ", 1)[1] if " " in t else "")
        for d, t in docs
    ]
    sigs = {}
    for did, text in corpus:
        w = text.split(" ")
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        if not sh:
            continue
        xs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
            for s in sh
        ]
        sigs[did] = [
            min((MINHASH_A[i] * x + MINHASH_B[i]) % MINHASH_P for x in xs)
            for i in range(MINHASH_K)
        ]
    rows = {
        (r["cfg_bands"], r["cfg_rows"]): (
            r["n_hot_buckets"], r["n_candidate_pairs"], r["max_bucket"],
        )
        for r in all_queries()["dedup_lsh_band_sweep"](spark, SF).collect()
    }
    assert set(rows) == {(16, 1), (8, 2), (4, 4)}
    for b in (16, 8, 4):
        r = MINHASH_K // b
        buckets = Counter()
        for sig in sigs.values():
            for bi in range(b):
                key = (bi, tuple(sig[bi * r : bi * r + r]))
                buckets[key] += 1
        hot = sum(1 for n in buckets.values() if n >= 2)
        pairs = sum(n * (n - 1) // 2 for n in buckets.values())
        assert rows[(b, r)] == (hot, pairs, max(buckets.values()))
    # monotone S-curve sanity: wider rows => stricter => fewer candidates
    assert rows[(16, 1)][1] >= rows[(8, 2)][1] >= rows[(4, 4)][1]


def test_audio_vad_twin(spark):
    """Replay VAD locally through the real codec path for every clip,
    including the run-length boundary logic."""
    import numpy as np

    from sdg_data_catalog_spark.operators.audiocodec import (
        wav_decode,
        wav_encode,
    )
    from sdg_data_catalog_spark.operators.multimodal import synthetic_samples

    rows = {
        r["media_id"]: (
            r["n_windows"], r["n_active"], r["max_run"], r["n_segments"],
        )
        for r in all_queries()["mm_audio_vad"](spark, SF).collect()
    }
    assert len(rows) == 500
    for did in rows:
        back, _ = wav_decode(wav_encode(synthetic_samples(did)))
        s = back.astype(np.int64)
        nw = (len(s) + 31) // 32
        active = [
            int((s[w * 32 : (w + 1) * 32] ** 2).sum()) >= 160_000
            for w in range(nw)
        ]
        max_run = n_seg = cur = 0
        for a in active:
            cur = cur + 1 if a else 0
            n_seg += int(a and cur == 1)
            max_run = max(max_run, cur)
        assert rows[did] == (nw, sum(active), max_run, n_seg)
    # both flag values must actually occur somewhere, or the threshold
    # gives the op nothing to detect
    assert any(v[1] > 0 for v in rows.values())
    assert any(v[1] < v[0] for v in rows.values())
