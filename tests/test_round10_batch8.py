"""Differential / property twins for round-10 batch 8."""

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


def test_lsh_recall_eval_twin(spark):
    """Recompute BOTH pair sets in pure Python (pinned minhash constants
    for candidates, shingle Jaccard for truth) and check all five
    numbers."""
    from sdg_data_catalog_spark.functions.hashing import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_A,
        MINHASH_B,
        MINHASH_K,
        MINHASH_P,
    )

    docs = _fetch(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    )
    corpus = [(d, t) for d, t in docs] + [
        (d + 1_000_000, t.split(" ", 1)[1] if " " in t else "") for d, t in docs
    ]
    shingle_sets, sigs = {}, {}
    for did, text in corpus:
        w = text.split(" ")
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        if not sh:
            continue
        shingle_sets[did] = sh
        xs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
            for s in sh
        ]
        sigs[did] = [
            min((MINHASH_A[i] * x + MINHASH_B[i]) % MINHASH_P for x in xs)
            for i in range(MINHASH_K)
        ]
    buckets = defaultdict(list)
    for did, sig in sigs.items():
        for b in range(LSH_BANDS):
            buckets[(b, tuple(sig[b * LSH_ROWS : (b + 1) * LSH_ROWS]))].append(did)
    cand = set()
    for members in buckets.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    inv = defaultdict(set)
    for did, sh in shingle_sets.items():
        for s in sh:
            inv[s].add(did)
    common = Counter()
    for owners in inv.values():
        o = sorted(owners)
        for i in range(len(o)):
            for j in range(i + 1, len(o)):
                common[(o[i], o[j])] += 1
    truth = {
        p
        for p, c in common.items()
        if c / (len(shingle_sets[p[0]]) + len(shingle_sets[p[1]]) - c) >= 0.6
    }
    hits = truth & cand
    row = all_queries()["curation_lsh_recall_eval"](spark, SF).collect()[0]
    assert row["n_true"] == len(truth)
    assert row["n_candidates"] == len(cand)
    assert row["n_hits"] == len(hits)
    assert row["recall_x1e6"] == (
        10**6 * len(hits) // len(truth) if truth else 0
    )
    assert row["precision_x1e6"] == (
        10**6 * len(hits) // len(cand) if cand else 0
    )
    # the planted near-dups are what LSH exists to find
    assert row["n_true"] > 0 and row["recall_x1e6"] > 0


def test_cdc_compact_twin(spark):
    ev = _fetch(
        f"SELECT user_id, event_type, event_id, ts, value"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    latest, counts = {}, Counter()
    for uid, et, eid, ts, val in ev:
        key = (uid, et)
        counts[key] += 1
        img = math.floor(val * 1e6)
        if key not in latest or (ts, eid) > latest[key][:2]:
            latest[key] = (ts, eid, img)
    rows = {
        (r["user_id"], r["event_type"]): (
            r["n_versions"], r["last_event_id"], r["last_value_x1e6"], r["is_live"],
        )
        for r in all_queries()["etl_cdc_compact"](spark, SF).collect()
    }
    assert set(rows) == set(latest)
    for key, (_ts, eid, img) in latest.items():
        assert rows[key] == (counts[key], eid, img, img >= 100_000_000)
    # both live keys and tombstones must occur for the flag to mean much
    assert any(v[3] for v in rows.values())
    assert any(not v[3] for v in rows.values())


def test_neyman_allocation_twin(spark):
    docs = _fetch(
        f"SELECT source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    )
    strata = defaultdict(list)
    for src, nc in docs:
        strata[src].append(nc)
    weights = {}
    for src, xs in strata.items():
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        weights[src] = n * math.sqrt((n * s2 - s1 * s1) / (n * n))
    tw = sum(weights.values())
    raw = {s: 1000 * w / tw for s, w in weights.items()}
    base = {s: math.floor(v) for s, v in raw.items()}
    rem = sorted(
        ((math.floor(1e9 * (raw[s] - base[s])), s) for s in raw),
        key=lambda t: (-t[0], t[1]),
    )
    shortfall = 1000 - sum(base.values())
    alloc = dict(base)
    for _img, s in rem[:shortfall]:
        alloc[s] += 1
    rows = {
        r["source"]: (r["n_h"], r["base"], r["n_alloc"])
        for r in all_queries()["sample_neyman_allocation"](spark, SF).collect()
    }
    assert set(rows) == set(strata)
    for s in strata:
        assert rows[s] == (len(strata[s]), base[s], alloc[s])
    assert sum(v[2] for v in rows.values()) == 1000


def test_freshness_sla_twin(spark):
    ev = _fetch(
        f"SELECT event_type, epoch_us(ts) FROM read_parquet('{SF}/events.parquet')"
    )
    last, counts = {}, Counter()
    for et, us in ev:
        counts[et] += 1
        last[et] = max(last.get(et, 0), us)
    wm = max(last.values())
    rows = {
        r["event_type"]: (r["n_events"], r["lag_micros"], r["within_sla"])
        for r in all_queries()["dq_freshness_sla"](spark, SF).collect()
    }
    assert set(rows) == set(last)
    for et in last:
        lag = wm - last[et]
        assert rows[et] == (counts[et], lag, lag <= 24 * 3600 * 1_000_000)
