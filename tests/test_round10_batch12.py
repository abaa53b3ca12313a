"""Differential / property twins for round-10 batch 12."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_delong_twin(spark):
    """Replay DeLong end-to-end in pure Python: ψ placements by direct
    pairwise counting (the O(n²) definitional form the engine avoids)."""
    ev = _fetch(
        f"SELECT event_id, event_type, value"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    obs = []
    for eid, et, val in ev:
        a = math.floor(val * 1e6)
        h = int(hashlib.md5(f"{eid}:b".encode()).hexdigest()[:15], 16)
        b = a + (h % 100001 - 50000)
        obs.append((1 if et == "click" else 0, a, b))
    pos = [(a, b) for y, a, b in obs if y == 1]
    neg = [(a, b) for y, a, b in obs if y == 0]
    na_list, nb_list = sorted(a for a, _ in neg), sorted(b for _, b in neg)
    pa_list, pb_list = sorted(a for a, _ in pos), sorted(b for _, b in pos)
    import bisect

    def below2(sorted_vals, s):
        lo = bisect.bisect_left(sorted_vals, s)
        hi = bisect.bisect_right(sorted_vals, s)
        return 2 * lo + (hi - lo)

    def above2(sorted_vals, s):
        lo = bisect.bisect_left(sorted_vals, s)
        hi = bisect.bisect_right(sorted_vals, s)
        return 2 * (len(sorted_vals) - hi) + (hi - lo)

    pa2_pos = [(below2(na_list, a), below2(nb_list, b)) for a, b in pos]
    pa2_neg = [(above2(pa_list, a), above2(pb_list, b)) for a, b in neg]
    mp, mn = len(pos), len(neg)
    auc_a = sum(x for x, _ in pa2_pos) / (2 * mp * mn)
    auc_b = sum(x for _, x in pa2_pos) / (2 * mp * mn)
    # internal consistency: mean placement over negatives gives same AUC
    assert abs(sum(x for x, _ in pa2_neg) / (2 * mp * mn) - auc_a) < 1e-12

    def cov(pairs):
        m = len(pairs)
        sa = sum(x for x, _ in pairs)
        sb = sum(x for _, x in pairs)
        saa = sum(x * x for x, _ in pairs)
        sbb = sum(x * x for _, x in pairs)
        sab = sum(x * y for x, y in pairs)
        return (
            (m * saa - sa * sa) / (m * (m - 1)),
            (m * sbb - sb * sb) / (m * (m - 1)),
            (m * sab - sa * sb) / (m * (m - 1)),
        )

    vaa_p, vbb_p, vab_p = cov(pa2_pos)
    vaa_n, vbb_n, vab_n = cov(pa2_neg)
    var = (vaa_p + vbb_p - 2 * vab_p) / (4 * mn * mn * mp) + (
        vaa_n + vbb_n - 2 * vab_n
    ) / (4 * mp * mp * mn)
    z = abs(auc_a - auc_b) / math.sqrt(var)
    row = all_queries()["eval_auc_delong"](spark, SF).collect()[0]
    assert row["n_pos"] == mp and row["n_neg"] == mn
    assert row["auc_a_x1e6"] == math.floor(1e6 * auc_a)
    assert row["auc_b_x1e6"] == math.floor(1e6 * auc_b)
    assert abs(row["z_abs_x1e6"] - math.floor(1e6 * z)) <= 2
    assert row["significant"] == (row["z_abs_x1e6"] > 1_959_963)
    # B is A plus noise: its AUC cannot be materially better
    assert row["auc_b_x1e6"] <= row["auc_a_x1e6"] + 20_000


def test_pmi_pairs_twin(spark):
    docs = _fetch(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    )
    doc_words = {d: set(t.split(" ")) for d, t in docs}
    df = Counter()
    for ws in doc_words.values():
        df.update(ws)
    vocab = {
        w
        for w, _d in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    }
    pair_df = Counter()
    for ws in doc_words.values():
        kept = sorted(ws & vocab)
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                pair_df[(kept[i], kept[j])] += 1
    nd = len(doc_words)
    scored = []
    for (w1, w2), d12 in pair_df.items():
        if d12 < 5:
            continue
        pmi = math.floor(1e6 * math.log(d12 * nd / (df[w1] * df[w2])))
        scored.append((-pmi, w1, w2, d12))
    scored.sort()
    expect = [(w1, w2, d12, -neg) for neg, w1, w2, d12 in scored[:30]]
    rows = [
        (r["w1"], r["w2"], r["d12"], r["pmi_x1e6"])
        for r in all_queries()["text_pmi_pairs"](spark, SF).collect()
    ]
    assert rows == expect


def test_range_band_twin(spark):
    cents = [
        math.floor(p * 100)
        for (p,) in _fetch(
            f"SELECT o_totalprice FROM read_parquet('{SF}/orders.parquet')"
        )
    ]
    bands = [
        ("tier_0_50k", 0, 50_000_00),
        ("tier_50k_100k", 50_000_00, 100_000_00),
        ("tier_100k_200k", 100_000_00, 200_000_00),
        ("tier_200k_400k", 200_000_00, 400_000_00),
        ("tier_400k_up", 400_000_00, 10**15),
    ]
    expect = {}
    for name, lo, hi in bands:
        sel = [c for c in cents if lo <= c < hi]
        expect[name] = (len(sel), sum(sel))
    rows = {
        r["tier"]: (r["n_orders"], r["total_cents"])
        for r in all_queries()["join_range_band"](spark, SF).collect()
    }
    assert rows == expect
    assert sum(v[0] for v in rows.values()) == len(cents)  # total partition
