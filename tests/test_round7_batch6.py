"""Twins for round-7 batch 6 (queries/round7_batch6.py) — pure-Python
differential recomputes. Oracle hashes are covered by test_contract.py.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def _events(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    return ev


def test_mg_heavy_hitters_exact(spark, sf_dir):
    out = all_queries()["sketch_mg_heavy_hitters"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts: Counter = Counter()
    for t in docs["text"]:
        counts.update(x for x in re.split(r"[^a-z]+", (t or "").lower()) if x)
    n = sum(counts.values())
    expect = sorted(
        ((tok, c) for tok, c in counts.items() if c * 200 > n),
        key=lambda kv: (-kv[1], kv[0]),
    )
    got = list(zip(out["token"], out["cnt"]))
    assert got == expect
    for r in out.itertuples():
        assert r.freq_ppm == r.cnt * 1_000_000 // n


def test_cumulative_distinct_matches_python(spark, sf_dir):
    out = all_queries()["win_cumulative_distinct"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev["day"] = ev["ts_us"] // 86_400_000_000
    seen: dict[str, set] = defaultdict(set)
    new_by_day: dict[tuple, int] = Counter()
    for r in ev.sort_values(["ts_us", "event_id"]).itertuples():
        if r.user_id not in seen[r.event_type]:
            seen[r.event_type].add(r.user_id)
            new_by_day[(r.event_type, r.day)] += 1
    for etype, grp in out.groupby("event_type"):
        grp = grp.sort_values("day")
        active_days = sorted(ev[ev["event_type"] == etype]["day"].unique())
        assert grp["day"].tolist() == active_days
        cum = 0
        for r in grp.itertuples():
            assert r.new_users == new_by_day.get((etype, r.day), 0)
            cum += r.new_users
            assert r.cum_distinct_users == cum
        assert cum == len(seen[etype])


def test_mann_whitney_matches_scipy_style(spark, sf_dir):
    import numpy as np

    out = all_queries()["agg_mann_whitney"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    img = np.floor(ev["value"].to_numpy() * 1e6).astype("int64")
    # average ranks over the pooled sample (1-based, ties share the mean)
    order = img.argsort(kind="stable")
    ranks = np.empty(len(img), dtype="float64")
    sorted_img = img[order]
    i = 0
    while i < len(sorted_img):
        j = i
        while j < len(sorted_img) and sorted_img[j] == sorted_img[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2  # mean of ranks i+1..j
        i = j
    n = len(img)
    _, tie_counts = np.unique(img, return_counts=True)
    ties = float((tie_counts.astype("float64") ** 3 - tie_counts).sum())
    for r in out.itertuples():
        mask = (ev["event_type"] == r.event_type).to_numpy()
        n1 = int(mask.sum())
        assert r.n1 == n1
        r1 = ranks[mask].sum()
        u = r1 - n1 * (n1 + 1) / 2
        assert abs(r.u - u) < 1e-6
        n2 = n - n1
        var = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
        z = (u - n1 * n2 / 2) / math.sqrt(var)
        assert abs(r.z - z) < 1e-5, (r.event_type, r.z, z)


def test_hdr_percentiles_bound_exact_percentiles(spark, sf_dir):
    import numpy as np

    out = all_queries()["agg_hdr_percentiles"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev = ev[ev["value"] > 0]
    for r in out.itertuples():
        vals = np.sort(
            np.floor(
                ev[ev["event_type"] == r.event_type]["value"].to_numpy() * 1e6
            ).astype("int64")
        )
        assert r.n == len(vals)
        for p, lo, hi in ((50, r.p50_lo, r.p50_hi), (90, r.p90_lo, r.p90_hi), (99, r.p99_lo, r.p99_hi)):
            target = vals[math.ceil(p * len(vals) / 100) - 1] / 1e6
            assert lo <= target < hi, (r.event_type, p, lo, target, hi)
            assert abs(hi - lo * 10) < 1e-9  # one decimal order of magnitude


def test_mg_fold_prune_path_high_vocab():
    """The production corpus's vocabulary (~dozens of tokens) never fills
    the 400-slot summary, so the prune branch only ever runs here: drive
    _mg_fold with a synthetic 5000-token vocabulary (heavy hitters + a
    long uniform tail, shuffled across batches) and check the two
    properties the operator relies on — the summary holds at most CAP
    entries, and every token with partition count > n_p/DENOM survives
    pruning (the pigeonhole guarantee phase 2 recounts against). Also
    pins the '' sentinel's exact partition total and equivalence with a
    reference dict-fold Misra-Gries."""
    import random

    from sdg_data_catalog_spark.queries.round7_batch6 import (
        _MG_CAP,
        _MG_DENOM,
        _mg_fold,
    )

    rng = random.Random(1234)
    stream: list[str] = []
    for i in range(20):  # heavy hitters: well above n/DENOM
        stream += [f"hot{i}"] * 1500
    for i in range(5000):  # long tail
        stream += [f"tail{i}"] * rng.randint(1, 8)
    rng.shuffle(stream)
    n = len(stream)
    # r15 _mg_fold input shape: per-DOC token arrays (plus the explode
    # edge cases: NULL array, empty array) instead of an exploded stream
    rows: list = [stream[i : i + 7] for i in range(0, n, 7)]
    rows.insert(3, None)
    rows.insert(9, [])
    batches = [
        pd.DataFrame({"toks": pd.Series(rows[i : i + 600], dtype=object)})
        for i in range(0, len(rows), 600)
    ]

    out = next(_mg_fold(iter(batches)))
    sentinel = out[out["token"] == ""]
    summary = out[out["token"] != ""]
    assert len(sentinel) == 1 and int(sentinel["c"].iloc[0]) == n
    assert len(summary) <= _MG_CAP
    survivors = set(summary["token"])
    true_counts = Counter(stream)
    for tok, c in true_counts.items():
        if c * _MG_DENOM > n:
            assert tok in survivors, f"heavy hitter {tok} ({c}) evicted"

    # reference dict-fold MG with identical merge/prune semantics
    counters: dict[str, int] = {}
    for pdf in batches:
        flat = [t for a in pdf["toks"] if a is not None for t in a]
        for tok, c in Counter(flat).items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > _MG_CAP:
            thresh = sorted(counters.values(), reverse=True)[_MG_CAP]
            counters = {t: c - thresh for t, c in counters.items() if c > thresh}
    got = dict(zip(summary["token"], summary["c"]))
    assert got == {t: 0 for t in counters}, "summary token set drifted"
