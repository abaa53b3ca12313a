"""Twins for round-7 batch 8 (queries/round7_batch8.py) — pure-Python
differential recomputes. Oracle hashes are covered by test_contract.py.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries

_DAY_US = 86_400_000_000


def test_survival_km_matches_python(spark, sf_dir):
    out = all_queries()["agg_survival_km"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    signup = (
        ev[ev["event_type"] == "signup"].groupby("user_id")["ts_us"].min()
    )
    subj = []
    for uid, t0 in signup.items():
        u = ev[ev["user_id"] == uid]
        p = u[(u["event_type"] == "purchase") & (u["ts_us"] > t0)]["ts_us"]
        if len(p):
            subj.append(((p.min() - t0) // _DAY_US, 1))
        else:
            subj.append(((u["ts_us"].max() - t0) // _DAY_US, 0))
    per_day = defaultdict(lambda: [0, 0])
    for day, died in subj:
        per_day[day][died] += 1  # [censored, death]
    n_risk = len(subj)
    surv = 1.0
    zeroed = False
    expect = []
    for day in sorted(per_day):
        cens, death = per_day[day]
        if death >= n_risk:
            zeroed = True
        elif death > 0:
            surv *= 1.0 - death / n_risk
        expect.append((day, n_risk, death, cens, 0.0 if zeroed else round(surv, 6)))
        n_risk -= death + cens
    got = list(
        zip(out["day"], out["n_risk"], out["n_death"], out["n_censored"], out["survival"])
    )
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:4] == e[:4], (g, e)
        assert abs(g[4] - e[4]) < 2e-6, (g, e)
    # survival is non-increasing and within [0, 1]
    s = out["survival"].tolist()
    assert all(0.0 <= x <= 1.0 for x in s)
    assert all(a >= b - 1e-9 for a, b in zip(s, s[1:]))


def test_split_stump_matches_numpy(spark, sf_dir):
    import numpy as np

    out = all_queries()["ml_split_stump"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    img = np.floor(ev["value"].to_numpy() * 1e6).astype("int64")
    y = (ev["event_type"] == "purchase").to_numpy().astype("int64")
    n, p = len(img), int(y.sum())
    grid = [d * 10**b for b in range(4, 9) for d in range(1, 10)]
    assert sorted(out["threshold"]) == [t / 1e6 for t in sorted(grid)]
    best_key = None
    ginis = {}
    for thr in grid:
        mask = img < thr
        nl, pl = int(mask.sum()), int(y[mask].sum())
        nr, pr = n - nl, p - pl
        if nl == 0 or nr == 0:
            g = 2.0
        else:
            gl = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
            gr = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
            g = (nl * gl + nr * gr) / n
        g = round(g, 9)
        ginis[thr] = (nl, pl, nr, pr, g)
        key = math.floor(g * 1e9) * 1_000_000 + thr // 1000
        if best_key is None or key < best_key:
            best_key = key
            best_thr = thr
    for r in out.itertuples():
        thr = round(r.threshold * 1e6)
        nl, pl, nr, pr, g = ginis[thr]
        assert (r.n_left, r.pos_left, r.n_right, r.pos_right) == (nl, pl, nr, pr)
        assert abs(r.gini - g) < 1e-9
        assert r.is_best == (thr == best_thr)
    assert out["is_best"].sum() == 1
