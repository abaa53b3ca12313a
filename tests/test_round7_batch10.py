"""Twins for round-7 batch 10 (queries/round7_batch10.py)."""

from __future__ import annotations

import math

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries

_DAY_US = 86_400_000_000


def test_cuped_matches_numpy(spark, sf_dir):
    import numpy as np

    out = all_queries()["agg_cuped_adjust"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // _DAY_US
    ev["img"] = np.floor(ev["value"].to_numpy() * 1e6).astype("int64")
    cutoff = (ev["day"].min() + ev["day"].max() + 1) // 2
    pu = (
        ev.assign(
            x=ev["img"].where(ev["day"] < cutoff, 0),
            y=ev["img"].where(ev["day"] >= cutoff, 0),
        )
        .groupby("user_id")[["x", "y"]]
        .sum()
        .reset_index()
    )
    pu["treat"] = (pu["user_id"] % 2).astype(int)
    x, y = pu["x"].to_numpy(float), pu["y"].to_numpy(float)
    n = len(pu)
    theta = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    rho2 = (n * (x * y).sum() - x.sum() * y.sum()) ** 2 / (
        (n * (x * x).sum() - x.sum() ** 2) * (n * (y * y).sum() - y.sum() ** 2)
    )
    xbar = x.mean()
    assert len(out) == 2
    for r in out.itertuples():
        g = pu[pu["treat"] == r.treat]
        assert r.n_users == len(g)
        assert abs(r.mean_post - g["y"].mean() / 1e6) < 1e-4
        adj = (g["y"] - theta * (g["x"] - xbar)).mean() / 1e6
        assert abs(r.mean_cuped - adj) < 1e-4
        assert abs(r.theta - theta) < 1e-4
        assert abs(r.var_ratio - (1 - rho2)) < 1e-4
    # CUPED must not move the overall (pooled) mean beyond tilt from
    # unequal arm sizes; and variance ratio must be in (0, 1]
    assert 0.0 < out["var_ratio"].iloc[0] <= 1.0


def test_srm_check_matches_python(spark, sf_dir):
    out = all_queries()["dq_srm_check"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    users = ev.drop_duplicates("user_id")
    counts = (users["user_id"] % 2).value_counts().to_dict()
    n = sum(counts.values())
    chi2 = sum((c - n / 2) ** 2 / (n / 2) for c in counts.values())
    assert len(out) == 2
    for r in out.itertuples():
        c = counts[r.treat]
        assert r.n_users == c
        assert abs(r.expected - n / 2) < 1e-9
        assert abs(r.chi2_term - round((c - n / 2) ** 2 / (n / 2), 6)) < 1e-9
        # integer flag == float flag (the cross-multiplied test)
        assert r.srm_flag == (chi2 > 3.84)
