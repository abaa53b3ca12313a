"""Twins for round-7 batch 7 (queries/round7_batch7.py) — pure-Python
differential recomputes. Oracle hashes are covered by test_contract.py.
"""

from __future__ import annotations

import math

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def test_triplet_mining_matches_numpy(spark, sf_dir):
    import numpy as np

    out = all_queries()["emb_triplet_mining"](spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    vid = emb["vec_id"].to_numpy()
    lab = emb["label"].to_numpy()
    anchors = np.where(vid < 32)[0]
    cands = np.where(vid >= 32)[0]
    assert len(out) == len(anchors)
    for r in out.itertuples():
        ai = np.where(vid == r.anchor_id)[0][0]
        assert lab[ai] == r.a_label
        cos = unit[cands] @ unit[ai]
        k = np.floor(cos * 1e12).astype("int64")
        for same, got_id, got_cos in (
            (True, r.pos_id, r.pos_cos),
            (False, r.neg_id, r.neg_cos),
        ):
            mask = (lab[cands] == lab[ai]) == same
            kk, ii = k[mask], vid[cands][mask]
            order = np.lexsort((ii, -kk))
            assert ii[order[0]] == got_id, (r.anchor_id, same)
            assert abs(kk[order[0]] / 1e12 - got_cos) < 1e-12
        assert abs(r.margin - (r.pos_cos - r.neg_cos)) < 1e-9


def test_backtest_smape_matches_python(spark, sf_dir):
    out = all_queries()["ts_backtest_smape"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    daily = ev.groupby(["event_type", "day"]).size().reset_index(name="y")
    for etype, g in daily.groupby("event_type"):
        cutoff = g["day"].max() - 6
        tr = g[g["day"] < cutoff]
        te = g[g["day"] >= cutoff]
        n, sd, sy = len(tr), tr["day"].sum(), tr["y"].sum()
        sdy = (tr["day"] * tr["y"]).sum()
        sdd = (tr["day"] * tr["day"]).sum()
        slope = (n * sdy - sd * sy) / (n * sdd - sd * sd)
        got = out[out["event_type"] == etype]
        ymap = dict(zip(g["day"], g["y"]))
        for r in got.itertuples():
            if r.method == "ols":
                f = sy / n + slope * (r.day - sd / n)
            else:
                assert r.day - 7 in ymap
                f = float(ymap[r.day - 7])
            actual = ymap[r.day]
            assert r.actual == actual
            assert abs(r.forecast - round(f, 6)) < 1e-9
            assert abs(r.abs_err - round(abs(actual - f), 6)) < 1e-9
            assert (
                abs(r.smape_term - round(2 * abs(actual - f) / (abs(actual) + abs(f)), 6))
                < 1e-9
            )
        # both methods present for every test day that has a d-7 base
        assert (got["method"] == "ols").sum() == len(te)


def test_chisq_independence_matches_python(spark, sf_dir):
    out = all_queries()["agg_chisq_independence"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["wd"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    ) % 7
    cell = ev.groupby(["event_type", "wd"]).size()
    rt = ev.groupby("event_type").size()
    ct = ev.groupby("wd").size()
    n = len(ev)
    nr, nc = len(rt), len(ct)
    chi2 = 0.0
    for r in out.itertuples():
        obs = cell[(r.event_type, r.wd)]
        assert r.n_obs == obs
        exp = rt[r.event_type] * ct[r.wd] / n
        assert abs(r.expected - round(exp, 6)) < 1e-9
        term = round((obs - exp) ** 2 / exp, 6)
        assert abs(r.chi2_term - term) < 1e-9
        assert r.df == (nr - 1) * (nc - 1)
        chi2 += math.floor(term * 1e6)
    assert len(out) == len(cell)
    assert abs(out["chi2_total"].iloc[0] - chi2 / 1e6) < 1e-9
