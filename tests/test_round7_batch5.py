"""Twins for round-7 batch 5 (queries/round7_batch5.py) — pure-Python
differential recomputes. The oracle hash is covered by test_contract.py;
these pin SEMANTICS against an independent implementation.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def _events(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    return ev


def test_event_sequence_matches_python(spark, sf_dir):
    out = all_queries()["win_event_sequence"](spark, sf_dir).toPandas()
    ev = _events(sf_dir).sort_values(["user_id", "ts_us", "event_id"])
    per_user: Counter = Counter()
    for uid, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        ts = g["ts_us"].tolist()
        n = sum(
            1
            for i in range(len(types) - 2)
            if types[i] == "view"
            and types[i + 1] == "click"
            and types[i + 2] == "purchase"
            and ts[i + 2] - ts[i] <= 3_600_000_000
        )
        per_user[n] += 1
    got = dict(zip(out["n_matches"], out["n_users"]))
    assert got == dict(per_user)
    assert out["n_users"].sum() == ev["user_id"].nunique()


def test_welch_ttest_matches_numpy(spark, sf_dir):
    import numpy as np

    out = all_queries()["agg_welch_ttest"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    img = np.floor(ev["value"].to_numpy() * 1e6).astype("int64") / 1e6
    for r in out.itertuples():
        a = img[(ev["event_type"] == r.event_type).to_numpy()]
        b = img[(ev["event_type"] != r.event_type).to_numpy()]
        assert r.n == len(a)
        assert abs(r.mean_value - a.mean()) < 1e-5
        assert abs(r.mean_rest - b.mean()) < 1e-5
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        t = (a.mean() - b.mean()) / math.sqrt(v1 / len(a) + v2 / len(b))
        df = (v1 / len(a) + v2 / len(b)) ** 2 / (
            (v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1)
        )
        assert abs(r.t_stat - t) < 1e-3, (r.event_type, r.t_stat, t)
        assert abs(r.df - df) < max(0.05, df * 1e-4)


def test_benford_matches_python(spark, sf_dir):
    out = all_queries()["dq_benford_digits"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev = ev[ev["value"] > 0]
    ev["digit"] = (
        (ev["value"] * 1e6).apply(math.floor).astype("int64").astype(str).str[0]
    ).astype(int)
    for (etype, digit), grp in out.groupby(["event_type", "digit"]):
        obs = ((ev["event_type"] == etype) & (ev["digit"] == digit)).sum()
        assert grp["n_obs"].iloc[0] == obs
    for etype, grp in out.groupby("event_type"):
        assert sorted(grp["digit"]) == list(range(1, 10))
        n = grp["n_obs"].sum()
        chi2 = 0.0
        for r in grp.itertuples():
            p = math.floor(math.log10(1 + 1 / r.digit) * 1e6)
            assert r.benford_ppm == p
            exp = n * p / 1e6
            assert abs(r.chi2_term - round((r.n_obs - exp) ** 2 / exp, 6)) < 1e-9
            chi2 += math.floor(r.chi2_term * 1e6)
        assert abs(grp["chi2_total"].iloc[0] - chi2 / 1e6) < 1e-9


def test_label_prop_matches_python(spark, sf_dir):
    out = all_queries()["graph_label_prop"](spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_custkey"]]
    e = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    pairs = {(s, c + 1_000_000) for s, c in zip(e["l_suppkey"], e["o_custkey"])}
    adj = defaultdict(set)
    for s, d in pairs:
        adj[d].add(s)
        adj[s].add(d)
    labels = {n: (n % 3 if n < 1_000_000 else None) for n in adj}
    seeds = {n for n in adj if n < 1_000_000}
    for _ in range(3):
        nxt = {}
        for n in adj:
            if n in seeds:
                nxt[n] = labels[n]
                continue
            votes = Counter(
                labels[m] for m in adj[n] if labels[m] is not None
            )
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[n] = best[0]
            else:
                nxt[n] = labels[n]
        labels = nxt
    census = defaultdict(lambda: [0, 0])
    for n, lbl in labels.items():
        key = -1 if lbl is None else lbl
        census[key][0] += 1
        census[key][1] += n
    for r in out.itertuples():
        assert census[r.label][0] == r.n_nodes, (r.label, census[r.label])
        assert census[r.label][1] == r.sum_node_ids
    assert out["n_nodes"].sum() == len(adj)
