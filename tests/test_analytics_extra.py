"""Twins for the time-series / mining / privacy / geo batch
(queries/analytics_extra.py) — pure-Python differential recomputes and
the invariants each operator promises.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_locf_grid_and_fill(spark, sf_dir):
    """Per user: the grid is every hour between first and last observation
    (no holes, no extras), and values equal pandas resample+ffill."""
    out = all_queries()["ts_resample_locf"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev = ev[ev["user_id"] % 5 == 0].copy()
    ev["hr"] = ev["ts"].dt.floor("h")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    for user, g in ev.groupby("user_id"):
        obs = g.groupby("hr")["cents"].agg(["sum", "count"])
        obs["v"] = obs["sum"] / (100.0 * obs["count"])
        grid = pd.date_range(obs.index.min(), obs.index.max(), freq="h")
        mine = out[out["user_id"] == user].set_index("hr").sort_index()
        assert list(mine.index) == list(grid), user
        filled = mine["filled"]
        assert set(grid) - set(obs.index) == set(mine.index[filled])
        want = obs["v"].reindex(grid).ffill()
        assert (mine["value"] - want).abs().max() <= 1e-9


def test_ewma_matches_python_fold(spark, sf_dir):
    out = {
        r.user_id: r
        for r in all_queries()["ts_ewma"](spark, sf_dir).toPandas().itertuples()
    }
    ev = _events(sf_dir)
    for user, g in ev.groupby("user_id"):
        vals = g.sort_values(["ts", "event_id"])["value"].tolist()
        acc = vals[0]
        for x in vals[1:]:
            acc = 0.8 * acc + 0.2 * x
        assert out[user].n_events == len(vals)
        assert abs(out[user].ewma - math.floor(acc * 1e6) / 1e6) <= 1e-12


def test_dp_count_noise_mechanism(spark, sf_dir):
    """Noise equals the md5-seeded inverse-CDF Laplace draw; the noisy
    count stays within the mechanism's hard bound ln(1e6) for b=1."""
    out = {
        r.event_type: r
        for r in all_queries()["agg_dp_count"](spark, sf_dir).toPandas().itertuples()
    }
    ev = _events(sf_dir)
    true = Counter(ev["event_type"])
    for et, n in true.items():
        u = (int(hashlib.md5(et.encode()).hexdigest()[:8], 16) % 1000000 + 0.5) / 1e6
        s = 1.0 if u >= 0.5 else -1.0
        noise = -s * math.log(1.0 - 2.0 * abs(u - 0.5))
        want = math.floor((n + noise) * 1000) / 1000
        assert abs(out[et].noisy_count - want) <= 1e-9, (et, n)
        assert abs(out[et].noisy_count - n) <= math.log(1e6) + 1e-6
        assert out[et].epsilon == 1.0


def test_frequent_pairs_exact_counts(spark, sf_dir):
    """MLlib FP-Growth's size-<=2 itemsets equal an exact pandas recompute
    (same ceil(minSupport*n) threshold, same lexicographic pair order)."""
    out = {
        r.itemset: r.freq
        for r in all_queries()["fpm_frequent_pairs"](spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ].drop_duplicates()
    n = li["l_orderkey"].nunique()
    thr = math.ceil(0.002 * n)
    want: dict[str, int] = {}
    for s, c in Counter(li["l_suppkey"]).items():
        if c >= thr:
            want[str(s)] = c
    pair_cnt: Counter = Counter()
    for _, basket in li.groupby("l_orderkey")["l_suppkey"]:
        items = sorted({str(s) for s in basket})
        for i, a in enumerate(items):
            for b in items[i + 1 :]:
                pair_cnt[f"{a}+{b}"] += 1
    for p, c in pair_cnt.items():
        if c >= thr:
            want[p] = c
    assert out == want


def test_geo_radius_haversine_twin(spark, sf_dir):
    out = {
        r.n_nationkey: r
        for r in all_queries()["join_geo_radius"](spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet")
    na = pd.read_parquet(f"{sf_dir}/nation.parquet")

    def hav(lat1, lon1, lat2, lon2):
        p = math.pi / 180
        a = (
            math.sin((lat2 - lat1) * p / 2) ** 2
            + math.cos(lat1 * p) * math.cos(lat2 * p)
            * math.sin((lon2 - lon1) * p / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    pts = [
        ((k * 13) % 120 - 60 + 0.25, (k * 29) % 360 - 180 + 0.25)
        for k in cu["c_custkey"]
    ]
    for nk in na["n_nationkey"]:
        clat, clon = (nk * 37) % 120 - 60 + 0.5, (nk * 73) % 360 - 180 + 0.5
        ds = [hav(clat, clon, plat, plon) for plat, plon in pts]
        assert out[nk].n_within == sum(1 for d in ds if d <= 2000)
        assert abs(out[nk].nearest_km - math.floor(min(ds) * 10) / 10) <= 1e-9


def test_containment_finds_planted_prefixes(spark, sf_dir):
    """Every planted 12-token prefix doc is reported contained in its
    source (containment of the prefix side ~1.0); Jaccard would miss
    these (sub-0.1 resemblance for 128-token docs)."""
    out = all_queries()["dedup_containment"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    planted = [
        d for d in docs["doc_id"] if d % 4 == 0
        and len(str(docs.loc[docs.doc_id == d, "text"].iloc[0]).split(" ")) >= 12
    ]
    pairs = {(r.doc_a, r.doc_b): r for r in out.itertuples()}
    found = 0
    for d in planted:
        key = (d, d + 1_000_000)
        if key in pairs:
            r = pairs[key]
            # the prefix (doc_b side, higher id) is the contained one
            assert max(r.containment_a_in_b, r.containment_b_in_a) >= 0.9
            found += 1
    assert found >= 0.9 * len(planted), (found, len(planted))


def test_bfs_hops_matches_python_bfs(spark, sf_dir):
    """Level-synchronous Spark BFS equals a textbook queue BFS over the
    same co-purchase adjacency."""
    from collections import deque

    out = {
        r.node: r.hop
        for r in all_queries()["graph_bfs_hops"](spark, sf_dir).toPandas().itertuples()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    adj: dict[int, set[int]] = {}
    for _, basket in li.groupby("l_orderkey")["l_partkey"]:
        items = sorted(set(basket))
        for i, a in enumerate(items):
            for b in items[i + 1 :]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    src = min(a for a, ns in adj.items() if ns)
    want = {src: 0}
    q = deque([(src, 0)])
    while q:
        node, hop = q.popleft()
        if hop == 4:
            continue
        for nb in adj.get(node, ()):
            if nb not in want:
                want[nb] = hop + 1
                q.append((nb, hop + 1))
    assert out == want


def test_surrogate_keys_dense_and_stable(spark, sf_dir):
    """Keys are a dense 1..N permutation in natural-key order — the
    stability property monotonically_increasing_id lacks."""
    out = all_queries()["etl_surrogate_key"](spark, sf_dir).toPandas()
    out = out.sort_values("source_sk")
    assert list(out["source_sk"]) == list(range(1, len(out) + 1))
    assert list(out["source"]) == sorted(out["source"])
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert out["n_docs"].sum() == len(docs)


def test_zipf_slope_matches_numpy_lstsq(spark, sf_dir):
    """regr_slope over (ln rank, ln freq) equals a numpy least-squares fit
    on the same ranked counts; natural-ish corpus slope is negative."""
    import numpy as np

    row = all_queries()["text_zipf_slope"](spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = Counter(w for t in docs["text"] for w in t.split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype="float64"))
    y = np.log(np.array([c for _, c in ranked], dtype="float64"))
    slope = np.polyfit(x, y, 1)[0]
    assert row.n_types == len(ranked)
    assert abs(row.zipf_slope - round(slope, 4)) <= 1e-3
    assert row.zipf_slope < 0


def test_hourly_seasonality_cells(spark, sf_dir):
    """Cells equal a pandas recompute with ISO weekday numbering and
    exact-cent means; the grid never exceeds 7x24."""
    out = all_queries()["agg_hourly_seasonality"](spark, sf_dir).toPandas()
    assert len(out) <= 168
    ev = _events(sf_dir).copy()
    ev["dow"] = ev["ts"].dt.weekday  # pandas: Monday=0, matching ISO-1
    ev["hour"] = ev["ts"].dt.hour
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    want = ev.groupby(["dow", "hour"]).agg(
        n_events=("cents", "size"), cents=("cents", "sum")
    )
    got = out.set_index(["dow", "hour"]).sort_index()
    assert list(got.index) == list(want.index)
    assert (got["n_events"] == want["n_events"]).all()
    mean = want["cents"] / (100.0 * want["n_events"])
    assert (got["avg_value"] - mean).abs().max() <= 1e-12


def test_autocorr_and_degree_distribution_twins(spark, sf_dir):
    """Lag-1 autocorrelation matches numpy corrcoef on cent-scaled pairs;
    the degree histogram sums to the co-purchase node count."""
    import numpy as np

    out = {
        r.user_id: r
        for r in all_queries()["ts_autocorr_lag1"](spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    ev = _events(sf_dir)
    for user, g in ev.groupby("user_id"):
        c = (g.sort_values(["ts", "event_id"])["value"] * 100).round().astype("int64").to_numpy()
        if len(c) < 2:
            continue
        x, y = c[1:], c[:-1]
        if x.std() == 0 or y.std() == 0:
            assert user not in out
            continue
        r_np = np.corrcoef(x, y)[0, 1]
        assert out[user].n_pairs == len(x)
        assert abs(out[user].autocorr_lag1 - math.floor(r_np * 1e6) / 1e6) <= 1e-6

    hist = all_queries()["graph_degree_distribution"](spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    nodes = set()
    for _, basket in li.groupby("l_orderkey")["l_partkey"]:
        items = sorted(set(basket))
        if len(items) > 1:
            nodes.update(items)
    assert hist["n_nodes"].sum() == len(nodes)
    assert (hist["degree"] >= 1).all()
