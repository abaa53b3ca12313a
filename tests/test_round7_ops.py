"""Twins for the round-7 batch (queries/timeseries_extra.py,
queries/curation_quality.py) — pure-Python differential recomputes and
the invariants each operator promises. The oracle hash itself is covered
by test_contract.py; these tests pin the SEMANTICS against an
independent (pandas/Counter/set) implementation.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries

_DAY_US = 86_400_000_000


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _daily(sf_dir: str) -> pd.DataFrame:
    ev = _events(sf_dir).copy()
    # epoch-day via integer µs division — the operators' day convention
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // _DAY_US
    return ev.groupby(["event_type", "day"]).size().reset_index(name="y")


def test_forecast_ols_matches_lstsq(spark, sf_dir):
    out = all_queries()["ts_forecast_ols"](spark, sf_dir).toPandas()
    daily = _daily(sf_dir)
    assert set(out["event_type"]) == set(daily["event_type"])
    for r in out.itertuples():
        g = daily[daily["event_type"] == r.event_type]
        x, y = g["day"].to_numpy(dtype=float), g["y"].to_numpy(dtype=float)
        n = len(x)
        assert r.n_days == n
        slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        intercept = (y.sum() - slope * x.sum()) / n
        assert abs(r.slope - slope) < 1e-4
        assert abs(r.intercept - intercept) < 1e-2  # intercept is huge vs slope
        assert abs(r.forecast_next - (intercept + slope * (x.max() + 1))) < 1e-2


def test_rolling_median_matches_pandas(spark, sf_dir):
    out = all_queries()["ts_rolling_median"](spark, sf_dir).toPandas()
    daily = _daily(sf_dir)
    assert len(out) == len(daily)
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        want = g["y"].rolling(7, min_periods=1).median().to_numpy()
        mine = (
            out[out["event_type"] == et].sort_values("day")["med7"].to_numpy()
        )
        assert (abs(mine - want) < 1e-9).all(), et


def test_decompose_ma_matches_pandas(spark, sf_dir):
    out = all_queries()["ts_decompose_ma"](spark, sf_dir).toPandas()
    daily = _daily(sf_dir)
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        trend = g["y"].rolling(7, center=True).mean()
        det = g["y"] - trend
        g2 = pd.DataFrame(
            {"dow": g["day"] % 7, "det": det, "trend": trend}
        ).dropna()
        for dow, gg in g2.groupby("dow"):
            row = out[(out["event_type"] == et) & (out["dow"] == dow)]
            assert len(row) == 1
            assert abs(row["seasonal"].iloc[0] - gg["det"].mean()) < 1e-6
            assert abs(row["avg_trend"].iloc[0] - gg["trend"].mean()) < 1e-6
            assert row["n_days"].iloc[0] == len(gg)
    # shape sanity: 7 dow rows per series, and seasonal deviations are
    # small relative to the trend level (they are residuals around it)
    for et in out["event_type"].unique():
        s = out[out["event_type"] == et]
        assert len(s) == 7 and set(s["dow"]) == set(range(7))
        assert (s["seasonal"].abs() < s["avg_trend"]).all()


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]


def _kn_stats(docs: pd.DataFrame):
    types: Counter = Counter()
    occ_by_doc: dict[int, list[tuple[str, str]]] = {}
    for r in docs.itertuples():
        t = _tokens(r.text)
        pairs = list(zip(t, t[1:]))
        if pairs:
            occ_by_doc[r.doc_id] = pairs
            types.update(pairs)
    c1: Counter = Counter()
    n1p: Counter = Counter()
    ncont: Counter = Counter()
    for (w1, w2), c in types.items():
        c1[w1] += c
        n1p[w1] += 1
        ncont[w2] += 1
    return types, c1, n1p, ncont, occ_by_doc


def test_kneser_ney_is_proper_distribution(sf_dir):
    """Interpolated KN sums to exactly 1 over the continuation vocabulary
    for every context — the property that distinguishes it from ad-hoc
    backoff."""
    types, c1, n1p, ncont, _ = _kn_stats(_docs(sf_dir))
    T = len(types)
    D = 0.75
    vocab2 = list(ncont)
    for w1 in list(c1)[:5]:
        total = 0.0
        for w2 in vocab2:
            disc = max(types.get((w1, w2), 0) - D, 0.0)
            total += (disc + D * n1p[w1] * (ncont[w2] / T)) / c1[w1]
        assert abs(total - 1.0) < 1e-9, w1


def test_kneser_ney_score_differential(spark, sf_dir):
    out = all_queries()["lm_kneser_ney_score"](spark, sf_dir).toPandas()
    types, c1, n1p, ncont, occ_by_doc = _kn_stats(_docs(sf_dir))
    T = len(types)
    D = 0.75
    scores = {}
    for doc_id, pairs in occ_by_doc.items():
        s = 0.0
        for w1, w2 in pairs:
            p = (
                max(types[(w1, w2)] - D, 0.0)
                + D * n1p[w1] * (ncont[w2] / T)
            ) / c1[w1]
            s += math.log(p)
        scores[doc_id] = (s / len(pairs), len(pairs))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:25]
    assert list(out["doc_id"]) == [doc_id for doc_id, _ in want]
    for r in out.itertuples():
        avg, nb = scores[r.doc_id]
        assert r.n_bigrams == nb
        assert abs(r.avg_logp - avg) < 1e-6


def test_vocab_coverage_differential(spark, sf_dir):
    out = all_queries()["agg_vocab_coverage"](spark, sf_dir).toPandas()
    cnt: Counter = Counter()
    for text in _docs(sf_dir)["text"]:
        cnt.update(_tokens(text))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    for r in out.itertuples():
        covered = sum(c for _, c in ranked[: int(r.top_k)])
        assert r.total == total
        assert r.covered == covered
        assert abs(r.coverage - covered / total) < 1e-6
    # monotone and bounded
    o = out.sort_values("top_k")
    assert o["covered"].is_monotonic_increasing
    assert (o["coverage"] <= 1.0).all()


def test_contamination_report_differential(spark, sf_dir):
    out = all_queries()["curation_contamination_report"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)

    def shingles(text: str) -> set:
        t = text.split(" ")
        return {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}

    train: set = set()
    ev: dict[int, set] = {}
    for r in docs.itertuples():
        sh = shingles(r.text)
        if not sh:
            continue
        if r.doc_id % 41 == 0:
            ev[r.doc_id] = sh
        else:
            train |= sh
    assert set(out["doc_id"]) == set(ev)
    for r in out.itertuples():
        sh = ev[r.doc_id]
        hits = len(sh & train)
        assert r.n_shingles == len(sh)
        assert r.n_contaminated == hits
        assert abs(r.contamination_rate - hits / len(sh)) < 1e-6


def test_fasttext_quality_differential(spark, sf_dir):
    out = all_queries()["curation_fasttext_quality"](spark, sf_dir).toPandas()
    scores = {}
    for r in _docs(sf_dir).itertuples():
        t = _tokens(r.text)
        if len(t) < 2:
            continue
        swint = 0
        n = 0
        for w1, w2 in zip(t, t[1:]):
            h = int(hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:8], 16)
            swint += ((h % 256) * 2654435761) % 1000003 % 197 - 98
            n += 1
        z_key = swint / 98.0 / n  # the engines' exact expression order
        z = z_key - 0.25
        scores[r.doc_id] = (z_key, 1.0 / (1.0 + math.exp(-z)), n)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:25]
    assert list(out["doc_id"]) == [d for d, _ in want]
    for r in out.itertuples():
        _, prob, n = scores[r.doc_id]
        assert r.n_bigrams == n
        assert abs(r.quality_prob - prob) < 1e-6
    assert (out["quality_prob"] > 0).all() and (out["quality_prob"] < 1).all()


def test_clustering_coeff_differential_and_triangle_consistency(spark, sf_dir):
    qs = all_queries()
    out = qs["graph_clustering_coeff"](spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li[li["l_partkey"] % 4 == 0]
    adj: dict[int, set] = defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    tri_per_node = {}
    for u, nb in adj.items():
        t = 0
        for v in nb:
            t += len(nb & adj[v])
        tri_per_node[u] = t // 2  # each triangle counted twice around u
    want = {
        u: (len(nb), tri_per_node[u]) for u, nb in adj.items() if len(nb) >= 2
    }
    assert set(out["node"]) == set(want)
    for r in out.itertuples():
        d, t = want[r.node]
        assert r.degree == d and r.n_triangles == t
        assert abs(r.clustering_coeff - 2.0 * t / (d * (d - 1))) < 1e-6
        assert 0.0 <= r.clustering_coeff <= 1.0
    # cross-operator: per-node credits sum to 3x the global triangle count
    n_tri = qs["graph_triangle_count"](spark, sf_dir).toPandas()
    assert out["n_triangles"].sum() == 3 * int(n_tri["n_triangles"].iloc[0])


def test_scd3_differential(spark, sf_dir):
    out = all_queries()["etl_scd3_prev"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev = ev[ev["user_id"] % 5 == 2].copy()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    want = {}
    for user, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        changes = []
        prev = None
        for r in g.itertuples():
            if prev is None or r.event_type != prev:
                changes.append((r.event_type, r.ts_us))
            prev = r.event_type
        cur = changes[-1]
        prv = changes[-2][0] if len(changes) >= 2 else None
        want[user] = (cur[0], prv, cur[1], len(changes))
    assert set(out["user_id"]) == set(want)
    for r in out.itertuples():
        cur, prv, at, n = want[r.user_id]
        assert r.current_status == cur
        assert (r.previous_status == prv) or (
            prv is None and pd.isna(r.previous_status)
        )
        assert r.changed_at_us == at and r.n_versions == n


def test_attribution_differential_and_totals(spark, sf_dir):
    out = all_queries()["agg_conversion_attribution"](spark, sf_dir).toPandas()
    ev = _events(sf_dir).copy()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    first: Counter = Counter()
    last: Counter = Counter()
    n_purchases = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        first_type = g["event_type"].iloc[0]
        last_np = None
        for r in g.itertuples():
            if r.event_type == "purchase":
                n_purchases += 1
                first[first_type] += 1
                last[last_np or "(none)"] += 1
            else:
                last_np = r.event_type
    for r in out.itertuples():
        want = first if r.model == "first_touch" else last
        assert r.conversions == want[r.channel], (r.model, r.channel)
    # both models attribute every purchase exactly once
    for model in ("first_touch", "last_touch"):
        assert (
            out[out["model"] == model]["conversions"].sum() == n_purchases
        )


def test_xcorr_differential(spark, sf_dir):
    out = all_queries()["ts_xcorr_lagged"](spark, sf_dir).toPandas()
    daily = _daily(sf_dir)
    a = daily[daily["event_type"] == "click"].set_index("day")["y"]
    b = daily[daily["event_type"] == "purchase"].set_index("day")["y"]
    assert set(out["lag"]) == set(range(-3, 4))
    for r in out.itertuples():
        days = sorted(set(a.index) & {d - r.lag for d in b.index})
        xa = pd.Series([a[d] for d in days], dtype=float)
        xb = pd.Series([b[d + r.lag] for d in days], dtype=float)
        assert r.n_days == len(days)
        assert abs(r.r - xa.corr(xb)) < 1e-6, r.lag
    # lag-0 of a series against itself would be 1; cross-series r bounded
    assert (out["r"].abs() <= 1.0 + 1e-9).all()


def test_scd2_pit_differential(spark, sf_dir):
    out = all_queries()["join_scd2_pit"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev = ev[ev["user_id"] % 3 == 0].copy()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    cutoff = pd.Timestamp("2024-01-24 00:00:00").value // 1000
    want: Counter = Counter()
    for user, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        # dimension versions from pre-cutoff history
        versions = []
        prev = None
        for r in g[g["ts_us"] < cutoff].itertuples():
            if prev is None or r.event_type != prev:
                versions.append((r.ts_us, r.event_type))
            prev = r.event_type
        for r in g[g["ts_us"] >= cutoff].itertuples():
            status = "(no-history)"
            for ts, st in versions:
                if ts <= r.ts_us:
                    status = st
                else:
                    break
            want[(status, r.event_type)] += 1
    got = {
        (r.status_at_event, r.event_type): r.n_events for r in out.itertuples()
    }
    assert got == dict(want)


def test_geo_gridded_matches_bruteforce_within_radius(spark, sf_dir):
    """Grid+neighbor-probe candidates must contain EVERY true within-500km
    pair (the binning-correctness contract) and n_within must equal the
    brute-force count."""
    out = all_queries()["join_geo_gridded"](spark, sf_dir).toPandas()
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    import numpy as np

    clat = ((nation["n_nationkey"] * 37) % 120).astype(float) - 60 + 0.5
    clon = ((nation["n_nationkey"] * 73) % 360).astype(float) - 180 + 0.5
    plat = ((cust["c_custkey"] * 13) % 120).astype(float) - 60 + 0.25
    plon = ((cust["c_custkey"] * 29) % 360).astype(float) - 180 + 0.25

    def hav(lat1, lon1, lat2, lon2):
        rl1, rl2 = np.radians(lat1), np.radians(lat2)
        dlat = np.radians(lat2 - lat1) / 2
        dlon = np.radians(lon2 - lon1) / 2
        return (
            2
            * 6371.0
            * np.arcsin(
                np.sqrt(
                    np.sin(dlat) ** 2
                    + np.cos(rl1) * np.cos(rl2) * np.sin(dlon) ** 2
                )
            )
        )

    got = out.set_index("n_nationkey")
    for i, nk in enumerate(nation["n_nationkey"]):
        km = hav(clat.iloc[i], clon.iloc[i], plat.to_numpy(), plon.to_numpy())
        brute = int((km <= 500.0).sum())
        row = got.loc[nk]
        assert row["n_within"] == brute, nk
        # the grid prunes: candidates are a small superset of matches and
        # a small fraction of the full cross product
        assert row["n_candidates"] >= row["n_within"]
        assert row["n_candidates"] < len(cust)


def test_ppl_band_selects_middle_half(spark, sf_dir):
    out = all_queries()["curation_ppl_band_select"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    n_scored = sum(1 for t in docs["text"] if len(_tokens(t)) >= 2)
    lo, hi = int(0.25 * n_scored), int(0.75 * n_scored)
    assert out["n_selected"].sum() == hi - lo
    # every selected id is a real doc and sources partition the selection
    assert out["n_selected"].gt(0).all()
    assert set(out["source"]).issubset(set(docs["source"]))


def test_bitemporal_belief_revision(spark, sf_dir):
    """Wave w's census equals an independent SCD2 rebuild over events
    with arrival <= w; waves only ever ADD versions (more history can
    split runs, never merge compressed ones... it CAN merge — assert
    instead per-wave census equality and monotone event coverage)."""
    out = all_queries()["etl_bitemporal_snapshot"](spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev = ev[ev["user_id"] % 4 == 1].copy()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["arrival"] = ev["event_id"] % 3
    for wave in range(3):
        sub = ev[ev["arrival"] <= wave]
        census: Counter = Counter()
        opens: Counter = Counter()
        for _, g in sub.groupby("user_id"):
            g = g.sort_values(["ts_us", "event_id"])
            runs = []
            prev = None
            for r in g.itertuples():
                if prev is None or r.event_type != prev:
                    runs.append(r.event_type)
                prev = r.event_type
            for s in runs:
                census[s] += 1
            opens[runs[-1]] += 1
        got = out[out["wave"] == wave]
        assert {r.status: r.n_versions for r in got.itertuples()} == dict(census), wave
        assert {
            r.status: r.n_current for r in got.itertuples() if r.n_current
        } == dict(opens), wave
    # the transaction-time axis matters: at least one status census
    # changes across waves (late arrivals revise belief)
    w0 = out[out["wave"] == 0].set_index("status")["n_versions"]
    w2 = out[out["wave"] == 2].set_index("status")["n_versions"]
    assert not w0.equals(w2)


def test_reconcile_rollup_all_green_and_exact(spark, sf_dir):
    out = all_queries()["dq_reconcile_rollup"](spark, sf_dir).toPandas()
    ev = _events(sf_dir).copy()
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // _DAY_US
    ev["micro"] = (ev["value"] * 1e6).apply(math.floor).astype("int64")
    g = ev.groupby("event_type")
    assert (out["reconciled"] == 1).all()
    got = out.set_index("event_type")
    for et, gg in g:
        assert got.loc[et, "src_rows"] == len(gg)
        assert got.loc[et, "src_value_micro"] == gg["micro"].sum()
        assert got.loc[et, "src_days"] == gg["day"].nunique()
        assert got.loc[et, "tgt_rows"] == got.loc[et, "src_rows"]


def test_equiheight_hist_properties(spark, sf_dir):
    out = all_queries()["catalog_equiheight_hist"](spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n = len(orders)
    assert out["n_rows"].sum() == n
    o = out.sort_values("bucket").reset_index(drop=True)
    assert list(o["bucket"]) == list(range(8))
    # equi-height: bucket sizes differ by at most 1 from n/8 (floor split)
    assert o["n_rows"].max() - o["n_rows"].min() <= 1
    # boundaries are non-decreasing across buckets and bracket the data
    for i in range(1, 8):
        assert o["lo"].iloc[i] >= o["hi"].iloc[i - 1] - 0.011  # cent ties
    assert abs(o["lo"].iloc[0] - round(orders["o_totalprice"].min(), 2)) < 0.02
    assert abs(o["hi"].iloc[7] - round(orders["o_totalprice"].max(), 2)) < 0.02
