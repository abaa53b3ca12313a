"""Twins for round-7 batch 9 (queries/round7_batch9.py) — pure-Python
differential recomputes. Oracle hashes are covered by test_contract.py.
"""

from __future__ import annotations

import math

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries

_DAY_US = 86_400_000_000


def test_diff_in_diff_matches_numpy(spark, sf_dir):
    import numpy as np

    out = all_queries()["agg_diff_in_diff"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // _DAY_US
    ev["img"] = np.floor(ev["value"].to_numpy() * 1e6).astype("int64")
    cutoff = (ev["day"].min() + ev["day"].max() + 1) // 2
    ev["treat"] = (ev["user_id"] % 2).astype(int)
    ev["post"] = (ev["day"] >= cutoff).astype(int)
    means, varr, ns = {}, {}, {}
    for (t, p), g in ev.groupby(["treat", "post"]):
        x = g["img"].to_numpy() / 1e6
        means[(t, p)] = x.mean()
        varr[(t, p)] = x.var(ddof=1)
        ns[(t, p)] = len(x)
    did = (means[(1, 1)] - means[(1, 0)]) - (means[(0, 1)] - means[(0, 0)])
    se = math.sqrt(sum(varr[k] / ns[k] for k in varr))
    assert len(out) == 4
    for r in out.itertuples():
        assert r.n == ns[(r.treat, r.post)]
        assert abs(r.mean_value - means[(r.treat, r.post)]) < 1e-5
        assert abs(r.did - did) < 1e-5
        assert abs(r.se - se) < 1e-5
        assert abs(r.t_stat - did / se) < max(1e-3, abs(did / se) * 1e-3)


def _point_in_poly(px, py, verts):
    k = False
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            if y2 > y1:
                if (px - x1) * (y2 - y1) < (x2 - x1) * (py - y1):
                    k = not k
            else:
                if (px - x1) * (y2 - y1) > (x2 - x1) * (py - y1):
                    k = not k
    return k


def test_point_in_polygon_matches_python(spark, sf_dir):
    from sdg_data_catalog_spark.queries.round7_batch9 import _POLYGONS

    out = all_queries()["join_point_in_polygon"](spark, sf_dir).toPandas()
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    polys = {}
    for p, i, x, y in _POLYGONS:
        polys.setdefault(p, []).append((i, x, y))
    polys = {p: [(x, y) for _, x, y in sorted(v)] for p, v in polys.items()}
    expect = {}
    for ck in cust["c_custkey"]:
        px = (ck * 73 % 360 - 180) * 1_000_000 + 500_000
        py = (ck * 37 % 120 - 60) * 1_000_000 + 500_000
        for p, verts in polys.items():
            if _point_in_poly(px, py, verts):
                n, s = expect.get(p, (0, 0))
                expect[p] = (n + 1, s + ck)
    got = {r.polygon_id: (r.n_points, r.sum_point_ids) for r in out.itertuples()}
    assert got == expect
    # sanity: the concave chevron's notch excludes points a bounding box
    # would include — verified implicitly by exact-count equality above
    assert set(got) <= {1, 2, 3}
