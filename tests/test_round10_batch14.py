"""Differential / property twins for round-10 batch 14."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_loo_influence_twin(spark):
    docs = _fetch(
        f"SELECT doc_id, source, text FROM read_parquet('{SF}/documents.parquet')"
    )
    sw = defaultdict(Counter)
    for _did, src, text in docs:
        sw[src].update(text.split(" "))
    gw = Counter()
    for c in sw.values():
        gw.update(c)
    n = sum(gw.values())
    v = len(gw)
    ns = {s: sum(c.values()) for s, c in sw.items()}
    probe = []
    for did, _src, text in docs:
        if did % 97 == 0:
            probe.extend(text.split(" "))
    base = sum(math.floor(1e6 * math.log((gw[w] + 1) / (n + v))) for w in probe)
    rows = {
        r["source"]: (r["n_probe_tokens"], r["loo_logp_x1e6"], r["influence_x1e6"])
        for r in all_queries()["curation_loo_influence"](spark, SF).collect()
    }
    assert set(rows) == set(sw)
    for s in sw:
        loo = sum(
            math.floor(
                1e6
                * math.log((gw[w] - sw[s][w] + 1) / (n - ns[s] + v))
            )
            for w in probe
        )
        assert rows[s] == (len(probe), loo, base - loo)
    # removing a source shrinks the corpus: the probe can gain or lose,
    # but at least one source must have nonzero influence
    assert any(r[2] != 0 for r in rows.values())


def test_power_analysis_twin(spark):
    ev = _fetch(
        f"SELECT event_type, FLOOR(value * 1e6)"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    per = defaultdict(list)
    for et, img in ev:
        per[et].append(int(img))
    rows = {
        r["event_type"]: (
            r["n_observed"], r["n_required_x1e6"], r["n_required"],
            r["currently_powered"],
        )
        for r in all_queries()["agg_power_analysis"](spark, SF).collect()
    }
    zsq = int(2.801585**2 * 1e12)
    for et, imgs in per.items():
        m = len(imgs)
        s1, s2 = sum(imgs), sum(x * x for x in imgs)
        var = (m * s2 - s1 * s1) / (m * m)
        delta = 0.02 * s1 / m
        n_req = 2.0 * var * zsq / 1e12 / (delta * delta)
        img = math.floor(1e6 * n_req)
        n_whole = img // 10**6 + (1 if img % 10**6 else 0)
        assert rows[et] == (m, img, n_whole, img <= m * 10**6)


def test_rfm_scores_twin(spark):
    ev = _fetch(
        f"SELECT user_id, epoch_us(ts), FLOOR(value * 1e6)"
        f" FROM read_parquet('{SF}/events.parquet')"
        f" WHERE event_type = 'purchase'"
    )
    per = defaultdict(lambda: [0, 0, 0])  # last_ts, freq, monetary
    for uid, us, v in ev:
        st = per[uid]
        st[0] = max(st[0], us)
        st[1] += 1
        st[2] += int(v)
    wm = max(st[0] for st in per.values())
    users = sorted(per)
    nu = len(users)
    rec = {u: (wm - per[u][0]) // DAY_US for u in users}

    def quintile(order):
        out = {}
        for r, u in enumerate(order, start=1):
            out[u] = (5 * (r - 1)) // nu
        return out

    r_q = quintile(sorted(users, key=lambda u: (-rec[u], u)))
    f_q = quintile(sorted(users, key=lambda u: (per[u][1], u)))
    m_q = quintile(sorted(users, key=lambda u: (per[u][2], u)))
    census = Counter((r_q[u], f_q[u], m_q[u]) for u in users)
    rows = {
        (r["r_q"], r["f_q"], r["m_q"]): r["n_users"]
        for r in all_queries()["win_rfm_scores"](spark, SF).collect()
    }
    assert rows == dict(census)
    assert sum(rows.values()) == nu
    # quintiles are balanced within 1 along each axis
    per_axis = Counter()
    for (rq, _f, _m), nvals in rows.items():
        per_axis[rq] += nvals
    assert max(per_axis.values()) - min(per_axis.values()) <= 1
