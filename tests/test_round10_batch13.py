"""Differential / property twins for round-10 batch 13."""

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


def _survival_subjects():
    ev = _fetch(
        f"SELECT user_id, event_type, epoch_us(ts)"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    per_user = defaultdict(list)
    for uid, et, us in ev:
        per_user[uid].append((et, us))
    subjects = []
    for uid, rows in per_user.items():
        t0s = [us for et, us in rows if et == "signup"]
        if not t0s:
            continue
        t0 = min(t0s)
        purchases = [us for et, us in rows if et == "purchase" and us > t0]
        if purchases:
            subjects.append(((min(purchases) - t0) // DAY_US, 1))
        else:
            subjects.append(((max(us for _et, us in rows) - t0) // DAY_US, 0))
    return subjects


def test_weibull_fit_twin(spark):
    """Replay the NA hazard curve and the log-log OLS sequentially."""
    subjects = _survival_subjects()
    census = defaultdict(lambda: [0, 0])  # day -> [d, c]
    for day, died in subjects:
        census[day][0] += died
        census[day][1] += 1
    days = sorted(census)
    at_risk, h, pts = 0, 0, []
    for day in reversed(days):
        at_risk += census[day][1]
        census[day].append(at_risk)
    for day in days:
        d, _c, n = census[day]
        if d > 0:
            h += math.floor(1e9 * d / n)
        if day >= 1 and h > 0:
            pts.append(
                (
                    math.floor(1e6 * math.log(day)),
                    math.floor(1e6 * math.log(h / 1e9)),
                )
            )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    k = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lam = math.exp(-(sy / n - k * sx / n) / k / 1e6)
    row = all_queries()["agg_weibull_fit"](spark, SF).collect()[0]
    assert row["n"] == n
    assert row["k_x1e6"] == math.floor(1e6 * k)
    assert abs(row["lambda_days_x1e6"] - math.floor(1e6 * lam)) <= 2
    assert row["hazard_rising"] == (row["k_x1e6"] > 1_000_000)
    # characteristic life must land inside the observed day range
    assert 0 < row["lambda_days_x1e6"] / 1e6 <= max(days) + 1


def test_knn_label_eval_twin(spark):
    embs = _fetch(
        f"SELECT vec_id, embedding, label"
        f" FROM read_parquet('{SF}/embeddings.parquet')"
    )
    vecs = {v: (e, l) for v, e, l in embs}

    def cos(a, b):
        num = na = nb = 0.0
        for x, y in zip(a, b):
            num += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        return num / (math.sqrt(na) * math.sqrt(nb))

    rows = {
        r["q_id"]: (r["true_label"], r["predicted"], r["n_votes"], r["is_correct"])
        for r in all_queries()["ml_knn_label_eval"](spark, SF).collect()
    }
    assert len(rows) == 32
    for qid in range(32):
        qe, ql = vecs[qid]
        scored = sorted(
            ((-cos(qe, e), v, l) for v, (e, l) in vecs.items() if v != qid),
        )
        votes = Counter(l for _s, _v, l in scored[:5])
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert rows[qid] == (ql, pred[0], pred[1], ql == pred[0])


def test_langid_confusion_twin(spark):
    """The confusion rollup must exactly aggregate the registered
    text_langid op's per-doc output."""
    per_doc = all_queries()["text_langid"](spark, SF).collect()
    langs = dict(
        _fetch(f"SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')")
    )
    cm = Counter()
    for r in per_doc:
        cm[(langs[r["doc_id"]], r["predicted_lang"])] += 1
    totals = Counter()
    for (a, _p), n in cm.items():
        totals[a] += n
    rows = {
        (r["actual"], r["predicted"]): (r["n"], r["share_of_actual_x1e6"])
        for r in all_queries()["eval_langid_confusion"](spark, SF).collect()
    }
    assert set(rows) == set(cm)
    for key, n in cm.items():
        assert rows[key] == (n, 10**6 * n // totals[key[0]])
    # zh has no profile: all zh mass must land on other languages
    assert all(p != "zh" for _a, p in rows)


def test_streak_census_twin(spark):
    ev = _fetch(
        f"SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US}"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    per_user = defaultdict(set)
    for uid, day in ev:
        per_user[uid].add(day)
    hist = Counter()
    for days in per_user.values():
        ds = sorted(days)
        best = cur = 1
        for a, b in zip(ds, ds[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        hist[best] += 1
    rows = {
        r["streak_days"]: r["n_users"]
        for r in all_queries()["win_streak_census"](spark, SF).collect()
    }
    assert rows == dict(hist)
    assert sum(rows.values()) == len(per_user)
