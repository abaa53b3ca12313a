"""Differential / property twins for round-10 batch 15."""

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


def test_overdispersion_twin(spark):
    ev = _fetch(
        f"SELECT event_type, epoch_us(ts) // {DAY_US}"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    daily = Counter(ev)
    per_type = defaultdict(list)
    for (et, _day), y in daily.items():
        per_type[et].append(y)
    rows = {
        r["event_type"]: (r["n_days"], r["dispersion_x1e6"], r["overdispersed"])
        for r in all_queries()["agg_negbin_overdispersion"](spark, SF).collect()
    }
    for et, ys in per_type.items():
        n = len(ys)
        s1, s2 = sum(ys), sum(y * y for y in ys)
        disp = ((n * s2 - s1 * s1) / (n * (n - 1))) / (s1 / n)
        d_img = math.floor(1e6 * disp * (n - 1))
        bound = math.floor(1e6 * ((n - 1) + 2 * math.sqrt(2 * (n - 1))))
        assert rows[et] == (n, math.floor(1e6 * disp), d_img > bound)


def test_backfill_twin(spark):
    ev = _fetch(
        f"SELECT DISTINCT event_type, epoch_us(ts) // {DAY_US}"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    per_type = defaultdict(set)
    for et, day in ev:
        per_type[et].add(day)
    expect = []
    for et in sorted(per_type):
        days = per_type[et]
        missing = sorted(
            d for d in range(min(days), max(days) + 1) if d not in days
        )
        runs = []
        for d in missing:
            if runs and d == runs[-1][1] + 1:
                runs[-1][1] = d
            else:
                runs.append([d, d])
        for start, end in runs:
            b = start
            while b <= end:
                e = min(b + 6, end)
                expect.append((et, b, e, e - b + 1))
                b += 7
    rows = [
        (r["event_type"], r["batch_start_day"], r["batch_end_day"], r["n_days"])
        for r in all_queries()["plan_backfill_batches"](spark, SF).collect()
    ]
    assert rows == expect
    # every batch is at most 7 days and batches within a type don't overlap
    assert all(1 <= r[3] <= 7 for r in rows)


def test_silence_trim_twin(spark):
    """Replay the trim locally through the real codec path."""
    import numpy as np

    from sdg_data_catalog_spark.operators.audiocodec import (
        wav_decode,
        wav_encode,
    )
    from sdg_data_catalog_spark.operators.multimodal import synthetic_samples

    rows = {
        r["media_id"]: (
            r["orig_samples"], r["trimmed_samples"],
            r["n_lead_windows"], r["n_trail_windows"],
        )
        for r in all_queries()["mm_wav_silence_trim"](spark, SF).collect()
    }
    assert len(rows) == 500
    for did in rows:
        s = synthetic_samples(did).astype(np.int64)
        nw = (len(s) + 31) // 32
        act = [
            int((s[w * 32 : (w + 1) * 32] ** 2).sum()) >= 160_000
            for w in range(nw)
        ]
        if any(act):
            first = act.index(True)
            last = nw - 1 - act[::-1].index(True)
            sliced = synthetic_samples(did)[
                first * 32 : min((last + 1) * 32, len(s))
            ]
            lead, trail = first, nw - 1 - last
        else:
            sliced = synthetic_samples(did)[:0]
            lead, trail = nw, 0
        back, _ = wav_decode(wav_encode(sliced))
        assert rows[did] == (len(s), len(back), lead, trail)
    # trims must actually remove something somewhere
    assert any(v[1] < v[0] for v in rows.values())


def test_csv_permissive_twin(spark):
    docs = _fetch(
        f"SELECT doc_id, n_chars FROM read_parquet('{SF}/documents.parquet')"
    )
    corrupt = [d for d, _n in docs if d % 7 == 3]
    good_chars = sum(n for d, n in docs if d % 7 != 3)
    row = all_queries()["scan_csv_permissive"](spark, SF).collect()[0]
    assert row["n_rows"] == len(docs)
    assert row["n_corrupt"] == len(corrupt)
    assert row["n_good"] == len(docs) - len(corrupt)
    assert row["sum_good_chars"] == good_chars
    assert row["n_corrupt"] > 0  # the corruption rule really fires
