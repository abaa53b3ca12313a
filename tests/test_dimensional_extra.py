"""Invariant tests for the round-6 dimensional/rule-mining batch
(queries/dimensional_extra.py): SCD2 interval algebra, binned range-join
exactness against a brute-force twin, association-rule identities, and
tokenizer-fertility consistency."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import all_queries


def test_scd2_merge_interval_algebra_and_rebuild_equality(spark, sf_dir):
    rows = all_queries()["etl_scd2_merge"](spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, versions in by_user.items():
        versions.sort(key=lambda r: r.valid_from_us)
        # exactly one current row per user, and it is the last one
        currents = [r for r in versions if r.is_current == 1]
        assert len(currents) == 1, uid
        assert versions[-1].is_current == 1
        for prev, nxt in zip(versions, versions[1:]):
            # contiguous, half-open, non-degenerate versions
            assert prev.valid_to_us == nxt.valid_from_us
            assert prev.valid_from_us < prev.valid_to_us
            # consecutive versions actually change state
            assert prev.status != nxt.status
    # incremental apply == full-stream rebuild (pandas twin)
    ev = (
        table(spark, sf_dir, "events")
        .filter("user_id % 3 = 0")
        .selectExpr(
            "user_id", "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us", "event_id",
        )
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
    )
    expect = set()
    for uid, grp in ev.groupby("user_id"):
        prev, starts = None, []
        for r in grp.itertuples():
            if r.event_type != prev:
                starts.append((r.event_type, r.ts_us))
                prev = r.event_type
        for k, (st, fr) in enumerate(starts):
            to = starts[k + 1][1] if k + 1 < len(starts) else None
            expect.add((uid, st, fr, to, int(to is None)))
    got = {
        (r.user_id, r.status, r.valid_from_us, r.valid_to_us, r.is_current)
        for r in rows
    }
    assert got == expect


def test_interval_overlap_matches_bruteforce(spark, sf_dir):
    out = all_queries()["join_interval_overlap"](spark, sf_dir).toPandas()
    assert len(out)
    ev = (
        table(spark, sf_dir, "events")
        .selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
            "event_type",
        )
        .toPandas()
    )
    errs = ev[ev.event_type == "error"].ts_us.to_numpy()
    for r in out.itertuples():
        expect = int(((errs >= r.lo_us) & (errs <= r.hi_us)).sum())
        assert r.n_err == expect, (r.user_id, r.lo_us)
    # intervals only for the probed users, and all padded symmetrically
    assert set(out.user_id % 7) == {0}


def test_assoc_rules_identities(spark, sf_dir):
    out = all_queries()["fpm_assoc_rules"](spark, sf_dir).toPandas()
    if not len(out):
        pytest.skip("no frequent pairs at this scale")
    # every rule appears with its reverse, sharing pair_freq
    keys = {(r.antecedent, r.consequent): r.pair_freq for r in out.itertuples()}
    for (a, c), f in keys.items():
        assert keys.get((c, a)) == f
    assert (out.confidence > 0).all() and (out.confidence <= 1.0 + 1e-9).all()
    # lift symmetric across the two directions of a pair
    lift = {(r.antecedent, r.consequent): r.lift for r in out.itertuples()}
    for (a, c), lv in lift.items():
        assert math.isclose(lift[(c, a)], lv, abs_tol=2e-6)


def test_tokenizer_fertility_consistent_with_local(spark, sf_dir):
    out = all_queries()["agg_tokenizer_fertility"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok_re = re.compile(r"[a-z]+|[0-9]|[^a-z0-9 ]")
    for row in out.itertuples():
        sub = docs[docs.lang == row.lang]
        words = int(sub.text.map(lambda t: len(t.split(" "))).sum())
        toks = int(sub.text.map(lambda t: len(tok_re.findall(t.lower()))).sum())
        assert row.n_docs == len(sub)
        assert row.n_words == words
        assert row.n_tokens == toks
        assert row.fertility == pytest.approx(toks / words, abs=1e-6)
