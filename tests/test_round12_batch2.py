"""Twins for round-12 batch 2 (queries/round12_batch2.py). Oracle hashes
are covered by test_contract.py."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def test_footer_stats_touch_no_data_pages(spark, sf_dir):
    """The audit must be metadata-only: per-partition n_rows/min/max from
    footers equal a pandas recompute, and the footer bytes themselves
    are a tiny fraction of the file (the 100-TB manifest-cost claim)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from sdg_data_catalog_spark.queries.round12_batch2 import (
        _ensure_footer_layout,
    )

    out = all_queries()["catalog_footer_stats"](spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    g = orders.groupby("o_orderpriority")["o_totalprice"]
    expect = pd.DataFrame(
        {
            "n_rows": g.size(),
            "min_price": g.min().round(2),
            "max_price": g.max().round(2),
        }
    ).reset_index()
    got = out.sort_values("priority").reset_index(drop=True)
    assert list(got["priority"]) == list(expect["o_orderpriority"])
    assert list(got["n_rows"]) == list(expect["n_rows"])
    assert np.allclose(got["min_price"], expect["min_price"])
    assert np.allclose(got["max_price"], expect["max_price"])

    layout = _ensure_footer_layout(spark, sf_dir)
    files = glob.glob(os.path.join(layout, "**", "*.parquet"), recursive=True)
    assert files
    for p in files[:2]:
        md = pq.ParquetFile(p).metadata
        assert md.serialized_size < os.path.getsize(p) / 4


def test_bcubed_aggregate_properties(spark, sf_dir):
    """Fold the per-(label, cell) decomposition to corpus-level B³ P/R
    and check the identities: both in (0, 1], Σ n_cl = N (every item in
    exactly one intersection), and P == R == 1 iff clusters ≡ classes
    (not the case for IVF cells vs labels, so strictly < 1 unless the
    clustering is degenerate-perfect). Also recompute from raw parquet
    with numpy."""
    out = all_queries()["eval_bcubed_pairs"](spark, sf_dir).toPandas()
    n = out["n_cl"].sum()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    assert n == len(emb)
    p = float((out["n_cl"] * out["n_cl"] / out["n_c"]).sum() / n)
    r = float((out["n_cl"] * out["n_cl"] / out["n_l"]).sum() / n)
    assert 0.0 < p <= 1.0 and 0.0 < r <= 1.0
    # per-item contributions in the table agree with the ratio columns
    assert np.allclose(out["precision_i"], (out["n_cl"] / out["n_c"]).round(6))
    assert np.allclose(out["recall_i"], (out["n_cl"] / out["n_l"]).round(6))
    # class sizes: n_l sums (over distinct labels) to N
    assert out.drop_duplicates("label")["n_l"].sum() == len(emb)


def test_resample_linear_matches_numpy(spark, sf_dir):
    """np.interp differential: per type, interpolate the deduped
    observation series onto the hourly grid and compare."""
    out = all_queries()["ts_resample_linear"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    hour = 3_600_000_000
    for etype, grp in ev.groupby("event_type"):
        obs = (
            grp.sort_values(["ts_us", "event_id"])
            .drop_duplicates("ts_us", keep="first")
            .sort_values("ts_us")
        )
        h0 = int(np.ceil(obs["ts_us"].min() / hour))
        h1 = int(obs["ts_us"].max() // hour)
        grid = np.arange(h0, h1 + 1) * hour
        # only grid points with both neighbors (inside the obs range)
        grid = grid[(grid >= obs["ts_us"].min()) & (grid <= obs["ts_us"].max())]
        want = np.interp(grid, obs["ts_us"], obs["value"])
        got = out[out["event_type"] == etype].sort_values("grid_ts_us")
        assert list(got["grid_ts_us"]) == list(grid)
        assert np.allclose(got["value_interp"], want.round(6), atol=1e-6)


def test_table_checksum_detects_mutation(spark, sf_dir):
    """The fingerprint property: recompute the orders checksum in pure
    Python (hashlib md5, same 32-bit prefix) and verify equality; then
    verify a single mutated row WOULD move the sum (the detection
    property replication validation relies on)."""
    import hashlib

    out = all_queries()["dq_table_checksum"](spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")

    def h(row_str: str) -> int:
        return int(hashlib.md5(row_str.encode()).hexdigest()[:8], 16)

    want = sum(
        h(f"{r.o_orderkey}|{r.o_custkey}|{r.o_orderstatus}|{r.o_orderpriority}")
        for r in orders.itertuples()
    )
    row = out[out["tbl"] == "orders"].iloc[0]
    assert int(row["checksum"]) == want
    assert int(row["n_rows"]) == len(orders)
    # mutation detection: flipping one custkey changes the sum
    r0 = orders.iloc[0]
    mutated = want - h(
        f"{r0.o_orderkey}|{r0.o_custkey}|{r0.o_orderstatus}|{r0.o_orderpriority}"
    ) + h(f"{r0.o_orderkey}|{r0.o_custkey + 1}|{r0.o_orderstatus}|{r0.o_orderpriority}")
    assert mutated != want


def test_pretrain_manifest_funnel_properties(spark, sf_dir):
    """Funnel invariants plus a pure-Python recompute of every stage."""
    import hashlib
    import re

    out = (
        all_queries()["pipeline_pretrain_manifest"](spark, sf_dir)
        .toPandas()
        .sort_values("stage_id")
        .reset_index(drop=True)
    )
    assert list(out["stage"]) == [
        "raw",
        "quality",
        "dedup_exact",
        "decontaminate",
        "token_budget",
    ]
    # monotone funnel
    assert all(
        out["n_docs"].iloc[i] >= out["n_docs"].iloc[i + 1] for i in range(4)
    )
    assert all(
        out["n_tokens"].iloc[i] >= out["n_tokens"].iloc[i + 1] for i in range(4)
    )
    assert out["n_tokens"].iloc[4] <= 200_000

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for r in docs.itertuples():
        toks = (r.text or "").split(" ")
        uniq = len(set(toks)) / len(toks)
        fp = hashlib.md5(
            " ".join(sorted(set((r.text or "").lower().split(" ")))).encode()
        ).hexdigest()
        rows.append((r.doc_id, len(toks), uniq, fp, r.text))
    df = pd.DataFrame(rows, columns=["doc_id", "ws", "uniq", "fp", "text"])
    assert out["n_docs"].iloc[0] == len(df) and out["n_tokens"].iloc[0] == df["ws"].sum()
    s1 = df[(df["ws"] >= 20) & (df["uniq"] >= 0.2)]
    assert out["n_docs"].iloc[1] == len(s1)
    s2 = s1.sort_values("doc_id").drop_duplicates("fp", keep="first")
    assert out["n_docs"].iloc[2] == len(s2)

    def sh3(text):
        t = text.split(" ")
        return {f"{t[i]} {t[i+1]} {t[i+2]}" for i in range(len(t) - 2)}

    ev = set()
    for r in docs[docs["doc_id"] % 97 == 0].itertuples():
        ev |= sh3(r.text or "")
    s3 = s2[
        (s2["doc_id"] % 97 != 0)
        & ~s2["text"].map(lambda t: bool(sh3(t or "") & ev))
    ]
    assert out["n_docs"].iloc[3] == len(s3) and out["n_tokens"].iloc[3] == s3["ws"].sum()
    s3s = s3.sort_values("doc_id")
    cum = s3s["ws"].cumsum()
    s4 = s3s[cum <= 200_000]
    assert out["n_docs"].iloc[4] == len(s4) and out["n_tokens"].iloc[4] == s4["ws"].sum()


def test_target_encode_shrinkage_properties(spark, sf_dir):
    """m-estimate identities: encoded lies strictly between the raw rate
    and the global prior (unless they coincide), approaches the prior as
    m/n grows, and a pandas recompute agrees."""
    out = all_queries()["feat_target_encode"](spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    prior = (orders["o_orderstatus"] == "F").mean()
    g = orders.groupby("o_orderpriority")["o_orderstatus"]
    for r in out.itertuples():
        sub = orders[orders["o_orderpriority"] == r.category]
        n, n_pos = len(sub), int((sub["o_orderstatus"] == "F").sum())
        assert (r.n, r.n_pos) == (n, n_pos)
        want = (n_pos + 10 * prior) / (n + 10)
        assert abs(r.encoded - round(want, 6)) < 1e-9
        lo, hi = sorted((r.raw_rate, prior))
        assert lo - 1e-9 <= r.encoded <= hi + 1e-9


def test_footer_reader_aggregates_across_rowgroups(tmp_path):
    """The footer fold must aggregate min/max/rows across MULTIPLE row
    groups (the partitioned layout at test SFs writes single-rowgroup
    files, so this path only runs here): write a 1000-row file with
    row_group_size=100 (10 rowgroups) and check the metadata-only fold
    equals the data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdg_data_catalog_spark.queries.round12_batch2 import (
        catalog_footer_stats,  # noqa: F401 — module import for _footers scope
    )

    rng = np.random.RandomState(7)
    vals = rng.uniform(1.0, 9999.0, size=1000)
    t = pa.table({"o_totalprice": vals})
    p = tmp_path / "multi_rg.parquet"
    pq.write_table(t, p, row_group_size=100)
    md = pq.ParquetFile(p).metadata
    assert md.num_row_groups == 10
    ci = md.schema.names.index("o_totalprice")
    lo, hi, n = None, None, 0
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        assert st is not None and st.has_min_max
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
        n += md.row_group(rg).num_rows
    assert n == 1000
    assert abs(lo - vals.min()) < 1e-12 and abs(hi - vals.max()) < 1e-12
