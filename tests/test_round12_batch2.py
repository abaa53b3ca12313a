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


_CKSUM_P = 1_000_000_007


def _cksum_py(row_strs) -> int:
    """Pure-Python replica of the op's checksum: 32-bit md5 prefix per
    row, reduced mod 1e9+7 per row and again over the sum."""
    import hashlib

    return (
        sum(
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % _CKSUM_P
            for s in row_strs
        )
        % _CKSUM_P
    )


def test_table_checksum_detects_mutation(spark, sf_dir):
    """The fingerprint property: recompute the orders checksum in pure
    Python (hashlib md5, same 32-bit prefix, same mod-1e9+7 reduction)
    and verify equality; then verify a single mutated row WOULD move the
    sum (the detection property replication validation relies on)."""
    out = all_queries()["dq_table_checksum"](spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")

    strs = [
        f"{r.o_orderkey}|{r.o_custkey}|{r.o_orderstatus}|{r.o_orderpriority}"
        for r in orders.itertuples()
    ]
    want = _cksum_py(strs)
    row = out[out["tbl"] == "orders"].iloc[0]
    assert int(row["checksum"]) == want
    assert int(row["n_rows"]) == len(orders)
    # mutation detection: flipping one custkey changes the sum
    r0 = orders.iloc[0]
    mutated = _cksum_py(
        [f"{r0.o_orderkey}|{r0.o_custkey + 1}|{r0.o_orderstatus}|{r0.o_orderpriority}"]
        + strs[1:]
    )
    assert mutated != want


def test_table_checksum_null_short_nonascii(spark, tmp_path):
    """The round-12 red-row regression test: on a crafted corpus with
    planted NULLs (int and string columns), empty/1-char strings, and
    non-ASCII text, Spark and DuckDB produce the SAME BIGINT checksum —
    i.e. the coalesce-to-chr(1) canonicalization is byte-identical on
    both engines and no row is silently dropped from the sum by
    NULL-propagating concatenation."""
    import duckdb

    from sdg_data_catalog_spark.oracle_check import compare
    from sdg_data_catalog_spark.queries.registry import all_oracles

    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array([1, 2, None, 4, 5], dtype="Int64"),
            "o_custkey": pd.array([None, 20, 30, 40, 50], dtype="Int64"),
            "o_orderstatus": ["F", None, "", "O", "P"],
            "o_orderpriority": ["1-URGENT", "2-HIGH", None, "", "héllo‡ 日本語"],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": pd.array([1, None], dtype="Int64"),
            "c_nationkey": pd.array([None, 2], dtype="Int64"),
            "c_mktsegment": ["x", None],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": pd.array([1, 2, None], dtype="Int64"),
            "l_linenumber": pd.array([1, None, 3], dtype="Int64"),
            "l_partkey": pd.array([None, 8, 9], dtype="Int64"),
            "l_returnflag": ["A", "ü", None],
        }
    )
    for name, df in (("orders", orders), ("customer", customer), ("lineitem", lineitem)):
        df.to_parquet(tmp_path / f"{name}.parquet")
    con = duckdb.connect()
    for name in ("orders", "customer", "lineitem"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{tmp_path / name}.parquet')"
        )
    got = all_queries()["dq_table_checksum"](spark, str(tmp_path))
    err = compare(
        "dq_table_checksum", got, all_oracles()["dq_table_checksum"], con
    )
    assert err is None, err
    # every row participates: n_rows equals the full table sizes
    pdf = got.toPandas().set_index("tbl")
    assert int(pdf.loc["orders", "n_rows"]) == 5
    assert int(pdf.loc["customer", "n_rows"]) == 2
    assert int(pdf.loc["lineitem", "n_rows"]) == 3
    # and the planted NULL actually moved the checksum vs a non-null twin
    strs_null = _cksum_py(["1|\x01|x", "\x01|2|\x01"])
    strs_zero = _cksum_py(["1|0|x", "0|2|0"])
    assert strs_null != strs_zero


def test_pretrain_manifest_short_docs(spark, tmp_path):
    """Planted 1- and 2-token docs (including in the eval split) must not
    crash the shingle legs (F.sequence would descend for <3 tokens) and
    must match the oracle end to end — the round-12 dead-filter
    regression test."""
    import duckdb

    from sdg_data_catalog_spark.oracle_check import compare
    from sdg_data_catalog_spark.queries.registry import all_oracles

    rng = np.random.default_rng(13)
    rows = []
    # eval-split doc_ids are multiples of 97: plant short docs there too
    for doc_id in [0, 97, 194]:
        rows.append((doc_id, "one" if doc_id == 0 else "two tokens"))
    rows.append((1, "solo"))
    rows.append((2, "two words"))
    vocab = [f"w{i}" for i in range(40)]
    for doc_id in range(3, 60):
        if doc_id % 97 == 0:
            continue
        n = int(rng.integers(25, 60))
        rows.append((doc_id, " ".join(rng.choice(vocab, size=n))))
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs["lang"] = "en"
    docs["source"] = "synth"
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    got = all_queries()["pipeline_pretrain_manifest"](spark, str(tmp_path))
    err = compare(
        "pipeline_pretrain_manifest",
        got,
        all_oracles()["pipeline_pretrain_manifest"],
        con,
    )
    assert err is None, err


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
