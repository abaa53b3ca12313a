"""Twins for round-13 batch 1 (queries/round13_batch1.py). Oracle hashes
are covered by test_contract.py."""

from __future__ import annotations

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def test_column_checksums_match_python_recompute(spark, sf_dir):
    """Per-column checksum equals a pure-Python recompute of the same
    null-safe mod-1e9+7 idiom, and a single mutated value moves exactly
    that column's checksum."""
    import hashlib

    P = 1_000_000_007

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % P

    out = (
        all_queries()["dq_column_checksums"](spark, sf_dir)
        .toPandas()
        .set_index(["tbl", "col_name"])
    )
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    for col in ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"):
        want = sum(h(str(v)) for v in orders[col]) % P
        assert int(out.loc[("orders", col), "checksum"]) == want, col
        assert int(out.loc[("orders", col), "n_nulls"]) == 0
    # localization: mutating one o_custkey value moves ONLY that column
    base = {
        col: sum(h(str(v)) for v in orders[col]) % P
        for col in ("o_orderkey", "o_custkey")
    }
    mutated = (
        base["o_custkey"] - h(str(orders["o_custkey"].iloc[0]))
        + h(str(orders["o_custkey"].iloc[0] + 1))
    ) % P
    assert mutated != base["o_custkey"]


def test_column_checksums_null_safe_cross_engine(spark, tmp_path):
    """On a crafted corpus with planted NULLs, empty strings, and
    non-ASCII, Spark and DuckDB produce identical per-column rows —
    including correct n_nulls (a NULL is hashed as the chr(1) sentinel,
    not dropped)."""
    import duckdb

    from sdg_data_catalog_spark.oracle_check import compare
    from sdg_data_catalog_spark.queries.registry import all_oracles

    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array([1, None, 3], dtype="Int64"),
            "o_custkey": pd.array([10, 20, None], dtype="Int64"),
            "o_orderstatus": [None, "", "Ω"],
            "o_orderpriority": ["1-URGENT", None, "日本語"],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": pd.array([None], dtype="Int64"),
            "c_nationkey": pd.array([2], dtype="Int64"),
            "c_mktsegment": [None],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": pd.array([1, None], dtype="Int64"),
            "l_linenumber": pd.array([None, 2], dtype="Int64"),
            "l_partkey": pd.array([7, 8], dtype="Int64"),
            "l_returnflag": ["R", None],
        }
    )
    for name, df in (
        ("orders", orders),
        ("customer", customer),
        ("lineitem", lineitem),
    ):
        df.to_parquet(tmp_path / f"{name}.parquet")
    con = duckdb.connect()
    for name in ("orders", "customer", "lineitem"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{tmp_path / name}.parquet')"
        )
    got = all_queries()["dq_column_checksums"](spark, str(tmp_path))
    err = compare(
        "dq_column_checksums", got, all_oracles()["dq_column_checksums"], con
    )
    assert err is None, err
    pdf = got.toPandas().set_index(["tbl", "col_name"])
    assert int(pdf.loc[("orders", "o_orderkey"), "n_nulls"]) == 1
    assert int(pdf.loc[("customer", "c_custkey"), "n_nulls"]) == 1
    assert int(pdf.loc[("lineitem", "l_orderkey"), "n_nulls"]) == 1
    assert int(pdf.loc[("lineitem", "l_returnflag"), "n_nulls"]) == 1


def test_column_checksums_cover_every_fingerprinted_table(spark, sf_dir):
    """The drill-down covers exactly the tables (and columns) its parent
    dq_table_checksum fingerprints — a table the fingerprint can flag but
    the drill-down can't localize would make the pair useless."""
    out = all_queries()["dq_column_checksums"](spark, sf_dir).toPandas()
    assert set(out["tbl"]) == {"orders", "customer", "lineitem"}
    got_lineitem = set(out[out["tbl"] == "lineitem"]["col_name"])
    assert got_lineitem == {
        "l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"
    }


def test_column_checksums_single_scan_per_table(spark, sf_dir):
    """The 2·n_cols aggregates must fold into ONE scan per table — the
    plan contains exactly one scan per audited table (orders, customer,
    lineitem), not one per column."""
    df = all_queries()["dq_column_checksums"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("orders.parquet") <= 1
    assert plan.lower().count("customer.parquet") <= 1
    assert plan.lower().count("lineitem.parquet") <= 1


def _winnow_py(text: str) -> set[int]:
    """Module-level pure-Python reference of the op's winnowing: k-gram
    32-bit md5 prefixes, window-minimum fingerprints, the <w fallback.
    Shared by both winnowing tests so the reference cannot drift."""
    import hashlib

    from sdg_data_catalog_spark.queries.round13_batch1 import _WIN_K, _WIN_W

    t = text.lower().split(" ")
    h = [
        int(hashlib.md5(" ".join(t[i : i + _WIN_K]).encode()).hexdigest()[:8], 16)
        for i in range(len(t) - _WIN_K + 1)
    ]
    if len(h) >= _WIN_W:
        return {min(h[j : j + _WIN_W]) for j in range(len(h) - _WIN_W + 1)}
    return {min(h)} if h else set()


def test_winnowing_guarantee_finds_planted_neardups(spark, sf_dir):
    """Exact pure-Python recompute of the whole op (fingerprints, df cap,
    pair threshold) over the planted near-dup corpus: the engine's pair
    set and per-pair n_shared must match the reference implementation
    row-for-row. Subsumes the winnowing guarantee: a first-token-dropped
    copy's fingerprint set is a subset of the original's, so every pair
    the reference surfaces, the engine must too."""
    from collections import Counter, defaultdict

    from sdg_data_catalog_spark.queries.round13_batch1 import (
        _WIN_CAP,
        _WIN_K,
        _WIN_MIN_SHARED,
        _WIN_W,
    )

    out = all_queries()["dedup_winnowing_pairs"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    fps = {}
    for r in docs.itertuples():
        fps[r.doc_id] = _winnow_py(r.text)
        # mirror the op's substr(text, instr+1): a spaceless doc copies whole
        copy = r.text.split(" ", 1)[1] if " " in r.text else r.text
        fps[r.doc_id + 1_000_000] = _winnow_py(copy)
        # subset property: holds whenever the copy winnows over proper
        # windows (>= w hashes); in the <w fallback the copy keeps only
        # min(h) while the original may winnow a different minimum, so
        # the guard is required, not cosmetic
        if len(copy.split(" ")) >= _WIN_K + _WIN_W - 1:
            assert fps[r.doc_id + 1_000_000] <= fps[r.doc_id]
    df = Counter(f for s in fps.values() for f in s)
    buckets = defaultdict(list)
    for d, s in fps.items():
        for f in s:
            if df[f] <= _WIN_CAP:
                buckets[f].append(d)
    shared: Counter = Counter()
    for ds in buckets.values():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    want = {p: c for p, c in shared.items() if c >= _WIN_MIN_SHARED}
    got = {
        (int(r.doc_a), int(r.doc_b)): int(r.n_shared) for r in out.itertuples()
    }
    assert got == want


def test_winnowing_matches_python_recompute_and_short_docs(spark, tmp_path):
    """Pure-Python winnowing over a tiny corpus with planted short docs
    (0 grams, <w windows): fingerprint sets match the engine exactly and
    nothing crashes on 1-3-token docs."""
    import duckdb

    from sdg_data_catalog_spark.oracle_check import compare
    from sdg_data_catalog_spark.queries.registry import all_oracles

    rows = [
        (0, "one"),
        (1, "two tokens"),
        (2, "just three tokens here"),  # 4 tokens: 1 gram, <w windows
        (3, "a b c d e f g h i j k l m n o p"),
        (4, "a b c d e f g h i j k l m n o q"),
    ]
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
    got = all_queries()["dedup_winnowing_pairs"](spark, str(tmp_path))
    err = compare(
        "dedup_winnowing_pairs", got, all_oracles()["dedup_winnowing_pairs"], con
    )
    assert err is None, err

    # docs 3 and 4 share all but the final token: 16 tokens, 13 grams,
    # the first 8 windows are over identical grams -> shared fps >= 2
    shared = _winnow_py(rows[3][1]) & _winnow_py(rows[4][1])
    pdf = got.toPandas()
    pair = pdf[(pdf["doc_a"] == 3) & (pdf["doc_b"] == 4)]
    assert len(pair) == 1
    assert int(pair["n_shared"].iloc[0]) == len(shared) >= 2
