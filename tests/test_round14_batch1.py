"""Twins for round-14 batch 1 (queries/round14_batch1.py): the xxhash64
production twins are rows-only in the driver (DuckDB has no xxhash64),
so THESE tests are their certification chain — a pure-Python XXH64
reference pinned to Spark's builtin, then exact recomputes of each twin
through that reference, then cross-twin pins against the md5-certified
paths. Plus the retention-prune lifecycle invariants."""

from __future__ import annotations

import pandas as pd
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries

# ---------------------------------------------------------------------------
# Pure-Python XXH64 (public spec: github.com/Cyan4973/xxHash, XXH64 with
# Spark's default seed 42 over the UTF-8 bytes — exactly what
# org.apache.spark.sql.catalyst.expressions.XxHash64 computes for a
# string column). This is the independent reference the twins certify
# against; test_xxh64_reference_matches_spark pins it to the engine.
# ---------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _rnd(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    return (((acc ^ _rnd(0, val)) * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Signed-64 XXH64, matching Spark's ``xxhash64`` on a string col."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _rnd(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _rnd(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _rnd(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _rnd(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _rnd(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def test_xxh64_reference_matches_spark(spark):
    """The pure-Python reference IS the twins' certification anchor —
    pin it to the engine on every byte-length class (empty, <4, <8,
    tail-4, tail-1, 31/32/33-byte block boundaries, non-ASCII, the
    chr(1) sentinel)."""
    from pyspark.sql import functions as F

    samples = [
        "",
        "a",
        "abc",
        "abcd",
        "abcdefg",
        "abcdefgh",
        "Ω non-ascii 日本語",
        "x" * 31,
        "y" * 32,
        "z" * 33,
        "pipe|joined|\x01|stuff",
        "the quick brown fox jumps over the lazy dog repeatedly enough",
    ]
    got = (
        spark.createDataFrame([(s,) for s in samples], ["s"])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in got:
        assert xxh64(r["s"].encode("utf-8")) == r["h"], repr(r["s"])


# ---------------------------------------------------------------------------
# dq_table_checksum_fast
# ---------------------------------------------------------------------------

_P = 1_000_000_007

_FAST_COLSETS = {
    "orders": ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
    "customer": ("c_custkey", "c_nationkey", "c_mktsegment"),
    "lineitem": ("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"),
}


def _fast_cksum_py(df: pd.DataFrame, cols) -> int:
    total = 0
    for row in df[list(cols)].itertuples(index=False):
        joined = "|".join(
            "\x01" if v is None or v is pd.NA else str(v) for v in row
        )
        total += xxh64(joined.encode("utf-8")) % _P
    return total % _P


def test_table_checksum_fast_matches_python_recompute(spark, sf_dir):
    """Every table's fast checksum equals the pure-Python XXH64
    recompute of the identical canonicalization, and n_rows per table
    equals the md5-certified twin's — the two twins can only differ in
    the hash function, never in what they fingerprint."""
    out = (
        all_queries()["dq_table_checksum_fast"](spark, sf_dir)
        .toPandas()
        .set_index("tbl")
    )
    md5 = (
        all_queries()["dq_table_checksum"](spark, sf_dir)
        .toPandas()
        .set_index("tbl")
    )
    assert set(out.index) == set(md5.index) == set(_FAST_COLSETS)
    for tbl, cols in _FAST_COLSETS.items():
        pdf = pd.read_parquet(f"{sf_dir}/{tbl}.parquet")
        assert int(out.loc[tbl, "n_rows"]) == len(pdf) == int(md5.loc[tbl, "n_rows"])
        assert int(out.loc[tbl, "checksum"]) == _fast_cksum_py(pdf, cols), tbl


def test_table_checksum_fast_null_safe_and_order_invariant(spark, tmp_path):
    """On a crafted corpus with planted NULLs, empty strings, and
    non-ASCII: (a) the fast checksum equals the Python recompute with
    the chr(1) NULL sentinel, (b) reversing row order leaves every
    checksum unchanged (sum mod p commutes), (c) mutating one value or
    nulling one field moves the checksum."""
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array([1, None, 3, 4], dtype="Int64"),
            "o_custkey": pd.array([10, 20, None, 40], dtype="Int64"),
            "o_orderstatus": [None, "", "Ω", "F"],
            "o_orderpriority": ["1-URGENT", None, "日本語", "5-LOW"],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": pd.array([None, 7], dtype="Int64"),
            "c_nationkey": pd.array([2, None], dtype="Int64"),
            "c_mktsegment": [None, "BUILDING"],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": pd.array([1], dtype="Int64"),
            "l_linenumber": pd.array([None], dtype="Int64"),
            "l_partkey": pd.array([9], dtype="Int64"),
            "l_returnflag": ["R"],
        }
    )
    frames = {"orders": orders, "customer": customer, "lineitem": lineitem}

    def run(root) -> dict[str, int]:
        out = (
            all_queries()["dq_table_checksum_fast"](spark, str(root))
            .toPandas()
            .set_index("tbl")
        )
        return {t: int(out.loc[t, "checksum"]) for t in frames}

    d1 = tmp_path / "fwd"
    d1.mkdir()
    for name, df in frames.items():
        df.to_parquet(d1 / f"{name}.parquet")
    got = run(d1)
    for tbl, cols in _FAST_COLSETS.items():
        # pandas surfaces parquet NULLs as pd.NA/None — map both to chr(1)
        assert got[tbl] == _fast_cksum_py(frames[tbl], cols), tbl

    d2 = tmp_path / "rev"
    d2.mkdir()
    for name, df in frames.items():
        df.iloc[::-1].to_parquet(d2 / f"{name}.parquet")
    assert run(d2) == got  # order-invariant

    d3 = tmp_path / "mut"
    d3.mkdir()
    mut = {k: v.copy() for k, v in frames.items()}
    mut["orders"].loc[3, "o_custkey"] = 41  # mutate one value
    mut["customer"].loc[1, "c_mktsegment"] = None  # null one field
    for name, df in mut.items():
        df.to_parquet(d3 / f"{name}.parquet")
    got3 = run(d3)
    assert got3["orders"] != got["orders"]
    assert got3["customer"] != got["customer"]
    assert got3["lineitem"] == got["lineitem"]  # untouched table unmoved


# ---------------------------------------------------------------------------
# dedup_winnowing_fast
# ---------------------------------------------------------------------------


def _winnow_fast_py(text: str) -> set[int]:
    """Pure-Python reference of the fast op's winnowing: XXH64 gram
    hashes (signed, exactly Spark's xxhash64), window minima, the <w
    fallback — the same structure as round-13's md5 `_winnow_py`."""
    from sdg_data_catalog_spark.queries.round13_batch1 import _WIN_K, _WIN_W

    t = text.lower().split(" ")
    h = [
        xxh64(" ".join(t[i : i + _WIN_K]).encode("utf-8"))
        for i in range(len(t) - _WIN_K + 1)
    ]
    if len(h) >= _WIN_W:
        return {min(h[j : j + _WIN_W]) for j in range(len(h) - _WIN_W + 1)}
    return {min(h)} if h else set()


def test_winnowing_fast_matches_python_recompute(spark, sf_dir):
    """Exact pure-Python recompute of the WHOLE fast op (XXH64
    fingerprints, df cap, pair threshold) over the planted near-dup
    corpus: pair set and per-pair n_shared match row-for-row. This is
    the rows-only twin's full certification — same strength as the md5
    twin's recompute test, anchored by
    test_xxh64_reference_matches_spark."""
    from collections import Counter, defaultdict

    from sdg_data_catalog_spark.queries.round13_batch1 import (
        _WIN_CAP,
        _WIN_MIN_SHARED,
    )

    out = all_queries()["dedup_winnowing_fast"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    fps = {}
    for r in docs.itertuples():
        fps[r.doc_id] = _winnow_fast_py(r.text)
        copy = r.text.split(" ", 1)[1] if " " in r.text else r.text
        fps[r.doc_id + 1_000_000] = _winnow_fast_py(copy)
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


def test_winnowing_fast_and_md5_agree_on_planted_recall(spark, sf_dir):
    """The twins select DIFFERENT window minima (hash-dependent), so
    their pair sets may differ near the n_shared threshold — but on the
    planted near-dups (orig, orig+1e6) their recall must be essentially
    identical: the winnowing guarantee is hash-agnostic. Pin >= 98%
    agreement on the planted set (the deterministic fixture makes the
    exact overlap stable; the slack covers only threshold-edge docs)."""
    md5 = all_queries()["dedup_winnowing_pairs"](spark, sf_dir).toPandas()
    fast = all_queries()["dedup_winnowing_fast"](spark, sf_dir).toPandas()

    def planted(df: pd.DataFrame) -> set[tuple[int, int]]:
        return {
            (int(a), int(b))
            for a, b in zip(df["doc_a"], df["doc_b"])
            if b == a + 1_000_000
        }

    p_md5, p_fast = planted(md5), planted(fast)
    assert len(p_md5) > 100 and len(p_fast) > 100
    overlap = len(p_md5 & p_fast)
    assert overlap >= 0.98 * max(len(p_md5), len(p_fast))


# ---------------------------------------------------------------------------
# catalog_retention_prune / atomic.prune
# ---------------------------------------------------------------------------


def test_prune_never_evicts_live_version_after_rollback(spark, tmp_path):
    """prune() with LATEST rolled back BELOW the retention horizon keeps
    the live version anyway: retention must not evict what readers
    resolve. Here v0..v3 exist, rollback×3 puts LATEST on v0, and
    prune(keep=2) removes only v1 (v2, v3 kept by count, v0 kept because
    it is live)."""
    import os

    from sdg_data_catalog_spark.sources.atomic import (
        latest_version,
        prune,
        publish,
        read_latest,
        rollback,
    )

    root = str(tmp_path / "store")
    for v in range(4):
        publish(spark.range(10 + v).withColumnRenamed("id", "k"), root, v, keep=10)
    for _ in range(3):
        rollback(root)
    assert latest_version(root)[1] == 0
    pruned = prune(root, keep=2)
    assert pruned == [1]
    kept = sorted(os.listdir(os.path.join(root, "versions")))
    assert kept == ["v000000000", "v000000002", "v000000003"]
    assert read_latest(spark, root).count() == 10  # live v0 intact


def test_pruned_version_is_gone_and_latest_unaffected(spark, tmp_path):
    """After prune: read_version of a pruned snapshot raises, read_latest
    returns the exact live rows, and re-running prune is a no-op
    (idempotent)."""
    from sdg_data_catalog_spark.sources.atomic import (
        prune,
        publish,
        read_latest,
        read_version,
    )

    root = str(tmp_path / "store")
    for v in range(3):
        publish(spark.range(5 * (v + 1)).withColumnRenamed("id", "k"), root, v, keep=10)
    assert prune(root, keep=2) == [0]
    with pytest.raises(Exception):
        read_version(spark, root, 0).count()
    assert read_latest(spark, root).count() == 15
    assert prune(root, keep=2) == []  # idempotent
