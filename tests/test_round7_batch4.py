"""Twins for round-7 batch 4 (queries/round7_batch4.py) — pure-Python
differential recomputes and the invariants each operator promises. The
oracle hash itself is covered by test_contract.py; these tests pin the
SEMANTICS against an independent (pandas/Counter/set) implementation.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _toks(text) -> list[str]:
    return [t for t in re.split(r"[^a-z]+", (text or "").lower()) if t]


def test_gopher_rules_matches_python(spark, sf_dir):
    from sdg_data_catalog_spark.functions.text import STOPWORDS

    out = all_queries()["text_gopher_rules"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    stop = set(STOPWORDS)
    agg: dict[tuple, list[int]] = {}
    for r in docs.itertuples():
        text = r.text or ""
        t = _toks(text)
        nw, tc = len(t), sum(len(x) for x in t)
        nd = len(set(t))
        ns = sum(1 for x in t if x in stop)
        nsd = len(set(t) & stop)
        low = text.lower()
        sym = len(low) - len(re.sub(r"[^a-z0-9 ]", "", low))
        flags = [
            8 <= nw <= 512,
            2 * nw <= tc <= 10 * nw,
            nsd >= 2 and 20 * ns >= nw,
            2 * nd >= nw,
            10 * sym <= max(len(text), 1),
        ]
        row = agg.setdefault((r.source, r.lang), [0] * 7)
        row[0] += 1
        for i, f in enumerate(flags):
            row[1 + i] += int(f)
        row[6] += int(all(flags))
    for r in out.itertuples():
        exp = agg[(r.source, r.lang)]
        got = [
            r.n_docs,
            r.pass_wordcount,
            r.pass_meanlen,
            r.pass_stopword,
            r.pass_dupword,
            r.pass_symbol,
            r.pass_all,
        ]
        assert got == exp, (r.source, r.lang, got, exp)
    assert out["n_docs"].sum() == len(docs)


def test_avg_precision_matches_numpy(spark, sf_dir):
    import numpy as np

    out = all_queries()["agg_avg_precision"](spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    w = np.array(
        [((((i + 17) * 2654435761) % 1000003) % 97 - 48) / 48.0 for i in range(1, 65)]
    )
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    p = 1.0 / (1.0 + np.exp(-(mat @ w)))
    y = (emb["label"].to_numpy() % 2).astype(int)
    order = np.lexsort((emb["vec_id"].to_numpy(), -np.floor(p * 1e18)))
    ys = y[order]
    tp = np.cumsum(ys)
    k = np.arange(1, len(ys) + 1)
    ap = (ys * (tp / k)).sum() / ys.sum()
    r = out.iloc[0]
    assert r["n_pos"] == ys.sum()
    assert r["n"] == len(ys)
    # operator floors per-rank precision at 1e-12 and AP at 1e-6
    assert abs(r["ap"] - ap) < 2e-6, (r["ap"], ap)


def _shingles(text: str) -> set[str]:
    w = text.split(" ") if text else []
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()


def test_kmv_jaccard_estimates_bounded(spark, sf_dir):
    out = all_queries()["sketch_kmv_jaccard"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    universe: dict[str, set[str]] = {}
    for r in docs.itertuples():
        universe.setdefault(r.source, set()).update(_shingles(r.text))
    K = 64
    # independent sketch recompute: K smallest md5 hex per source
    sk = {
        s: sorted(hashlib.md5(x.encode()).hexdigest() for x in v)[:K]
        for s, v in universe.items()
    }
    for r in out.itertuples():
        a, b = set(sk[r.source_a]), set(sk[r.source_b])
        merged = sorted(a | b)[:K]
        n_common = sum(1 for h in merged if h in a and h in b)
        assert r.n_common == n_common
        assert r.est_jaccard_ppm == n_common * 1_000_000 // K
        true_j = len(universe[r.source_a] & universe[r.source_b]) / len(
            universe[r.source_a] | universe[r.source_b]
        )
        # KMV error ~ 1/sqrt(K) = 0.125; allow 3 sigma
        assert abs(r.est_jaccard_ppm / 1e6 - true_j) < 0.38
        true_u = len(universe[r.source_a] | universe[r.source_b])
        assert 0.4 * true_u < r.est_union < 2.5 * true_u


def test_domain_mix_shares_and_caps(spark, sf_dir):
    out = all_queries()["curation_domain_mix"](spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    tokens = Counter()
    for r in docs.itertuples():
        tokens[r.source] += len(_toks(r.text))
    total = sum(tokens.values())
    n_src = len(tokens)
    assert len(out) == n_src
    for r in out.itertuples():
        assert r.tokens == tokens[r.source]
        assert r.share_ppm == r.tokens * 1_000_000 // total
        assert r.target_ppm == 1_000_000 // n_src
        expect_w = min((1_000_000 // n_src) * 1_000_000 // max(r.share_ppm, 1), 5_000_000)
        assert r.weight_ppm == expect_w
    # floor-division shares under-count by at most n_sources ppm
    assert 1_000_000 - n_src <= out["share_ppm"].sum() <= 1_000_000


def test_winsorized_mean_matches_numpy(spark, sf_dir):
    import numpy as np

    out = all_queries()["agg_winsorized_mean"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for r in out.itertuples():
        g = ev[ev["event_type"] == r.event_type].sort_values(["value", "event_id"])
        img = np.floor(g["value"].to_numpy() * 1e6).astype("int64")
        img.sort()
        n = len(img)
        lo_rk = max(1, n * 5 // 100)
        lo, hi = img[lo_rk - 1], img[n - lo_rk]
        assert r.n == n
        assert abs(r.p05 - lo / 1e6) < 1e-9
        assert abs(r.p95 - hi / 1e6) < 1e-9
        wmean = np.clip(img, lo, hi).sum() // n / 1e6
        assert abs(r.winsorized_mean - wmean) < 1e-9
        assert r.p05 <= r.winsorized_mean <= r.p95
        assert abs(r.raw_mean - img.sum() // n / 1e6) < 1e-9
