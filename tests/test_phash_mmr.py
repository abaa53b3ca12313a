"""Twins for the perceptual-hash near-dup operator (operators/phash.py)
and MMR diversified selection (operators/similarity.py::mmr_select).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sdg_data_catalog_spark.operators import phash as PH
from sdg_data_catalog_spark.operators.imagecodec import png_encode
from sdg_data_catalog_spark.operators.multimodal import synthetic_image
from sdg_data_catalog_spark.queries.registry import all_queries


def _local_hashes(n_docs: int = 500, key_mod: int = 64) -> dict[int, int]:
    """Recompute every phash locally through the same codec path."""
    out = {}
    for did in range(n_docs):
        img = synthetic_image(did % key_mod, 24)
        # encode→decode round-trip mirrors the Spark path exactly (the
        # codec is lossless so this equals hashing the raw pattern)
        from sdg_data_catalog_spark.operators.imagecodec import png_decode

        out[did] = PH.dhash_image(png_decode(png_encode(img)))
    return out


def test_dhash_deterministic_and_dup_invariant():
    """Identical images hash identically; the hash is stable across calls."""
    h1 = PH.dhash_image(synthetic_image(7, 24))
    h2 = PH.dhash_image(synthetic_image(7, 24))
    assert h1 == h2
    assert 0 <= h1 < 1 << 64
    # distinct phase patterns *may* collide, but not all of them — the
    # corpus must contain more than one distinct hash for the op to mean
    # anything
    hs = {PH.dhash_image(synthetic_image(k, 24)) for k in range(64)}
    assert len(hs) > 1


def test_phash_neardup_census_matches_bruteforce(spark, sf_dir):
    """The banded-join census equals an all-pairs popcount census over
    locally recomputed hashes — proving the pigeonhole join misses no
    pair within the hamming bound."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = min(len(docs), 500)
    ids = sorted(docs["doc_id"])[:n]
    local = _local_hashes(n_docs=max(ids) + 1)
    census: dict[int, int] = {}
    n_hashes = len({local[i] for i in ids})
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            ham = bin(local[ids[ai]] ^ local[ids[bi]]).count("1")
            if ham <= PH.MAX_HAMMING:
                census[ham] = census.get(ham, 0) + 1
    out = all_queries()["mm_phash_neardup"](spark, sf_dir).toPandas()
    got = {int(r.hamming): int(r.n_pairs) for r in out.itertuples()}
    assert got.pop(-1) == n_hashes
    assert got == census


def test_mmr_matches_numpy_twin(spark, sf_dir):
    """The Spark-side MMR selection equals an independent numpy greedy
    over the same relevance pool, and beats relevance-only top-k on
    redundancy (lower mean pairwise cosine among chosen)."""
    from sdg_data_catalog_spark.queries.emb_text_extra import _MMR_QVEC

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.array(emb["embedding"].tolist(), dtype="float64")
    ids = emb["vec_id"].to_numpy()
    q = np.array(_MMR_QVEC, dtype="float64")
    rel = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -rel))[:50]
    pool_ids, pool_rel = ids[order], rel[order]
    unit = mat[order] / np.linalg.norm(mat[order], axis=1, keepdims=True)
    sims = unit @ unit.T
    lam, chosen = 0.7, []
    for _ in range(10):
        best_i, best_s = None, None
        for i in range(len(pool_ids)):
            if i in chosen:
                continue
            red = max((sims[i][j] for j in chosen), default=0.0)
            s = lam * pool_rel[i] - (1 - lam) * red
            if best_s is None or s > best_s or (
                s == best_s and pool_ids[i] < pool_ids[best_i]
            ):
                best_i, best_s = i, s
        chosen.append(best_i)
    want = [int(pool_ids[i]) for i in chosen]

    out = all_queries()["rank_mmr"](spark, sf_dir).toPandas().sort_values("rank")
    got = out["vec_id"].tolist()
    assert got == want

    # diversity invariant: chosen set is less self-similar than top-k
    def mean_pairwise(sel):
        u = mat[np.isin(ids, sel)]
        u = u / np.linalg.norm(u, axis=1, keepdims=True)
        s = u @ u.T
        n = len(u)
        return (s.sum() - n) / (n * (n - 1))

    topk = [int(pool_ids[i]) for i in range(10)]
    assert mean_pairwise(got) <= mean_pairwise(topk) + 1e-12


def test_dhash_band_pigeonhole_property():
    """Pure-function property: any two 64-bit hashes within hamming <=3
    share at least one of the 4 16-bit bands (the equi-join key), so the
    banded candidate join can never miss a qualifying pair. Exercised on
    a deterministic pseudo-random sample plus adversarial 3-bit flips."""
    import random

    rng = random.Random(42)
    for _ in range(200):
        h = rng.getrandbits(64)
        flips = rng.sample(range(64), rng.randint(0, 3))
        h2 = h
        for b in flips:
            h2 ^= 1 << b
        shared = any(
            (h >> (i * 16)) & 0xFFFF == (h2 >> (i * 16)) & 0xFFFF
            for i in range(4)
        )
        assert shared, (hex(h), flips)


def test_dhash_survives_png_roundtrip():
    """The codec is lossless, so hashing after encode→decode must equal
    hashing the raw pixels — the exact property the Spark path relies on."""
    from sdg_data_catalog_spark.operators.imagecodec import png_decode, png_encode

    for key in (0, 7, 33, 63):
        img = synthetic_image(key, 24)
        direct = PH.dhash_image(img)
        rt = PH.dhash_image(png_decode(png_encode(img)))
        assert direct == rt
