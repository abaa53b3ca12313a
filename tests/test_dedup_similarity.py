"""Property tests for the dedup/similarity operators (SURVEY.md §5.2:
differential + property checks beyond the oracle gate)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import dedup as D
from sdg_data_catalog_spark.operators import similarity as S
from sdg_data_catalog_spark.queries.dedup_similarity import _near_dup_corpus


def test_minhash_lsh_recall_of_high_jaccard(spark, sf_dir):
    """LSH candidates must contain (almost) every truly-high-Jaccard pair:
    with 4 bands x 4 rows, P(detect | j=0.9) = 1-(1-0.9^4)^4 ≈ 0.98.
    On the planted corpus (j ≈ 0.95+) we demand >= 95% recall."""
    corpus = _near_dup_corpus(table(spark, sf_dir, "documents"))
    truth = {
        (r.doc_a, r.doc_b)
        for r in D.jaccard_pairs(corpus, threshold=0.9).collect()
    }
    cand = {(r.doc_a, r.doc_b) for r in D.minhash_band_pairs(corpus).collect()}
    assert truth, "planted near-dups must exist"
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.95, f"LSH recall {recall:.3f} over {len(truth)} true pairs"


def test_jaccard_max_df_pruning_is_subset(spark, sf_dir):
    """df-capped Jaccard (the scale path) must not invent pairs."""
    corpus = _near_dup_corpus(table(spark, sf_dir, "documents"))
    full = {(r.doc_a, r.doc_b) for r in D.jaccard_pairs(corpus, threshold=0.6).collect()}
    pruned = {
        (r.doc_a, r.doc_b)
        for r in D.jaccard_pairs(corpus, threshold=0.6, max_df=50).collect()
    }
    assert pruned <= full


def test_jaccard_blocked_matches_inverted_index(spark, sf_dir):
    """Differential: the blocked numpy formulation must reproduce the
    declarative inverted-index join exactly (pairs AND values)."""
    corpus = _near_dup_corpus(table(spark, sf_dir, "documents"))
    ref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.jaccard_pairs(corpus, threshold=0.6).collect()
    }
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.jaccard_pairs_blocked(corpus, threshold=0.6).collect()
    }
    assert ref, "planted near-dups must exist"
    assert got == ref


def test_knn_matches_numpy(spark, sf_dir):
    """Differential test: Spark brute-force top-1 == numpy argmax."""
    emb = table(spark, sf_dir, "embeddings")
    got = {
        r.q_id: (r.neighbor_id, r.cos_sim)
        for r in S.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=1).collect()
    }
    pdf = emb.orderBy("vec_id").toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    ids = pdf["vec_id"].to_numpy()
    for qi in range(5):
        best = int(np.argmax(sims[qi]))
        assert got[ids[qi]][0] == ids[best]
        assert abs(got[ids[qi]][1] - sims[qi][best]) < 1e-5


def test_ann_lsh_topk_candidates_share_bucket(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    buckets = {
        r.vec_id: r.bucket
        for r in emb.select(
            "vec_id", S.lsh_bucket(F.col("embedding")).alias("bucket")
        ).collect()
    }
    for r in S.ann_lsh_topk(emb, k=1).collect():
        assert buckets[r.q_id] == buckets[r.neighbor_id]


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    """Planted near-dups (one dropped token) must land within the hamming
    ball; simhash of identical docs must be identical."""
    docs = table(spark, sf_dir, "documents").limit(50)
    corpus = _near_dup_corpus(docs)
    sh = {r.doc_id: r.simhash for r in D.simhash(corpus).collect()}
    close = 0
    for doc_id in [r.doc_id for r in docs.collect()]:
        h = bin(sh[doc_id] ^ sh[doc_id + 1_000_000]).count("1")
        close += h <= 2
    assert close >= 40  # >= 80% of planted pairs within hamming 2


def test_minhash_vectorized_equals_declarative(spark, sf_dir):
    """The in-row numpy signature path must be bit-identical to the
    explode + grouped-MIN formulation the DuckDB oracle mirrors."""
    corpus = _near_dup_corpus(table(spark, sf_dir, "documents").limit(120))
    sql_form = {tuple(r) for r in D.minhash_signatures_sql(corpus).collect()}
    vec_form = {tuple(r) for r in D.minhash_signatures(corpus).collect()}
    assert vec_form == sql_form and len(vec_form) > 0


def test_simhash_blocked_equals_allpairs(spark, sf_dir):
    """Pigeonhole chunk-blocking is exact, not approximate: the blocked
    equi-join candidate generation must recover EXACTLY the all-pairs
    self-join result (same pairs, same hamming distances)."""
    docs = table(spark, sf_dir, "documents").limit(80)
    corpus = _near_dup_corpus(docs)
    ref = {(r.doc_a, r.doc_b): r.hamming for r in D.simhash_pairs(corpus, max_hamming=2).collect()}
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.simhash_pairs_blocked(corpus, max_hamming=2).collect()
    }
    assert got == ref and len(ref) > 0


def test_connected_components_exhaustion_falls_back(spark):
    """A chain longer than max_iters must still come back fully converged
    (exhaustion triggers the large-star/small-star fallback instead of
    returning drifting labels)."""
    n = 24
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a BIGINT, doc_b BIGINT"
    )
    labels = {r.doc_id: r.component for r in D.connected_components(pairs, max_iters=3).collect()}
    assert set(labels.values()) == {0} and len(labels) == n + 1


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF with n_probe=1 on random-ish synthetic vectors: every returned
    neighbor must be a true cosine neighbor ranking no better than brute
    force says, and recall@5 must be non-trivial (> 0.1 even on data with
    no cluster structure)."""
    from sdg_data_catalog_spark.catalog import table as load
    from sdg_data_catalog_spark.operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r["q_id"], r["neighbor_id"])
        for r in S.knn_bruteforce(emb, emb.filter("vec_id < 10"), k=5).collect()
    }
    approx = S.ivf_topk(emb, k=5).collect()
    assert approx, "IVF returned no candidates"
    hits = sum((r["q_id"], r["neighbor_id"]) in exact for r in approx)
    recall = hits / len(exact)
    assert recall > 0.1, f"recall@5 = {recall}"
    # sanity: cosine values are genuine (within [-1, 1], rounded to 6)
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in approx)


def test_ivf_multiprobe_monotone_recall(spark, sf_dir):
    """Raising n_probe widens the candidate set, so recall vs brute force
    must be monotonically non-decreasing, reaching 1.0 when every cell is
    probed; an explicit external query set must route through the SAME
    codebook as the index side."""
    from sdg_data_catalog_spark.catalog import table as load
    from sdg_data_catalog_spark.operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id >= 20 AND vec_id < 30")
    exact = {
        (r["q_id"], r["neighbor_id"])
        for r in S.knn_bruteforce(emb, queries, k=5).collect()
    }

    def recall(n_probe):
        got = S.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=n_probe).collect()
        return sum((r["q_id"], r["neighbor_id"]) in exact for r in got) / len(exact)

    r1, r4, r16 = recall(1), recall(4), recall(16)
    assert r1 <= r4 <= r16, (r1, r4, r16)
    assert r16 == 1.0  # probing every cell IS brute force


def test_components_partition_the_pair_graph(spark, sf_dir):
    """Invariants: component id is the min member and itself a member;
    exactly one survivor per component; every paired doc gets a label;
    both endpoints of every pair share a component."""
    corpus = _near_dup_corpus(table(spark, sf_dir, "documents"))
    pairs = D.jaccard_pairs_blocked(corpus, threshold=0.6)
    labels = D.connected_components(pairs)
    lab = {r.doc_id: r.component for r in labels.collect()}
    assert lab, "pair graph must be non-empty"
    by_comp = {}
    for d, c in lab.items():
        assert c <= d
        by_comp.setdefault(c, []).append(d)
    for c, members in by_comp.items():
        assert c == min(members) and c in members
    for r in pairs.collect():
        assert lab[r.doc_a] == lab[r.doc_b]


def test_scalable_running_total_matches_global_window(spark, sf_dir):
    """Differential: two-phase prefix sum (range shuffle + broadcast
    offsets) must equal the naive single-partition global window."""
    from pyspark.sql.window import Window

    from sdg_data_catalog_spark.operators.curation import running_total

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("v")
    )
    got = {
        r.doc_id: r.cum
        for r in running_total(docs, "doc_id", F.col("v"), "cum", num_partitions=7).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref = {r.doc_id: r.cum for r in docs.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == ref


def test_components_match_union_find_on_random_graphs(spark):
    """Differential vs a reference union-find on seeded random graphs
    (chains, stars, and sparse G(n,p) — deeper than dedup graphs get)."""
    import random

    def union_find(n_edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in n_edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    cases = []
    cases.append([(i, i + 1) for i in range(30)])            # one deep chain
    cases.append([(0, i) for i in range(1, 20)])             # star
    rng = random.Random(42)
    cases.append([(rng.randrange(60), rng.randrange(60)) for _ in range(45)])
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        ref = union_find(edges)
        pairs = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
        got = {r.doc_id: r.component for r in D.connected_components(pairs, max_iters=64).collect()}
        assert got == ref


def test_star_components_match_propagation(spark, sf_dir):
    """The O(log n) large/small-star variant must produce the identical
    labeling as min-propagation on every test graph, including the deep
    chain where star needs ~log2(30)≈5 rounds vs 30."""
    import random

    cases = [
        [(i, i + 1) for i in range(30)],
        [(0, i) for i in range(1, 20)],
    ]
    rng = random.Random(7)
    cases.append([(rng.randrange(50), rng.randrange(50)) for _ in range(40)])
    corpus = _near_dup_corpus(table(spark, sf_dir, "documents").limit(40))
    jac = D.jaccard_pairs_blocked(corpus, threshold=0.6)
    for edges in [c for c in cases]:
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
        prop = {r.doc_id: r.component for r in D.connected_components(pairs, max_iters=64).collect()}
        star = {r.doc_id: r.component for r in D.connected_components_star(pairs).collect()}
        assert star == prop
    prop = {r.doc_id: r.component for r in D.connected_components(jac).collect()}
    star = {r.doc_id: r.component for r in D.connected_components_star(jac).collect()}
    assert star == prop


def test_pack_sequences_invariant(spark, sf_dir):
    """Every pack except the last must hold exactly `budget` tokens, and
    each document's slices must reassemble to its full token count."""
    from sdg_data_catalog_spark.operators.packing import pack_sequences

    docs = table(spark, sf_dir, "documents")
    packs = pack_sequences(docs, budget=256).collect()
    per_pack = {}
    per_doc = {}
    for r in packs:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens"]
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
    last = max(per_pack)
    assert all(v == 256 for p, v in per_pack.items() if p != last)
    assert 0 < per_pack[last] <= 256
    n_toks = {
        r["doc_id"]: r["tk"]
        for r in docs.selectExpr("doc_id", "size(split(text, ' ')) AS tk").collect()
    }
    assert per_doc == n_toks


def test_decontaminate_removes_exact_and_keeps_disjoint(spark, sf_dir):
    """A doc copied verbatim from the eval set must be dropped; a doc with a
    disjoint vocabulary must survive."""
    corpus = table(spark, sf_dir, "documents").limit(50).select("doc_id", "text")
    ev = corpus.filter(F.col("doc_id") == corpus.agg(F.min("doc_id")).collect()[0][0])
    planted = corpus.unionByName(
        spark.createDataFrame(
            [(999_999, "zebra quokka axolotl wombat capuchin lemur")],
            "doc_id BIGINT, text STRING",
        )
    )
    out = {r["doc_id"] for r in D.decontaminate(planted, ev).collect()}
    contaminated_id = ev.collect()[0]["doc_id"]
    assert contaminated_id not in out  # shares all its shingles with eval
    assert 999_999 in out  # disjoint vocab survives


def test_random_projection_preserves_norms(spark, sf_dir):
    """JL concentration: the scaled projected norm tracks the original norm
    per vector (bounded distortion) and is unbiased on average."""
    emb = table(spark, sf_dir, "embeddings")
    rows = S.project_rp(emb).collect()
    ratios = [r["proj_norm"] / r["orig_norm"] for r in rows]
    assert all(0.4 < x < 1.8 for x in ratios)  # per-vector distortion bound
    assert abs(sum(ratios) / len(ratios) - 1.0) < 0.1  # unbiased in aggregate


def test_quantize_int8_error_bounded_by_half_step(spark, sf_dir):
    """Symmetric int8 reconstruction error can never exceed scale/2 =
    max|x|/254 per coordinate."""
    emb = table(spark, sf_dir, "embeddings")
    qz = S.quantize_int8(emb)
    amax = F.aggregate(
        F.transform("embedding", lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda a, x: F.greatest(a, x),
    )
    joined = qz.join(emb.select("vec_id", amax.alias("amax")), "vec_id")
    bad = joined.filter(
        F.col("max_abs_err") > F.col("amax") / 254 + 1e-12
    ).count()
    assert bad == 0


def test_apply_canonical_is_a_total_survivorship_mapping(spark, sf_dir):
    """Every corpus doc appears exactly once; canonicals are self-mapped
    survivors; each cluster keeps exactly one member and the planted
    near-dup twins collapse (kept < total)."""
    from sdg_data_catalog_spark.queries.dedup_similarity import (
        _near_dup_corpus,
        dedup_apply_canonical,
    )
    from sdg_data_catalog_spark.catalog import table

    out = dedup_apply_canonical(spark, sf_dir).collect()
    corpus_n = _near_dup_corpus(table(spark, sf_dir, "documents")).count()
    assert len(out) == corpus_n
    assert len({r.doc_id for r in out}) == corpus_n
    canon_ids = {r.canonical_id for r in out}
    kept_ids = {r.doc_id for r in out if r.kept}
    assert canon_ids == kept_ids  # survivors are exactly the canonicals
    for r in out:
        assert r.kept == (r.doc_id == r.canonical_id)
    assert len(kept_ids) < corpus_n  # planted twins actually collapsed


def test_running_total_empty_input(spark):
    """Empty-input edge (found at the 100x replica, round 12: the
    pretrain manifest's decontamination stage can kill EVERY doc when
    each distinct text also appears in the eval split, handing the
    budget stage zero rows): running_total must return an empty frame
    with the output column present, not crash on the VOID-typed empty
    offset map."""
    from pyspark.sql import functions as F

    from sdg_data_catalog_spark.operators.curation import running_total

    empty = spark.createDataFrame([], "doc_id long, ws_tokens long")
    out = running_total(empty, "doc_id", F.col("ws_tokens").cast("bigint"), "cum")
    assert out.columns == ["doc_id", "ws_tokens", "cum"]
    assert out.count() == 0
