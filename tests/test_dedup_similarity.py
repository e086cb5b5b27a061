"""Dedup families (exact / Jaccard / MinHash+LSH / SimHash) and similarity
search (cosine top-k, LSH ANN) vs ground-truth oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from ecg_feature_engineering_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "THE  Quick   Brown fox jumps over the lazy dog"),  # exact after norm
        (3, "completely different text about spark windows"),
        (4, "completely different text about spark windows"),  # exact dup of 3
        (5, "unrelated short doc"),
        (6, ""),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _true_jaccard(a: str, b: str, n=3):
    def sh(t):
        toks = " ".join(t.lower().split()).split(" ")
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_exact_dedup(spark, docs):
    kept = dedup.dedup_exact(docs, "text", "doc_id").toPandas()
    # 2 normalizes to 0's text, 4 == 3 -> keep min ids
    assert set(kept["doc_id"]) == {0, 1, 3, 5, 6}
    groups = dedup.exact_dups(docs, "text", "doc_id").toPandas()
    members = {tuple(g) for g in groups["doc_ids"]}
    assert members == {(0, 2), (3, 4)}


def test_ngram_jaccard_pairs(spark, docs):
    got = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3,
                                    threshold=0.4).toPandas()
    got_pairs = {(a, b): j for a, b, j in got.to_numpy()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for (a, b), j in got_pairs.items():
        assert np.isclose(j, _true_jaccard(texts[a], texts[b]))
    assert (0, 1) in got_pairs and (0, 2) in got_pairs
    assert (3, 4) in got_pairs and got_pairs[(3, 4)] == 1.0


def test_minhash_lsh_finds_high_jaccard_pairs(spark, docs):
    got = dedup.minhash_lsh_pairs(docs, "text", "doc_id", n=3, k=64,
                                  bands=16, threshold=0.3).toPandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    # identical docs always collide in every band
    assert (3, 4) in pairs and (0, 2) in pairs
    est = dict(zip(map(tuple, got[["id_a", "id_b"]].to_numpy()),
                   got["jaccard_est"]))
    assert est[(3, 4)] == 1.0
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for (a, b), e in est.items():
        assert abs(e - _true_jaccard(texts[a], texts[b])) < 0.35  # k=64 noise


def test_simhash_near_dups(spark, docs):
    sig = dedup.simhash64(docs, "text", "doc_id").toPandas()
    assert sig["simhash"].nunique() >= 5  # distinct content -> distinct hashes
    by_id = dict(zip(sig["doc_id"], sig["simhash"]))
    assert by_id[3] == by_id[4]  # identical text -> identical simhash
    got = dedup.simhash_near_dups(spark.createDataFrame(
        pd.DataFrame([(0, "alpha beta gamma delta epsilon zeta"),
                      (1, "alpha beta gamma delta epsilon zeta"),
                      (2, "totally other words here now")],
                     columns=["doc_id", "text"])), "text", "doc_id",
        max_hamming=3).toPandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_cosine_topk_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=4) \
        .toPandas()
    pdf = emb.toPandas()
    M = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    for q in range(3):
        qi = np.flatnonzero(ids == q)[0]
        cos = M @ M[qi]
        cos[qi] = -np.inf
        want = ids[np.argsort(-cos, kind="stable")[:4]]
        rows = got[got["query_id"] == q].sort_values("rank")
        assert list(rows["neighbor_id"]) == list(want)
        np.testing.assert_allclose(
            rows["cos"].to_numpy(),
            np.round(np.sort(cos)[::-1][:4], 6), atol=1e-6)


def test_lsh_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=5).toPandas()
    # near-orthogonal random embeddings: use short 4-bit hashes x 8 tables so
    # collision probability (1 - theta/pi)^4 per table stays useful
    approx = similarity.lsh_topk(emb, queries, dim=64, k=5, n_planes=4,
                                 tables=8).toPandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e.index]
    assert np.mean(recalls) >= 0.25  # ANN recall floor at 8 tables x 4 planes


def test_embedding_near_dup_self_detect(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    # duplicate vec 0 under a new id -> cosine 1 pair must be found
    dup = emb.where(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    both = emb.unionByName(dup)
    got = similarity.cosine_near_dup_pairs(both, dim=64, threshold=0.99) \
        .toPandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    assert (0, 100000) in pairs


def test_ivf_topk_recall(spark, sf_dir):
    """IVF (KMeans coarse quantizer) ANN: recall@5 well above the random
    floor, and probing more lists raises candidate coverage."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=5).toPandas()
    approx = similarity.ivf_topk(emb, queries, k=5, n_lists=8,
                                 n_probe=4).toPandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e.index]
    # probing 4 of 8 lists covers ~50% of the corpus; random-neighbor
    # recall would be ~0.5 — require clearly better (quantizer locality)
    assert np.mean(recalls) >= 0.5
    # cos values must be exact for returned pairs (re-rank is exact)
    merged = approx.merge(exact, on=["query_id", "neighbor_id"],
                          suffixes=("_a", "_e"))
    np.testing.assert_allclose(merged["cos_a"], merged["cos_e"], atol=1e-6)


def test_semdedup_planted_structure(spark, sf_dir):
    """SemDeDup on embeddings + planted scaled copies: each copy shares
    its original's cluster (identical centroid profile — immune to
    KMeans float noise), is flagged as the HIGHER id of its pair, and
    nothing else is flagged at 0.95 on isotropic 64-dim vectors."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8)
    planted = q.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0))
        .cast(emb.schema["embedding"].dataType.simpleString())
        .alias("embedding"))
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    out = similarity.semdedup(corpus, threshold=0.95, n_lists=8) \
        .toPandas().set_index("vec_id")
    assert len(out) == emb.count() + 8
    flagged = set(out.index[out["is_semdup"]])
    assert flagged == {1_000_000 + i for i in range(8)}
    for i in range(8):   # copy and original in the SAME cluster
        assert out.loc[i, "cluster_id"] == \
            out.loc[1_000_000 + i, "cluster_id"]


def test_semdedup_chain_semantics(spark):
    """Pin the published triu-max rule on a similarity CHAIN a-b-c
    (adjacent cosines above threshold, cos(a,c) below): b AND c are
    both flagged — the paper's released upper-triangular test against
    ALL lower-id members, not a sequential kept-only pass (which would
    keep c). A doc change that silently switched semantics would flip
    this."""
    import math
    # 2-D unit vectors at angles 0, 14, 28 degrees; cos(14deg)=0.970
    # >= 0.95, cos(28deg)=0.883 < 0.95. Padded to 4 dims.
    def vec(deg):
        r = math.radians(deg)
        return [float(math.cos(r)), float(math.sin(r)), 0.0, 0.0]
    # the chain at 0/14/28 deg + an antipodal filler group so KMeans
    # (k >= 2 required) separates chain-vs-filler instead of splitting
    # the chain
    rows = [(0, vec(0)), (1, vec(14)), (2, vec(28)),
            (100, vec(175)), (101, vec(185))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = (similarity.semdedup(df, threshold=0.95, n_lists=2,
                               max_train=5)
           .toPandas().set_index("vec_id"))
    assert (out.loc[0, "cluster_id"] == out.loc[1, "cluster_id"]
            == out.loc[2, "cluster_id"] != out.loc[100, "cluster_id"])
    assert not out.loc[0, "is_semdup"]
    assert out.loc[1, "is_semdup"]      # cos to a = 0.970
    assert out.loc[2, "is_semdup"]      # cos to b = 0.970 (a: 0.883)


def test_semdedup_one_cluster_degeneration(spark):
    """An all-in-one-cluster cone corpus forces the documented quadratic
    degeneration (one cluster holds ~all vectors, full pair space) —
    the correctness of that worst case is pinned against a brute-force
    numpy oracle computed CLUSTER-LOCALLY from the engine's own
    assignment (VERDICT r4 #7). 40 seeded cone vectors around +e0 at
    threshold 0.6 give a dense mix of flagged/unflagged with no pair
    near the threshold; 2 antipodal mutually-dissimilar fillers let
    KMeans (k >= 2) separate cone-vs-filler instead of splitting the
    cone."""
    rng = np.random.default_rng(5)
    base = np.zeros(8)
    base[0] = 1.0
    vecs = base + 0.35 * rng.normal(size=(40, 8))
    fillers = -base + 0.1 * rng.normal(size=(6, 8))
    allv = np.vstack([vecs, fillers])
    rows = [(i, [float(x) for x in allv[i]]) for i in range(46)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    out = (similarity.semdedup(df, threshold=0.6, n_lists=2, max_train=46)
           .toPandas().set_index("vec_id").sort_index())
    # the degenerate shape: every cone vector in ONE cluster (the full
    # 40x40 pair space), fillers in the other
    assert out.loc[:39, "cluster_id"].nunique() == 1
    assert out.loc[40:, "cluster_id"].nunique() == 1
    assert (out.loc[0, "cluster_id"] != out.loc[40, "cluster_id"])
    norms = np.sqrt((allv ** 2).sum(axis=1))
    cos = (allv @ allv.T) / np.outer(norms, norms)
    # fixture validity: no pair sits near the threshold (numpy pairwise
    # sums vs Spark's sequential fold differ by ulps, not 1e-9)
    iu = np.triu_indices(46, 1)
    assert np.abs(cos[iu] - 0.6).min() > 1e-9
    cid = out["cluster_id"].to_numpy()
    expect = [any(cos[j, i] >= 0.6 for j in range(i) if cid[j] == cid[i])
              for i in range(46)]
    assert list(out["is_semdup"]) == expect
    # both classes exercised inside the degenerate cluster
    assert 0 < sum(expect[:40]) < 40


def test_semdedup_threshold_tie(spark):
    """Boundary semantics: a pair whose cosine lands EXACTLY on the
    threshold (all-exact arithmetic: dot([3,4],[4,3])=24, norms 5, so
    cos = fl(24/25) with zero rounding upstream) is flagged — >= not >
    — and one ulp above the same cosine is not (VERDICT r4 #7)."""
    import math

    rows = [(1, [3.0, 4.0, 0.0, 0.0]), (2, [4.0, 3.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]), (4, [0.0, 0.0, 2.0, 0.1])]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    tie = 24.0 / 25.0
    at = (similarity.semdedup(df, threshold=tie, n_lists=2, max_train=4)
          .toPandas().set_index("vec_id"))
    assert at.loc[1, "cluster_id"] == at.loc[2, "cluster_id"]
    assert bool(at.loc[2, "is_semdup"]) and not bool(at.loc[1, "is_semdup"])
    above = (similarity.semdedup(df, threshold=math.nextafter(tie, 1.0),
                                 n_lists=2, max_train=4)
             .toPandas().set_index("vec_id"))
    assert not above.loc[[1, 2], "is_semdup"].any()
