"""Approximate-nearest-neighbor / similarity search over embedding columns.

Scale additions per the build contract. Two paths:

- ``cosine_topk``  — brute-force exact baseline: broadcast the (small) query
  set against the corpus, JVM-side dot products via F.zip_with/F.aggregate
  (no Python), top-k per query via window. Cost O(|Q|·|C|) — the correctness
  oracle and the right choice when |Q| is small.
- ``lsh_topk``     — random-hyperplane (sign) LSH bucketing: probe only
  same-bucket candidates across ``tables`` independent hash tables. The 100 TB
  path: corpus is bucketed once (one shuffle), probes are bucket-local.
- ``cosine_near_dup_pairs`` — embedding near-duplicate detection
  (cosine >= threshold) over LSH buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HYPERPLANE_SEED = 0xA11CE  # fixed seed for hyperplane draws


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL for a zero-norm side (an unguarded divide
    aborts the whole job with DIVIDE_BY_ZERO under ANSI)."""
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str | None = None) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it must be small — this is the exact
    baseline); corpus-side scan stays partition-local, no shuffle until the
    final per-query top-k window on |Q|·k rows.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos", 6).alias("cos"))
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    rng = np.random.default_rng([_HYPERPLANE_SEED, table])
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(df: DataFrame, dim: int, vec_col: str = "embedding",
                    n_planes: int = 8, table: int = 0,
                    out: str = "bucket") -> DataFrame:
    """Sign-LSH bucket id: bit b = (v · plane_b) > 0, packed to an int.
    Planes are deterministic from (seed, table); the dot products are
    JVM-side fold expressions — no Python, no shuffle."""
    planes = _hyperplanes(dim, n_planes, table)
    bucket = F.lit(0)
    for b in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = F.when(_dot(F.col(vec_col), plane) > 0, 1).otherwise(0)
        bucket = bucket * 2 + bit
    return df.withColumn(out, bucket)


def with_lsh_buckets_multi(df: DataFrame, dim: int,
                           vec_col: str = "embedding", n_planes: int = 8,
                           tables: int = 4,
                           out: str = "__tb") -> DataFrame:
    """Every table's bucket id in ONE projection, exploded to
    (table, bucket) rows — a single scan regardless of ``tables`` (a
    per-table loop re-scans and re-shuffles the full corpus per table,
    which is the difference between 1 and ``tables`` passes at 100 TB)."""
    entries = []
    for t in range(tables):
        planes = _hyperplanes(dim, n_planes, t)
        bucket = F.lit(0)
        for b in range(n_planes):
            plane = F.array(*[F.lit(float(x)) for x in planes[b]])
            bit = F.when(_dot(F.col(vec_col), plane) > 0, 1).otherwise(0)
            bucket = bucket * 2 + bit
        entries.append(F.struct(F.lit(t).alias("t"), bucket.alias("b")))
    return df.withColumn(out, F.explode(F.array(*entries)))


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, tables: int = 4) -> DataFrame:
    """ANN top-k: union of ``tables`` independent sign-LSH tables; candidates
    are same-bucket rows only; exact cosine re-ranks candidates. Recall grows
    with ``tables``; cost is bucket-local instead of O(|Q|·|C|)."""
    cb = with_lsh_buckets_multi(corpus, dim, vec_col, n_planes, tables) \
        .select(F.col(id_col).alias("neighbor_id"),
                F.col("__tb.t").alias("t"), F.col("__tb.b").alias("b"),
                F.col(vec_col).alias("__cv"))
    qb = with_lsh_buckets_multi(queries, dim, vec_col, n_planes, tables) \
        .select(F.col(id_col).alias("query_id"),
                F.col("__tb.t").alias("t"), F.col("__tb.b").alias("b"),
                F.col(vec_col).alias("__qv"))
    cands = (cb.join(qb, ["t", "b"])
             .where(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id", "__qv", "__cv"))
    scored = (
        cands.dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id",
                cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def _kmeans_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                      n_lists: int, seed: int,
                      max_train: int) -> np.ndarray:
    """Row-normalized KMeans coarse-quantizer centroids trained on a
    bounded DETERMINISTIC sample: a bare limit() takes whichever
    partitions answer first, so centroids (and every downstream
    assignment) would differ between runs; TakeOrderedAndProject on the
    id is O(n log max_train) with no full sort."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = (corpus.orderBy(id_col).limit(max_train)
             .select(array_to_vector(F.col(vec_col)).alias("features")))
    km = KMeans(k=n_lists, seed=seed, maxIter=20).fit(train)
    centroids = np.stack([np.asarray(c) for c in km.clusterCenters()])
    return centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)


def _nearest_lists(vec_col: str, cnorm: np.ndarray, n: int):
    """Column: array of the n nearest list ids by centroid cosine."""
    n_lists = len(cnorm)
    sims = F.array(*[
        _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
        / F.greatest(_norm(F.col(vec_col)), F.lit(1e-12))
        for c in cnorm
    ])
    idx = F.array(*[
        F.struct(F.element_at(sims, i + 1).alias("s"),
                 F.lit(i).alias("list_id"))
        for i in range(n_lists)
    ])
    top = F.slice(F.reverse(F.array_sort(idx)), 1, n)
    return F.transform(top, lambda t: t["list_id"])


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_lists: int = 16, n_probe: int = 3,
             seed: int = 7, max_train: int = 20_000) -> DataFrame:
    """IVF-style ANN: a KMeans coarse quantizer partitions the corpus into
    ``n_lists`` inverted lists; each query probes its ``n_probe`` nearest
    centroids and exact cosine re-ranks only those lists' members.

    Scale shape: centroids are tiny and broadcast; corpus list assignment
    is one pass (done once, reusable as a materialized column/partition
    key); the probe join is an equi-join on list id — candidates per query
    are |corpus|*n_probe/n_lists instead of |corpus|. The quantizer trains
    on a bounded sample (``max_train``) so training never scans 10^12 rows.
    """
    cnorm = _kmeans_centroids(corpus, id_col, vec_col, n_lists, seed,
                              max_train)

    def nearest_lists(n: int):
        return _nearest_lists(vec_col, cnorm, n)

    listed = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        F.element_at(nearest_lists(1), 1).alias("list_id"))
    probes = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.explode(nearest_lists(n_probe)).alias("list_id"))
    scored = (
        listed.join(probes, "list_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos", 6).alias("cos"))
    )


def cosine_near_dup_pairs(df: DataFrame, dim: int, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_planes: int = 10, tables: int = 6) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold) via LSH buckets —
    the embedding-space member of the dedup family (operators/dedup.py)."""
    b = with_lsh_buckets_multi(df, dim, vec_col, n_planes, tables)
    x = b.select(F.col(id_col).alias("id_a"), F.col("__tb.t").alias("t"),
                 F.col("__tb.b").alias("bb"), F.col(vec_col).alias("__va"))
    y = b.select(F.col(id_col).alias("id_b"), F.col("__tb.t").alias("t"),
                 F.col("__tb.b").alias("bb"), F.col(vec_col).alias("__vb"))
    pairs = (x.join(y, ["t", "bb"]).where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "__va", "__vb"))
    return (
        pairs.dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b",
                cosine(F.col("__va"), F.col("__vb")).alias("cos"))
        # threshold on the TRUE cosine; rounding is output formatting only
        # (filtering the rounded value would flip borderline pairs)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def semdedup(df: DataFrame, threshold: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_lists: int = 16, seed: int = 7,
             max_train: int = 20_000) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, the published semantic-dedup
    recipe): k-means cluster the embedding space, then within each
    cluster flag every item whose cosine to ANY lower-id cluster member
    is >= ``threshold`` — the paper's released pseudocode (upper-
    triangular max-similarity test against all earlier-index members,
    NOT a sequential pass against only-kept items; on a similarity
    CHAIN a-b-c where only adjacent pairs cross the threshold, b AND c
    are both flagged even though b's removal leaves c without a kept
    near-duplicate — pinned in tests). Cluster-local, so the pair
    space is sum over clusters of |c|^2 instead of N^2 (the paper's
    whole point; at corpus scale ``n_lists`` ~ sqrt(N) bounds |c|).
    Returns every input row with (cluster_id, is_semdup).

    Scale shape: centroids are tiny and driver-held (bounded
    deterministic training sample, the ivf_topk quantizer); assignment
    is one scan pass; the within-cluster self-join is an equi-join on
    cluster_id; the dup-id set is a thin semi-joinable table. A
    pathological all-in-one-cluster corpus degrades to the quadratic
    pair space — that is SemDeDup's published behavior, not a plan
    accident (pick n_lists for the data).

    Determinism: the flag compares the TRUE float cosine to the
    threshold (borderline pairs are centroid-perturbation-sensitive
    ONLY through cluster membership; a planted exact or POWER-OF-TWO-
    scaled copy shares its original's centroid profile bit-for-bit —
    2.0*x is exact in IEEE float, so each copy-vs-centroid cosine
    scales numerator and denominator by exactly 2 and the quotient is
    bit-identical — so copy-vs-original pairs are immune, the
    certifiable invariant. A non-power-of-two scale rounds per
    coordinate and the profile is only ulp-close; ADVICE r4)."""
    cnorm = _kmeans_centroids(df, id_col, vec_col, n_lists, seed,
                              max_train)
    listed = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v"),
        F.element_at(_nearest_lists(vec_col, cnorm, 1), 1)
        .alias("cluster_id"))
    a = listed.select(F.col("vec_id").alias("__ida"),
                      F.col("__v").alias("__va"), "cluster_id")
    b = listed.select(F.col("vec_id").alias("__idb"),
                      F.col("__v").alias("__vb"), "cluster_id")
    dups = (a.join(b, "cluster_id")
            .where(F.col("__ida") < F.col("__idb"))
            .where(cosine(F.col("__va"), F.col("__vb"))
                   >= F.lit(threshold))
            .select(F.col("__idb").alias("vec_id")).distinct())
    return (listed.join(dups.withColumn("__dup", F.lit(True)),
                        "vec_id", "left")
            .select("vec_id", "cluster_id",
                    F.coalesce(F.col("__dup"), F.lit(False))
                    .alias("is_semdup")))
