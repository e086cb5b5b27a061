"""Deterministic splits, multi-label explode, recodes — SURVEY.md §2.6/2.7/2.2.

Reference analogs: shuffled positional train/val/test slices
(split_data.py:17-20, preprocess-300hz.py:174-186) replaced by order-stable
hash bucketing; the 6x-duplicated comma-list label parser
(extract_HRV.py:52-78 et al.) replaced by split+explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float],
               seed: int = 42, out: str = "split",
               bucket_expr: Column | None = None) -> DataFrame:
    """Reproducible, join-free split assignment: bucket = xxhash64(id, seed)
    mod 10_000, mapped to named splits by cumulative weight. Unlike
    randomSplit this is stable under repartitioning and resumable reruns
    (north-rule resumability: re-running assigns identical splits).
    ``bucket_expr`` overrides the bucket with any integer expression in
    [0, 10000) — e.g. a multiplicative hash portable to SQL oracles."""
    total = sum(weights.values())
    bucket = (bucket_expr if bucket_expr is not None else
              F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000)))
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt / total * 10_000
        cond = bucket < F.lit(int(round(acc)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out, expr)


def explode_multilabel(df: DataFrame, label_col: str, out: str = "label",
                       sep: str = ",") -> DataFrame:
    """Comma-list multi-label -> one row per label, trimmed, empties dropped
    (R1; the reference duplicates feature vectors per label — same here by
    construction of explode)."""
    # \Q..\E quotes the separator: F.split takes a Java REGEX, so a
    # bare '|' or '.' separator would split on every character
    labels = F.filter(
        F.transform(F.split(F.col(label_col), "\\Q" + sep + "\\E"),
                    lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    return df.withColumn(out, F.explode(labels))


def recode(col: Column | str, mapping: dict, default=None) -> Column:
    """Value recode via a when-ladder (P7: gender_num/label_num,
    utils.py:16-40). For large maps prefer a broadcast dim-table join."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        cond = c == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(F.lit(default))


def one_hot(col: Column | str, values: list) -> Column:
    """Label -> 0/1 vector (P8, challenge2020/utils/data.py:35-38)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[F.when(c == F.lit(v), 1).otherwise(0) for v in values])


def balance_classes(df: DataFrame, label_col: str,
                    factors: dict[str, int],
                    default: int = 1) -> DataFrame:
    """R5 — class-balancing replication (preprocess-300hz.py:315-341):
    each row is replicated ``factors[label]`` times (default 1). The
    reference draws a random aug_fact per class; here the factor ladder is
    explicit and deterministic (reproducible pipelines — the seeded-random
    variant is one ``rand(seed)`` term away). ``explode(sequence)`` keeps it
    fully distributed — no driver loop, output fan-out is the only cost."""
    lab = F.col(label_col)
    fac = None
    for k, v in factors.items():
        cond = lab == F.lit(k)
        fac = F.when(cond, F.lit(v)) if fac is None else fac.when(cond, v)
    fac = F.lit(default) if fac is None else fac.otherwise(F.lit(default))
    # factor 0 must DROP the row — a bare sequence(1, 0) steps -1 and
    # yields [1, 0] (two copies); guard with an empty array instead.
    copies = F.when(fac >= 1, F.sequence(F.lit(1), fac)) \
              .otherwise(F.array().cast("array<int>"))
    return (
        df.withColumn("__copy", F.explode(copies))
        .drop("__copy")
    )


def pivot_one_hot(df: DataFrame, id_col: str, label_col: str,
                  values: list) -> DataFrame:
    """R6 — label -> one row per id with 0/1 indicator columns
    (challenge2020/utils/data.py:35-38) via groupBy().pivot() with the value
    list pinned (pinning avoids the extra distinct-scan job and keeps the
    output schema stable for 10^12-row inputs)."""
    out = (
        df.groupBy(id_col)
        .pivot(label_col, values)
        .agg(F.max(F.lit(1)))
    )
    return out.select(
        id_col,
        *[F.coalesce(F.col(str(v)), F.lit(0)).alias(f"is_{v}")
          for v in values],
    )


def smooth_labels(onehot: Column, factor: float) -> Column:
    """P9 — label smoothing over a one-hot array column:
    ``y*(1-f) + f/k`` per element (challenge2020/utils/tools.py:206-224,
    the re-Inception smoothing). k is the array length (dynamic, so the
    same expression serves any label arity)."""
    if not 0 <= factor <= 1:
        raise ValueError(f"invalid label smoothing factor: {factor}")
    keep = 1 - factor  # computed driver-side, one double literal in the plan
    return F.transform(
        onehot,
        lambda x: x * F.lit(keep) + F.lit(factor) / F.size(onehot))


def seeded_shuffle(df: DataFrame, id_col: str, seed: int = 42,
                   out: str = "pos", n_buckets: int = 1024,
                   hash_expr: Column | None = None) -> DataFrame:
    """O6 — deterministic seeded permutation (np.random.permutation /
    random.shuffle analog: preprocess-300hz.py:178, split_data.py:17-20),
    reproducible under repartitioning and reruns because the order derives
    from a keyed hash, not RNG state.

    Scale shape: a global ``row_number() OVER (ORDER BY hash)`` is a
    single-reducer sort. Instead the hash range is cut into ``n_buckets``
    range buckets (bucket id is MONOTONE in the hash, so bucket-local ranks
    plus bucket offsets reproduce the exact global hash order): one small
    aggregate for bucket counts, a prefix sum over that tiny table,
    broadcast back, and a per-bucket window — every stage partitions.

    ``hash_expr`` overrides the default ``xxhash64`` order with any
    integer expression in [0, 2^31) (e.g. a multiplicative hash portable
    to SQL oracles)."""
    h = hash_expr if hash_expr is not None else F.pmod(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(2_147_483_647))
    df = df.withColumn("__h", h)
    df = df.withColumn(
        "__b",
        F.floor(F.col("__h") * n_buckets / F.lit(2_147_483_647))
        .cast("long"))
    counts = df.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__c").over(wb), F.lit(0)).alias("__off"))
    w = Window.partitionBy("__b").orderBy("__h", id_col)
    return (
        df.join(F.broadcast(offsets), "__b")
        .withColumn(out, (F.col("__off") + F.row_number().over(w))
                    .cast("long"))
        .drop("__h", "__b", "__off")
    )


def blacklist_filter(df: DataFrame, id_col: str, bad_ids: list) -> DataFrame:
    """P3 — drop corrupt records (preprocess-300hz.py:93-98). isin for small
    lists (constant-folded); left-anti join for large blacklists."""
    if len(bad_ids) <= 1000:
        return df.where(~F.col(id_col).isin(bad_ids))
    spark = df.sparkSession
    bl = spark.createDataFrame([(b,) for b in bad_ids], [id_col])
    return df.join(F.broadcast(bl), id_col, "left_anti")


def sample_bucket_expr(id_col: str, portable: bool = False,
                       modulus: int = 10_000) -> Column:
    """The deterministic sampling bucket in [0, modulus): xxhash64 by
    default; ``portable=True`` derives it from md5 — slower, but
    byte-identical in any engine that has md5 (the oracle mode). The
    ONE definition both stratified_sample and its contract query use —
    an inline copy would let the emitted bucket column drift from the
    filter actually applied."""
    if portable:
        return F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                   16, 10).cast("long"),
            F.lit(modulus))
    return F.pmod(F.xxhash64(F.col(id_col), F.lit(7)), F.lit(modulus))


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      portable: bool = False) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id's hash
    bucket (``sample_bucket_expr``) falls under the stratum's rate — the
    scale-safe replacement for sampleBy (stable under repartitioning,
    reruns, and resume; the same id always makes the same draw, so
    downstream joins against the sample stay consistent).
    Rates are in [0, 1] and quantized to 1e-4 (the bucket modulus)."""
    bucket = sample_bucket_expr(id_col, portable)
    thr: Column | None = None
    for name, rate in rates.items():
        cond = F.col(strata_col) == name
        t = F.lit(int(round(rate * 10_000)))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (F.lit(int(round(default_rate * 10_000))) if thr is None
           else thr.otherwise(F.lit(int(round(default_rate * 10_000)))))
    return df.where(bucket < thr)
