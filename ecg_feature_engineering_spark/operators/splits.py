"""Deterministic splits, multi-label explode, recodes — SURVEY.md §2.6/2.7/2.2.

Reference analogs: shuffled positional train/val/test slices
(split_data.py:17-20, preprocess-300hz.py:174-186) replaced by order-stable
hash bucketing; the 6x-duplicated comma-list label parser
(extract_HRV.py:52-78 et al.) replaced by split+explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float],
               seed: int = 42, out: str = "split") -> DataFrame:
    """Reproducible, join-free split assignment: bucket = xxhash64(id, seed)
    mod 10_000, mapped to named splits by cumulative weight. Unlike
    randomSplit this is stable under repartitioning and resumable reruns
    (north-rule resumability: re-running assigns identical splits)."""
    total = sum(weights.values())
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
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
    labels = F.filter(
        F.transform(F.split(F.col(label_col), sep), lambda x: F.trim(x)),
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
    return (
        df.withColumn("__copy", F.explode(F.sequence(F.lit(1), fac)))
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


def blacklist_filter(df: DataFrame, id_col: str, bad_ids: list) -> DataFrame:
    """P3 — drop corrupt records (preprocess-300hz.py:93-98). isin for small
    lists (constant-folded); left-anti join for large blacklists."""
    if len(bad_ids) <= 1000:
        return df.where(~F.col(id_col).isin(bad_ids))
    spark = df.sparkSession
    bl = spark.createDataFrame([(b,) for b in bad_ids], [id_col])
    return df.join(F.broadcast(bl), id_col, "left_anti")
