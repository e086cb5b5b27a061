"""Skew-handling helpers: key salting for groupBy paths where AQE can't help.

AQE's skew-join splitting covers joins; grouped aggregates and
applyInPandas/window paths over a hot entity (FIXTURES.md: ~10% of rows on one
entity, 5% on one phash prefix) need explicit salt. Pattern: two-phase
aggregate — partial per (key, salt), final per key — standard map-side-combine
spelled out for non-algebraic aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, out: str = "__salt",
              deterministic_col: str | None = None) -> DataFrame:
    """Add a salt column. If ``deterministic_col`` is given, salt =
    pmod(xxhash64(col), n) — stable across retries/resume (preferred,
    and the column must vary WITHIN each hot group: salting on the group
    key itself is a no-op because every row of the hot key gets the same
    salt). Otherwise the salt hashes the whole row (xxhash64 over all
    columns) — deterministic per row content, spreads any group whose
    rows differ anywhere."""
    if deterministic_col:
        salt = F.pmod(F.xxhash64(deterministic_col), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(n_salts))
    return df.withColumn(out, salt)


def salted_count(df: DataFrame, by: list[str], n_salts: int = 16,
                 unique_col: str | None = None) -> DataFrame:
    """Two-phase count per key: count per (key, salt) then sum per key.
    Demonstrates the salting contract; Catalyst already partial-aggregates
    algebraic counts, so use this shape for the *non*-algebraic cases
    (collect_list-style or applyInPandas pre-reduction).

    ``unique_col`` should be a row-level column (event_id, ts); it must
    NOT be the group key — a salt derived from the key is constant within
    the key and spreads nothing. Defaults to whole-row hashing."""
    salted = with_salt(df, n_salts, deterministic_col=unique_col)
    partial = salted.groupBy(*by, "__salt").agg(F.count(F.lit(1)).alias("__n"))
    return partial.groupBy(*by).agg(F.sum("__n").alias("n"))


def repartition_by_entity_range(df: DataFrame, by: str = "entity_id",
                                order: str = "ts",
                                n_partitions: int | None = None) -> DataFrame:
    """Entity-range partition + (entity, ts) sort within partitions — the
    physical layout the as-of/merge_asof and window stages want (SURVEY.md
    §4.2). Lets consecutive window stages reuse one exchange+sort."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(n, by).sortWithinPartitions(by, order)
