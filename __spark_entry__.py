"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship as-of + windowed feature pipeline at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 (registry: ecg_feature_engineering_spark/contract.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecg_feature_engineering_spark import contract  # noqa: E402
from ecg_feature_engineering_spark.plans.flagship import flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    contract.ensure_workers_can_import(spark)
    return flagship(spark, "/root/testdata/sf0.001", n_images=240)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in the
    driver's certification-window order (contract.QUERY_ORDER — the
    driver checks the first 50 entries)."""
    return contract.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — since late r3 EVERY
    registered query has one (relational SQL, generated SQL twins, or
    pinned seeded-corpus digests); raw kernel numerics additionally
    oracle-checked in tests/."""
    return contract.ordered_oracles()
