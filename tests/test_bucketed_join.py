"""Bucketed co-located join: two tables written with the SAME bucketing
on the join key must join with ZERO exchanges — the physical-layout
contract sources/io.py's bucketing helpers exist for (at 100 TB, a
repeated big-big join on a stable key is pre-paid once at write time
instead of shuffling both sides on every query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value")
    aggs = ev.groupBy("user_id").agg(F.avg("value").alias("user_mean"))
    for name, df in (("ev_b", ev), ("agg_b", aggs)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.mode("overwrite")
           .option("path", str(root / name))
           .bucketBy(8, "user_id").sortBy("user_id")
           .saveAsTable(name))
    yield "ev_b", "agg_b"
    for name in ("ev_b", "agg_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    a, b = bucketed_tables
    # force the sort-merge path: a broadcast join would dodge the
    # exchange trivially and prove nothing about the bucket layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(a).join(spark.table(b), "user_id")
        n = j.count()
        assert n == spark.table(a).count()  # every event has a user agg
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_pays_the_shuffle(spark, sf_dir, bucketed_tables):
    """Control: the same join from plain parquet DOES exchange both
    sides — the bucketed layout, not AQE, removes them."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "value")
        aggs = ev.groupBy("user_id").agg(
            F.avg("value").alias("user_mean"))
        j = ev.join(aggs, "user_id")
        j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
