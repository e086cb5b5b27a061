"""Structured Streaming façade over the batch window semantics.

The reference is pure batch (SURVEY.md §2.10); these wrappers exist so the
same session/tumbling/sliding semantics run incrementally: session_window for
gap sessions (batch twin: operators/windows.sessionize), window() for the
sliding segmentation analog (W5), watermarks for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_aggs(events: DataFrame, gap: str = "30 minutes",
                           watermark: str = "1 hour",
                           by: str = "user_id", ts: str = "ts",
                           value: str = "value") -> DataFrame:
    """Per-(entity, gap-session) aggregates on a streaming DataFrame.
    Append-mode compatible: results finalize once the watermark passes the
    session gap."""
    # watermarks demand TIMESTAMP (not TIMESTAMP_NTZ, the parquet default);
    # session tz is pinned UTC (session.py) so the cast is value-preserving
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("session"), F.col(by))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(value).alias("sum_value"),
             F.min(ts).alias("session_start"),
             F.max(ts).alias("session_end"))
    )


def streaming_sliding_aggs(events: DataFrame, length: str = "10 minutes",
                           slide: str = "5 minutes",
                           watermark: str = "1 hour",
                           by: str = "user_id", ts: str = "ts",
                           value: str = "value") -> DataFrame:
    """Sliding-window aggregates (W5 analog: SegSig_1d overlap slicing,
    HRV_features.py:32-58) in streaming form."""
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), length, slide).alias("win"), F.col(by))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.avg(value).alias("avg_value"),
             F.stddev_pop(value).alias("std_value"))
    )


def streaming_running_stats(events: DataFrame, by: str = "user_id",
                            value: str = "value") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (north rule
    §2.10): per-entity running (count, sum, mean) carried across
    micro-batches in explicit GroupState — the incremental twin of a
    grouped aggregate, for update-mode sinks. The reference's only "state"
    is files-on-disk between stages (SURVEY.md S9); this is the
    streaming-native replacement."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    # derive the key type from the input schema — hardcoding long breaks
    # string entity keys (the engine's default elsewhere)
    key_type = events.schema[by].dataType.simpleString()
    out_schema = f"{by} {key_type}, n long, total double, mean double"
    state_schema = "n long, total double"

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            # count OBSERVATIONS (non-null), matching the batch grouped
            # avg this operator twins — len(pdf) would count null rows
            # whose NaN pd.sum silently skips, biasing the mean
            n += int(pdf[value].count())
            total += float(pdf[value].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [{by: key[0], "n": n, "total": total,
              # no observations -> NULL mean (the batch avg it twins),
              # not a fake 0.0
              "mean": total / n if n else None}])

    return events.groupBy(by).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def run_stateful_stream(spark, parquet_dir: str, schema, transform,
                        query_name: str = "stateful_out") -> DataFrame:
    """Drive a stateful (update-mode) streaming query over a batch parquet
    directory to completion via the memory sink."""
    src = spark.readStream.schema(schema).parquet(parquet_dir)
    q = (transform(src).writeStream.outputMode("update")
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_batch_as_stream(spark, parquet_dir: str, schema, transform,
                        query_name: str = "stream_out") -> DataFrame:
    """Drive a batch parquet directory through a streaming query to completion
    (memory sink) — the smoke-test harness for the streaming façade."""
    src = spark.readStream.schema(schema).parquet(parquet_dir)
    q = (transform(src).writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
