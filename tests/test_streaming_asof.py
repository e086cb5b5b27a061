"""Streaming point-in-time join: batch equivalence + cross-micro-batch
state carry (maxFilesPerTrigger=1 forces the state path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ecg_feature_engineering_spark.operators import asof
from ecg_feature_engineering_spark.streaming.asof import (
    streaming_asof_backward,
)


@pytest.fixture(scope="module")
def asof_dirs(spark, tmp_path_factory):
    """Two-file parquet dirs (events + snapshots), split by time so file 1
    strictly precedes file 2 — two micro-batches with in-order delivery."""
    root = tmp_path_factory.mktemp("stream_asof")
    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-01-01")
    ev_rows, sn_rows = [], []
    for u in ("a", "b", "c"):
        t = 0
        for i in range(40):
            t += int(rng.integers(1, 15))
            ev_rows.append((u, base + pd.Timedelta(minutes=t), float(i)))
        t = -5
        for j in range(10):
            t += int(rng.integers(10, 60))
            sn_rows.append((u, base + pd.Timedelta(minutes=t),
                            float(100 + j)))
    ev = pd.DataFrame(ev_rows, columns=["user_id", "ts", "value"])
    sn = pd.DataFrame(sn_rows, columns=["user_id", "ts", "snap_value"])
    cut = base + pd.Timedelta(minutes=150)
    for name, pdf in (("events", ev), ("snaps", sn)):
        d = root / name
        d.mkdir()
        spark.createDataFrame(pdf[pdf.ts < cut]).coalesce(1) \
            .write.mode("append").parquet(str(d))
        spark.createDataFrame(pdf[pdf.ts >= cut]).coalesce(1) \
            .write.mode("append").parquet(str(d))
    return str(root / "events"), str(root / "snaps"), ev, sn


def _run_stream(spark, ev_dir, sn_dir, ev_schema, sn_schema,
                files_per_trigger):
    ev_s = (spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(ev_dir))
    sn_s = (spark.readStream.schema(sn_schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(sn_dir))
    out = streaming_asof_backward(ev_s, sn_s, by="user_id")
    name = f"asof_stream_{files_per_trigger}"
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def _batch_expected(spark, ev, sn):
    got = asof.asof_join(
        spark.createDataFrame(ev), spark.createDataFrame(sn),
        on="ts", by="user_id", direction="backward",
        keep_match_ts="snap_ts").toPandas()
    return (got[["user_id", "ts", "value", "snap_value", "snap_ts"]]
            .rename(columns={"value": "event_value"})
            .sort_values(["user_id", "ts"]).reset_index(drop=True))


@pytest.mark.parametrize("files_per_trigger", [10, 1])
def test_streaming_asof_equals_batch(spark, asof_dirs, files_per_trigger):
    """files_per_trigger=10 -> one micro-batch (pure within-batch join);
    =1 -> two micro-batches, so batch-2 events must match snapshots
    carried in GroupState from batch 1."""
    ev_dir, sn_dir, ev, sn = asof_dirs
    ev_schema = spark.createDataFrame(ev).schema
    sn_schema = spark.createDataFrame(sn).schema
    got = (_run_stream(spark, ev_dir, sn_dir, ev_schema, sn_schema,
                       files_per_trigger)
           .sort_values(["user_id", "ts"]).reset_index(drop=True))
    exp = _batch_expected(spark, ev, sn)
    assert len(got) == len(exp) == 120
    pd.testing.assert_frame_equal(
        got[["user_id", "ts", "event_value", "snap_value", "snap_ts"]],
        exp, check_dtype=False)
