"""Streaming dedup: state must suppress duplicates ACROSS micro-batches
(the property a batch-only dedup cannot show). The kept-row choice is
arrival-order-dependent by design; the arrival-order-free invariants —
kept fingerprint SET == batch's, one row per fingerprint — are pinned."""

from __future__ import annotations

import pandas as pd
import pytest

from ecg_feature_engineering_spark.operators import dedup as batch_dedup
from ecg_feature_engineering_spark.operators import text as text_ops
from ecg_feature_engineering_spark.streaming import dedup as sdedup

DOCS_DDL = "doc_id long, text string, ts timestamp"


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    from ecg_feature_engineering_spark import contract

    contract.ensure_workers_can_import(spark)
    root = tmp_path_factory.mktemp("stream_docs")
    d = root / "docs"
    d.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    # batch 1: docs 0-3 (1 and 3 are whitespace-variant dups of 0 and 2)
    b1 = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["hello world", "hello\tworld", "spark engine",
                 " spark  engine "],
        "ts": [t0 + pd.Timedelta(minutes=m) for m in range(4)],
    })
    # batch 2: doc 4 dups doc 0 CROSS-batch; docs 5-6 are new
    b2 = pd.DataFrame({
        "doc_id": [4, 5, 6],
        "text": ["HELLO  WORLD", "fresh content", "more fresh content"],
        "ts": [t0 + pd.Timedelta(minutes=10 + m) for m in range(3)],
    })
    for b in (b1, b2):
        spark.createDataFrame(b, DOCS_DDL).coalesce(1) \
            .write.mode("append").parquet(str(d))
    return str(d)


def _run_stream(spark, out, name):
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_streaming_dedup_matches_batch_fingerprint_set(spark, docs_dir):
    full = spark.read.parquet(docs_dir)
    batch_kept = batch_dedup.dedup_exact(full, "text", "doc_id")
    assert batch_kept.count() == 4
    # the kept-row choice differs (batch: min doc_id; streaming: first
    # arrival) — the shared invariant is the fingerprint set, which for
    # any correct dedup equals the input's distinct fingerprints
    batch_fps = set(
        r["fingerprint"]
        for r in text_ops.fingerprint(full, "text")
        .select("fingerprint").distinct().collect())

    stream = (spark.readStream.schema(DOCS_DDL)
              .option("maxFilesPerTrigger", 1).parquet(docs_dir))
    got = _run_stream(spark, sdedup.streaming_dedup_exact(stream),
                      "dedup_stream")
    assert len(got) == 4  # 7 docs, 3 suppressed (2 in-batch, 1 CROSS-batch)
    assert set(got["fingerprint"]) == batch_fps
    assert got["fingerprint"].is_unique
    # doc 4 (cross-batch dup of doc 0) must be suppressed by carried state
    assert 4 not in set(got["doc_id"])


def test_streaming_dedup_within_watermark(spark, docs_dir):
    stream = (spark.readStream.schema(DOCS_DDL)
              .option("maxFilesPerTrigger", 1).parquet(docs_dir))
    got = _run_stream(
        spark,
        sdedup.streaming_dedup_within_watermark(stream, "ts", "1 hour"),
        "dedup_stream_wm")
    # all 7 docs land inside one horizon -> same suppression as global
    assert len(got) == 4
    assert got["fingerprint"].is_unique
