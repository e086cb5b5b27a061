"""Streaming multimodal decode: the Arrow payload kernels are stateless
mapInPandas transforms, so they run unchanged on a streaming DataFrame —
this pins streaming==batch equality for the audio decode path across
multiple micro-batches (the §2.10 façade extended to the media surface)."""

from __future__ import annotations

import pytest

from ecg_feature_engineering_spark.datagen import audio as dga
from ecg_feature_engineering_spark.functions import media_kernels as mk

AUDIO_SCHEMA_DDL = dga.AUDIO_SCHEMA + ", f0_hz double"


@pytest.fixture(scope="module")
def audio_dir(spark, tmp_path_factory):
    from ecg_feature_engineering_spark import contract

    contract.ensure_workers_can_import(spark)
    root = tmp_path_factory.mktemp("stream_audio")
    d = root / "audio"
    d.mkdir()
    # two files -> two micro-batches under maxFilesPerTrigger=1
    full = dga.audio_df(spark, 40, seed=42).cache()
    full.where("audio_id < 'aud00000020'").coalesce(1) \
        .write.mode("append").parquet(str(d))
    full.where("audio_id >= 'aud00000020'").coalesce(1) \
        .write.mode("append").parquet(str(d))
    return str(d), full


def test_streaming_decode_equals_batch(spark, audio_dir):
    path, full = audio_dir
    batch = mk.audio_decode_stats(
        spark.read.parquet(path), keep=["audio_id", "fmt"]) \
        .toPandas().sort_values("audio_id").reset_index(drop=True)

    stream = (spark.readStream.schema(AUDIO_SCHEMA_DDL)
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = mk.audio_decode_stats(stream, keep=["audio_id", "fmt"])
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("audio_stream").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM audio_stream").toPandas() \
        .sort_values("audio_id").reset_index(drop=True)

    assert len(got) == len(batch) == 40
    for c in batch.columns:
        assert (got[c] == batch[c]).all(), c
