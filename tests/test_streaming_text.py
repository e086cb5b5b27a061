"""Streaming twin for the text quality family: the quality filters are
stateless scan-local expressions, so they run unchanged on a streaming
DataFrame — pinned here as streaming==batch equality across two
micro-batches (the same §2.10 guarantee class as the media kernels)."""

from __future__ import annotations

import pandas as pd
import pytest

from ecg_feature_engineering_spark.operators import text

DOCS_DDL = "doc_id long, text string"


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_text")
    d = root / "docs"
    d.mkdir()
    b1 = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the cat and the dog sat on it for fun",
                 "spark spark spark spark spark", None],
    })
    b2 = pd.DataFrame({
        "doc_id": [3, 4],
        "text": ["\tthe\x0bquick fox is of it",
                 "mail a.b@ex.org or https://e.co/x"],
    })
    for b in (b1, b2):
        spark.createDataFrame(b, DOCS_DDL).coalesce(1) \
            .write.mode("append").parquet(str(d))
    return str(d)


def test_streaming_quality_equals_batch(spark, docs_dir):
    def chain(df):
        # winnow_fingerprints included: the winnowing selection is
        # scan-local array algebra, so it too runs unchanged on streams;
        # line_repetition_stats likewise (within-doc arrays, no state)
        return text.line_repetition_stats(text.winnow_fingerprints(
            text.pii_scrub(
                text.dup_ngram_stats(text.gopher_quality(df)))))

    batch = chain(spark.read.parquet(docs_dir)) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)

    stream = (spark.readStream.schema(DOCS_DDL)
              .option("maxFilesPerTrigger", 1).parquet(docs_dir))
    out = chain(stream)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("text_stream").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM text_stream").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)

    assert len(got) == len(batch) == 5
    for c in batch.columns:
        a, b = got[c], batch[c]
        assert ((a == b) | (a.isna() & b.isna())).all(), c
