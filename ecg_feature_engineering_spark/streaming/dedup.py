"""Streaming deduplication — the incremental twin of the batch
exact-dedup path (operators/dedup.dedup_exact): normalize -> fingerprint
-> keep first occurrence per fingerprint, with duplicate state carried
ACROSS micro-batches by the engine's dedup state store.

Two state regimes:

- ``streaming_dedup_exact``: global dedup, unbounded state — the exact
  semantic twin of batch dedup (a fingerprint seen in micro-batch 1
  suppresses its duplicate in micro-batch 1000). Right for bounded key
  universes (entity catalogs, config streams).
- ``streaming_dedup_within_watermark``: state bounded by the watermark
  horizon via ``dropDuplicatesWithinWatermark`` — the 100 TB/day
  ingest shape, where "duplicate" is only meaningful within a recency
  window and state must not grow with the stream's lifetime.

Which rows are KEPT differs from batch min-id dedup (streaming keeps
the first ARRIVAL, batch keeps the min doc_id): the invariant shared by
both — and pinned by tests — is the kept fingerprint SET, which is
arrival-order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ecg_feature_engineering_spark.operators import text


def streaming_dedup_exact(docs: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """Exact streaming dedup on the normalized-text fingerprint.
    Unbounded dedup state (one fingerprint per distinct doc ever seen)."""
    fp = text.fingerprint(docs, text_col, "fingerprint")
    return fp.dropDuplicates(["fingerprint"])


def streaming_dedup_within_watermark(docs: DataFrame, ts_col: str,
                                     watermark: str = "1 hour",
                                     text_col: str = "text") -> DataFrame:
    """Watermark-bounded streaming dedup: duplicates are suppressed only
    within the watermark horizon, and fingerprint state older than the
    horizon is evicted — state size tracks the horizon's key count, not
    the stream's lifetime."""
    fp = text.fingerprint(docs, text_col, "fingerprint")
    return (fp.withWatermark(ts_col, watermark)
              .dropDuplicatesWithinWatermark(["fingerprint"]))
