"""Seeded, sf-independent events corpus for contract digests.

The composite contract queries (``e3_pipeline``, ``long_features_parity``)
certify multi-stage pipelines whose outputs DuckDB cannot recompute
(softmax scoring, wavelet kernels). Their oracles are therefore pinned
golden digests — and a pinned digest needs an input that is identical no
matter which sf_dir the driver passes. Same pattern as
``datagen.images.images_df`` (the r2-certified image digests).

Everything is JVM-side column arithmetic over ``spark.range`` — no Python
rows, no files, deterministic on any partitioning: every column is a pure
function of the row id via portable multiplicative hashes (the id is
always < 2^31 here, so the int64 ANSI overflow guard is trivially met).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KNUTH = 2654435761


def _h(col, salt: int):
    """Portable 64-bit-safe multiplicative hash, uniform-ish in [0, 10^4)."""
    return F.pmod(col * F.lit(_KNUTH) + F.lit(salt), F.lit(10_000))


def events_df(spark: SparkSession, n_users: int = 50,
              events_per_user: int = 80, seed: int = 97) -> DataFrame:
    """Deterministic events-shaped corpus (event_id, ts, user_id,
    event_type, value) — schema-compatible with the testdata's events
    table. `value` has exactly 2 decimals in [-50, 50) like the testdata;
    per-user timestamps are strictly increasing with occasional >6h jumps
    so sessionization-style logic stays exercised. The default 80
    events/user clears the wavelet kernel's min_len=64 zero-fill floor
    (shorter series produce all-zero wv features, as in the reference)."""
    n = n_users * events_per_user
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id"), F.lit(n_users)).alias("user_id"),
    )
    h1 = _h(F.col("event_id"), seed)
    h2 = _h(F.col("event_id"), seed + 1)
    h3 = _h(F.col("event_id"), seed + 2)
    value = (h1 - 5000).cast("double") / 100.0
    # base spacing 37 s + jitter<30 s keeps per-user order strict; a ~2%
    # chance of a 25 000 s jump creates multi-session users
    step = (F.lit(37) + F.pmod(h2, F.lit(30))
            + F.when(F.pmod(h3, F.lit(50)) == 0, 25_000).otherwise(0))
    # strictly increasing per-user ts needs the cumulative step sum — a
    # window over the tiny per-user partitions (deterministic: step is a
    # pure function of event_id, the order key)
    from pyspark.sql import Window
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    epoch = (F.lit(1_600_000_000)
             + F.col("user_id") * 1_000_000
             + F.sum(step).over(w))
    etype = F.element_at(
        F.array(F.lit("click"), F.lit("view"), F.lit("purchase"),
                F.lit("error")),
        (F.pmod(h2, F.lit(4)) + 1).cast("int"))
    return df.select(
        "event_id",
        F.timestamp_seconds(epoch).alias("ts"),
        "user_id",
        etype.alias("event_type"),
        value.alias("value"),
    )
