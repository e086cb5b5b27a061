"""Interval/range joins — SURVEY.md J6: "beat window [R_P-90, R_P-90+0.6*fs)
slices samples around each event" (extract_SHORT.py:60-67,
extract_QRSF.py:49-56).

A naive theta-join ``e.ts BETWEEN a.lo AND a.hi`` is a broadcast
nested-loop at best and O(n^2) at worst. The scale path here buckets time:
each anchor interval explodes to the coarse time buckets it overlaps, each
event maps to its single bucket, and the join becomes an equi-join on
(entity, bucket) + a residual range filter — shuffle-partitionable, AQE/skew
friendly, never quadratic. Bucket width should be >= the typical interval
length (each interval then lands in <= 2 buckets)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sec(df: DataFrame, col_name: str) -> Column:
    """Numeric seconds for bucket ids — tz-independent for TIMESTAMP_NTZ.
    A cast-through-timestamp on NTZ is session-tz-dependent AND
    non-monotonic across DST transitions, so a qualifying event could
    bucket outside [b_lo, b_hi] and silently drop from the equi-join."""
    from ecg_feature_engineering_spark.operators.windows import (
        ntz_epoch_seconds,
    )
    t = df.schema[col_name].dataType.simpleString()
    c = F.col(col_name)
    if t == "timestamp_ntz":
        return ntz_epoch_seconds(c)
    return c.cast("timestamp").cast("double")


def interval_join(
    events: DataFrame,
    anchors: DataFrame,
    by: str | list[str] = "entity_id",
    event_ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    bucket_seconds: float = 3600.0,
    how: str = "inner",
    anchor_key: str | None = None,
) -> DataFrame:
    """Join every event row to every anchor interval (same ``by`` key) with
    ``anchors.lo <= events.ts <= anchors.hi``. Anchor columns are kept;
    event columns are kept; name collisions on the event side get ``_ev``.

    Implementation: bucketized equi-join (see module doc). One shuffle on
    (by, bucket); residual BETWEEN filter applied post-join.

    ``how='left'`` keeps anchors whose intervals match no event (event
    columns null) and requires ``anchor_key`` — a column unique per anchor
    row — because outer semantics can't ride the bucketized join directly:
    an anchor whose bucket-matched events all fail the BETWEEN residual
    would be dropped, and an anchor spanning several empty buckets would
    emit one null row per bucket. Instead: inner join + anti-join the
    unmatched anchors back in.
    """
    by = [by] if isinstance(by, str) else list(by)
    ev_cols = [c for c in events.columns if c not in by]
    an_cols = [c for c in anchors.columns if c not in by]
    rename = {c: c + "_ev" for c in ev_cols if c in an_cols}

    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports how='inner'|'left', got {how!r}")
    if how == "left":
        if anchor_key is None:
            raise ValueError("interval_join(how='left') needs anchor_key "
                             "(a column unique per anchor row)")
        inner = interval_join(events, anchors, by, event_ts, lo, hi,
                              bucket_seconds, "inner")
        unmatched = anchors.join(
            inner.select(*by, anchor_key).distinct(),
            on=[*by, anchor_key], how="left_anti")
        return inner.unionByName(unmatched, allowMissingColumns=True)

    b_lo = F.floor(_sec(anchors, lo) / bucket_seconds).cast("long")
    b_hi = F.floor(_sec(anchors, hi) / bucket_seconds).cast("long")
    a = anchors.withColumn("__bucket",
                           F.explode(F.sequence(b_lo, b_hi)))
    e = events.select(
        *by,
        *[F.col(c).alias(rename.get(c, c)) for c in ev_cols],
        F.floor(_sec(events, event_ts) / bucket_seconds).cast("long")
        .alias("__bucket"),
    )
    ets = rename.get(event_ts, event_ts)
    cond = (F.col(ets) >= F.col(lo)) & (F.col(ets) <= F.col(hi))
    return (
        a.join(e, on=[*by, "__bucket"], how="inner")
        .where(cond)
        .drop("__bucket")
    )


def anchor_window_aggs(
    events: DataFrame,
    anchors: DataFrame,
    by: str | list[str] = "entity_id",
    event_ts: str = "ts",
    value: str = "value",
    anchor_key: str = "anchor_id",
    lo: str = "lo",
    hi: str = "hi",
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """A24 relational form — per anchor interval: count, min/max/mean of the
    event value, and the fiducial points ``argmax``/``argmin`` timestamps
    (max_by/min_by — the reference's per-beat peak picking,
    extract_SHORT.py:68-90). Interval join then one grouped aggregate."""
    by = [by] if isinstance(by, str) else list(by)
    j = interval_join(events, anchors, by, event_ts, lo, hi, bucket_seconds)
    ets = event_ts + "_ev" if event_ts in anchors.columns else event_ts
    val = value + "_ev" if value in anchors.columns else value
    return j.groupBy(*by, anchor_key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(val).alias("max_value"),
        F.min(val).alias("min_value"),
        F.avg(val).alias("mean_value"),
        (F.max(val) - F.min(val)).alias("amplitude"),
        # tie-break on ts so argmax/argmin are deterministic under ties
        F.max_by(ets, F.struct(F.col(val).alias("v"),
                               F.col(ets).alias("t"))).alias("argmax_ts"),
        F.min_by(ets, F.struct(F.col(val).alias("v"),
                               F.col(ets).alias("t"))).alias("argmin_ts"),
    )
