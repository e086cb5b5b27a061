"""Streaming point-in-time (as-of) join — the Structured Streaming twin of
``operators/asof.py``'s union_window strategy (north rule: the core
operator must run incrementally too).

Shape: snapshots and events union into ONE tagged stream (exactly like the
batch union trick), grouped by entity; explicit GroupState carries the
latest snapshot across micro-batches; within a batch the join is a
vectorized ``pd.merge_asof`` seeded with the state row — no per-row
Python.

Delivery contract: per-entity in-order arrival across micro-batches (a
snapshot that arrives AFTER an event with a later timestamp has already
been emitted cannot retroactively re-match it — the same contract as any
single-pass streaming join; use the batch operator for backfills).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_asof_backward(events: DataFrame, snapshots: DataFrame,
                            by: str = "user_id", ts: str = "ts",
                            event_value: str = "value",
                            snap_value: str = "snap_value") -> DataFrame:
    """For every event row, attach the most recent snapshot row of the
    same entity with ``snapshot.ts <= event.ts`` (backward as-of; ties
    match, like the batch operator). Both inputs are STREAMING DataFrames
    with columns (by, ts, value-col).

    Returns a streaming DataFrame (by, ts, event_value, snap_value,
    snap_ts) — update-mode compatible."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = events.schema[by].dataType.simpleString()
    # watermark/state APIs want TIMESTAMP; session tz is pinned UTC
    ev = events.select(
        F.col(by), F.col(ts).cast("timestamp").alias("ts"),
        F.lit(1).alias("__side"),
        F.col(event_value).cast("double").alias("ev"),
        F.lit(None).cast("double").alias("sv"))
    sn = snapshots.select(
        F.col(by), F.col(ts).cast("timestamp").alias("ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("double").alias("ev"),
        F.col(snap_value).cast("double").alias("sv"))
    tagged = ev.unionByName(sn)

    out_schema = (f"{by} {key_type}, ts timestamp, event_value double, "
                  "snap_value double, snap_ts timestamp")
    state_schema = "snap_ts long, snap_value double"  # epoch micros

    def update(key, pdfs, state):
        rows = pd.concat(list(pdfs), ignore_index=True)
        # side 0 (snapshot) sorts before side 1 (event) on equal ts so a
        # same-timestamp snapshot matches its event — the batch operator's
        # backward tie contract
        rows = rows.sort_values(["ts", "__side"], kind="mergesort")
        snaps = rows[rows["__side"] == 0][["ts", "sv"]].rename(
            columns={"ts": "snap_ts", "sv": "snap_value"})
        if state.exists:
            st_ts, st_val = state.get
            seed_ts = pd.Timestamp(st_ts, unit="us")
            # a LATE snapshot (ts <= the state's) can never win backward
            # as-of for any future event; drop it rather than hand
            # merge_asof an unsorted right side (which raises and would
            # kill the whole streaming query)
            snaps = snaps[snaps["snap_ts"] > seed_ts]
            seed = pd.DataFrame({
                "snap_ts": [seed_ts], "snap_value": [st_val]})
            snaps = pd.concat([seed, snaps], ignore_index=True)
        evs = rows[rows["__side"] == 1][["ts", "ev"]].rename(
            columns={"ev": "event_value"})
        if len(evs):
            if len(snaps):
                joined = pd.merge_asof(
                    evs, snaps, left_on="ts", right_on="snap_ts",
                    direction="backward")
            else:
                joined = evs.assign(snap_ts=pd.NaT, snap_value=None)
            joined.insert(0, by, key[0])
            out = joined[[by, "ts", "event_value", "snap_value", "snap_ts"]]
        else:
            out = pd.DataFrame(
                columns=[by, "ts", "event_value", "snap_value", "snap_ts"])
        if len(snaps):
            last = snaps.iloc[-1]
            state.update((int(pd.Timestamp(last["snap_ts"]).value // 1000),
                          float(last["snap_value"])))
        yield out

    return tagged.groupBy(by).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)
