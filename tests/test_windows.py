"""Window operators vs pandas oracles on the real events table (sf0.001)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ecg_feature_engineering_spark.operators import windows

ORDER = ["ts", "event_id"]


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "value", "event_type")


def test_lag_diff(spark, sf_dir, events_pdf):
    got = (windows.with_lag_diff(_events(spark, sf_dir), "value", "user_id",
                                 ORDER, 1, "d1")
           .select("event_id", "d1").toPandas()
           .set_index("event_id")["d1"])
    want = events_pdf.assign(
        d1=events_pdf.groupby("user_id")["value"].diff(1)
    ).set_index("event_id")["d1"]
    np.testing.assert_allclose(got[want.index], want, rtol=0, atol=0,
                               equal_nan=True)


def test_ffill(spark, sf_dir, events_pdf):
    ev = _events(spark, sf_dir)
    from pyspark.sql import functions as F
    ev = ev.withColumn("v", F.when(F.col("event_type") == "error", None)
                       .otherwise(F.col("value")))
    got = (windows.ffill(ev, ["v"], "user_id", ORDER)
           .select("event_id", "v").toPandas().set_index("event_id")["v"])
    pdf = events_pdf.copy()
    pdf["v"] = pdf["value"].where(pdf["event_type"] != "error")
    want = pdf.assign(v=pdf.groupby("user_id")["v"].ffill()).set_index(
        "event_id")["v"]
    np.testing.assert_allclose(got[want.index], want, rtol=0, atol=0,
                               equal_nan=True)


def test_bfill(spark, sf_dir, events_pdf):
    ev = _events(spark, sf_dir)
    from pyspark.sql import functions as F
    ev = ev.withColumn("v", F.when(F.col("event_type") == "error", None)
                       .otherwise(F.col("value")))
    got = (windows.bfill(ev, ["v"], "user_id", ORDER)
           .select("event_id", "v").toPandas().set_index("event_id")["v"])
    pdf = events_pdf.copy()
    pdf["v"] = pdf["value"].where(pdf["event_type"] != "error")
    want = pdf.assign(v=pdf.groupby("user_id")["v"].bfill()).set_index(
        "event_id")["v"]
    np.testing.assert_allclose(got[want.index], want, rtol=0, atol=0,
                               equal_nan=True)


def test_sessionize(spark, sf_dir, events_pdf):
    gap = 21600.0
    got = (windows.sessionize(_events(spark, sf_dir), gap, "user_id", "ts")
           .select("event_id", "session_id").toPandas()
           .set_index("event_id")["session_id"])
    sec = events_pdf["ts"].astype("int64") / 1e9
    flag = (sec.groupby(events_pdf["user_id"]).diff() > gap).astype(int)
    want = flag.groupby(events_pdf["user_id"]).cumsum()
    want.index = events_pdf["event_id"]
    np.testing.assert_array_equal(got[want.index].to_numpy(),
                                  want.to_numpy())


def test_rolling(spark, sf_dir, events_pdf):
    got = (windows.rolling(_events(spark, sf_dir), "value",
                           {"m": "avg", "mx": "max"}, "user_id", ORDER, 5)
           .select("event_id", "m", "mx").toPandas().set_index("event_id"))
    g = events_pdf.groupby("user_id")["value"]
    want_m = g.rolling(5, min_periods=1).mean().reset_index(level=0, drop=True)
    want_mx = g.rolling(5, min_periods=1).max().reset_index(level=0, drop=True)
    want_m.index = events_pdf["event_id"]
    want_mx.index = events_pdf["event_id"]
    np.testing.assert_allclose(got["m"][want_m.index], want_m, rtol=1e-12)
    np.testing.assert_allclose(got["mx"][want_mx.index], want_mx, rtol=0)


def test_rolling_median3(spark, sf_dir, events_pdf):
    got = (windows.rolling_median3(_events(spark, sf_dir), "value", "user_id",
                                   ORDER, "m3")
           .select("event_id", "m3").toPandas().set_index("event_id")["m3"])
    want = (events_pdf.groupby("user_id")["value"]
            .rolling(3, min_periods=1, center=True).median()
            .reset_index(level=0, drop=True))
    want.index = events_pdf["event_id"]
    np.testing.assert_allclose(got[want.index], want, rtol=0, atol=0)


def test_trim_endpoints(spark, sf_dir, events_pdf):
    got = set(windows.trim_endpoints(_events(spark, sf_dir), "user_id", ORDER)
              .select("event_id").toPandas()["event_id"])
    want = set()
    for _, grp in events_pdf.groupby("user_id"):
        want |= set(grp["event_id"].iloc[1:-1])
    assert got == want


def test_sliding_segments(spark, sf_dir, events_pdf):
    seg, stride = 20, 10
    got = (windows.sliding_segments(_events(spark, sf_dir), seg, stride,
                                    "user_id", ORDER, "seg")
           .select("event_id", "seg").toPandas())
    got_pairs = set(map(tuple, got.to_numpy()))
    want_pairs = set()
    for _, grp in events_pdf.groupby("user_id"):
        for i, eid in enumerate(grp["event_id"]):
            lo = max(0, int(np.floor((i - seg + stride) / stride)))
            hi = i // stride
            for s in range(lo, hi + 1):
                want_pairs.add((eid, s))
    assert got_pairs == want_pairs
    # every segment has <= seg rows and consecutive row indices
    sizes = got.groupby(["seg"]).size()
    assert (sizes <= seg * events_pdf["user_id"].nunique()).all()


def test_leakage_rolling_frames_trailing_only(spark, sf_dir):
    """Rolling/ffill/sessionize frames end at currentRow: poisoning future
    rows never changes past outputs."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import functions as F
    cutoff = "2024-01-15"
    base = (windows.rolling(ev, "value", {"m": "avg"}, "user_id", ORDER, 5)
            .where(F.col("ts") < cutoff).select("event_id", "m").toPandas()
            .set_index("event_id")["m"])
    poisoned = ev.withColumn(
        "value", F.when(F.col("ts") >= cutoff, 1e12).otherwise(F.col("value")))
    got = (windows.rolling(poisoned, "value", {"m": "avg"}, "user_id", ORDER, 5)
           .where(F.col("ts") < cutoff).select("event_id", "m").toPandas()
           .set_index("event_id")["m"])
    np.testing.assert_array_equal(base[got.index].to_numpy(), got.to_numpy())


def test_ohlc_time_bars_matches_pandas(spark, sf_dir, events_pdf):
    got = (windows.ohlc_time_bars(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        21600, "value", "user_id", "ts", "event_id")
        .toPandas().set_index(["user_id", "bar_start_s"]).sort_index())
    pdf = events_pdf[events_pdf["value"].notna()].copy()
    us = pdf["ts"].astype("int64") // 1000  # ns -> us, tz-naive
    pdf["bar"] = (us // 21_600_000_000) * 21600
    pdf = pdf.sort_values(["ts", "event_id"])
    grp = pdf.groupby(["user_id", "bar"])["value"]
    want = grp.agg(["first", "max", "min", "last", "count"])
    want["sum"] = pdf.assign(
        qv=(pdf["value"] * 100).round().astype("int64")
    ).groupby(["user_id", "bar"])["qv"].sum() / 100.0
    assert len(got) == len(want)
    for (uid, bar), row in want.iterrows():
        g = got.loc[(uid, bar)]
        assert g["open_value"] == row["first"], (uid, bar)
        assert g["close_value"] == row["last"], (uid, bar)
        assert g["high_value"] == row["max"] and g["low_value"] == row["min"]
        assert g["n_events"] == row["count"]
        assert g["sum_value"] == row["sum"], (uid, bar)
