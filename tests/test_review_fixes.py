"""Regression tests for the third review round: tokenization edge cases,
NULL-propagating median, late-snapshot streaming, PNG Up filter, threshold
rounding, fractional windows, path-derived ids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ecg_feature_engineering_spark.datagen import codecs
from ecg_feature_engineering_spark.operators import text, windows


def test_words_tab_and_newline_padding(spark):
    d = spark.createDataFrame(pd.DataFrame({
        "text": ["\thello\t", "hello world\n", "\t", "", "a  b"]}))
    got = [r["n"] for r in
           d.select(F.size(text.words(F.col("text"))).alias("n")).collect()]
    assert got == [1, 2, 0, 0, 2]


def test_fingerprint_padding_invariant(spark):
    # a tab-padded doc must fingerprint identically to its space-padded twin
    d = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["hello world", "\thello  world\n", " hello\tworld "]}))
    got = text.fingerprint(d).select("fingerprint").distinct().count()
    assert got == 1


def test_rolling_median3_null_propagates(spark):
    d = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["e"] * 4,
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:01",
                              "2024-01-01 00:02", "2024-01-01 00:03"]),
        "value": [10.0, None, 20.0, 30.0]}))
    got = (windows.rolling_median3(d, "value", "entity_id", "ts", "m")
           .orderBy("ts").select("m").toPandas()["m"].tolist())
    # row0: first row -> (b+c)/2 -> (10+null)/2 -> null
    # row1: null value -> null; row2: frame has the null -> null
    # row3: last row -> (a+b)/2 = 25
    assert got[0] is None or np.isnan(got[0])
    assert got[1] is None or np.isnan(got[1])
    assert got[2] is None or np.isnan(got[2])
    assert got[3] == 25.0


def test_streaming_asof_survives_late_snapshot(spark, tmp_path):
    from ecg_feature_engineering_spark.streaming.asof import (
        streaming_asof_backward,
    )

    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame([("u", base + pd.Timedelta(minutes=m), float(m))
                       for m in (10, 70)],
                      columns=["user_id", "ts", "value"])
    # batch 1 snapshot at 00:45; batch 2 delivers a LATE one at 00:30
    sn1 = pd.DataFrame([("u", base + pd.Timedelta(minutes=45), 145.0)],
                       columns=["user_id", "ts", "snap_value"])
    sn2 = pd.DataFrame([("u", base + pd.Timedelta(minutes=30), 130.0)],
                       columns=["user_id", "ts", "snap_value"])
    ev1, ev2 = ev[ev.ts < base + pd.Timedelta(minutes=60)], \
        ev[ev.ts >= base + pd.Timedelta(minutes=60)]
    for name, parts in (("events", (ev1, ev2)), ("snaps", (sn1, sn2))):
        d = tmp_path / name
        for part in parts:
            spark.createDataFrame(part).coalesce(1) \
                .write.mode("append").parquet(str(d))
    ev_s = (spark.readStream.schema(spark.createDataFrame(ev).schema)
            .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "events")))
    sn_s = (spark.readStream.schema(spark.createDataFrame(sn1).schema)
            .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "snaps")))
    q = (streaming_asof_backward(ev_s, sn_s, by="user_id")
         .writeStream.outputMode("update").format("memory")
         .queryName("late_snap").start())
    q.processAllAvailable()   # must NOT crash on the unsorted seed
    q.stop()
    out = (spark.sql("SELECT * FROM late_snap ORDER BY ts").toPandas())
    assert len(out) == 2
    # the 01:10 event matches the 00:45 state snapshot, not the late 00:30
    assert out.iloc[-1]["snap_value"] == 145.0


def test_png_up_filter_first_row():
    # hand-build a PNG whose FIRST scanline uses filter 2 (Up): the prior
    # scanline is all zeros per spec, so the row decodes to its raw bytes
    import struct
    import zlib

    h, w = 2, 3
    row0 = np.arange(9, dtype=np.uint8)            # raw == decoded (Up on 0s)
    row1_raw = np.arange(9, 18, dtype=np.uint8)
    row1_filtered = (row1_raw - row0) & 0xFF       # Up vs row0
    scan = (b"\x02" + row0.tobytes() + b"\x02" + row1_filtered.tobytes())

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(scan))
           + chunk(b"IEND", b""))
    px = codecs.decode_png(png)
    np.testing.assert_array_equal(px[0].ravel(), row0)
    np.testing.assert_array_equal(px[1].ravel(), row1_raw)


def test_cosine_near_dup_threshold_on_true_cosine(spark):
    from ecg_feature_engineering_spark.operators import similarity

    # borderline pair: true cos just BELOW 0.95 but rounds to 0.950000
    a = np.array([1.0, 0.0])
    theta = np.arccos(0.9499996)
    b = np.array([np.cos(theta), np.sin(theta)])
    d = spark.createDataFrame(pd.DataFrame({
        "vec_id": [1, 2],
        "embedding": [a.tolist(), b.tolist()]}))
    got = similarity.cosine_near_dup_pairs(d, dim=2, threshold=0.95,
                                           n_planes=2, tables=6).toPandas()
    assert len(got) == 0  # below-threshold pair must not pass via rounding


def test_time_windows_fractional_seconds(spark):
    d = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["e"] * 4,
        "ts": pd.to_datetime(["2024-01-01 00:00:00.0",
                              "2024-01-01 00:00:00.4",
                              "2024-01-01 00:00:00.6",
                              "2024-01-01 00:00:01.1"]),
        "value": [1.0, 2.0, 3.0, 4.0]}))
    got = windows.tumbling_time_aggs(d, 0.5, "value", "entity_id", "ts") \
        .orderBy("window_start_s").toPandas()
    assert got["n_events"].tolist() == [2, 1, 1]  # 0.5s windows, not 0s
    with pytest.raises(ValueError):
        windows.tumbling_time_aggs(d, 0.0, "value", "entity_id", "ts")


def test_binary_ingest_path_ids(spark, tmp_path):
    from ecg_feature_engineering_spark.sources import io

    for sub in ("a", "b"):
        p = tmp_path / sub
        p.mkdir()
        (p / "1.png").write_bytes(b"xx")
    (tmp_path / "noext").write_bytes(b"yy")
    files = io.read_binary_files(spark, str(tmp_path), recursive=True)
    got = io.binary_files_to_payload_table(files).toPandas()
    assert got["image_id"].nunique() == 3       # a/1 and b/1 don't collide
    noext = got[got["image_id"].str.endswith("noext")]
    assert noext["fmt"].isna().all()            # null fmt, not ''


def test_tukey_window_properties():
    from ecg_feature_engineering_spark.functions.kernels import tukey_window

    w = tukey_window(64, 0.25)
    assert w[0] == 0.0 and abs(w[-1]) < 1e-15       # tapers reach zero
    assert np.all(w[9:55] == 1.0)                    # flat middle
    np.testing.assert_allclose(w, w[::-1], atol=1e-15)  # symmetric
    assert np.all(np.diff(w[:8]) > 0)                # monotone rise
    np.testing.assert_array_equal(tukey_window(64, 0.0), np.ones(64))
    # published spot value: tukey(8, 0.5) sample 1 = sin^2(pi*2/7*... )
    w8 = tukey_window(8, 0.5)
    np.testing.assert_allclose(
        w8[1], 0.5 * (1 + np.cos(np.pi * (-1 + 2 * 1 / 0.5 / 7))),
        atol=1e-15)


def test_spectrogram_tukey_detrend(spark):
    from ecg_feature_engineering_spark.functions import kernels

    n = 128
    t = np.arange(n)
    fs, tone_hz = 300.0, 300.0 * 8 / 64   # exactly bin 8 of a 64-pt seg
    x = 5.0 + 2.0 * np.sin(2 * np.pi * tone_hz * t / fs)
    pdf = pd.DataFrame({
        "entity_id": ["e"] * n,
        "ts": pd.date_range("2024-01-01", periods=n, freq="s"),
        "value": x})
    out = kernels.spectrogram_agg(
        spark.createDataFrame(pdf), "value", "entity_id", "ts",
        fs=fs, nperseg=64).collect()[0]
    spec = np.array(out["log_spec"])
    assert out["n_segments"] == 2 and spec.shape == (2, 33)
    # constant detrend kills the DC offset; the tone dominates at bin 8
    assert spec[0].argmax() == 8
    assert spec[0][8] - spec[0][0] > 5  # DC well below the tone (log scale)


def test_checkpoint_params_invalidation_and_metrics(spark, tmp_path):
    from ecg_feature_engineering_spark.checkpoint import StageCheckpointer

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(50)

    cp1 = StageCheckpointer(spark, str(tmp_path), params={"n_images": 10})
    cp1.run("s", build)
    assert calls["n"] == 1
    # same params -> resume without recompute
    StageCheckpointer(spark, str(tmp_path), params={"n_images": 10}).run(
        "s", build)
    assert calls["n"] == 1
    # different params -> stale manifest invalidated, stage recomputes
    cp2 = StageCheckpointer(spark, str(tmp_path), params={"n_images": 99})
    cp2.run("s", build)
    assert calls["n"] == 2
    # metrics reports only THIS run's params
    assert len(cp2.metrics()) == 1
    assert cp2.metrics()[0]["rows"] == 50
    # lineage lists the written files, not a re-scan
    import json as _json
    man = _json.load(open(tmp_path / "s" / "manifest.json"))
    assert all("file" in p and p["bytes"] > 0 for p in man["partitions"])


def test_asof_nullts_contract(spark):
    from ecg_feature_engineering_spark.operators import asof

    left = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["a", "a"],
        "ts": [pd.Timestamp("2024-01-01 05:00"), pd.NaT]}))
    right = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["a", "a"],
        "ts": [pd.NaT, pd.Timestamp("2020-01-01")],
        "v": [99.0, 7.0]}))
    for strat in ("union_window", "union_window_bucketed", "merge_asof"):
        got = (asof.asof_join(left, right, by="entity_id", strategy=strat,
                              keep_match_ts="mts", bucket_seconds=3600.0)
               .orderBy("ts").collect())
        # null-ts probe -> all-null fills; null-ts right row never matches
        assert got[0]["v"] is None and got[0]["mts"] is None, strat
        assert got[1]["v"] == 7.0, strat
