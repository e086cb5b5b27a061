"""Batch-2 operators vs numpy/pandas oracles: CDF density, full
Variability, QRSYuxi, crossing widths, interval join, wavelets, fused FFT,
spectrogram, fiducial kernel parity, balance/pivot."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ecg_feature_engineering_spark.functions import kernels, wavelets
from ecg_feature_engineering_spark.operators import joins, splits, stats, windows

ORDER = ["ts", "event_id"]


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value")


def test_cdf_density_oracle(spark, sf_dir, events_pdf):
    got = stats.cdf_density(_events(spark, sf_dir), "value", "user_id") \
        .toPandas().set_index("user_id")["cdf_density"]
    for uid, grp in events_pdf.groupby("user_id"):
        x = grp["value"].to_numpy()
        hist, _ = np.histogram(x, range=(100, 400), bins=60)
        want = np.sum(np.cumsum(hist) / len(x)) / 60
        assert np.isclose(got[uid], want), uid


def test_variability_full_oracle(spark, sf_dir, events_pdf):
    ev = _events(spark, sf_dir)
    trimmed = windows.trim_endpoints(ev, "user_id", ORDER)
    prepped = stats.with_variability_inputs(trimmed, "value", "user_id",
                                            ORDER)
    got = prepped.groupBy("user_id").agg(
        *stats.variability_full_aggs("value", "nn", "nn_pair",
                                     "first_value", "last_value", 15.0)) \
        .toPandas().set_index("user_id")
    for uid, grp in events_pdf.groupby("user_id"):
        ts = grp.sort_values(["ts", "event_id"])["value"].to_numpy()[1:-1]
        NN = np.abs(np.diff(ts))
        want_step = (sum(np.sqrt(NN[x] ** 2 + NN[x + 1] ** 2)
                         for x in range(len(NN) - 1)) / (len(NN) - 1)) \
            / ts.mean()
        want_disp = np.sqrt(
            (NN ** 2).sum() / (2 * len(NN)) - NN.sum() ** 2 / (2 * len(NN) ** 2)
        ) / ((-ts[0] - 2 * ts[-1] + 2 * ts.sum()) / (2 * len(NN)))
        row = got.loc[uid]
        assert np.isclose(row["sdnn"], ts.std())
        assert row["nn50"] == (NN > 15).sum()
        assert np.isclose(row["pnn50"], (NN > 15).sum() / len(ts))
        assert np.isclose(row["stepping"], want_step), uid
        assert np.isclose(row["dispersion"], want_disp), uid


def test_qrs_yuxi_oracle(spark, sf_dir, events_pdf):
    """Literal reimplementation of the reference loop as the oracle."""
    ev = _events(spark, sf_dir)
    trimmed = windows.trim_endpoints(ev, "user_id", ORDER)
    got = stats.qrs_yuxi(trimmed, "value", "user_id", ORDER).toPandas() \
        .set_index("user_id")["yuxi_ratio"]
    tol = 0.05
    for uid, grp in events_pdf.groupby("user_id"):
        ts = grp.sort_values(["ts", "event_id"])["value"].to_numpy()[1:-1]
        med = np.median(ts)
        matched = [False] * len(ts)
        for i in range(len(ts)):
            if abs(ts[i] - med) / med <= tol or \
               abs(ts[i] - 2 * med) / (2 * med) <= tol:
                matched[i] = True
        for i in range(len(ts)):
            if not matched[i]:
                fwd = ts[i] if i == 0 else ts[i - 1] + ts[i]
                bwd = ts[i] if i == len(ts) - 1 else ts[i] + ts[i + 1]
                if (abs(fwd - 2 * med) / (2 * med) <= tol
                        or abs(fwd - 3 * med) / (3 * med) <= tol
                        or abs(bwd - 2 * med) / (2 * med) <= tol
                        or abs(bwd - 3 * med) / (3 * med) <= tol):
                    matched[i] = True
        assert np.isclose(got[uid], sum(matched) / len(matched)), uid


def test_crossing_widths_oracle(spark, sf_dir, events_pdf):
    """Literal pair_flag state machine as the oracle."""
    got = stats.crossing_width_stats(_events(spark, sf_dir), "value",
                                     "user_id", ORDER).toPandas() \
        .set_index("user_id")
    for uid, grp in events_pdf.groupby("user_id"):
        x = grp.sort_values(["ts", "event_id"])["value"].to_numpy()
        th = x.mean()
        cnt, pair_flag, pre_loc, width = 0, 1, 0, []
        for i in range(len(x) - 1):
            if (x[i] - th) * (x[i + 1] - th) < 0:
                cnt += 1
                if pair_flag == 1:
                    width.append(i - pre_loc)
                    pair_flag = 0
                else:
                    pair_flag = 1
                    pre_loc = i
        want_w = float(np.mean(width)) if len(width) > 1 else 0.0
        assert got.loc[uid, "n_crossings"] == cnt, uid
        assert np.isclose(got.loc[uid, "mean_width"], want_w), uid


def test_interval_join_matches_naive(spark, sf_dir):
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    anchors = (_events(spark, sf_dir)
               .where(F.col("event_type") == "purchase")
               .select("user_id", F.col("event_id").alias("anchor_id"),
                       (F.col("ts") - F.expr("INTERVAL 3 HOURS")).alias("lo"),
                       (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("hi")))
    bucketed = joins.interval_join(ev, anchors, by="user_id",
                                   bucket_seconds=3600.0)
    naive = anchors.alias("a").join(
        ev.alias("e"),
        (F.col("a.user_id") == F.col("e.user_id"))
        & F.col("e.ts").between(F.col("a.lo"), F.col("a.hi")))
    assert bucketed.count() == naive.count()


def test_fiducial_kernel_matches_range_join(spark, sf_dir):
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    base = _events(spark, sf_dir).where(F.col("event_type") == "click")
    anchors_k = base.select("user_id", F.col("event_id").alias("anchor_id"),
                            "ts")
    anchors_r = base.select(
        "user_id", F.col("event_id").alias("anchor_id"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("hi"))
    a = kernels.anchor_fiducials_kernel(
        ev, anchors_k, by="user_id", anchor_key="anchor_id",
        lo_s=-7200.0, hi_s=7200.0).toPandas() \
        .sort_values("anchor_id").reset_index(drop=True)
    b = joins.anchor_window_aggs(
        ev, anchors_r, by="user_id", anchor_key="anchor_id",
        bucket_seconds=4 * 3600.0).toPandas() \
        .sort_values("anchor_id").reset_index(drop=True)
    assert list(a["anchor_id"]) == list(b["anchor_id"])
    for c in ("n_events", "max_value", "min_value", "mean_value",
              "amplitude"):
        np.testing.assert_allclose(a[c].astype(float), b[c].astype(float),
                                   rtol=1e-12, err_msg=c)


def test_wavelet_generator_published_values():
    # published db2/db3 scaling filters (public constants)
    db2 = [0.48296291314469025, 0.836516303737469,
           0.22414386804185735, -0.12940952255092145]
    np.testing.assert_allclose(wavelets.daubechies_scaling_filter(2), db2,
                               atol=1e-10)
    db3 = [0.3326705529509569, 0.8068915093133388, 0.4598775021193313,
           -0.13501102001039084, -0.08544127388224149, 0.035226291882100656]
    np.testing.assert_allclose(wavelets.daubechies_scaling_filter(3), db3,
                               atol=1e-10)


def test_wavelet_energy_and_shape():
    rng = np.random.default_rng(4)
    x = rng.normal(size=2048)
    bands = wavelets.wavedec(x, 7, 7)
    assert len(bands) == 8
    e = sum((c * c).sum() for c in bands)
    # orthogonal filter bank: energy preserved up to boundary extension
    assert abs(e / (x * x).sum() - 1) < 0.05
    feats = wavelets.wavelet_stat_features(x, 7, 7, min_len=64)
    assert feats.shape == (48,)
    assert wavelets.wavelet_stat_features(x[:50], 7, 7).sum() == 0.0


def test_fft_features_agg_oracle(spark, sf_dir, events_pdf):
    got = kernels.fft_features_agg(_events(spark, sf_dir), "value",
                                   "user_id", "ts", fs=1.0,
                                   snr_cut_hz=0.1).toPandas() \
        .set_index("user_id")
    part = [0, 1.5, 4, 8, 20, 100, 0.5]
    for uid, grp in list(events_pdf.groupby("user_id"))[:4]:
        x = grp.sort_values("ts")["value"].to_numpy()
        freqs, pxx = kernels.periodogram_np(x, 1.0)
        idx = [int(h * len(x) / 1.0) for h in part]
        p = [pxx[idx[i]:idx[i + 1]].sum() for i in range(6)]
        row = got.loc[uid]
        for i in range(6):
            assert np.isclose(row[f"band{i}"], round(p[i], 6), atol=1e-6)
        tot = sum(p)
        probs = [v / tot for v in p if v > 0]
        assert np.isclose(row["band_entropy"],
                          -sum(v * np.log(v) for v in probs), atol=1e-5)
        sig = pxx[freqs < 0.1].sum()
        noise = pxx[freqs >= 0.1].sum()
        assert np.isclose(row["snr"], sig / noise, atol=1e-5)


def test_spectrogram_shape(spark, sf_dir, events_pdf):
    got = kernels.spectrogram_agg(_events(spark, sf_dir), "value",
                                  "user_id", "ts", fs=1.0, nperseg=64) \
        .toPandas().set_index("user_id")
    for uid, grp in list(events_pdf.groupby("user_id"))[:3]:
        n = len(grp)
        want_segs = max((n - 64) // 64 + 1, 0) if n >= 64 else 0
        assert got.loc[uid, "n_segments"] == want_segs
        if want_segs:
            spec = got.loc[uid, "log_spec"]
            assert len(spec) == want_segs and len(spec[0]) == 33


def test_balance_and_pivot(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"id": [1, 2, 3], "lab": ["a", "b", "c"]}))
    out = splits.balance_classes(df, "lab", {"a": 2, "b": 3}).toPandas()
    assert out["lab"].value_counts().to_dict() == {"b": 3, "a": 2, "c": 1}
    oh = splits.pivot_one_hot(df, "id", "lab", ["a", "b", "c"]).toPandas() \
        .set_index("id").sort_index()
    assert oh.loc[1].tolist() == [1, 0, 0]
    assert oh.loc[3].tolist() == [0, 0, 1]


def test_phash_near_dup_planted(spark):
    """A planted 2-bit-flipped pHash duplicate must be found by the
    block-bucketed hamming query; far hashes must not."""
    import __spark_entry__  # noqa: F401  (registry import side effect)
    from ecg_feature_engineering_spark import contract

    rows = [("a", 0x0123456789ABCDEF), ("b", 0x0123456789ABCDEC),  # ham 2
            # shares 3 of 4 blocks with a (so it IS a candidate) but block 2
            # differs by 8 bits -> must be filtered by the hamming cut
            ("c", 0x0123FFFF89ABCDEF)]
    img = spark.createDataFrame(pd.DataFrame(rows,
                                             columns=["image_id", "phash"]))
    # reuse the query body against a planted frame
    blocks = F.array(*[
        F.struct(F.lit(i).alias("blk"),
                 F.shiftrightunsigned(F.col("phash"), 16 * i)
                 .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for i in range(4)])
    b = (img.withColumn("b", F.explode(blocks))
         .select(F.col("image_id").alias("id"), F.col("phash").alias("ph"),
                 F.col("b.blk"), F.col("b.key")))
    pairs = (
        b.alias("x").join(
            b.alias("y"),
            (F.col("x.blk") == F.col("y.blk"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"),
                F.bit_count(F.col("x.ph").bitwiseXOR(F.col("y.ph")))
                .alias("hamming"))
        .distinct().where(F.col("hamming") <= 6)).toPandas()
    assert set(map(tuple, pairs[["id_a", "id_b"]].to_numpy())) == {("a", "b")}
    assert pairs["hamming"].iloc[0] == 2
    assert "phash_near_dups" in contract.QUERY_BUILDERS


def test_fiducial_kernel_extended_outputs(spark, sf_dir, events_pdf):
    """Extended per-anchor fiducials vs a literal pandas recomputation for
    a few anchors (slopes, offsets, area, pre/post means)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    base = _events(spark, sf_dir).where(F.col("event_type") == "click")
    anchors = base.select("user_id", F.col("event_id").alias("anchor_id"),
                          "ts")
    got = kernels.anchor_fiducials_kernel(
        ev, anchors, by="user_id", anchor_key="anchor_id",
        lo_s=-7200.0, hi_s=7200.0).toPandas().set_index("anchor_id")
    apdf = base.toPandas()
    for _, a in apdf.iloc[:10].iterrows():
        grp = events_pdf[events_pdf.user_id == a["user_id"]].sort_values("ts")
        t0 = a["ts"] - pd.Timedelta(seconds=7200)
        t1 = a["ts"] + pd.Timedelta(seconds=7200)
        w = grp[(grp.ts >= t0) & (grp.ts <= t1)]
        sel = w["value"].to_numpy()
        ssec = w["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        ta = pd.Timestamp(a["ts"]).value / 1e9
        row = got.loc[a["event_id"]]
        assert row["n_events"] == len(sel)
        imax = sel.argmax()
        assert np.isclose(row["argmax_offset_s"], ssec[imax] - ta, atol=1e-5)
        assert np.isclose(row["first_value"], sel[0])
        assert np.isclose(row["last_value"], sel[-1])
        if len(sel) > 1:
            assert np.isclose(row["area"], np.trapz(sel, ssec), rtol=1e-9)
        pre = sel[ssec <= ta]
        assert np.isclose(row["value_at_anchor"], pre[-1])
        assert row["n_pre"] == len(pre)
