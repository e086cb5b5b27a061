"""Audio/video multimodal kernels: codec roundtrips, numeric oracles
against independent numpy recomputation, and the Spark plumbing (schema,
row expansion, payload pruning)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ecg_feature_engineering_spark.datagen import audio as dga
from ecg_feature_engineering_spark.datagen import video as dgv
from ecg_feature_engineering_spark.functions import media_kernels as mk
from ecg_feature_engineering_spark.functions.kernels import periodogram_np


# ------------------------------------------------------------ WAV codec
def test_wav_pcm16_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = np.round(rng.uniform(-0.9, 0.9, 1234) * 32767) / 32767
    sr, y = dga.decode_wav(dga.encode(x, 16000, "pcm16"))
    assert sr == 16000
    np.testing.assert_allclose(x, y, atol=1e-12)


def test_wav_pcm8_quantization_bounded():
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.9, 0.9, 5000)
    _, y = dga.decode_wav(dga.encode(x, 8000, "pcm8"))
    # 8-bit quantization step is 1/127 -> max abs error half a step
    assert np.max(np.abs(x - y)) <= 0.5 / 127 + 1e-12
    assert dga.snr_db(x, y) > 40.0


def test_wav_header_fields_and_chunk_walk():
    x = np.zeros(64)
    data = dga.encode(x, 44100, "pcm16")
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    # insert a foreign chunk between fmt and data; decoder must skip it
    foreign = b"LIST" + (7).to_bytes(4, "little") + b"junkbyt" + b"\x00"
    patched = data[:36] + foreign + data[36:]
    sr, y = dga.decode_wav(patched)
    assert sr == 44100 and len(y) == 64


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        dga.decode_wav(b"NOTAWAVE" + b"\x00" * 40)


# ----------------------------------------------------------- FVID codec
def test_fvid_roundtrip_exact():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(7, 9, 11, 3), dtype=np.uint8)
    fps, out = dgv.decode_fvid(dgv.encode_fvid(frames, 24))
    assert fps == 24
    np.testing.assert_array_equal(frames, out)


def test_fvid_foreign_magic_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        dgv.decode_fvid(b"H264" + b"\x00" * 32)


def test_static_video_has_zero_motion():
    row = dgv.gen_video_row(42, 0)  # i % 11 == 0 -> planted static
    assert row["is_static"]
    _, frames = dgv.decode_fvid(row["bytes"])
    assert np.all(frames[0] == frames[-1])


# ------------------------------------------------- Spark audio kernels
@pytest.fixture(scope="module")
def audio_df(spark):
    from ecg_feature_engineering_spark import contract

    contract.ensure_workers_can_import(spark)
    return dga.audio_df(spark, 60, seed=42).cache()


def test_audio_decode_stats_matches_numpy(audio_df):
    got = mk.audio_decode_stats(audio_df, keep=["audio_id"]) \
        .toPandas().set_index("audio_id")
    src = audio_df.select("audio_id", "bytes").toPandas()
    for _, r in src.sample(12, random_state=0).iterrows():
        sr, x = dga.decode_wav(r["bytes"])
        row = got.loc[r["audio_id"]]
        assert row["decoded_sr"] == sr and row["decoded_n"] == len(x)
        assert np.isclose(row["rms"], np.sqrt(np.mean(x ** 2)))
        assert np.isclose(row["peak"], np.max(np.abs(x)))
        zc = np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
        assert np.isclose(row["zcr_hz"], zc / (len(x) / sr))


def test_audio_spectral_centroid_matches_numpy(audio_df):
    got = mk.audio_spectral(audio_df, keep=["audio_id", "f0_hz"]) \
        .toPandas().set_index("audio_id")
    src = audio_df.select("audio_id", "bytes").toPandas()
    for _, r in src.sample(8, random_state=1).iterrows():
        sr, x = dga.decode_wav(r["bytes"])
        freqs, pxx = periodogram_np(x, float(sr))
        row = got.loc[r["audio_id"]]
        assert np.isclose(row["spectral_centroid_hz"],
                          (freqs * pxx).sum() / pxx.sum())
        # band partition must tile the full power
        assert np.isclose(row["band_low"] + row["band_mid"]
                          + row["band_high"], row["total_power"])
    # planted dominant tone recovered within one FFT bin, every clip
    full = mk.audio_spectral(audio_df,
                             keep=["audio_id", "sr", "n_samples", "f0_hz"]) \
        .toPandas()
    bin_w = full["sr"] / full["n_samples"]
    assert (np.abs(full["dominant_hz"] - full["f0_hz"]) <= bin_w).all()


def test_audio_resample_against_numpy_interp(audio_df):
    rs = mk.resample_audio(audio_df.withColumnRenamed("sr", "src_sr"),
                           8000, keep=["audio_id", "src_sr"]) \
        .toPandas().set_index("audio_id")
    src = audio_df.select("audio_id", "sr", "fmt", "bytes").toPandas()
    for _, r in src.sample(8, random_state=2).iterrows():
        sr, x = dga.decode_wav(r["bytes"])
        n_out = max(int(round(len(x) * 8000 / sr)), 1)
        t_out = np.arange(n_out) * (sr / 8000)
        want = np.interp(t_out, np.arange(len(x)), x)
        row = rs.loc[r["audio_id"]]
        assert row["sr"] == 8000 and row["n_samples"] == n_out
        _, y = dga.decode_wav(row["bytes"])
        # pcm16 re-encode quantizes: within half a 16-bit step
        assert np.max(np.abs(y - want)) <= 0.5 / 32767 + 1e-9
        # identity-rate resample of a pcm16 source must be lossless (a
        # pcm8 source's k/127 grid is NOT a subset of the 32767 grid, so
        # it re-quantizes within the half-step bound asserted above)
        if sr == 8000 and r["fmt"] == "pcm16":
            np.testing.assert_allclose(y, x, atol=1e-12)


def test_empty_wav_payload_survives_kernels(spark):
    """A structurally valid WAV with a 0-sample data chunk must produce an
    all-zero stats row, not crash the task (review finding: np.max on a
    zero-size array)."""
    import pandas as pd

    from ecg_feature_engineering_spark import contract

    contract.ensure_workers_can_import(spark)
    empty = dga.encode(np.zeros(0), 8000, "pcm16")
    df = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["a0"], "bytes": [empty]}))
    got = mk.audio_decode_stats(df, keep=["audio_id"]).toPandas().iloc[0]
    assert got["decoded_n"] == 0 and got["rms"] == 0.0 and got["peak"] == 0.0
    sp = mk.audio_spectral(df, keep=["audio_id"]).toPandas().iloc[0]
    assert sp["total_power"] == 0.0 and sp["dominant_hz"] == 0.0
    rs = mk.resample_audio(df, 4000, keep=["audio_id"]).toPandas().iloc[0]
    assert rs["n_samples"] == 0
    _, y = dga.decode_wav(rs["bytes"])
    assert len(y) == 0
    snr = mk.audio_transcode_snr(
        df.withColumn("fmt", F.lit("pcm16")), "pcm8").toPandas().iloc[0]
    assert snr["snr_db"] == 999.0  # exact roundtrip, not 0/0 NaN


def test_empty_fvid_payload_survives_kernels(spark):
    """A structurally valid 0-frame FVID must yield an all-zero stats row,
    zero sampled frames, and an empty resized clip — not NaNs or a
    np.stack([]) crash."""
    import pandas as pd

    from ecg_feature_engineering_spark import contract

    contract.ensure_workers_can_import(spark)
    empty = dgv.encode_fvid(np.zeros((0, 4, 6, 3), dtype=np.uint8), 8)
    df = spark.createDataFrame(
        pd.DataFrame({"video_id": ["v0"], "bytes": [empty]}))
    vs = mk.video_stats(df, keep=["video_id"]).toPandas().iloc[0]
    assert vs["decoded_frames"] == 0
    assert vs["luma_mean"] == 0.0 and vs["motion_max"] == 0.0
    assert mk.sample_frames(df, keep=["video_id"]).count() == 0
    rz = mk.resize_frames(df, 2, 3, keep=["video_id"]).toPandas().iloc[0]
    assert rz["n_frames"] == 0
    _, frames = dgv.decode_fvid(rz["bytes"])
    assert frames.shape == (0, 2, 3, 3)


def test_audio_transcode_snr_floor(audio_df):
    snr = mk.audio_transcode_snr(audio_df, "pcm8").toPandas()
    assert (snr["snr_db"] >= 40.0).all()
    assert (snr.loc[snr["fmt"] == "pcm8", "snr_db"] == 999.0).all()


# ------------------------------------------------- Spark video kernels
@pytest.fixture(scope="module")
def video_df(spark):
    from ecg_feature_engineering_spark import contract

    contract.ensure_workers_can_import(spark)
    return dgv.video_df(spark, 44, seed=42).cache()


def test_video_stats_static_invariant(video_df):
    got = mk.video_stats(video_df, keep=["video_id", "is_static"]) \
        .toPandas()
    meas = got["motion_mean"] == 0.0
    assert (meas == got["is_static"]).all()
    n_frames = video_df.select("video_id", "n_frames").toPandas() \
        .set_index("video_id")["n_frames"]
    assert (got.set_index("video_id")["decoded_frames"] == n_frames).all()


def test_video_stats_matches_numpy(video_df):
    luma_w = np.array([0.299, 0.587, 0.114])
    got = mk.video_stats(video_df, keep=["video_id"]) \
        .toPandas().set_index("video_id")
    src = video_df.select("video_id", "bytes").toPandas()
    for _, r in src.sample(6, random_state=3).iterrows():
        _, frames = dgv.decode_fvid(r["bytes"])
        luma = frames.astype(np.float64) @ luma_w
        row = got.loc[r["video_id"]]
        assert np.isclose(row["luma_mean"], luma.mean())
        assert np.isclose(row["luma_std"], luma.std())
        if len(frames) > 1:
            steps = np.abs(np.diff(luma, axis=0)).mean(axis=(1, 2))
            assert np.isclose(row["motion_mean"], steps.mean())
            assert np.isclose(row["motion_max"], steps.max())


def test_sample_frames_expansion_shape(video_df):
    fs = mk.sample_frames(video_df, every_k=4,
                          keep=["video_id"]).toPandas()
    n_frames = video_df.select("video_id", "n_frames").toPandas() \
        .set_index("video_id")["n_frames"]
    # stride semantics: ceil(n/4) rows per video, indices 0,4,8,...
    counts = fs.groupby("video_id").size()
    assert (counts == np.ceil(n_frames / 4).astype(int)
            .reindex(counts.index)).all()
    assert (fs["frame_idx"] % 4 == 0).all()
    assert set(fs["video_id"]) == set(n_frames.index)


def test_resize_frames_common_grid(video_df):
    from ecg_feature_engineering_spark.datagen.codecs import area_resize

    out = mk.resize_frames(video_df, 8, 8, keep=["video_id"]) \
        .toPandas().set_index("video_id")
    src = video_df.select("video_id", "n_frames", "bytes").toPandas()
    assert (out["w"] == 8).all() and (out["h"] == 8).all()
    for _, r in src.sample(5, random_state=4).iterrows():
        row = out.loc[r["video_id"]]
        assert row["n_frames"] == r["n_frames"]
        fps_in, frames_in = dgv.decode_fvid(r["bytes"])
        fps_out, frames_out = dgv.decode_fvid(row["bytes"])
        assert fps_out == fps_in and frames_out.shape == (len(frames_in), 8, 8, 3)
        # per-frame equality with the image resampler (exact: FVID is lossless)
        np.testing.assert_array_equal(frames_out[0],
                                      area_resize(frames_in[0], 8, 8))


def test_media_query_schemas(spark):
    """The registered contract queries keep their driver-facing schema."""
    from ecg_feature_engineering_spark import contract

    contract.ensure_workers_can_import(spark)
    q = contract.QUERY_BUILDERS
    assert q["audio_decode_stats"](spark, "").columns == [
        "fmt", "n", "sum_n", "min_rms", "max_rms", "min_zcr", "max_zcr"]
    assert q["video_frame_sample"](spark, "").columns == [
        "fps", "n_videos", "n_frames", "max_idx", "min_luma", "max_luma"]
