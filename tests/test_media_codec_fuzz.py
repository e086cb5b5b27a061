"""Property-based codec fuzz (hypothesis): the WAV and FVID codecs must
roundtrip EXACTLY on their representable grids for arbitrary content and
shapes — the same guarantee class the as-of fuzz suite pins for the join."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ecg_feature_engineering_spark.datagen import audio as dga
from ecg_feature_engineering_spark.datagen import video as dgv
from ecg_feature_engineering_spark.functions import media_kernels as mk


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=4096),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_pcm16_roundtrip_any_length(n, sr, seed):
    rng = np.random.default_rng(seed)
    # arbitrary int16-grid signal, full amplitude range
    pcm = rng.integers(-32767, 32768, n)
    x = pcm / 32767.0
    sr2, y = dga.decode_wav(dga.encode(x, sr, "pcm16"))
    assert sr2 == sr
    np.testing.assert_array_equal(np.rint(y * 32767).astype(np.int64), pcm)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=4096),
    fmt=st.sampled_from(["pcm16", "pcm8"]),
    sr=st.sampled_from([8000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_reencode_idempotent_bytes(n, fmt, sr, seed):
    """decode -> re-encode reproduces the exact original blob for any
    payload: quantization is idempotent at the byte level (the invariant
    behind audio_transcode_snr's 999-dB same-format arm)."""
    rng = np.random.default_rng(seed)
    blob = dga.encode(rng.uniform(-1, 1, n), sr, fmt)
    _, x = dga.decode_wav(blob)
    assert dga.encode(x, sr, fmt) == blob


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    fps=st.integers(min_value=1, max_value=120),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_fvid_roundtrip_any_shape(n, h, w, fps, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    fps2, out = dgv.decode_fvid(dgv.encode_fvid(frames, fps))
    assert fps2 == fps
    np.testing.assert_array_equal(frames, out)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=2048),
    sr_in=st.sampled_from([8000, 16000]),
    sr_out=st.sampled_from([4000, 8000, 16000]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_resample_grid_endpoints(n, sr_in, sr_out, seed):
    """Resample length math and endpoint alignment hold for any rate
    pair, checked against the KERNEL's own grid function (resample_grid —
    shared with resample_audio, so grid regressions cannot hide behind a
    test-local reimplementation)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.9, 0.9, n)
    n_out, t_out = mk.resample_grid(n, sr_in, sr_out)
    assert n_out == max(int(round(n * sr_out / sr_in)), 1)
    y = np.interp(t_out, np.arange(n), x)
    assert np.isclose(y[0], x[0])  # grid anchored at t=0
    assert len(y) == n_out
    # duration preserved within one output sample period
    assert abs(n_out / sr_out - n / sr_in) <= 1.0 / sr_out + 1e-12
    # np.interp clamps beyond the last sample: tail is the last value
    assert abs(y[-1]) <= max(abs(x.min()), abs(x.max())) + 1e-12
