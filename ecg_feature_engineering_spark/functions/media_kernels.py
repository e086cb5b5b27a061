"""Arrow kernels over audio/video payloads — the multimodal companions to
``functions/kernels.py``'s image kernels (brief: image/audio/video as opaque
binary columns, decode/feature-extract/resample/frame-sample as vectorized
Pandas kernels, never per-row Python UDFs).

Plumbing mirrors the image kernels exactly: ``mapInPandas`` over the scan
partitions (zero shuffle — decode cost is per-row CPU), payload column
pruned immediately after the kernel, bounded Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``). Frame sampling is the
one row-EXPANDING kernel (one video -> k frame rows), the multimodal twin
of ``anchor_fiducials_kernel`` (U10).

Reference analogs: audio decode+stats ≈ the per-record signal load +
summary block (extract_HRV.py:29-33); audio resample ≈ the common-clock
resample (resample.py:24-28); spectral centroid/band power ≈ the
HRV frequency-domain features (HRV_features.py periodogram block); frame
sampling ≈ the fixed-stride segment loop (preprocess-300hz.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ecg_feature_engineering_spark.datagen import audio as audiocodec
from ecg_feature_engineering_spark.datagen import video as videocodec
from ecg_feature_engineering_spark.functions.kernels import periodogram_np

_LUMA = np.array([0.299, 0.587, 0.114])


def _luma(frames: np.ndarray) -> np.ndarray:
    """Rec.601 luma via explicit elementwise ops. NOT ``frames @ _LUMA``:
    numpy's batched matmul over a (n,h,w,3) stack is SIMD-blocked at
    array-offset granularity, so IDENTICAL frames at different offsets
    can produce last-ulp-different luma — which broke the exact
    motion==0 invariant for planted static clips (measured 6e-15)."""
    f = frames.astype(np.float64)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


# ---------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------

AUDIO_STATS_FIELDS = (
    "duration_s double, rms double, peak double, zcr_hz double, "
    "clip_frac double, decoded_sr int, decoded_n int"
)


def audio_decode_stats(df, id_col: str = "audio_id",
                       bytes_col: str = "bytes",
                       keep: list[str] | None = None):
    """Decode the WAV payload and emit per-clip waveform statistics
    (duration, RMS, peak, zero-crossing rate in Hz, clipping fraction).
    No shuffle; payload pruned after the kernel."""
    keep = keep if keep is not None else [id_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (", ".join(f"{c} {types[c]}" for c in keep)
                  + ", " + AUDIO_STATS_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            stats = np.empty((n, 5), dtype=np.float64)
            meta = np.empty((n, 2), dtype=np.int32)
            for i, d in enumerate(b[bytes_col].to_numpy()):
                sr, x = audiocodec.decode_wav(d)
                if len(x) == 0:
                    # a structurally valid WAV with an empty data chunk:
                    # all-zero stats row, not a zero-size-reduction crash
                    stats[i] = (0.0, 0.0, 0.0, 0.0, 0.0)
                    meta[i] = (sr, 0)
                    continue
                zc = np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
                dur = len(x) / sr
                stats[i] = (
                    dur,
                    float(np.sqrt(np.mean(x ** 2))),
                    float(np.max(np.abs(x))),
                    zc / dur if dur > 0 else 0.0,
                    float(np.mean(np.abs(x) >= 0.999)),
                )
                meta[i] = (sr, len(x))
            out = b[keep].copy()
            out[["duration_s", "rms", "peak", "zcr_hz", "clip_frac"]] = stats
            out["decoded_sr"] = meta[:, 0]
            out["decoded_n"] = meta[:, 1]
            yield out

    return df.select(*dict.fromkeys([*keep, bytes_col])) \
        .mapInPandas(run, schema=out_schema)


AUDIO_SPECTRAL_FIELDS = (
    "spectral_centroid_hz double, dominant_hz double, band_low double, "
    "band_mid double, band_high double, total_power double"
)


def audio_spectral(df, id_col: str = "audio_id", bytes_col: str = "bytes",
                   keep: list[str] | None = None):
    """Per-clip spectral features off the shared periodogram kernel
    (one FFT per clip, CSE'd across all six outputs — the fix for the
    reference's recompute-per-family quirk, LONG_features.py:270-281).
    Bands are fractions of each clip's own Nyquist ([0,.1), [.1,.5),
    [.5,1)), so mixed sample rates stay comparable."""
    keep = keep if keep is not None else [id_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (", ".join(f"{c} {types[c]}" for c in keep)
                  + ", " + AUDIO_SPECTRAL_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            feats = np.empty((n, 6), dtype=np.float64)
            for i, d in enumerate(b[bytes_col].to_numpy()):
                sr, x = audiocodec.decode_wav(d)
                if len(x) == 0:  # empty data chunk: all-zero feature row
                    feats[i] = (0.0,) * 6
                    continue
                freqs, pxx = periodogram_np(x, float(sr))
                tot = float(pxx.sum())
                centroid = float((freqs * pxx).sum() / tot) if tot > 0 else 0.0
                dom = float(freqs[int(np.argmax(pxx))])
                nyq = sr / 2.0
                lo = float(pxx[freqs < 0.1 * nyq].sum())
                mid = float(pxx[(freqs >= 0.1 * nyq) & (freqs < 0.5 * nyq)].sum())
                hi = float(pxx[freqs >= 0.5 * nyq].sum())
                feats[i] = (centroid, dom, lo, mid, hi, tot)
            out = b[keep].copy()
            out[["spectral_centroid_hz", "dominant_hz", "band_low",
                 "band_mid", "band_high", "total_power"]] = feats
            yield out

    return df.select(*dict.fromkeys([*keep, bytes_col])) \
        .mapInPandas(run, schema=out_schema)


def resample_grid(n_in: int, sr_in: int, sr_out: int
                  ) -> tuple[int, np.ndarray]:
    """Target-clock grid for a linear-interp resample: output length
    (duration-preserving rounding, min 1) and the output sample times in
    SOURCE sample units, anchored at t=0. Pure function shared by the
    Spark kernel and the property-based fuzz suite so grid-math
    regressions cannot hide behind a test-local reimplementation."""
    n_out = max(int(round(n_in * sr_out / sr_in)), 1)
    return n_out, np.arange(n_out) * (sr_in / sr_out)


def resample_audio(df, target_sr: int, id_col: str = "audio_id",
                   bytes_col: str = "bytes", out_fmt: str = "pcm16",
                   keep: list[str] | None = None):
    """Common-clock resample (resample.py:24-28 analog): decode, linear-
    interpolate onto the target rate's uniform grid, re-encode. Output row
    count equals input row count (a transform, not an agg)."""
    keep = keep if keep is not None else [id_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (", ".join(f"{c} {types[c]}" for c in keep)
                  + ", bytes binary, sr int, n_samples int, fmt string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            enc, lens = [], []
            for d in b[bytes_col].to_numpy():
                sr, x = audiocodec.decode_wav(d)
                if len(x) == 0:  # empty in -> empty out (valid 0-sample WAV)
                    enc.append(audiocodec.encode(x, target_sr, out_fmt))
                    lens.append(0)
                    continue
                n_out, t_out = resample_grid(len(x), sr, target_sr)
                y = np.interp(t_out, np.arange(len(x)), x)
                enc.append(audiocodec.encode(y, target_sr, out_fmt))
                lens.append(n_out)
            out = b[keep].copy()
            out["bytes"] = enc
            out["sr"] = np.int32(target_sr)
            out["n_samples"] = np.array(lens, dtype=np.int32)
            out["fmt"] = out_fmt
            yield out

    return df.select(*dict.fromkeys([*keep, bytes_col])) \
        .mapInPandas(run, schema=out_schema)


def audio_transcode_snr(df, target_fmt: str = "pcm8",
                        id_col: str = "audio_id", bytes_col: str = "bytes",
                        fmt_col: str = "fmt"):
    """Payload invariant (the audio twin of ``psnr_roundtrip``): decode ->
    transcode to ``target_fmt`` -> decode; SNR between the two decodes.
    Note a SAME-format roundtrip is always exact here (PCM quantization is
    idempotent), so the lossy invariant is the 16->8-bit transcode: pcm16
    sources land at the 8-bit quantization floor (>=40 dB on this corpus,
    pinned in the digest), pcm8 sources are exact (capped 999 dB)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for d in b[bytes_col].to_numpy():
                sr, x = audiocodec.decode_wav(d)
                if len(x) == 0:
                    # 0-sample clip: the roundtrip is trivially exact;
                    # snr_db would be 0/0 = NaN, not the exact-cap value
                    rows.append(999.0)
                    continue
                _, x2 = audiocodec.decode_wav(
                    audiocodec.encode(x, sr, target_fmt))
                rows.append(min(audiocodec.snr_db(x, x2), 999.0))
            yield pd.DataFrame({id_col: b[id_col], "fmt": b[fmt_col],
                                "snr_db": np.array(rows)})

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        run, schema=f"{id_col} string, fmt string, snr_db double")


# ---------------------------------------------------------------------
# Video
# ---------------------------------------------------------------------

VIDEO_STATS_FIELDS = (
    "decoded_frames int, luma_mean double, luma_std double, "
    "motion_mean double, motion_max double"
)


def video_stats(df, id_col: str = "video_id", bytes_col: str = "bytes",
                keep: list[str] | None = None):
    """Per-video summary: luma stats over all frames plus inter-frame
    motion (mean |frame_k - frame_{k-1}| in luma) — static clips have
    motion exactly 0 (the planted datagen invariant)."""
    keep = keep if keep is not None else [id_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (", ".join(f"{c} {types[c]}" for c in keep)
                  + ", " + VIDEO_STATS_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            feats = np.empty((n, 4), dtype=np.float64)
            counts = np.empty(n, dtype=np.int32)
            for i, d in enumerate(b[bytes_col].to_numpy()):
                _, frames = videocodec.decode_fvid(d)
                if len(frames) == 0:
                    # structurally valid 0-frame FVID: all-zero stats row
                    # (luma.mean() on an empty stack is NaN, not a value)
                    feats[i] = (0.0, 0.0, 0.0, 0.0)
                    counts[i] = 0
                    continue
                luma = _luma(frames)
                if len(frames) > 1:
                    diffs = np.abs(np.diff(luma, axis=0))
                    per_step = diffs.mean(axis=(1, 2))
                    motion_mean, motion_max = per_step.mean(), per_step.max()
                else:
                    motion_mean = motion_max = 0.0
                feats[i] = (luma.mean(), luma.std(),
                            motion_mean, motion_max)
                counts[i] = len(frames)
            out = b[keep].copy()
            out["decoded_frames"] = counts
            out[["luma_mean", "luma_std", "motion_mean", "motion_max"]] = feats
            yield out

    return df.select(*dict.fromkeys([*keep, bytes_col])) \
        .mapInPandas(run, schema=out_schema)


def resize_frames(df, out_h: int, out_w: int, id_col: str = "video_id",
                  bytes_col: str = "bytes", keep: list[str] | None = None):
    """Resize every frame of every clip onto a common (out_h, out_w) grid
    (deterministic area-mean, the image ``resize_images`` resampler
    applied along the frame axis) and re-encode as FVID. Completes the
    brief's multimodal verb list — decode / feature-extract / resize /
    frame-sample — for the video column."""
    from ecg_feature_engineering_spark.datagen.codecs import area_resize

    keep = keep if keep is not None else [id_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (", ".join(f"{c} {types[c]}" for c in keep)
                  + ", bytes binary, w int, h int, n_frames int")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            enc, counts = [], []
            for d in b[bytes_col].to_numpy():
                fps, frames = videocodec.decode_fvid(d)
                if len(frames) == 0:
                    # np.stack([]) raises; an empty clip resizes to an
                    # empty clip of the TARGET shape
                    small = np.zeros((0, out_h, out_w, 3), dtype=np.uint8)
                else:
                    small = np.stack([area_resize(f, out_h, out_w)
                                      for f in frames])
                enc.append(videocodec.encode_fvid(small, fps))
                counts.append(len(frames))
            out = b[keep].copy()
            out["bytes"] = enc
            out["w"] = np.int32(out_w)
            out["h"] = np.int32(out_h)
            out["n_frames"] = np.array(counts, dtype=np.int32)
            yield out

    return df.select(*dict.fromkeys([*keep, bytes_col])) \
        .mapInPandas(run, schema=out_schema)


def sample_frames(df, every_k: int = 4, id_col: str = "video_id",
                  bytes_col: str = "bytes", keep: list[str] | None = None):
    """Frame sampling — the row-EXPANDING kernel: one video row -> one row
    per sampled frame (indices 0, k, 2k, ... — frame 0 always included),
    each with its per-frame luma stats. The multimodal twin of the
    reference's fixed-stride segmenter (preprocess-300hz.py segment loop)
    and of ``anchor_fiducials_kernel``'s expansion shape (U10)."""
    keep = keep if keep is not None else [id_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (", ".join(f"{c} {types[c]}" for c in keep)
                  + ", frame_idx int, frame_luma_mean double, "
                    "frame_luma_std double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            counts: list[int] = []  # sampled frames per input row
            idxs: list[int] = []
            means: list[float] = []
            stds: list[float] = []
            for d in b[bytes_col].to_numpy():
                _, frames = videocodec.decode_fvid(d)
                ks = range(0, len(frames), every_k)
                counts.append(len(ks))
                for k in ks:
                    luma = _luma(frames[k])
                    idxs.append(k)
                    means.append(float(luma.mean()))
                    stds.append(float(luma.std()))
            # keep columns assembled ONCE per batch via index-repeat (no
            # per-frame pandas scalar access on the hot decode path)
            out = b[keep].iloc[
                np.repeat(np.arange(len(b)), counts)].reset_index(drop=True)
            out["frame_idx"] = np.array(idxs, dtype=np.int32)
            out["frame_luma_mean"] = np.array(means, dtype=np.float64)
            out["frame_luma_std"] = np.array(stds, dtype=np.float64)
            yield out

    return df.select(*dict.fromkeys([*keep, bytes_col])) \
        .mapInPandas(run, schema=out_schema)
