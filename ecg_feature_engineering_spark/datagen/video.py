"""Deterministic synthetic video table generator + toy container codec.

Completes the image/audio/video multimodal trio (brief: opaque ``binary``
payload + typed metadata, decoded only inside Arrow kernels). Real video
bitstreams (H.264/VP9) need external codecs the container lacks, so — per
the brief's stub rule — the CONTAINER here is a self-defined deterministic
format (``FVID``: header + zlib-compressed raw RGB frames) whose decode is
exact, while anything that would require libavcodec is explicitly out of
scope (see ``decode_fvid`` docstring). The Spark-side plumbing — schema,
partitioning, mapInPandas kernel signatures, one-row-to-many frame
explosion — is real and tested; swapping in a real codec changes only the
two pure functions below.

Reference analog: a video's frame axis plays the role of the reference's
per-record time axis (extract_HRV.py 12xT signal matrix); frame sampling is
the analog of its fixed-stride signal windowing (preprocess-300hz.py
segment loop).

Generation is per-row deterministic from (seed, i); frames follow a
moving-gradient pattern so inter-frame motion has a known nonzero value
and a planted static video has motion exactly 0.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

_MAGIC = b"FVID"

VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, fps int, n_frames int, "
    "fmt string, caption string"
)


def encode_fvid(frames: np.ndarray, fps: int) -> bytes:
    """Encode (n, h, w, 3) uint8 frames as an FVID blob.

    Layout: magic(4) | w u16 | h u16 | fps u8 | n_frames u16 | zlib(raw).
    Deterministic (zlib level pinned) and exact on roundtrip.
    """
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = f.shape
    if c != 3:
        raise ValueError("frames must be (n, h, w, 3)")
    hdr = _MAGIC + struct.pack("<HHBH", w, h, fps, n)
    return hdr + zlib.compress(f.tobytes(), 6)


def decode_fvid(data: bytes) -> tuple[int, np.ndarray]:
    """Decode an FVID blob -> (fps, frames (n, h, w, 3) uint8).

    A real-codec variant (H.264 etc.) would live here behind the same
    signature; the container image lacks libavcodec, so only FVID is
    implemented (NotImplementedError for foreign magics rather than a
    silent fake decode).
    """
    if data[:4] != _MAGIC:
        raise NotImplementedError(
            "only the FVID container is decodable in this environment; "
            "real bitstream codecs require libavcodec (absent here)")
    w, h, fps, n = struct.unpack_from("<HHBH", data, 4)
    raw = zlib.decompress(data[11:])
    frames = np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3)
    return int(fps), frames


_VOCAB = "pan zoom static flicker gradient drift scene cut fade loop".split()


def _rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, 11, i]))


def gen_video_row(seed: int, i: int) -> dict:
    """One deterministic clip: a diagonal gradient translating by a seeded
    per-frame shift (+ a pinch of noise on frame 0 reused across frames so
    motion comes only from the shift). Every 11th clip is STATIC (all
    frames identical) — the planted motion==0 invariant."""
    rng = _rng(seed, i)
    w = int(rng.integers(8, 25))
    h = int(rng.integers(8, 25))
    fps = int((i % 2 + 1) * 12)  # 12 or 24
    n_frames = int(rng.integers(4, 17))
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy * 7 + xx * 13) % 256).astype(np.float64)
    noise = rng.integers(0, 32, size=(h, w, 3)).astype(np.float64)
    shift = 0 if i % 11 == 0 else int(rng.integers(1, 4))
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for k in range(n_frames):
        plane = np.roll(base, k * shift, axis=1)
        rgb = np.stack([plane, (plane * 2) % 256, (255 - plane)], axis=-1)
        frames[k] = np.clip(rgb + noise, 0, 255).astype(np.uint8)
    data = encode_fvid(frames, fps)
    caption = " ".join(
        str(_VOCAB[int(x)])
        for x in rng.integers(0, len(_VOCAB), int(rng.integers(1, 5))))
    return {
        "video_id": f"vid{i:08d}",
        "bytes": data,
        "w": w, "h": h, "fps": fps, "n_frames": n_frames,
        "fmt": "fvid",
        "caption": caption,
        "is_static": bool(shift == 0),  # ground-truth companion column
    }


def video_df(spark, n: int = 120, seed: int = 42, parts: int | None = None):
    """Distributed video table: VIDEO_SCHEMA + ground-truth ``is_static``
    companion column (same catalog-column pattern as ``images_df``)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [gen_video_row(seed, int(i)) for i in b["id"].to_numpy()]
            pdf = pd.DataFrame(rows, columns=[
                "video_id", "bytes", "w", "h", "fps", "n_frames", "fmt",
                "caption", "is_static"])
            for c in ("w", "h", "fps", "n_frames"):
                pdf[c] = pdf[c].astype("int32")
            yield pdf

    parts = parts or max(1, min(n // 50 or 1, 128))
    return spark.range(0, n, 1, parts).mapInPandas(
        gen, schema=VIDEO_SCHEMA + ", is_static boolean")
