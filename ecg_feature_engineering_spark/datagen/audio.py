"""Deterministic synthetic audio table generator + pure-numpy WAV codec.

Multimodal companion to ``datagen/images.py``: audio payloads are opaque
``bytes:binary`` columns with typed metadata, decoded only inside Arrow
kernels (the brief's image/audio/video multimodal contract). The codec is a
REAL RIFF/WAVE implementation — canonical 44-byte header, mono PCM — in two
genuine WAV subformats:

- ``pcm16``: 16-bit signed little-endian PCM (lossless roundtrip),
- ``pcm8`` : 8-bit unsigned PCM (a real WAV variant; the 16->8-bit
  quantization is the audio analog of the lossy-image path, with an
  SNR-floor invariant instead of PSNR).

Anything requiring an external codec (MP3/AAC/FLAC bitstreams) is out of
container scope and would be stubbed; WAV needs no library, so the decode
here is real, not a fake.

Reference analog: one generated row ≈ one WFDB record's signal vector
(reference extract_HRV.py:29-30 loads a 12xT matrix per record); the synth
signal is a seeded sum of sinusoids + noise so spectral features have
closed-form expectations (same trick as the reference's known-band HRV
spectra, HRV_features.py frequency-domain block).

Generation is per-row deterministic from (seed, i) and runs distributed via
``spark.range(n).mapInPandas`` — the 10^12-row framing never touches the
driver.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

_RIFF_FMT_PCM = 1
_SRS = (8000, 16000)  # deterministic per-row choice below

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sr int, n_samples int, fmt string, "
    "caption string"
)


# ---------------------------------------------------------------------
# WAV codec (RIFF/WAVE, mono PCM) — pure numpy/struct, no libraries
# ---------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sr: int, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1) as a canonical mono RIFF/WAVE blob.

    bits=16 -> PCM_S16LE (lossless for int16-grid inputs);
    bits=8  -> PCM_U8 (real WAV subformat; lossy via 8-bit quantization).
    """
    x = np.asarray(samples, dtype=np.float64)
    if bits == 16:
        pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
        body = pcm.tobytes()
    elif bits == 8:
        pcm = np.clip(np.rint(x * 127.0) + 128, 0, 255).astype(np.uint8)
        body = pcm.tobytes()
    else:
        raise ValueError(f"unsupported bits: {bits}")
    block_align = bits // 8  # mono
    byte_rate = sr * block_align
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(body)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, _RIFF_FMT_PCM, 1, sr,
                             byte_rate, block_align, bits),
        b"data", struct.pack("<I", len(body)),
    ])
    return hdr + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono PCM RIFF/WAVE blob -> (sample_rate, float64 in [-1, 1]).

    Walks the chunk list (not fixed offsets) so blobs with extra chunks
    still parse; rejects non-PCM / non-mono inputs explicitly.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, sr, bits, body = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, n_ch, sr, _rate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload)
            if audio_fmt != _RIFF_FMT_PCM or n_ch != 1:
                raise ValueError("only mono PCM supported")
        elif tag == b"data":
            body = payload
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if sr is None or body is None:
        raise ValueError("missing fmt/data chunk")
    if bits == 16:
        x = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32767.0
    elif bits == 8:
        x = (np.frombuffer(body, dtype=np.uint8).astype(np.float64)
             - 128.0) / 127.0
    else:
        raise ValueError(f"unsupported bits: {bits}")
    return int(sr), x


_FMT_BITS = {"pcm16": 16, "pcm8": 8}


def encode(samples: np.ndarray, sr: int, fmt: str) -> bytes:
    return encode_wav(samples, sr, _FMT_BITS[fmt])


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of a decoded roundtrip (audio PSNR analog)."""
    noise = np.mean((ref - test) ** 2)
    if noise == 0:
        return float("inf")
    return float(10.0 * np.log10(np.mean(ref ** 2) / noise))


# ---------------------------------------------------------------------
# Synth corpus
# ---------------------------------------------------------------------

_VOCAB = (
    "tone sweep noise chirp hum click speech music silence beep ring "
    "drone pulse echo"
).split()


def _rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, 7, i]))


def gen_audio_row(seed: int, i: int) -> dict:
    """One deterministic clip: two seeded sinusoids + low white noise.

    The dominant tone's frequency is recoverable from the payload alone
    (periodogram argmax), which is what the spectral-feature digest pins.
    """
    rng = _rng(seed, i)
    sr = _SRS[i % len(_SRS)]
    dur_ms = int(rng.integers(40, 160))  # 40-160 ms -> 320-2560 samples
    n = max(sr * dur_ms // 1000, 64)
    t = np.arange(n) / sr
    f0 = float(rng.integers(100, sr // 4))         # dominant tone
    f1 = float(rng.integers(sr // 4, sr // 2 - 50))  # weak high partial
    x = (0.55 * np.sin(2 * np.pi * f0 * t)
         + 0.15 * np.sin(2 * np.pi * f1 * t)
         + 0.02 * rng.standard_normal(n))
    x = np.clip(x, -0.999, 0.999)
    fmt = "pcm16" if i % 3 else "pcm8"  # 1/3 lossy, like the image corpus
    data = encode(x, sr, fmt)
    n_words = int(rng.integers(1, 6))
    caption = " ".join(
        str(_VOCAB[int(w)])
        for w in rng.integers(0, len(_VOCAB), n_words))
    return {
        "audio_id": f"aud{i:08d}",
        "bytes": data,
        "sr": sr,
        "n_samples": int(n),
        "fmt": fmt,
        "caption": caption,
        "f0_hz": f0,  # companion ground-truth column (not part of payload)
    }


def audio_df(spark, n: int = 300, seed: int = 42, parts: int | None = None):
    """Distributed audio table: AUDIO_SCHEMA + a ground-truth ``f0_hz``
    companion column (kept in the same scan, the catalog-column pattern of
    ``images_df``)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = [gen_audio_row(seed, int(i)) for i in ids]
            pdf = pd.DataFrame(rows, columns=[
                "audio_id", "bytes", "sr", "n_samples", "fmt", "caption",
                "f0_hz"])
            pdf["sr"] = pdf["sr"].astype("int32")
            pdf["n_samples"] = pdf["n_samples"].astype("int32")
            yield pdf

    parts = parts or max(1, min(n // 100 or 1, 256))
    return spark.range(0, n, 1, parts).mapInPandas(
        gen, schema=AUDIO_SCHEMA + ", f0_hz double")
