"""Discrete wavelet transform in pure numpy — U5 analog (WaveletStat db7
7-level DWT, LONG_features.py:243-262). This container has no pywt, so the
filters are constructed from first principles (public Daubechies spectral
factorization, Strang & Nguyen) and the pyramid transform uses symmetric
signal extension. Coefficient ordering follows the standard wavedec layout
[aJ, dJ, dJ-1, ..., d1].

Validation (tests/test_kernels.py): the generator reproduces the published
db2/db3 scaling filters to 8+ digits; the transform preserves energy on long
signals (orthogonal filter bank); per-level lengths follow
floor((n + L - 1)/2). Exact pywt boundary-sample parity is unverifiable in
this container (no pywt) — boundary convention is documented here and
pinned by tests for determinism.
"""

from __future__ import annotations

from math import comb

import numpy as np


def daubechies_scaling_filter(n_moments: int) -> np.ndarray:
    """Length-2N Daubechies scaling (low-pass) filter h with N vanishing
    moments via spectral factorization: roots of
    P(y) = sum_k C(N-1+k, k) y^k are mapped to z-plane pairs
    z + 1/z = 2 - 4y; the minimum-phase root of each pair is kept;
    h(z) ~ (1+z)^N * prod(z - z_i), normalized to sum h = sqrt(2)."""
    n = n_moments
    p_coeffs = [comb(n - 1 + k, k) for k in range(n - 1, -1, -1)]
    yroots = np.roots(p_coeffs) if n > 1 else np.array([])
    zroots = []
    for y in yroots:
        b = 2.0 - 4.0 * y
        disc = np.sqrt(b * b - 4.0 + 0j)
        z1, z2 = (b + disc) / 2.0, (b - disc) / 2.0
        zroots.append(z1 if abs(z1) < 1.0 else z2)
    poly = np.poly1d([1.0])
    for _ in range(n):
        poly = poly * np.poly1d([1.0, 1.0])
    for zi in zroots:
        poly = poly * np.poly1d([1.0, -zi])
    h = np.real(poly.coeffs)
    return h / h.sum() * np.sqrt(2.0)


def wavelet_filters(n_moments: int) -> tuple[np.ndarray, np.ndarray]:
    """(dec_lo, dec_hi): decomposition filters; hi by quadrature mirror
    g[k] = (-1)^k h[L-1-k]."""
    h = daubechies_scaling_filter(n_moments)
    ln = len(h)
    g = np.array([(-1) ** k * h[ln - 1 - k] for k in range(ln)])
    return h, g


def dwt_single(x: np.ndarray, lo: np.ndarray, hi: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray]:
    """One analysis level: symmetric-pad by L-1, correlate, downsample by 2.
    Output length floor((n + L - 1) / 2)."""
    ln = len(lo)
    xp = np.pad(x, (ln - 1, ln - 1), mode="symmetric")
    a_full = np.convolve(xp, lo[::-1], mode="valid")
    d_full = np.convolve(xp, hi[::-1], mode="valid")
    return a_full[1::2], d_full[1::2]


def wavedec(x: np.ndarray, n_moments: int = 7, level: int = 7
            ) -> list[np.ndarray]:
    """Multi-level DWT, standard [aJ, dJ, ..., d1] layout."""
    lo, hi = wavelet_filters(n_moments)
    a = np.asarray(x, dtype=np.float64)
    details = []
    for _ in range(level):
        a, d = dwt_single(a, lo, hi)
        details.append(d)
    return [a] + details[::-1]


def wavelet_stat_features(x: np.ndarray, n_moments: int = 7,
                          level: int = 7, min_len: int = 1664
                          ) -> np.ndarray:
    """A22 WaveletStat — per coefficient band (the first 8 arrays of the
    7-level decomposition): max, min, mean, median, population std, and
    energy/len(x) (LONG_features.py:246-262); zeros if len(x) < min_len."""
    if len(x) < min_len:
        return np.zeros((level + 1) * 6)
    bands = wavedec(x, n_moments, level)
    out = []
    for c in bands:
        out += [c.max(), c.min(), c.mean(), np.median(c), c.std(),
                float((c * c).sum()) / len(x)]
    return np.array(out)
