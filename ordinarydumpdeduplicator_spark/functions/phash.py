"""64-bit perceptual hash (pHash) over decoded pixels — pure numpy.

Classic DCT pHash: downscale to 32x32 grayscale (area mean), 2-D DCT-II,
take the top-left 8x8 coefficient block minus DC, threshold at the median.
Deterministic; used by the fixture generator to populate the input table's
``phash`` column and by tests to re-derive it from ``bytes``.

This is the image-side near-duplicate feature the north rule adds on top of
the reference's single content feature (SHA-1, Common/FsUtils.cs:39-54).
Small pixel perturbations (re-encode noise) flip few bits, so near-dup
images sit within a small Hamming radius — candidate generation is then
multi-index banding (operators/lsh.py).
"""

from __future__ import annotations

import numpy as np

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi / n * (i + 0.5) * k)
        m[0] *= 1.0 / np.sqrt(2.0)
        _DCT32 = m * np.sqrt(2.0 / n)
    return _DCT32


def _to_gray32(pixels: np.ndarray) -> np.ndarray:
    """RGB HxWx3 uint8 -> 32x32 float grayscale via block-area mean."""
    g = (
        0.299 * pixels[:, :, 0]
        + 0.587 * pixels[:, :, 1]
        + 0.114 * pixels[:, :, 2]
    ).astype(np.float64)
    h, w = g.shape
    return _area_mean_resample(g, 32, 32)


def _bin_edges(n: int, bins: int) -> tuple[np.ndarray, np.ndarray]:
    """Lower/upper pixel bin edges; every bin non-empty even when n < bins."""
    e = np.floor(np.linspace(0, n, bins + 1)).astype(np.int64)
    lo = np.minimum(e[:-1], n - 1)
    hi = np.maximum(e[1:], lo + 1)
    hi = np.minimum(hi, n)
    hi = np.maximum(hi, lo + 1)
    return lo, hi


def _area_mean_resample(g: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized block-area-mean resample via an integral image."""
    h, w = g.shape
    y0, y1 = _bin_edges(h, out_h)
    x0, x1 = _bin_edges(w, out_w)
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = g.cumsum(0).cumsum(1)
    s = (
        csum[np.ix_(y1, x1)]
        - csum[np.ix_(y0, x1)]
        - csum[np.ix_(y1, x0)]
        + csum[np.ix_(y0, x0)]
    )
    area = np.outer(y1 - y0, x1 - x0).astype(np.float64)
    return s / area


def _pack_bits_msb(bits: np.ndarray) -> int:
    """64 bool bits (MSB first) -> signed int64, vectorized packbits."""
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash as a signed int64 (Spark LongType friendly)."""
    g = _to_gray32(pixels)
    m = _dct_matrix(32)
    d = m @ g @ m.T
    block = d[:8, :8].flatten()
    coeffs = block[1:]  # drop DC
    med = np.median(coeffs)
    bits = np.zeros(64, dtype=bool)
    bits[1:] = coeffs > med
    return _pack_bits_msb(bits)


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash (row-gradient sign on an 8x9 grayscale
    downsample) — the standard complement to DCT pHash: dHash keys on
    local edge structure where pHash keys on global low-frequency energy,
    so together they separate near-dup classes neither catches alone."""
    g = (
        0.299 * pixels[:, :, 0]
        + 0.587 * pixels[:, :, 1]
        + 0.114 * pixels[:, :, 2]
    ).astype(np.float64)
    small = _area_mean_resample(g, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    return _pack_bits_msb(bits)
