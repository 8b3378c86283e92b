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


_GRAY_W = np.array([0.299, 0.587, 0.114], dtype=np.float64)


def _to_gray(pixels: np.ndarray) -> np.ndarray:
    """RGB HxWx3 uint8 -> HxW float64 grayscale (one tensordot, no
    per-channel temporaries)."""
    return np.tensordot(pixels.astype(np.float64), _GRAY_W, axes=([2], [0]))


def _to_gray32(pixels: np.ndarray) -> np.ndarray:
    """RGB HxWx3 uint8 -> 32x32 float grayscale via block-area mean."""
    return _area_mean_resample(_to_gray(pixels), 32, 32)


def _bin_edges(n: int, bins: int) -> tuple[np.ndarray, np.ndarray]:
    """Lower/upper pixel bin edges; every bin non-empty even when n < bins."""
    e = np.floor(np.linspace(0, n, bins + 1)).astype(np.int64)
    lo = np.minimum(e[:-1], n - 1)
    hi = np.maximum(e[1:], lo + 1)
    hi = np.minimum(hi, n)
    hi = np.maximum(hi, lo + 1)
    return lo, hi


def _integral(g: np.ndarray) -> np.ndarray:
    h, w = g.shape
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(g, axis=0, out=csum[1:, 1:])
    np.cumsum(csum[1:, 1:], axis=1, out=csum[1:, 1:])
    return csum


def _area_mean_resample(
    g: np.ndarray, out_h: int, out_w: int, csum: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized block-area-mean resample via an integral image (pass a
    precomputed ``csum`` to amortize it across several target sizes)."""
    h, w = g.shape
    y0, y1 = _bin_edges(h, out_h)
    x0, x1 = _bin_edges(w, out_w)
    if csum is None:
        csum = _integral(g)
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


def _phash_from_g32(g32: np.ndarray) -> int:
    m = _dct_matrix(32)
    d = m @ g32 @ m.T
    block = d[:8, :8].flatten()
    coeffs = block[1:]  # drop DC
    med = np.median(coeffs)
    bits = np.zeros(64, dtype=bool)
    bits[1:] = coeffs > med
    return _pack_bits_msb(bits)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash as a signed int64 (Spark LongType friendly)."""
    return _phash_from_g32(_to_gray32(pixels))


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


def _dhash_from_small(small: np.ndarray) -> int:
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    return _pack_bits_msb(bits)


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash (row-gradient sign on an 8x9 grayscale
    downsample) — the standard complement to DCT pHash: dHash keys on
    local edge structure where pHash keys on global low-frequency energy,
    so together they separate near-dup classes neither catches alone."""
    return _dhash_from_small(_area_mean_resample(_to_gray(pixels), 8, 9))


def gray_features(pixels: np.ndarray) -> tuple[int, int, float, float]:
    """(phash64, dhash64, gray_mean, gray_std) in ONE pass: the RGB->gray
    tensordot and the integral image are computed once and shared by both
    downsamples and the statistics — the per-image hot path of the feature
    stage (operators/features.py), ~30% cheaper than calling the three
    derivations separately at 256x192 (each would redo gray + cumsum).
    Bit-identical to phash64/dhash64: same gray, same integral, same
    resample arithmetic."""
    g = _to_gray(pixels)
    csum = _integral(g)
    h, w = g.shape
    ph = _phash_from_g32(_area_mean_resample(g, 32, 32, csum))
    dh = _dhash_from_small(_area_mean_resample(g, 8, 9, csum))
    return ph, dh, float(g.mean()), float(g.std())
