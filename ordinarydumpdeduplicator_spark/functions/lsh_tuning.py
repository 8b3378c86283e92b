"""Banded-MinHash LSH parameter selection (the S-curve calculus).

For a signature of ``bands * rows`` min-hashes cut into ``bands`` bands of
``rows`` rows, a pair with true Jaccard ``s`` becomes a candidate with

    P(s) = 1 - (1 - s^rows)^bands

(the classic banding S-curve, Mining of Massive Datasets ch. 3). These
helpers make the engine's banding knobs (functions/minhash.BANDS /
ROWS_PER_BAND, the per-operator ``bands=`` arguments) choosable from a
stated contract — "detect pairs above threshold t with recall >= r" —
instead of folklore defaults, and make the cost side (expected candidate
volume) visible before a 100 TB run burns it.

Pure math, no Spark session required; used by tests to pin the shipped
defaults' operating point and available to operators for config
validation.
"""

from __future__ import annotations

import math

#: the engine's shipped text-chain operating point (functions/minhash)
DEFAULT_BANDS = 32
DEFAULT_ROWS = 4


def detection_probability(s: float, bands: int, rows: int) -> float:
    """P(candidate | true Jaccard s) for banded LSH: 1 - (1 - s^r)^b."""
    if not 0.0 <= s <= 1.0:
        raise ValueError(f"jaccard s must be in [0, 1], got {s}")
    return 1.0 - (1.0 - s**rows) ** bands


def threshold(bands: int, rows: int) -> float:
    """The S-curve knee (1/b)^(1/r) — the Jaccard where detection moves
    fastest; pairs well above it are near-certain candidates, pairs well
    below near-certain non-candidates."""
    return (1.0 / bands) ** (1.0 / rows)


def choose_bands(
    rows: int, jaccard_threshold: float, min_recall: float = 0.99
) -> int:
    """Smallest band count whose S-curve detects pairs AT the threshold
    with probability >= min_recall, given ``rows`` rows per band.

    b >= log(1 - min_recall) / log(1 - t^r), rounded up. More bands =
    longer signatures and more band rows per item (linear cost), so the
    smallest satisfying count is the one to ship."""
    if not 0.0 < jaccard_threshold <= 1.0:
        raise ValueError("jaccard_threshold must be in (0, 1]")
    if not 0.0 < min_recall < 1.0:
        raise ValueError("min_recall must be in (0, 1)")
    p_band = jaccard_threshold**rows
    if p_band >= 1.0:
        return 1
    return max(1, math.ceil(math.log1p(-min_recall) / math.log1p(-p_band)))


def choose_params(
    jaccard_threshold: float,
    min_recall: float = 0.99,
    max_fp_at: tuple[float, float] | None = None,
    max_hashes: int = 1024,
) -> tuple[int, int]:
    """(bands, rows) meeting a detection contract with the fewest total
    hashes.

    - recall side: P(candidate | s = jaccard_threshold) >= min_recall;
    - optional precision side: ``max_fp_at = (s_low, p_max)`` demands
      P(candidate | s = s_low) <= p_max — more rows per band sharpen the
      knee, at the price of more bands (hence hashes) for the same
      recall.

    Scans rows = 1.. while total hashes stay within ``max_hashes`` and
    returns the first (rows ascending, so cheapest-knee-first) config
    whose minimal band count satisfies both sides; raises if none fits —
    the caller's contract is infeasible at this signature budget and
    should be renegotiated rather than silently approximated."""
    best: tuple[int, int] | None = None
    best_hashes = max_hashes + 1
    for rows in range(1, 65):
        bands = choose_bands(rows, jaccard_threshold, min_recall)
        total = bands * rows
        if total > max_hashes:
            continue
        if max_fp_at is not None:
            s_low, p_max = max_fp_at
            if detection_probability(s_low, bands, rows) > p_max:
                continue
        if total < best_hashes:
            best, best_hashes = (bands, rows), total
    if best is None:
        raise ValueError(
            f"no (bands, rows) within {max_hashes} hashes satisfies "
            f"recall>={min_recall} at s={jaccard_threshold}"
            + (f" and fp<={max_fp_at[1]} at s={max_fp_at[0]}" if max_fp_at else "")
        )
    return best


def expected_candidates(
    n_items: int,
    bands: int,
    rows: int,
    jaccard_of_random_pair: float = 0.0,
    n_true_pairs: int = 0,
    true_pair_jaccard: float = 1.0,
) -> float:
    """Back-of-envelope expected candidate-pair volume: true pairs times
    their detection probability plus C(n, 2) random pairs times the
    false-positive rate at the random-pair similarity. The number to
    sanity-check against the bucket caps before a large run."""
    fp = detection_probability(jaccard_of_random_pair, bands, rows)
    tp = detection_probability(true_pair_jaccard, bands, rows)
    random_pairs = n_items * (n_items - 1) / 2 - n_true_pairs
    return n_true_pairs * tp + random_pairs * fp
