"""S-curve parameter selection: pin the math and the shipped defaults'
operating point (no Spark session needed)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, strategies as st

from ordinarydumpdeduplicator_spark.functions.lsh_tuning import (
    DEFAULT_BANDS,
    DEFAULT_ROWS,
    choose_bands,
    choose_params,
    detection_probability,
    expected_candidates,
    threshold,
)


def test_detection_probability_known_values():
    # MMDS ch.3 worked example: b=20, r=5 at s=0.8 -> ~0.9996
    assert detection_probability(0.8, 20, 5) == pytest.approx(
        1 - (1 - 0.8**5) ** 20
    )
    assert detection_probability(0.0, 32, 4) == 0.0
    assert detection_probability(1.0, 32, 4) == 1.0


def test_shipped_defaults_operating_point():
    """The engine's 32x4 banding: near-certain detection at the verify
    threshold 0.5's UPPER region, coin-flip AT 0.5 — the knee sits just
    below 0.5, which is why verification (not banding) is the precision
    gate."""
    knee = threshold(DEFAULT_BANDS, DEFAULT_ROWS)
    assert 0.35 < knee < 0.45
    assert detection_probability(0.7, DEFAULT_BANDS, DEFAULT_ROWS) > 0.999
    # at jaccard 0.5 exactly, detection is genuinely probabilistic —
    # the documented reason short one-word-edit paraphrases at ~0.5
    # are coin flips (tests/test_decontamination.py plants well above)
    p_at_half = detection_probability(0.5, DEFAULT_BANDS, DEFAULT_ROWS)
    assert 0.8 < p_at_half < 0.95


def test_choose_bands_meets_recall():
    for rows in (2, 4, 8):
        for t in (0.5, 0.7, 0.9):
            b = choose_bands(rows, t, min_recall=0.99)
            assert detection_probability(t, b, rows) >= 0.99
            if b > 1:
                assert detection_probability(t, b - 1, rows) < 0.99


def test_choose_params_respects_both_sides():
    bands, rows = choose_params(
        0.8, min_recall=0.99, max_fp_at=(0.3, 0.05)
    )
    assert detection_probability(0.8, bands, rows) >= 0.99
    assert detection_probability(0.3, bands, rows) <= 0.05


def test_choose_params_infeasible_raises():
    with pytest.raises(ValueError):
        # demand near-perfect separation of 0.5 vs 0.49 in 64 hashes
        choose_params(0.5, min_recall=0.999, max_fp_at=(0.49, 0.001),
                      max_hashes=64)


def test_expected_candidates_shape():
    # no true pairs, zero random similarity -> zero candidates
    assert expected_candidates(10_000, 32, 4) == 0.0
    # true pairs at jaccard 1.0 are all detected
    assert expected_candidates(
        100, 32, 4, n_true_pairs=50, true_pair_jaccard=1.0
    ) == pytest.approx(50.0)


@given(
    s=st.floats(min_value=0.0, max_value=1.0),
    bands=st.integers(min_value=1, max_value=64),
    rows=st.integers(min_value=1, max_value=16),
)
def test_detection_probability_monotone_and_bounded(s, bands, rows):
    p = detection_probability(s, bands, rows)
    assert 0.0 <= p <= 1.0
    # monotone in s
    s2 = min(1.0, s + 0.05)
    assert detection_probability(s2, bands, rows) >= p - 1e-12
    # monotone in bands
    assert detection_probability(s, bands + 1, rows) >= p - 1e-12


@given(
    t=st.floats(min_value=0.2, max_value=0.95),
    rows=st.integers(min_value=1, max_value=12),
)
def test_choose_bands_minimal(t, rows):
    b = choose_bands(rows, t, min_recall=0.95)
    # 1e-9 slack: the chooser works in log1p space, the check in direct
    # powers — the two can differ by a few ulps around the boundary
    assert detection_probability(t, b, rows) >= 0.95 - 1e-9
    if b > 1:
        assert detection_probability(t, b - 1, rows) < 0.95 + 1e-9


def test_knee_formula_matches_crossover():
    """(1/b)^(1/r) is where s^r * b = 1 — detection prob ~1 - 1/e
    region; check the knee lands between the 10% and 90% points."""
    for bands, rows in ((32, 4), (20, 5), (8, 16)):
        knee = threshold(bands, rows)
        assert detection_probability(knee * 0.6, bands, rows) < 0.5
        assert detection_probability(min(1.0, knee * 1.5), bands, rows) > 0.5
