"""Deterministic (hash-threshold) sampling for training-data pipelines.

Web-scale corpora need *reproducible* sampling — eval holdouts, ablation
subsets, per-language mixture rates — that is stable across runs, cluster
sizes and row order. Random `df.sample()` gives none of that (it is
partition-layout dependent). The standard fix is a hash rule: keep a row
iff ``hash(salt, key) < p * 2^bits``.

The hash here is the row key's lowercase-hex MD5 digest compared
*lexicographically* against a threshold literal: 32 hex chars are a
uniform draw over [0, 2^128), and `p * 2^128` rendered as 32 hex digits
is the cut. Both Spark (`F.md5`) and DuckDB (`md5`) emit lowercase hex,
so the exact same rule is expressible in both engines with **zero UDFs**
and no integer parsing — the driver's DuckDB oracle replays it verbatim
(see ``__spark_entry__.oracle_sql()['stratified_sample']``).

Scale shape: the predicate is a pure per-row filter — no shuffle, no
state, pushed past column pruning; at 10^12 rows it is a map-only scan.
MD5 is a mixing function here, not a security boundary (the same family
choice as functions/text.shingle_hash64).

Reference analogue: the reference has no sampler (it enumerates a local
tree exhaustively, `OrdinaryDumpDeduplicator/HierarchyAnalyzer.cs`); this
is one of the beyond-reference pipeline operators SURVEY §2.12 adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fraction_to_hex_threshold(fraction: float, digits: int = 32) -> str:
    """``fraction`` of the [0, 16^digits) hash space as a lowercase-hex
    literal of exactly ``digits`` chars. A lowercase-hex digest compares
    lexicographically below it iff its integer value < fraction * 16^d
    (hex chars order the same as their values; equal-length strings)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * (1 << (4 * digits))))
    if cut >= 1 << (4 * digits):
        # p=1.0: 'g' sorts after 'f', so every hex digest compares below
        return "g"
    return format(cut, "x").rjust(digits, "0")


def sample_predicate(
    key: Column, fraction: float, salt: str = "sample"
) -> Column:
    """Boolean column: deterministic keep-decision for one fraction."""
    digest = F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))
    return digest < F.lit(fraction_to_hex_threshold(fraction))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a reproducible ~``fraction`` of rows keyed by ``key_col``.

    Stable under repartitioning, row reordering and re-runs; disjoint
    salts give independent draws (holdout vs ablation subsets)."""
    return df.filter(sample_predicate(F.col(key_col), fraction, salt))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling — the mixture-rebalancing primitive
    (e.g. downsample English to 10%, keep low-resource languages whole).

    One CASE over stratum thresholds, then one digest comparison: still a
    map-only per-row filter. Strata missing from ``rates`` fall back to
    ``default_rate`` (0.0 = drop)."""
    thr = F.lit(fraction_to_hex_threshold(default_rate))
    for stratum in sorted(rates):
        thr = F.when(
            F.col(stratum_col) == stratum,
            F.lit(fraction_to_hex_threshold(rates[stratum])),
        ).otherwise(thr)
    digest = F.md5(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    )
    return df.filter(digest < thr)
