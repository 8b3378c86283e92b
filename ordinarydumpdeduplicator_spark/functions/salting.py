"""Explicit key salting for skewed joins/aggregations.

The engine's first line of defense against skew is removing it at the
source (exact pre-grouping of identical captions/phashes, bucket caps —
operators/lsh.py) plus AQE's runtime skew-join. This module is the third
tool the north rule names: EXPLICIT salting, for the cases where a hot
join key genuinely must fan out (e.g. joining a feature table against a
hot-key dimension where neither side can be pre-collapsed).

Pattern: the skewed (big) side gets a uniform random-ish salt in
``[0, n_salts)`` derived deterministically from a stable column; the
replicated (small) side is exploded once per salt value. The join key
becomes (key, salt) — one hot key's rows spread over ``n_salts``
reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int, stable_col: str) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from stable_col
    (same row -> same salt across retries; no Math.random in the plan)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(stable_col)), F.lit(n_salts))
    )


def replicate_for_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Explode the small side once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    stable_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed hot keys: salt big, replicate
    small, join on (keys + salt), drop the salt.

    ``stable_col`` defaults to the first join key — pass a high-cardinality
    column (e.g. the row id) so a hot key's rows actually spread.

    Only join types whose unmatched-row semantics survive small-side
    replication are allowed: for right/full outer joins every unmatched
    replicated small-side row would be emitted ``n_salts`` times, silently
    producing wrong results — those raise."""
    allowed = {"inner", "cross", "left", "leftouter", "leftsemi", "leftanti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            "small side duplicates its unmatched rows under right/full "
            "outer semantics (use inner/left/left_semi/left_anti)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    stable = stable_col or keys[0]
    b = with_salt(big, n_salts, stable)
    s = replicate_for_salt(small, n_salts)
    return b.join(s, keys + [SALT_COL], how).drop(SALT_COL)


def salted_count(
    df: DataFrame, keys: list[str], n_salts: int = 16, stable_col: str | None = None
) -> DataFrame:
    """Two-phase skew-safe count per key: partial count per (key, salt),
    then final sum per key — the aggregation analogue of salted_join
    (map-side combine already does this for built-in aggs; the explicit
    form exists for aggregations that cannot partial-combine, and as the
    documented pattern)."""
    stable = stable_col or keys[0]
    partial = (
        with_salt(df, n_salts, stable)
        .groupBy(*keys, SALT_COL)
        .agg(F.count(F.lit(1)).alias("__partial_n"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial_n").alias("n"))
