"""Similarity search over an embedding column (array<float>).

Two paths, as a training-data pipeline needs at 100 TB:

- ``brute_force_topk``: exact cosine top-k via a blocked cross join — the
  correctness baseline. Dot products are pure built-in expressions
  (``F.zip_with`` + ``F.aggregate``) so the whole plan stays in codegen;
  no Python. Quadratic — only for small corpora / the oracle check.
- ``lsh_topk``: random-hyperplane LSH (sign sketch = SimHash over the
  embedding) -> band buckets -> candidate equi-join -> exact cosine on
  candidates -> top-k. Sub-quadratic; buckets bound the join. This is the
  scale path; hyperplanes are a tiny seeded matrix broadcast via literal
  arrays, so it needs no Python either.

Top-k per query = ranking window (row_number <= k) — the same O5/O6
arg-max pattern as the reference's latest-inspection filter
(DataControllerSimple.cs:190-208).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HP_SEED = 0xE1B


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_cosine(pairs: DataFrame, vec_a: str = "vec_a", vec_b: str = "vec_b") -> DataFrame:
    a, b = F.col(vec_a), F.col(vec_b)
    denom = _norm(a) * _norm(b)
    return pairs.withColumn(
        "cosine",
        F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0)),
    )


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (excluding self)."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    other = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("vec_b")
    )
    pairs = base.crossJoin(other).where(F.col("vec_id") != F.col("neighbor_id"))
    scored = with_cosine(pairs, "vec", "vec_b")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = _HP_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def sign_sketch(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, sketch) where sketch bit j = sign(vec . hyperplane_j).
    Hyperplanes are literal arrays (seeded, tiny) — evaluated JVM-side."""
    planes = _hyperplanes(dim, n_planes)
    v = F.col(vec_col)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in planes[j]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        * F.lit(int(2**j))
        for j in range(n_planes)
    ]
    sketch = sum(bits[1:], bits[0])
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        sketch.cast("long").alias("sketch"),
    )


def lsh_topk(
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share >= 1 of `bands` sketch bands
    (n_planes/bands bits each), then exact cosine on candidates only."""
    assert n_planes % bands == 0
    bits_per = n_planes // bands
    mask = (1 << bits_per) - 1
    sk = sign_sketch(embeddings, dim, n_planes, id_col, vec_col)
    entries = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftright("sketch", j * bits_per)
                .bitwiseAND(F.lit(mask))
                .cast("long")
                .alias("key"),
            )
            for j in range(bands)
        ]
    )
    banded = sk.select("vec_id", "vec", F.explode(entries).alias("e")).select(
        "vec_id", "vec", F.col("e.band").alias("band"), F.col("e.key").alias("key")
    )
    a = banded.alias("a")
    b = banded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vec").alias("vec_b"),
        "band",
        "key",
    ).alias("b")
    cands = (
        a.join(b, ["band", "key"])
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "vec", "neighbor_id", "vec_b")
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    scored = with_cosine(cands, "vec", "vec_b")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", "cosine")
    )
