"""Generic entities/hierarchy table — the FsEntity/Directory tree as data.

The reference models scan roots as an object tree: ``FsEntity`` identity
is (name, parent) recursively, i.e. a path (Common/FsEntity.cs:73-89,
lazy ``Path`` memoization :38-51), and ``Directory.AddSubDirectory`` /
``AddFile`` throw when a name repeats under one parent
(Common/Directory.cs:43-58,60-75). The Spark mapping (SURVEY.md §1.3) is
a flat ``entities(entity_id, name, parent_id, path)`` DataFrame:

- ``entity_id``/``parent_id`` are the stored path strings — the
  memoized-path column IS the surrogate key, making the parent pointer a
  plain equi-join (at catalog scale substitute ``xxhash64(path)`` ids;
  the shape is identical).
- ``entities_from_locations`` derives the table from any frame carrying
  '/'-separated location paths (one prefix-explode + distinct — the same
  ancestor-chain expansion as operators/report.location_rollup (F6)).
- ``validate_entities`` enforces the per-parent unique-name invariant as
  a guard-raise, the dataflow form of the reference's add-time throws —
  and additionally that parent pointers resolve (no dangling parent_id).
- ``entity_rollup`` re-derives the O10 hierarchy rollup by joining
  members' ancestor chains against the entities dim. Property-tested
  equal to ``location_rollup`` over the same members
  (tests/test_entities.py) — the entities table adds nothing numerically,
  it adds the queryable hierarchy (names, parent pointers) the flat
  location strings lack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ancestor_paths(location_col: str) -> F.Column:
    parts = F.split(F.col(location_col), "/")
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, 1, i), "/"),
    )


def entities_from_locations(
    df: DataFrame, location_col: str = "location"
) -> DataFrame:
    """Distinct entity row per path prefix occurring in ``location_col``.

    entity_id = path; name = last segment; parent_id = parent path (null
    for roots). One explode + distinct — a single shuffle on the path."""
    return (
        df.select(F.explode(_ancestor_paths(location_col)).alias("path"))
        .distinct()
        .select(
            F.col("path").alias("entity_id"),
            F.element_at(F.split("path", "/"), -1).alias("name"),
            F.when(
                F.size(F.split("path", "/")) > 1,
                F.expr("array_join(slice(split(path, '/'), 1, size(split(path, '/')) - 1), '/')"),
            ).alias("parent_id"),
            "path",
        )
    )


def validate_entities(entities: DataFrame) -> None:
    """Raise ValueError on (a) duplicate names under one parent — the
    reference's AddSubDirectory/AddFile guard (Common/Directory.cs:43-75)
    — or (b) a parent_id that is not itself an entity (dangling pointer,
    impossible for the reference's object graph by construction)."""
    dup = (
        entities.groupBy("parent_id", "name")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        r = dup[0]
        raise ValueError(
            f"entities: duplicate name {r['name']!r} under parent "
            f"{r['parent_id']!r} (names must be unique per parent)"
        )
    dangling = (
        entities.filter(F.col("parent_id").isNotNull())
        .join(
            entities.select(F.col("entity_id").alias("parent_id")),
            "parent_id",
            "left_anti",
        )
        .limit(1)
        .collect()
    )
    if dangling:
        raise ValueError(
            f"entities: dangling parent_id {dangling[0]['parent_id']!r}"
        )


def entity_rollup(members: DataFrame, entities: DataFrame) -> DataFrame:
    """O10 via the entities dim: members' ancestor chains equi-joined to
    entity rows (left_semi would lose the entity id; inner join keeps only
    chains the dim knows — identical output columns to location_rollup,
    keyed by ``ancestor``). The dim is broadcast: the hierarchy is tiny
    relative to the member fact table."""
    exploded = members.select(
        "cluster_id",
        "image_id",
        "size",
        F.explode(_ancestor_paths("location")).alias("ancestor"),
    )
    dim = F.broadcast(entities.select(F.col("path").alias("ancestor")))
    return (
        exploded.join(dim, "ancestor")
        .groupBy("ancestor")
        .agg(
            F.count(F.lit(1)).alias("n_dup_files"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum("size").alias("dup_bytes"),
        )
    )
