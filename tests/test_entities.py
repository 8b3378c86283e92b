"""Entities/hierarchy table: FsEntity identity + Directory invariants as
DataFrames, property-tested against the flat location rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.entities import (
    entities_from_locations,
    entity_rollup,
    validate_entities,
)
from ordinarydumpdeduplicator_spark.operators.report import location_rollup

MEMBERS_SCHEMA = "cluster_id string, image_id string, size long, location string"


@pytest.fixture()
def members(spark):
    rows = [
        ("A", "a1", 10, "corpus/src0/en"),
        ("A", "a2", 10, "corpus/src0/de"),
        ("A", "a3", 10, "corpus/src1/en"),
        ("B", "b1", 20, "corpus/src0/en"),
        ("B", "b2", 20, "archive/old"),
        ("C", "c1", 30, "archive"),
    ]
    return spark.createDataFrame(rows, MEMBERS_SCHEMA)


def test_entities_shape(spark, members):
    ents = entities_from_locations(members)
    rows = {r["entity_id"]: r for r in ents.collect()}
    assert set(rows) == {
        "corpus", "corpus/src0", "corpus/src1", "corpus/src0/en",
        "corpus/src0/de", "corpus/src1/en", "archive", "archive/old",
    }
    assert rows["corpus"]["parent_id"] is None and rows["corpus"]["name"] == "corpus"
    assert rows["corpus/src0/en"]["parent_id"] == "corpus/src0"
    assert rows["corpus/src0/en"]["name"] == "en"
    # identity = (name, parent) recursively: same leaf name under two
    # parents is two distinct entities (FsEntity.cs:73-89)
    assert rows["corpus/src0/en"]["entity_id"] != rows["corpus/src1/en"]["entity_id"]
    validate_entities(ents)  # derived tables always satisfy the invariants


def test_rollup_over_entities_equals_location_rollup(spark, members):
    ents = entities_from_locations(members)
    via_entities = {tuple(r) for r in entity_rollup(members, ents).collect()}
    flat = {tuple(r) for r in location_rollup(members).collect()}
    assert via_entities == flat


def test_validate_rejects_duplicate_names(spark):
    bad = spark.createDataFrame(
        [
            ("r", "r", None, "r"),
            ("r/a", "a", "r", "r/a"),
            ("r/a2", "a", "r", "r/a2"),  # same name 'a' under parent 'r'
        ],
        "entity_id string, name string, parent_id string, path string",
    )
    with pytest.raises(ValueError, match="duplicate name"):
        validate_entities(bad)


def test_validate_rejects_dangling_parent(spark):
    bad = spark.createDataFrame(
        [("r/a", "a", "r", "r/a")],  # parent 'r' missing
        "entity_id string, name string, parent_id string, path string",
    )
    with pytest.raises(ValueError, match="dangling"):
        validate_entities(bad)
