"""Row-level MERGE: the generated Iceberg SQL's semantics are executable
and equal to the incremental-maintenance join formulation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.actions import (
    maintain_members,
    plan_delete,
    plan_isolation,
)
from ordinarydumpdeduplicator_spark.sources.merge import (
    MergeSpec,
    execute_merge,
    members_merge_spec,
    merge_sql,
)

MEMBERS_SCHEMA = "cluster_id string, image_id string, size long, sort string, location string"


@pytest.fixture()
def members(spark):
    rows = [
        ("A", "a1", 10, "original", "src/x"),
        ("A", "a2", 10, "original", "src/x"),
        ("A", "a3", 10, "original", "src/y"),
        ("A", "a4", 10, "isolated", "isolated duplicates/src/x"),
        ("B", "b1", 20, "original", "src/z"),
        ("C", "c1", 30, "isolated", "isolated duplicates/src/x"),
        ("C", "c2", 30, "isolated", "isolated duplicates/src/y"),
    ]
    return spark.createDataFrame(rows, MEMBERS_SCHEMA)


@pytest.fixture()
def actions(members):
    return plan_isolation(members).unionByName(
        plan_delete(
            members.withColumn("delete_requested", F.col("image_id") == "c2")
        )
    )


def test_merge_equals_maintain_members(spark, members, actions):
    merged = execute_merge(members, actions, members_merge_spec())
    expected = maintain_members(members, actions)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in expected.collect()
    }
    # spot semantics: a2 isolated at the planned destination, c2 gone
    got = {r["image_id"]: r for r in merged.collect()}
    assert "c2" not in got
    assert got["a2"]["sort"] == "isolated"
    assert got["a2"]["location"] == "isolated duplicates/src/x"
    assert got["b1"]["sort"] == "original"  # unmatched target passes through


def test_merge_sql_text(spark):
    sql = merge_sql(members_merge_spec(), "lake.members", "staged_actions")
    assert sql == (
        "MERGE INTO lake.members t\n"
        "USING staged_actions s\n"
        "ON t.image_id = s.image_id\n"
        "WHEN MATCHED AND s.action = 'delete' THEN DELETE\n"
        "WHEN MATCHED AND s.action = 'isolate' THEN UPDATE SET "
        "t.location = s.to_location, t.sort = 'isolated'"
    )


def test_merge_first_clause_wins(spark):
    target = spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, v int")
    source = spark.createDataFrame([("k1", 10)], "k string, w int")
    spec = MergeSpec(
        on=["k"],
        matched=[
            ("s.w > 5", {"v": "s.w"}),
            (None, None),  # later DELETE must NOT fire for k1
        ],
    )
    got = {r["k"]: r["v"] for r in execute_merge(target, source, spec).collect()}
    assert got == {"k1": 10, "k2": 2}


def test_merge_insert_clause(spark):
    target = spark.createDataFrame([("k1", 1)], "k string, v int")
    source = spark.createDataFrame([("k1", 10), ("k3", 30), ("k4", 4)], "k string, w int")
    spec = MergeSpec(
        on=["k"],
        matched=[(None, {"v": "t.v + s.w"})],
        not_matched=("s.w > 5", {"k": "s.k", "v": "s.w"}),
    )
    got = {r["k"]: r["v"] for r in execute_merge(target, source, spec).collect()}
    assert got == {"k1": 11, "k3": 30}  # k4 fails the insert condition
    sql = merge_sql(spec, "tgt", "src")
    assert "WHEN NOT MATCHED AND s.w > 5 THEN INSERT (k, v) VALUES (s.k, s.w)" in sql


def test_merge_cardinality_violation_raises(spark, members):
    doubled = spark.createDataFrame(
        [("a2", "isolate", "d1"), ("a2", "isolate", "d2")],
        "image_id string, action string, to_location string",
    )
    with pytest.raises(ValueError, match="cardinality"):
        execute_merge(members, doubled, members_merge_spec())


def test_merge_null_key_raises(spark):
    target = spark.createDataFrame([("k1", 1)], "k string, v int")
    source = spark.createDataFrame([(None, 9)], "k string, w int")
    with pytest.raises(ValueError, match="null merge key"):
        execute_merge(target, source, MergeSpec(on=["k"], matched=[(None, None)]))


def test_merge_random_property_vs_pandas_oracle(spark):
    """Randomized: execute_merge == a row-at-a-time pandas interpretation
    of the same spec (clauses in order, first match wins)."""
    import random

    rnd = random.Random(7)
    target_rows = [(f"k{i}", rnd.randint(0, 9), "keep") for i in range(40)]
    source_rows = [
        (f"k{i}", rnd.choice(["del", "upd", "noop"]))
        for i in rnd.sample(range(60), 30)  # some keys miss the target
    ]
    target = spark.createDataFrame(target_rows, "k string, v int, tag string")
    source = spark.createDataFrame(source_rows, "k string, op string")
    spec = MergeSpec(
        on=["k"],
        matched=[
            ("s.op = 'del'", None),
            ("s.op = 'upd' AND t.v >= 5", {"tag": "'big'"}),
            ("s.op = 'upd'", {"tag": "'small'", "v": "t.v + 100"}),
        ],
    )

    src = {k: op for k, op in source_rows}
    expected = set()
    for k, v, tag in target_rows:
        op = src.get(k)
        if op == "del":
            continue
        if op == "upd":
            if v >= 5:
                expected.add((k, v, "big"))
            else:
                expected.add((k, v + 100, "small"))
        else:
            expected.add((k, v, tag))

    got = {tuple(r) for r in execute_merge(target, source, spec).collect()}
    assert got == expected


def test_duplicate_unmatched_source_keys_insert_per_row(spark):
    """Iceberg cardinality: duplicate source keys are an error only when
    they match one target row; unmatched duplicates insert per-row."""
    import pytest

    from ordinarydumpdeduplicator_spark.sources.merge import (
        MergeSpec,
        execute_merge,
    )

    spec = MergeSpec(
        on=["k"],
        matched=[(None, {"v": "s.v"})],
        not_matched=(None, {"k": "s.k", "v": "s.v"}),
    )
    target = spark.createDataFrame([("a", 1)], "k string, v long")
    source = spark.createDataFrame(
        [("b", 10), ("b", 11)], "k string, v long"
    )
    out = {(r.k, r.v) for r in execute_merge(target, source, spec).collect()}
    assert out == {("a", 1), ("b", 10), ("b", 11)}

    # the same duplicate key DOES raise once it matches a target row
    target2 = spark.createDataFrame([("b", 1)], "k string, v long")
    with pytest.raises(ValueError, match="cardinality"):
        execute_merge(target2, source, spec)
