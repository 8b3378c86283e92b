"""O17/O18/O19 — isolate/delete transactions + incremental report upkeep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.actions import (
    apply_actions,
    maintain_flags,
    maintain_members,
    plan_delete,
    plan_isolation,
)
from ordinarydumpdeduplicator_spark.operators.report import cluster_flags

MEMBERS_SCHEMA = "cluster_id string, image_id string, size long, sort string, location string"


@pytest.fixture()
def members(spark):
    rows = [
        # cluster A: three originals + one isolated -> two isolate actions
        ("A", "a1", 10, "original", "src/x"),
        ("A", "a2", 10, "original", "src/x"),
        ("A", "a3", 10, "original", "src/y"),
        ("A", "a4", 10, "isolated", "isolated duplicates/src/x"),
        # cluster B: single original -> untouched
        ("B", "b1", 20, "original", "src/z"),
        # cluster C: isolated-only pair -> deletable
        ("C", "c1", 30, "isolated", "isolated duplicates/src/x"),
        ("C", "c2", 30, "isolated", "isolated duplicates/src/y"),
    ]
    return spark.createDataFrame(rows, MEMBERS_SCHEMA)


def test_plan_isolation_keeps_min_original(spark, members):
    actions = plan_isolation(members).collect()
    got = {(r["image_id"], r["action"], r["to_location"]) for r in actions}
    assert got == {
        ("a2", "isolate", "isolated duplicates/src/x"),
        ("a3", "isolate", "isolated duplicates/src/y"),
    }


def test_plan_delete_guard(spark, members):
    ok = members.withColumn(
        "delete_requested", F.col("image_id").isin("c1", "c2")
    )
    acts = plan_delete(ok).collect()
    assert {r["image_id"] for r in acts} == {"c1", "c2"}
    assert all(r["to_location"] is None for r in acts)

    bad = members.withColumn(
        "delete_requested", F.col("image_id").isin("a1", "c1")
    )
    with pytest.raises(ValueError, match="not isolated"):
        plan_delete(bad)


def test_apply_actions_appends_successor_states(spark, members):
    states = members.select(
        "image_id",
        F.lit("run_0").alias("run_id"),
        "size",
        F.sha2(F.col("cluster_id"), 256).cast("binary").alias("sha"),
        F.lit("new").alias("status"),
        "location",
        "sort",
    )
    actions = plan_isolation(members)
    new_rows = apply_actions(states, actions, "run_1").collect()
    by_img = {}
    for r in new_rows:
        by_img.setdefault(r["image_id"], []).append(r)
    assert set(by_img) == {"a2", "a3"}
    for img in ("a2", "a3"):
        statuses = {r["status"]: r for r in by_img[img]}
        assert set(statuses) == {"removed", "new"}
        assert statuses["new"]["location"].startswith("isolated duplicates/")
        assert statuses["new"]["sort"] == "isolated"
        assert statuses["removed"]["location"].startswith("src/")


def test_maintain_matches_full_recompute(spark, members):
    flags_before = cluster_flags(members)
    actions = plan_isolation(members).unionByName(
        plan_delete(
            members.withColumn(
                "delete_requested", F.col("image_id") == F.lit("c2")
            )
        )
    )
    after = maintain_members(members, actions)
    incremental = maintain_flags(flags_before, after, actions)
    full = cluster_flags(after)
    a = {tuple(r) for r in incremental.collect()}
    b = {tuple(r) for r in full.collect()}
    assert a == b
    # semantic spot-checks: A now has 1 original + 3 isolated
    fa = {r["cluster_id"]: r for r in incremental.collect()}
    assert fa["A"]["n_original"] == 1 and fa["A"]["n_isolated"] == 3
    assert not fa["A"]["has_unprocessed"]
    assert fa["C"]["n_members"] == 1  # c2 deleted


def test_post_isolate_state_derivation_is_deterministic(spark, members):
    """An isolate commit appends TWO rows for the same (image, run): a
    'removed' row at the old location and the live successor at the new
    one. The state windows tie-break removed-before-live, so the image
    must ALWAYS derive live (not 'removed') and be reported as moved —
    regardless of Spark's within-tie row order."""
    from datetime import datetime

    from pyspark.sql import Window

    from ordinarydumpdeduplicator_spark.operators.states import (
        derive_status,
        detect_moved,
    )

    states0 = members.select(
        "image_id",
        F.lit("run_0").alias("run_id"),
        "size",
        F.sha2(F.col("cluster_id"), 256).alias("sha"),
        F.lit("new").alias("status"),
        "location",
        "sort",
    )
    actions = plan_isolation(members)
    new_rows = apply_actions(states0, actions, "run_1")
    states = states0.unionByName(new_rows)
    runs = spark.createDataFrame(
        [
            ("run_0", "src", datetime(2026, 1, 1), datetime(2026, 1, 1, 1)),
            ("run_1", "src", datetime(2026, 2, 1), datetime(2026, 2, 1, 1)),
        ],
        "run_id string, source_id string, start_ts timestamp, finish_ts timestamp",
    )

    # repeat to catch nondeterministic tie resolution across executions
    for _ in range(3):
        derived = derive_status(states, runs)
        final = {
            r["image_id"]: r["derived_status"]
            for r in derived.filter(F.col("run_id") == "run_1")
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("image_id").orderBy(
                        F.when(F.col("status") == "removed", 0).otherwise(1).desc()
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .collect()
        }
        # the LIVE successor rows (status != removed) derive unchanged
        assert final["a2"] == "unchanged"
        assert final["a3"] == "unchanged"

        moved = {
            (r["image_id"], r["from_location"], r["to_location"])
            for r in detect_moved(states, runs).collect()
        }
        assert ("a2", "src/x", "isolated duplicates/src/x") in moved
        assert ("a3", "src/y", "isolated duplicates/src/y") in moved
        # no image may surface as removed-at-latest: the live row wins ties
        latest_live = (
            detect_moved(states, runs).select("image_id").distinct().count()
        )
        assert latest_live >= 2
