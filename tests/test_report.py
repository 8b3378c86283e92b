"""Report layer: the O8 flag truth table (SameContentFilesInfo.cs:209-248),
O7 size metrics (:34-68), T1/T2 sort order (DuplicatesViewController.cs:32-59),
O10 hierarchy rollup (DuplicateReport.cs:114-142)."""

import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.operators.report import (
    cluster_flags,
    location_rollup,
    report_views,
    sorted_report,
)

MEMBERS_DDL = "cluster_id string, image_id string, size bigint, sort string, location string"


@pytest.fixture(scope="module")
def members(spark):
    rows = [
        # c1: two originals, no isolated  -> has_unprocessed
        ("c1", "a1", 100, "original", "root/x"),
        ("c1", "a2", 100, "original", "root/x/y"),
        # c2: one original + two isolated -> fully processed
        ("c2", "b1", 50, "original", "root/x"),
        ("c2", "b2", 50, "isolated", "root/iso"),
        ("c2", "b3", 50, "isolated", "root/iso"),
        # c3: isolated only
        ("c3", "d1", 70, "isolated", "root/iso"),
        ("c3", "d2", 70, "isolated", "root/iso"),
        # c4: singleton original -> unique
        ("c4", "e1", 999, "original", "root/z"),
    ]
    return spark.createDataFrame(rows, schema=MEMBERS_DDL).cache()


def test_flag_truth_table(members):
    """Mirrors AnalyzeDuplicates exactly: orig>0 / isolated>0 / orig>1 /
    orig+isolated==1 (SameContentFilesInfo.cs:209-248)."""
    got = {r.cluster_id: r for r in cluster_flags(members).collect()}
    assert (got["c1"].has_original, got["c1"].has_isolated,
            got["c1"].has_unprocessed, got["c1"].is_unique) == (True, False, True, False)
    assert (got["c2"].has_original, got["c2"].has_isolated,
            got["c2"].has_unprocessed, got["c2"].is_unique) == (True, True, False, False)
    assert (got["c3"].has_original, got["c3"].has_isolated,
            got["c3"].has_unprocessed, got["c3"].is_unique) == (False, True, False, False)
    assert (got["c4"].has_original, got["c4"].has_isolated,
            got["c4"].has_unprocessed, got["c4"].is_unique) == (True, False, False, True)


def test_size_metrics(members):
    """AllDataSize / DuplicatesDataSize / AllDuplicatesDataSize
    (SameContentFilesInfo.cs:34-68)."""
    got = {r.cluster_id: r for r in cluster_flags(members).collect()}
    assert got["c1"].all_bytes == 200 and got["c1"].dup_bytes == 100
    assert got["c1"].all_dup_bytes == 100
    assert got["c2"].all_bytes == 150 and got["c2"].dup_bytes == 0
    assert got["c2"].all_dup_bytes == 100
    assert got["c3"].all_bytes == 140 and got["c3"].dup_bytes == 0
    assert got["c4"].all_bytes == 999 and got["c4"].all_dup_bytes == 0


def test_report_views(members):
    views = report_views(cluster_flags(members))
    assert {r.cluster_id for r in views["unprocessed"].collect()} == {"c1"}
    assert {r.cluster_id for r in views["all_isolated"].collect()} == {"c2", "c3"}
    assert {r.cluster_id for r in views["isolated_only"].collect()} == {"c3"}


def test_sort_order(members):
    """Isolated-only groups first, then by reclaimable bytes descending
    (DuplicatesViewController.cs:32-59)."""
    order = [r.cluster_id for r in sorted_report(cluster_flags(members)).collect()]
    assert order[0] == "c3"  # isolated-only first
    rest = order[1:]
    assert rest == ["c1", "c2", "c4"]  # all_dup_bytes 100, 100 (tie->id), 0


def test_sort_order_hide_isolated(members):
    got = sorted_report(cluster_flags(members), hide_isolated=True).collect()
    ids = [r.cluster_id for r in got]
    # fully-processed groups (c2, c3) are hidden in hide mode
    assert ids == ["c1", "c4"]


def test_location_rollup(members):
    got = {r.ancestor: r for r in location_rollup(members).collect()}
    assert got["root"].n_dup_files == 8
    assert got["root/x"].n_dup_files == 3  # a1, a2 (x/y counts under x), b1
    assert got["root/x/y"].n_dup_files == 1
    assert got["root/iso"].n_dup_files == 4
    assert got["root/iso"].n_clusters == 2
    assert got["root"].dup_bytes == 100 * 2 + 50 * 3 + 70 * 2 + 999


def test_directory_tree_assembly(spark):
    """Tree rows carry parent pointers, depth, rolled-up stats and the
    per-level view ordering (dup_bytes desc, then name) — the DataFrame
    form of the recursive DirectoryWithDuplicates build."""
    from ordinarydumpdeduplicator_spark.operators.report import directory_tree

    members = spark.createDataFrame(
        [
            ("A", "a1", 100, "corpus/big/x"),
            ("A", "a2", 100, "corpus/big/x"),
            ("B", "b1", 10, "corpus/small"),
            ("C", "c1", 5, "archive"),
        ],
        "cluster_id string, image_id string, size long, location string",
    )
    rows = {r["path"]: r for r in directory_tree(members).collect()}
    assert set(rows) == {
        "corpus", "corpus/big", "corpus/big/x", "corpus/small", "archive",
    }
    assert rows["corpus"]["parent_id"] is None and rows["corpus"]["depth"] == 1
    assert rows["corpus/big/x"]["parent_id"] == "corpus/big"
    assert rows["corpus/big/x"]["depth"] == 3
    # rollup stats agree with location_rollup semantics
    assert rows["corpus"]["n_dup_files"] == 3
    assert rows["corpus"]["dup_bytes"] == 210
    assert rows["corpus/big"]["n_clusters"] == 1
    # sibling ordering under 'corpus': big (200 bytes) before small (10)
    assert rows["corpus/big"]["sibling_rank"] == 1
    assert rows["corpus/small"]["sibling_rank"] == 2
    # roots are ranked within the null-parent level: corpus (210) > archive (5)
    assert rows["corpus"]["sibling_rank"] == 1
    assert rows["archive"]["sibling_rank"] == 2
