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
