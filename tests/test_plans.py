"""Physical-plan quality gates (.explain audits as regression tests).

The 100 TB design claims specific plan shapes; these tests pin them so a
refactor that silently loses a pushdown, a broadcast, or column pruning
fails CI — not a production run.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_filter_pushdown_reaches_scan(spark, queries):
    plan = plan_of(queries["pricing_summary"](spark, SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1].split("\n", 1)[0]


def test_column_pruning(spark, queries):
    plan = plan_of(queries["token_stats"](spark, SF))
    # the scan must read only doc_id + text, not the whole documents schema
    read = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "text" in read and "doc_id" in read
    assert "source" not in read and "lang" not in read


def test_small_dim_broadcast(spark, queries):
    plan = plan_of(queries["nation_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_exact_groups_no_sort(spark, queries):
    """The content-key grouping must be hash-aggregate + join — no Sort
    node on the 64-char sha key (the window formulation would sort every
    row after the exchange)."""
    plan = plan_of(queries["exact_text_groups"](spark, SF))
    assert "HashAggregate" in plan
    assert "Window" not in plan
    for line in plan.splitlines():
        if "Sort " in line and "content_sha" in line:
            raise AssertionError(f"sort on content key crept back: {line}")


def test_bytes_never_shuffled(spark, tiny_images):
    """The scale-critical invariant: the multi-KB/MB `bytes` column must
    never appear in any Exchange — only compact features shuffle."""
    from ordinarydumpdeduplicator_spark.operators.exact_dedup import exact_clusters
    from ordinarydumpdeduplicator_spark.operators.features import extract_features

    feats = extract_features(tiny_images)
    plan = plan_of(exact_clusters(feats), "formatted")
    for block in plan.split("\n\n"):
        if block.strip().startswith("(") and "Exchange" in block.split("\n")[0]:
            assert "bytes" not in block, f"bytes column crossed a shuffle:\n{block}"


def test_anti_join_strategy(spark, queries):
    plan = plan_of(queries["orders_fully_shipped_early"](spark, SF))
    assert "LeftAnti" in plan
