"""Explicit salting utilities (north rule: salting for hot keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.functions.salting import (
    salted_count,
    salted_join,
    with_salt,
)


def test_salted_join_matches_plain_join(spark):
    # one hot key ("photo") + long tail
    big = spark.createDataFrame(
        [(f"r{i:04d}", "photo" if i % 2 == 0 else f"k{i % 7}") for i in range(500)],
        "row_id string, key string",
    )
    small = spark.createDataFrame(
        [("photo", 1), ("k1", 2), ("k3", 3)], "key string, val int"
    )
    salted = salted_join(big, small, "key", n_salts=8, stable_col="row_id")
    plain = big.join(small, "key")
    a = sorted(tuple(r) for r in salted.select("key", "row_id", "val").collect())
    b = sorted(tuple(r) for r in plain.select("key", "row_id", "val").collect())
    assert a == b


def test_salt_spreads_hot_key(spark):
    big = spark.createDataFrame(
        [(f"r{i:04d}", "hot") for i in range(256)], "row_id string, key string"
    )
    n_distinct = (
        with_salt(big, 8, "row_id").select("__salt").distinct().count()
    )
    assert n_distinct == 8  # the hot key's rows actually fan out


def test_salted_count_matches_groupby(spark):
    df = spark.createDataFrame(
        [(f"r{i}", "photo" if i % 3 else f"k{i % 5}") for i in range(300)],
        "row_id string, key string",
    )
    a = {
        (r["key"], r["n"])
        for r in salted_count(df, ["key"], n_salts=4, stable_col="row_id").collect()
    }
    b = {
        (r["key"], r["count"])
        for r in df.groupBy("key").count().collect()
    }
    assert a == b


def test_salted_join_rejects_outer_joins(spark):
    import pytest as _pytest

    from ordinarydumpdeduplicator_spark.functions.salting import salted_join

    big = spark.createDataFrame([("k1", 1)], "k string, v int")
    small = spark.createDataFrame([("k1", 9), ("k2", 8)], "k string, w int")
    for how in ("right", "full", "full_outer", "right_outer"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", n_salts=4, how=how)
    # left_anti remains valid and correct: unmatched big rows survive once
    got = salted_join(
        big, small.filter("k = 'k2'"), "k", n_salts=4, how="left_anti"
    ).collect()
    assert [(r["k"], r["v"]) for r in got] == [("k1", 1)]
