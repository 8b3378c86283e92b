"""Benchmark-decontamination operator: hand semantics + plan shape."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ordinarydumpdeduplicator_spark.operators.decontamination import (
    decontaminate,
)

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_decontaminate_hand_case(spark):
    train = spark.createDataFrame(
        [
            # shares the 3-gram "c d e" with eval doc 100, at ONE position
            (1, "a b c d e f"),
            # repeats the contaminated 3-gram "x y z" twice: 2 positions,
            # 1 distinct gram
            (2, "x y z q x y z"),
            (3, "totally clean words only here"),
            (4, "ab"),  # < n tokens -> zero grams, clean
        ],
        schema=_SCHEMA,
    )
    ev = spark.createDataFrame(
        [(100, "c d e"), (101, "p q r s x y z")], schema=_SCHEMA
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, ev, n=3).collect()
    }
    assert len(out) == 4
    r1 = out[1]
    assert (r1["n_grams"], r1["n_contaminated_positions"]) == (4, 1)
    assert r1["contaminated"]
    r2 = out[2]
    assert r2["n_contaminated_positions"] == 2
    assert r2["n_contaminated_grams"] == 1
    assert not out[3]["contaminated"]
    assert out[4].asDict() == {
        "doc_id": 4,
        "n_grams": 0,
        "n_contaminated_positions": 0,
        "n_contaminated_grams": 0,
        "contaminated": False,
    }


def test_decontaminate_eval_side_broadcasts(spark):
    """The benchmark gram-key set must probe as a broadcast hash join —
    the training side is never shuffled for the membership test."""
    train = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.lit("w"), F.col("id").cast("string"), F.lit("a b c d")
        ).alias("text"),
    )
    ev = spark.createDataFrame([(0, "a b c d e")], schema=_SCHEMA)
    plan = decontaminate(train, ev, n=4)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan
    # and with broadcast_eval=False the same op still resolves (shuffle path)
    assert decontaminate(train, ev, n=4, broadcast_eval=False).count() == 200
