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


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    from ordinarydumpdeduplicator_spark.operators.decontamination import (
        fuzzy_decontaminate,
    )

    base = (
        "the quick brown fox jumps over the lazy dog every single day "
        "while the patient gray owl watches from the tall oak tree near "
        "the quiet river bank waiting for the evening light"
    )
    # one word changed: 3 of ~30 trigram shingles differ -> jaccard ~0.85,
    # far above both the LSH detection knee and the 0.5 verify threshold
    # (a one-word change in a ~10-word text sits AT 0.5, where banded
    # detection is a coin flip by design)
    paraphrase = base.replace("lazy dog", "lazy cat")
    eval_docs = spark.createDataFrame(
        [(100, base)], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # verbatim copy of the eval doc
            (1, base),
            # light paraphrase
            (2, paraphrase),
            # unrelated
            (3, "completely different topic about spark physical plans"),
            # null text: no shingles, clean by rule
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.contaminated, r.matched_eval_id)
        for r in fuzzy_decontaminate(train, eval_docs).collect()
    }
    assert out[1] == (True, 100)
    assert out[2] == (True, 100)
    assert out[3] == (False, None)
    assert out[4] == (False, None)
    assert len(out) == 4
