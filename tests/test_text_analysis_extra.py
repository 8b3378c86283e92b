"""Winnowing fingerprints, BPE-ish token counts, size formatting (F7)."""

from __future__ import annotations

import numpy as np
import pytest

from ordinarydumpdeduplicator_spark.functions.text import (
    data_size_string,
)
from ordinarydumpdeduplicator_spark.operators.text_analysis import (
    bpe_token_stats,
    winnowing_fingerprints,
)


def winnow_oracle(text: str, k: int = 5, window: int = 4) -> list[int]:
    s = " ".join(text.lower().split())
    a = s.encode("utf-8")
    if len(a) < k:
        return None
    hs = []
    for i in range(len(a) - k + 1):
        h = np.uint64(0)
        for ch in a[i : i + k]:
            with np.errstate(over="ignore"):
                h = h * np.uint64(1000000007) + np.uint64(ch)
        hs.append(int(h))
    if len(hs) < window:
        sel = [min(hs)]
    else:
        sel = [min(hs[i : i + window]) for i in range(len(hs) - window + 1)]
    return sorted({np.uint64(x).astype(np.int64).item() for x in sel})


def test_winnowing_matches_oracle(spark):
    texts = [
        ("d1", "The quick brown fox jumps over the lazy dog"),
        ("d2", "the   QUICK brown fox jumps over the lazy dog"),  # normalizes same
        ("d3", "completely different document text here"),
        ("d4", "ab"),       # shorter than k -> None
        ("d5", None),
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    got = {r["doc_id"]: r["fingerprint"] for r in winnowing_fingerprints(df).collect()}
    assert got["d1"] == winnow_oracle(texts[0][1])
    assert got["d1"] == got["d2"]  # normalization-invariant
    assert got["d3"] == winnow_oracle(texts[2][1])
    assert got["d3"] != got["d1"]
    assert got["d4"] is None and got["d5"] is None


def test_bpe_token_stats(spark):
    df = spark.createDataFrame(
        [("d1", "Hello, world! It's 42."), ("d2", ""), ("d3", "abc")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in bpe_token_stats(df).collect()}
    # word runs: Hello | world | It | s | 42  -> 5 ; punct: , ! ' .  -> 4
    assert rows["d1"]["n_word_tokens"] == 5
    assert rows["d1"]["n_punct_tokens"] == 4
    assert rows["d1"]["n_bpe_ish_tokens"] == 9
    assert rows["d2"]["n_bpe_ish_tokens"] == 0
    assert rows["d3"]["n_bpe_ish_tokens"] == 1


@pytest.mark.parametrize(
    "n,expected",
    [
        (0, "0 bytes"),
        (1023, "1023 bytes"),
        (1024, "1 KiB"),
        (1536, "1.5 KiB"),
        (1048576, "1 MiB"),
        (5 * 1024**4, "5 TiB"),
        (3 * 1024**5, "3 PiB"),
        (1048570, "1 MiB"),  # 1023.99 KiB: unit bump after rounding
    ],
)
def test_data_size_string(n, expected):
    assert data_size_string(n) == expected


def test_data_size_col(spark):
    from pyspark.sql import functions as F
    from ordinarydumpdeduplicator_spark.functions.text import data_size_col

    # aligned with data_size_string: same trailing-.0 trim, same unit bump
    df = spark.createDataFrame(
        [(0,), (1023,), (1024,), (1536,), (1048576,), (1048570,)], "n long"
    )
    got = [r[0] for r in df.select(data_size_col(F.col("n"))).collect()]
    assert got == ["0 bytes", "1023 bytes", "1 KiB", "1.5 KiB", "1 MiB", "1 MiB"]


def test_relative_path():
    from ordinarydumpdeduplicator_spark.functions.text import relative_path

    assert relative_path("corpus/src0", "corpus/src0/a/b") == "a/b"
    assert relative_path("corpus/src0", "corpus/src0") == ""
    assert relative_path("corpus/src0", "corpus/src1/a") is None
    assert relative_path("corpus/src0", "corpus/src00/a") is None  # no prefix trap


def test_timespan_string():
    from ordinarydumpdeduplicator_spark.functions.text import timespan_string

    assert timespan_string(0) == "00:00:00.00"
    assert timespan_string(3725.5) == "01:02:05.50"
    assert timespan_string(59.999) == "00:01:00.00"  # carries into minutes
    assert timespan_string(3599.999) == "01:00:00.00"  # carries into hours
    assert timespan_string(59.99) == "00:00:59.99"


def test_repetition_stats_hand_case(spark):
    from pyspark.sql import types as T
    from ordinarydumpdeduplicator_spark.operators.text_analysis import (
        repetition_stats,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [
        # "a b a b a": 2-grams = [a b, b a, a b, b a] -> every position is
        # a duplicate, top gram occurs 2x
        (1, "a b a b a"),
        (2, "all tokens here are distinct words"),  # no repeated 2-gram
        (3, "one"),  # < 2 tokens -> zeros
        (4, "x x x x"),  # 3x "x x" -> top 3, all 3 positions duplicated
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            spark.createDataFrame(rows, schema=schema), n=2
        ).collect()
    }
    assert out[1]["n_ngrams"] == 4
    assert out[1]["top_ngram_count"] == 2
    assert out[1]["dup_ngram_positions"] == 4
    assert out[2]["dup_ngram_positions"] == 0
    assert out[2]["top_ngram_count"] == 1
    assert out[3].asDict() == {
        "doc_id": 3, "n_tokens": 1, "n_ngrams": 0,
        "top_ngram_count": 0, "dup_ngram_positions": 0,
    }
    assert out[4]["n_ngrams"] == 3 and out[4]["top_ngram_count"] == 3
    assert out[4]["dup_ngram_positions"] == 3


def test_tfidf_keywords_hand_computed(spark):
    import math

    from ordinarydumpdeduplicator_spark.operators.text_analysis import (
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry dog"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["token"], r["tf"], r["score"]) for r in out}
    idf2 = math.log(4 / 3) + 1  # df=2 tokens (banana, cherry), N=3
    idf1 = math.log(4 / 2) + 1  # df=1 tokens (apple, dog)
    assert got[(1, 1)] == ("apple", 2, round(2 * idf1, 6))
    assert got[(1, 2)] == ("banana", 1, round(idf2, 6))
    # doc 2: banana and cherry tie exactly -> token ASC breaks it
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"
    assert got[(3, 1)] == ("cherry", 2, round(2 * idf2, 6))
    assert got[(3, 2)] == ("dog", 1, round(idf1, 6))
    assert all(doc != 4 for doc, _ in got)  # NULL text excluded


def test_percentile_buckets(spark):
    from ordinarydumpdeduplicator_spark.operators.text_analysis import (
        percentile_buckets,
    )

    scores = spark.createDataFrame(
        [
            # en: 6 docs -> tiers of 2/2/2; doc 2 ties doc 1 (id breaks),
            # doc 6 has a NULL score (no tokens) -> sorts last
            (1, "en", 10.0),
            (2, "en", 10.0),
            (3, "en", 5.0),
            (4, "en", 3.0),
            (5, "en", 1.0),
            (6, "en", None),
            # de: 4 docs -> ntile sizes 2/1/1 (first tier takes the extra)
            (7, "de", 9.0),
            (8, "de", 8.0),
            (9, "de", 7.0),
            (10, "de", 6.0),
        ],
        "doc_id long, lang string, score double",
    )
    out = percentile_buckets(scores, "score")
    rows = {r["doc_id"]: (r["bucket"], r["bucket_label"]) for r in out.collect()}
    assert rows == {
        1: (1, "head"), 2: (1, "head"),
        3: (2, "middle"), 4: (2, "middle"),
        5: (3, "tail"), 6: (3, "tail"),
        7: (1, "head"), 8: (1, "head"),
        9: (2, "middle"), 10: (3, "tail"),
    }
    assert dict(out.dtypes)["bucket"] == "bigint"  # driver value-hash width


def test_percentile_buckets_label_mismatch(spark):
    import pytest as _pytest

    from ordinarydumpdeduplicator_spark.operators.text_analysis import (
        percentile_buckets,
    )

    scores = spark.createDataFrame(
        [(1, "en", 1.0)], "doc_id long, lang string, score double"
    )
    with _pytest.raises(ValueError, match="labels"):
        percentile_buckets(scores, "score", n_buckets=4)
