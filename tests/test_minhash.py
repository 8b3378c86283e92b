"""MinHash / shingle / SimHash unit tests against slow oracles (no Spark)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ordinarydumpdeduplicator_spark.functions.minhash import (
    NUM_HASHES,
    exact_jaccard,
    minhash_signature,
    minhash_signature_batch,
)
from ordinarydumpdeduplicator_spark.functions.text import (
    jaccard,
    shingles,
    tokens,
)
from ordinarydumpdeduplicator_spark.operators.features import simhash64


def test_tokens_and_shingles():
    assert tokens("  A  b\tC ") == ["a", "b", "c"]
    assert tokens("") == [] and tokens(None) == []
    assert shingles("a b c d") == {"a b c", "b c d"}
    assert shingles("a b") == {"a b"}  # shorter than k -> single shingle
    assert shingles("") == set()


def test_minhash_empty_caption_is_none():
    assert minhash_signature("") is None
    assert minhash_signature(None) is None
    assert minhash_signature("   ") is None


def test_minhash_identical_texts_match():
    a = minhash_signature("red cat on a mat by the door")
    b = minhash_signature("red cat on a mat by the door")
    assert a == b and len(a) == NUM_HASHES


def test_batch_matches_single():
    texts = pd.Series(["a b c d e f", "", None, "x y z w", "a b c d e f g"])
    batch = minhash_signature_batch(texts)
    for t, sig in zip(texts, batch):
        assert sig == minhash_signature(t)


@settings(max_examples=30, deadline=None)
@given(
    base=st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=30),
    repl=st.integers(min_value=0, max_value=5),
)
def test_minhash_estimates_jaccard(base, repl):
    """Signature agreement approximates true shingle Jaccard (within noise)."""
    words_a = list(base)
    words_b = list(base)
    for i in range(min(repl, len(words_b))):
        words_b[i] = "zz%d" % i
    ta, tb = " ".join(words_a), " ".join(words_b)
    sa, sb = minhash_signature(ta), minhash_signature(tb)
    j = jaccard(shingles(ta), shingles(tb))
    est = sum(x == y for x, y in zip(sa, sb)) / NUM_HASHES
    assert abs(est - j) < 0.25  # 128 hashes -> s.e. ~0.04; generous bound


def test_exact_jaccard_symmetry():
    assert exact_jaccard("a b c d", "b c d e") == exact_jaccard("b c d e", "a b c d")
    assert exact_jaccard("", "") == 0.0


def test_simhash_properties():
    a = simhash64(["red", "cat", "mat", "door", "tree", "house"])
    b = simhash64(["red", "cat", "mat", "door", "tree", "house"])
    assert a == b
    assert simhash64([]) == 0
    c = simhash64(["completely", "different", "words", "here", "now", "ok"])
    assert bin((a ^ c) & (2**64 - 1)).count("1") > 4
