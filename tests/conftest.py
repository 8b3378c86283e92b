from __future__ import annotations

import pandas as pd
import pytest

from ordinarydumpdeduplicator_spark.fixtures.generator import (
    IMAGE_COLS,
    make_corpus,
)
from ordinarydumpdeduplicator_spark.schemas import IMAGES_SCHEMA
from ordinarydumpdeduplicator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("odd_spark_tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    """(images_pdf_with_hidden_cols, golden_pairs) at ~200 rows."""
    return make_corpus(200)


@pytest.fixture(scope="session")
def small_corpus():
    """~1000 rows: e2e + recall tests."""
    return make_corpus(1000)


def to_spark_images(spark, pdf: pd.DataFrame):
    pub = pdf[IMAGE_COLS].copy()
    return spark.createDataFrame(pub, schema=IMAGES_SCHEMA)


@pytest.fixture(scope="session")
def tiny_images(spark, tiny_corpus):
    df = to_spark_images(spark, tiny_corpus[0])
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def small_images(spark, small_corpus):
    df = to_spark_images(spark, small_corpus[0])
    df.cache().count()
    return df
