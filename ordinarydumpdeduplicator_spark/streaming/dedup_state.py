"""Stateful streaming exact-dedup: applyInPandasWithState over content keys.

The custom-stateful-operator route for streams: each content sha keeps a
tiny state record (first-seen image id + count) across micro-batches, so
every arriving row is tagged ``is_dup`` / ``cluster_id`` CONTINUOUSLY —
the streaming form of the reference's hash-group (GetDuplicates,
DataControllerSimple.cs:252-285), where the "dictionary" is Spark's
distributed state store instead of an in-memory HashSet.

Scale shape: state is partitioned by sha (the natural near-unique key);
each group's state is O(1) bytes; the state store checkpoints with the
stream, so a restart resumes with every previously-seen content key
intact — exactly the resumability story of the batch pipeline, in
streaming form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "image_id string, sha string, cluster_id string, seen_before long, "
    "is_dup boolean"
)
STATE_SCHEMA = "first_id string, n long"


def _dedup_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """One content key's rows this batch + its persistent state."""
    (sha,) = key
    if state.exists:
        first_id, n = state.get
    else:
        first_id, n = None, 0
    out = []
    rows = pd.concat(list(batches))
    # deterministic within-batch order: smallest id claims first-seen
    for img_id in sorted(rows["image_id"]):
        if first_id is None:
            first_id = img_id
        out.append((img_id, sha, first_id, n, n > 0))
        n += 1
    state.update((first_id, n))
    yield pd.DataFrame(
        out,
        columns=["image_id", "sha", "cluster_id", "seen_before", "is_dup"],
    )


def streaming_exact_dedup(features_stream: DataFrame) -> DataFrame:
    """(image_id, sha, ...) stream -> continuously tagged dedup stream.

    cluster_id = first image id ever seen with this sha (across ALL
    batches, via the state store); is_dup marks every later arrival."""
    keyed = features_stream.filter(F.col("sha").isNotNull()).select(
        "image_id", "sha"
    )
    return keyed.groupBy("sha").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source wiring: images parquet stream -> features -> stateful
    dedup -> parquet sink. Returns the started StreamingQuery."""
    from ..operators.features import extract_features
    from .inspection import read_image_stream

    feats = extract_features(read_image_stream(spark, input_path))
    tagged = streaming_exact_dedup(feats)
    writer = (
        tagged.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
