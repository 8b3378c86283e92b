"""Streaming near-dup clustering == batch caption pipeline on the same
corpus, across two availableNow restarts (exactly-once per file via the
stream checkpoint, state tables carried between batches)."""

from __future__ import annotations

import os

from ordinarydumpdeduplicator_spark.operators.connected_components import (
    connected_components,
)
from ordinarydumpdeduplicator_spark.operators.features import extract_features
from ordinarydumpdeduplicator_spark.operators.lsh import caption_candidates
from ordinarydumpdeduplicator_spark.operators.verify import verify_caption_pairs
from ordinarydumpdeduplicator_spark.streaming.near_dup import (
    load_assignments,
    stream_near_dup_clusters,
)
from tests.conftest import to_spark_images


def _assign_dict(df):
    return {r["image_id"]: r["cluster_id"] for r in df.collect()}


def test_stream_near_dup_matches_batch(spark, tiny_corpus, tmp_path):
    pdf, _ = tiny_corpus
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    def run_once():
        q = stream_near_dup_clusters(spark, inp, state, ck)
        q.awaitTermination()

    to_spark_images(spark, pdf.iloc[:120]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_once()
    to_spark_images(spark, pdf.iloc[120:]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_once()

    got = load_assignments(spark, state)

    full_images = to_spark_images(spark, pdf)
    feats = extract_features(full_images).cache()
    pairs, star = caption_candidates(feats, bucket_cap=256)
    near = verify_caption_pairs(pairs, full_images)
    ref = connected_components(
        star.select("src", "dst").unionByName(near.select("src", "dst"))
    )
    assert _assign_dict(got) == _assign_dict(ref)

    # third start with no new files: nothing to process, state unchanged
    before = _assign_dict(got)
    run_once()
    after = _assign_dict(load_assignments(spark, state))
    assert after == before


def test_replayed_epoch_overwrites_partial_state(spark, tiny_corpus, tmp_path):
    """Crash protocol: a batch that died mid-write leaves partial epoch
    dirs; Structured Streaming replays the SAME batch id, and every state
    write is an overwrite of that epoch's own directory — so the partial
    state is healed, never appended to."""
    import shutil

    pdf, _ = tiny_corpus
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    to_spark_images(spark, pdf.iloc[:120]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream_near_dup_clusters(spark, inp, state, ck).awaitTermination()

    # simulate batch 1 crashing after its reps write "completed" with
    # garbage (worst case: committed-looking partial state for the epoch
    # the stream will replay)
    poisoned = os.path.join(state, "reps", "epoch=1")
    spark.createDataFrame(
        [("deadbeef", "bogus_rep")], "caption_sha string, rep string"
    ).write.mode("overwrite").parquet(poisoned)
    assert os.path.exists(os.path.join(poisoned, "_SUCCESS"))

    to_spark_images(spark, pdf.iloc[120:]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream_near_dup_clusters(spark, inp, state, ck).awaitTermination()

    # the replayed epoch rewrote its reps dir: the poison row is gone
    reps = spark.read.parquet(os.path.join(state, "reps"))
    assert reps.filter("caption_sha = 'deadbeef'").count() == 0

    # and the final assignment equals the batch-pipeline reference
    full_images = to_spark_images(spark, pdf)
    feats = extract_features(full_images).cache()
    pairs, star = caption_candidates(feats, bucket_cap=256)
    near = verify_caption_pairs(pairs, full_images)
    ref = connected_components(
        star.select("src", "dst").unionByName(near.select("src", "dst"))
    )
    assert _assign_dict(load_assignments(spark, state)) == _assign_dict(ref)


def test_replay_after_prune_keeps_prior_assignments(spark, tiny_corpus, tmp_path):
    """Crash in the gap between a batch's state writes and the stream
    checkpoint commit: the replayed batch must still find the PREVIOUS
    assignment snapshot (pruning retains the latest prior epoch), or the
    replay would re-run as a first batch and silently drop every earlier
    cluster assignment."""
    import shutil

    pdf, _ = tiny_corpus
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    to_spark_images(spark, pdf.iloc[:120]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream_near_dup_clusters(spark, inp, state, ck).awaitTermination()
    to_spark_images(spark, pdf.iloc[120:]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream_near_dup_clusters(spark, inp, state, ck).awaitTermination()

    # batch 1's state writes (incl. the prune) completed, but "the
    # checkpoint never committed": delete the commit marker (and its
    # local-FS checksum sidecar) so the next start re-executes batch 1
    # with the same offsets
    os.remove(os.path.join(ck, "commits", "1"))
    crc = os.path.join(ck, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    stream_near_dup_clusters(spark, inp, state, ck).awaitTermination()

    full_images = to_spark_images(spark, pdf)
    feats = extract_features(full_images).cache()
    pairs, star = caption_candidates(feats, bucket_cap=256)
    near = verify_caption_pairs(pairs, full_images)
    ref = connected_components(
        star.select("src", "dst").unionByName(near.select("src", "dst"))
    )
    assert _assign_dict(load_assignments(spark, state)) == _assign_dict(ref)


def test_pruned_caption_resolver_prunes_and_matches(spark, tiny_corpus,
                                                    tmp_path):
    """The verify stage's caption fetch reads only the candidate
    endpoints' id shards (pushed IN literal on the clustering column)
    and returns exactly the requested ids' captions; an empty id set
    reads ZERO caption rows (pinned by corrupting the store)."""
    import glob

    from pyspark.sql import functions as F

    from ordinarydumpdeduplicator_spark.streaming.near_dup import (
        CAPTIONS_SCHEMA,
        pruned_caption_resolver,
    )

    pdf, _ = tiny_corpus
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)
    to_spark_images(spark, pdf.iloc[:120]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    q = stream_near_dup_clusters(spark, inp, state, ck)
    q.awaitTermination()

    cap_dirs = [os.path.join(state, "captions", "epoch=0")]
    full = {
        r["image_id"]: r["caption"]
        for r in spark.read.schema(CAPTIONS_SCHEMA)
        .parquet(*cap_dirs)
        .collect()
    }
    want_ids = sorted(full)[:7]
    resolver = pruned_caption_resolver(spark, cap_dirs)
    ids = spark.createDataFrame(
        [(i,) for i in want_ids], "image_id string"
    )
    got = resolver(ids)
    assert {
        r["image_id"]: r["caption"] for r in got.collect()
    } == {i: full[i] for i in want_ids}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "In(__shard" in plan or "EqualTo(__shard" in plan, plan
    assert "IsNull(__shard)" in plan, plan  # legacy escape hatch rides

    # zero-read on an empty candidate set: corrupt every caption part
    # file — the resolver must still return an empty frame untouched
    for p in glob.glob(
        os.path.join(state, "captions", "**", "part-*.parquet"),
        recursive=True,
    ):
        with open(p, "wb") as f:
            f.write(b"garbage")
    empty = resolver(ids.limit(0))
    assert empty.count() == 0


def test_pruned_state_matches_full_scan(spark, tiny_corpus, tmp_path):
    """prune_state=True (bloom-probed, shard-pruned rep/band index
    reads) must yield assignments identical to the full-frame path on
    the same waves, across a restart."""
    pdf, _ = tiny_corpus
    results = {}
    for mode in (True, False):
        inp = str(tmp_path / f"in_{mode}")
        state = str(tmp_path / f"state_{mode}")
        ck = str(tmp_path / f"ck_{mode}")
        os.makedirs(inp, exist_ok=True)

        def run_once():
            q = stream_near_dup_clusters(
                spark, inp, state, ck, prune_state=mode
            )
            q.awaitTermination()

        to_spark_images(spark, pdf.iloc[:120]).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        run_once()
        to_spark_images(spark, pdf.iloc[120:200]).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        run_once()
        results[mode] = _assign_dict(load_assignments(spark, state))
    assert results[True] == results[False]


def test_pruned_state_novel_batch_reads_zero_index_rows(
    spark, tiny_corpus, tmp_path
):
    """With pruning engaged, a batch of entirely novel captions never
    touches the rep/band index stores: corrupt every part file of both
    and the batch must still complete with correct state."""
    import glob

    pdf, _ = tiny_corpus
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    def run_once():
        q = stream_near_dup_clusters(
            spark, inp, state, ck, prune_state=True
        )
        q.awaitTermination()

    to_spark_images(spark, pdf.iloc[:120]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_once()

    for sub in ("reps", "bands"):
        parts = glob.glob(
            os.path.join(state, sub, "**", "part-*.parquet"),
            recursive=True,
        )
        assert parts
        for p in parts:
            with open(p, "wb") as f:
                f.write(b"garbage")

    # a disjoint fixture slice: fresh ids, fresh captions — every rep
    # sha and band key is a bloom miss, so neither store is read
    to_spark_images(spark, pdf.iloc[120:160]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_once()  # completing at all proves zero index reads

    # and the state it produced matches an uncorrupted twin run
    inp2 = str(tmp_path / "in2")
    state2 = str(tmp_path / "state2")
    ck2 = str(tmp_path / "ck2")
    os.makedirs(inp2, exist_ok=True)
    for lo, hi in ((0, 120), (120, 160)):
        to_spark_images(spark, pdf.iloc[lo:hi]).coalesce(1).write.mode(
            "append"
        ).parquet(inp2)
        q = stream_near_dup_clusters(
            spark, inp2, state2, ck2, prune_state=True
        )
        q.awaitTermination()
    assert _assign_dict(load_assignments(spark, state)) == _assign_dict(
        load_assignments(spark, state2)
    )
