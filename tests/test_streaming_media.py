"""Streaming media-ingest novelty: per-batch verdicts vs the epoch-keyed
fingerprint index, within-batch collapse, byte-exact path for
undecodable payloads, crash-replay healing."""

from __future__ import annotations

import os

from ordinarydumpdeduplicator_spark.fixtures import codecs
from ordinarydumpdeduplicator_spark.fixtures.generator import (
    _make_pixels,
    _rng,
)
from ordinarydumpdeduplicator_spark.operators.video_dedup import (
    VIDEO_FP_SCHEMA,
    video_fingerprints,
)
from ordinarydumpdeduplicator_spark.streaming.media_ingest import (
    load_media_metrics,
    load_media_verdicts,
    load_reference_fps,
    stream_media_novelty,
)

INPUT_SCHEMA = "video_id string, bytes binary"


def _frames(unit: str, n: int = 8):
    return [_make_pixels(_rng(3, "smn", unit, i), 32, 24) for i in range(n)]


def _avi(unit: str, fps: int = 10) -> bytes:
    return codecs.encode_avi_rgb(_frames(unit), fps=fps)


def _write_wave(spark, inp, rows):
    spark.createDataFrame(rows, INPUT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)


def _run_once(spark, inp, state, ck):
    q = stream_media_novelty(
        spark,
        inp,
        state,
        ck,
        fingerprint_fn=video_fingerprints,
        input_schema=INPUT_SCHEMA,
        fp_schema=VIDEO_FP_SCHEMA,
        id_col="video_id",
        hashes_col="frame_hashes",
        prefix="frame",
    )
    q.awaitTermination()


def test_stream_media_novelty_verdicts(spark, tmp_path):
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    # valid RIFF/AVI magic, corrupt body -> status 'broken', sha only
    broken = b"RIFF" + b"\x00\x00\x00\x00" + b"AVI " + b"\x00" * 64
    wave1 = [
        ("a", _avi("x")),
        ("c", _avi("y")),
        ("n1", None),  # Broken sentinel: nothing to fingerprint
        ("u1", broken),  # undecodable but hashable
    ]
    _write_wave(spark, inp, wave1)
    _run_once(spark, inp, state, ck)

    v = {
        r["video_id"]: r
        for r in load_media_verdicts(spark, state).collect()
    }
    assert v["a"]["outcome"] == "novel"
    assert v["c"]["outcome"] == "novel"
    assert v["n1"]["outcome"] == "no_hashes"
    assert v["u1"]["outcome"] == "novel"  # first holder of its byte sha

    wave2 = [
        ("b", _avi("x", fps=25)),  # re-mux of a -> ref_dup
        ("d", _avi("z")),          # fresh content
        ("d2", _avi("z", fps=25)),  # within-batch re-mux of d
        # d's frames PLUS 8 frames of unseen content w: clusters with d
        # (half its segments match), so it's a batch_dup — but its w-half
        # hashes exist nowhere else. The member-indexing rule must keep
        # them (under canonical id "d") or wave3's "t" below is
        # misclassified novel.
        ("dx", codecs.encode_avi_rgb(_frames("z") + _frames("w"))),
        ("e", None),
        ("u2", broken),  # byte-identical to u1 -> ref_dup via sha path
    ]
    _write_wave(spark, inp, wave2)
    _run_once(spark, inp, state, ck)

    v = {
        r["video_id"]: r
        for r in load_media_verdicts(spark, state).collect()
    }
    assert v["b"]["outcome"] == "ref_dup" and v["b"]["match_ref_id"] == "a"
    assert v["u2"]["outcome"] == "ref_dup" and v["u2"]["match_ref_id"] == "u1"
    assert v["u2"]["match_frac"] == 1.0
    assert v["e"]["outcome"] == "no_hashes"
    # d/d2/dx collapse within the batch: min-id canonical is novel
    assert v["d"]["outcome"] == "novel"
    assert v["d2"]["outcome"] == "batch_dup"
    assert v["d2"]["batch_canonical_id"] == "d"
    assert v["dx"]["outcome"] == "batch_dup"
    assert v["dx"]["batch_canonical_id"] == "d"

    # the index covers novel CLUSTERS (all members' fingerprints,
    # re-keyed to the canonical id) — not just the canonicals
    idx = sorted(
        set(
            r["video_id"]
            for r in load_reference_fps(
                spark, state, VIDEO_FP_SCHEMA
            ).collect()
        )
    )
    assert idx == ["a", "c", "d", "u1"]

    # metrics: disjoint outcome buckets sum to batch size
    for m in load_media_metrics(spark, state).collect():
        assert (
            m["n_in"]
            == m["n_no_hashes"] + m["n_ref_dup"] + m["n_batch_dup"] + m["n_novel"]
        )

    # cumulative recall: "t" re-uploads ONLY the w-half of dx — content
    # that never appeared in a canonical. The family-indexed hashes must
    # classify it ref_dup of the canonical, not novel.
    _write_wave(spark, inp, [("t", _avi("w"))])
    _run_once(spark, inp, state, ck)
    v = {
        r["video_id"]: r
        for r in load_media_verdicts(spark, state).collect()
    }
    assert v["t"]["outcome"] == "ref_dup" and v["t"]["match_ref_id"] == "d"


def test_stream_media_replay_heals(spark, tmp_path):
    """Replay of a batch whose epoch parquet committed but whose stream
    checkpoint didn't must overwrite its own state, not duplicate it."""
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    _write_wave(spark, inp, [("a", _avi("x")), ("c", _avi("y"))])
    _run_once(spark, inp, state, ck)
    _write_wave(spark, inp, [("b", _avi("x", fps=25)), ("d", _avi("z"))])
    _run_once(spark, inp, state, ck)
    want_idx = sorted(
        r["video_id"]
        for r in load_reference_fps(spark, state, VIDEO_FP_SCHEMA).collect()
    )
    want_v = sorted(
        (r["video_id"], r["outcome"])
        for r in load_media_verdicts(spark, state).collect()
    )

    for name in ("1", ".1.crc"):
        p = os.path.join(ck, "commits", name)
        if os.path.exists(p):
            os.remove(p)
    _run_once(spark, inp, state, ck)

    got_idx = sorted(
        r["video_id"]
        for r in load_reference_fps(spark, state, VIDEO_FP_SCHEMA).collect()
    )
    got_v = sorted(
        (r["video_id"], r["outcome"])
        for r in load_media_verdicts(spark, state).collect()
    )
    assert got_idx == want_idx and got_v == want_v

    # the healed index still dedups a third wave
    _write_wave(spark, inp, [("m", _avi("z", fps=30))])
    _run_once(spark, inp, state, ck)
    v = {
        r["video_id"]: r
        for r in load_media_verdicts(spark, state).collect()
    }
    assert v["m"]["outcome"] == "ref_dup" and v["m"]["match_ref_id"] == "d"


def test_compact_media_index(spark, tmp_path):
    """Compaction merges all-but-the-newest fingerprint epochs into the
    oldest dir: same index content, fewer epoch dirs, and the healed
    strictly-below loader contract still dedups the next wave."""
    from ordinarydumpdeduplicator_spark.streaming.media_ingest import (
        compact_media_index,
    )

    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    for unit in ("x", "y", "z"):
        _write_wave(spark, inp, [(unit, _avi(unit))])
        _run_once(spark, inp, state, ck)

    def index_rows():
        return sorted(
            (r["video_id"], tuple(r["frame_hashes"] or []))
            for r in load_reference_fps(
                spark, state, VIDEO_FP_SCHEMA
            ).collect()
        )

    before = index_rows()
    fps_dir = os.path.join(state, "fps")
    assert len(os.listdir(fps_dir)) == 3

    assert compact_media_index(spark, state, VIDEO_FP_SCHEMA) == 2
    dirs = sorted(os.listdir(fps_dir))
    assert len(dirs) == 2 and dirs[0] == "epoch=0"
    assert index_rows() == before

    # idempotent / no-op below 3 epochs
    assert compact_media_index(spark, state, VIDEO_FP_SCHEMA) == 0

    # the compacted index still dedups: re-upload a re-mux of wave-1
    # content whose delta now lives in the merged epoch
    _write_wave(spark, inp, [("rx", _avi("x", fps=25))])
    _run_once(spark, inp, state, ck)
    v = {
        r["video_id"]: r
        for r in load_media_verdicts(spark, state).collect()
    }
    assert v["rx"]["outcome"] == "ref_dup" and v["rx"]["match_ref_id"] == "x"
