"""Streaming ingest-dedup == batch first-occurrence dedup on the same
corpus, across availableNow restarts, with bloom-index state carried
between batches and crash-replay healing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.streaming.ingest_dedup import (
    load_new_docs,
    stream_ingest_dedup,
)

PARAMS = dict(n_shards=8, bits_per_shard=1 << 12)


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def _write_wave(spark, inp, rows):
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(inp)


def _run_once(spark, inp, state, ck):
    q = stream_ingest_dedup(spark, inp, state, ck, **PARAMS)
    q.awaitTermination()


def _expected_first_occurrence(rows):
    seen, keep = {}, []
    for doc_id, text in sorted(rows):
        key = " ".join(text.lower().split()) if text is not None else None
        if key is None:
            keep.append(doc_id)
        elif key not in seen:
            seen[key] = doc_id
            keep.append(doc_id)
    return sorted(keep)


def test_stream_ingest_dedup_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    # NULL-text docs are never deduplicable: every one stays "new"
    wave1 = [(i, f"text number {i % 40}") for i in range(100)] + [
        (500, None),
        (501, None),
    ]
    # wave 2 repeats wave-1 keys 0..19, adds new keys 40..59 + a NULL
    wave2 = [(100 + i, f"text number {i % 60}") for i in range(120)] + [
        (502, None)
    ]
    # wave 3 is ALL duplicates: empty new/keys epochs must round-trip
    wave3 = [(600 + i, f"text number {i}") for i in range(20)]

    _write_wave(spark, inp, wave1)
    _run_once(spark, inp, state, ck)
    got1 = sorted(r.doc_id for r in load_new_docs(spark, state).collect())
    assert got1 == _expected_first_occurrence(wave1)
    assert {500, 501} <= set(got1)

    _write_wave(spark, inp, wave2)
    _run_once(spark, inp, state, ck)
    got2 = sorted(r.doc_id for r in load_new_docs(spark, state).collect())
    assert got2 == _expected_first_occurrence(wave1 + wave2)
    assert 502 in got2

    _write_wave(spark, inp, wave3)
    _run_once(spark, inp, state, ck)
    got3 = sorted(r.doc_id for r in load_new_docs(spark, state).collect())
    assert got3 == got2, "all-duplicate wave must add nothing"

    # restart with no new input: no state change
    _run_once(spark, inp, state, ck)
    got4 = sorted(r.doc_id for r in load_new_docs(spark, state).collect())
    assert got4 == got2


def test_stream_ingest_replay_heals(spark, tmp_path):
    """Crash in the gap between 'epoch parquet committed' and 'stream
    checkpoint committed': the replayed batch overwrites its own epoch
    dirs, so nothing duplicates and the bloom snapshot stays correct."""
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    _write_wave(spark, inp, [(i, f"t {i % 10}") for i in range(30)])
    _run_once(spark, inp, state, ck)
    _write_wave(spark, inp, [(100 + i, f"t {i % 20}") for i in range(40)])
    _run_once(spark, inp, state, ck)
    want = sorted(r.doc_id for r in load_new_docs(spark, state).collect())

    # simulate the crash: drop batch 1's stream commit (and its .crc) so
    # Structured Streaming replays it against the already-written state
    for name in ("1", ".1.crc"):
        p = os.path.join(ck, "commits", name)
        if os.path.exists(p):
            os.remove(p)
    _run_once(spark, inp, state, ck)
    got = sorted(r.doc_id for r in load_new_docs(spark, state).collect())
    assert got == want

    # and the bloom snapshot still dedups a third wave correctly
    _write_wave(spark, inp, [(200 + i, f"t {i % 30}") for i in range(30)])
    _run_once(spark, inp, state, ck)
    got3 = sorted(r.doc_id for r in load_new_docs(spark, state).collect())
    # keys t0..t19 already known; t20..t29 are new (first holder: 220+i)
    assert got3 == want + [220 + i for i in range(10)]


def test_stream_ingest_metrics_accounting(spark, tmp_path):
    from ordinarydumpdeduplicator_spark.streaming.ingest_dedup import (
        load_ingest_metrics,
    )

    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    # wave 1: 10 distinct keys x2 copies each + 1 NULL
    wave1 = [(i, f"k {i % 10}") for i in range(20)] + [(900, None)]
    # wave 2: 5 history dups, 5 new keys (x2 copies), 1 NULL
    wave2 = [(100 + i, f"k {5 + (i % 10)}") for i in range(20)] + [
        (901, None)
    ]
    _write_wave(spark, inp, wave1)
    _run_once(spark, inp, state, ck)
    _write_wave(spark, inp, wave2)
    _run_once(spark, inp, state, ck)

    m = {r.batch_id: r for r in load_ingest_metrics(spark, state).collect()}
    assert set(m) == {0, 1}
    r0, r1 = m[0], m[1]
    assert (r0.n_in, r0.n_null_key, r0.n_batch_dup, r0.n_history_dup,
            r0.n_new) == (21, 1, 10, 0, 10)
    # wave 2: 20 text rows over keys 5..14 (2 copies each) + NULL;
    # keys 5..9 are history dups, keys 10..14 are new
    assert (r1.n_in, r1.n_null_key, r1.n_batch_dup, r1.n_history_dup,
            r1.n_new) == (21, 1, 10, 5, 5)
    for r in m.values():
        assert r.n_in == r.n_null_key + r.n_batch_dup + r.n_history_dup + r.n_new
    # accounting must agree with the shipped corpus (new + NULL
    # passthrough rows are what load_new_docs returns)
    total = sum(r.n_new + r.n_null_key for r in m.values())
    assert total == load_new_docs(spark, state).count()


def test_compact_ingest_keys(spark, tmp_path):
    """Key-store compaction: same keys, fewer epoch dirs, shard
    clustering preserved, and the next wave still dedups against the
    merged history."""
    import os

    from ordinarydumpdeduplicator_spark.streaming.ingest_dedup import (
        KEYS_SCHEMA,
        compact_ingest_keys,
        load_new_docs,
        stream_ingest_dedup,
    )

    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(inp, exist_ok=True)

    def wave(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(inp)
        q = stream_ingest_dedup(spark, inp, state, ck)
        q.awaitTermination()

    wave([(1, "alpha"), (2, "beta")])
    wave([(3, "gamma")])
    wave([(4, "delta")])

    keys_dir = os.path.join(state, "keys")

    def key_set():
        from ordinarydumpdeduplicator_spark.streaming.near_dup import (
            _committed_epochs,
        )

        return sorted(
            (r["content_sha"], r["shard"])
            for r in spark.read.schema(KEYS_SCHEMA)
            .parquet(*[p for _, p in _committed_epochs(keys_dir)])
            .collect()
        )

    before = key_set()
    assert len(os.listdir(keys_dir)) == 3
    assert compact_ingest_keys(spark, state) == 2
    assert len(os.listdir(keys_dir)) == 2
    assert key_set() == before

    # history dedup across the compaction boundary: re-send old text
    wave([(5, "alpha"), (6, "epsilon")])
    new_ids = sorted(
        r["doc_id"] for r in load_new_docs(spark, state).collect()
    )
    assert 5 not in new_ids and 6 in new_ids
