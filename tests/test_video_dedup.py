"""Video near-dup dedup: planted-class golden clusters + tier
attribution + band-recall property (operators/video_dedup.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.fixtures import codecs
from ordinarydumpdeduplicator_spark.fixtures.generator import _make_pixels, _rng
from ordinarydumpdeduplicator_spark.functions.phash import hamming64
from ordinarydumpdeduplicator_spark.operators.video_dedup import (
    frame_band_rows,
    video_dedup_report,
    video_fingerprints,
)

W, H, N_FRAMES = 32, 24, 10


def _frames(unit: str, n: int = N_FRAMES) -> list:
    return [_make_pixels(_rng(7, "vid", unit, i), W, H) for i in range(n)]


def _noise(frames: list, unit: str) -> list:
    out = []
    for i, f in enumerate(frames):
        rng = _rng(7, "vidnoise", unit, i)
        out.append(
            np.clip(
                f.astype(np.int16)
                + rng.integers(-1, 2, size=f.shape, dtype=np.int16),
                0,
                255,
            ).astype(np.uint8)
        )
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    """Planted classes:
      exact       v0 == v1 byte-identical
      frame_exact v2 vs v3: same frames, different fps (container bytes
                  differ, decoded frames identical)
      frame_near  v4 vs v5: +-1 noised AND trimmed (2 frames dropped)
      unique      v6, v7
      broken      v8 (truncated RIFF); v9 byte-identical broken copy
                  (garbage payloads still form one exact group)
      unreadable  v10 (NULL bytes)
      fake        v11 non-AVI container bytes (strict=False path)
    """
    fa = _frames("a")
    fb = _frames("b")
    fc = _frames("c")
    base_a = codecs.encode_avi_rgb(fa, fps=10)
    base_b = codecs.encode_avi_rgb(fb, fps=10)
    broken = codecs.encode_avi_rgb(fc, fps=10)[:200]
    rows = [
        ("v00", base_a),
        ("v01", base_a),
        ("v02", base_b),
        ("v03", codecs.encode_avi_rgb(fb, fps=25)),
        ("v04", codecs.encode_avi_rgb(fc, fps=10)),
        ("v05", codecs.encode_avi_rgb(_noise(fc, "c")[2:], fps=10)),
        ("v06", codecs.encode_avi_rgb(_frames("d"), fps=10)),
        ("v07", codecs.encode_avi_rgb(_frames("e"), fps=10)),
        ("v08", broken),
        ("v09", broken),
        ("v10", None),
        ("v11", b"\x00\x00\x01\xbamp4ish-payload-no-riff" * 4),
    ]
    return spark.createDataFrame(rows, "video_id string, bytes binary")


@pytest.fixture(scope="module")
def report(corpus):
    r = video_dedup_report(corpus, n_frames=8)
    return {k: v.toPandas() for k, v in r.items()}


def test_fingerprint_statuses(report):
    st = dict(zip(report["fingerprints"].video_id,
                  report["fingerprints"].status))
    assert st == {
        "v00": "ok", "v01": "ok", "v02": "ok", "v03": "ok",
        "v04": "ok", "v05": "ok", "v06": "ok", "v07": "ok",
        "v08": "broken", "v09": "broken", "v10": "unreadable",
        "v11": "fake_decode",
    }
    fp = report["fingerprints"].set_index("video_id")
    assert fp.loc["v00", "n_frames_total"] == N_FRAMES
    assert len(fp.loc["v00", "frame_hashes"]) == 8  # evenly sampled
    assert fp.loc["v10", "file_sha"] is None
    assert fp.loc["v08", "file_sha"] is not None


def test_golden_clusters(report):
    cl = dict(zip(report["clusters"].video_id, report["clusters"].cluster_id))
    # planted groups cluster together...
    assert cl["v00"] == cl["v01"]
    assert cl["v02"] == cl["v03"]
    assert cl["v04"] == cl["v05"]
    assert cl["v08"] == cl["v09"]  # broken byte-identical: exact group
    # ...and nothing else merges
    groups = {cl["v00"], cl["v02"], cl["v04"], cl["v08"]}
    assert len(groups) == 4
    for v in ("v06", "v07", "v10", "v11"):
        assert cl[v] == v, v  # singleton -> own id
    dup = dict(zip(report["clusters"].video_id, report["clusters"].is_dup))
    assert sum(dup.values()) == 8


def test_tier_attribution(report):
    t = dict(zip(report["tiers"].video_id, report["tiers"].tier))
    heads = {v for v, tier in t.items() if tier == "canonical"}
    assert heads == {"v00", "v02", "v04", "v08"}
    assert t["v01"] == "exact"
    assert t["v03"] == "frame_exact"
    assert t["v05"] == "frame_near"
    assert t["v09"] == "exact"
    for v in ("v06", "v07", "v10", "v11"):
        assert t[v] == "unique", v


def test_edge_kinds(report):
    # star-hub choice is arbitrary-but-deterministic (hash-min member),
    # so assert unordered pairs
    kinds = {(frozenset((s, d)), k) for s, d, k in zip(
        report["edges"].src, report["edges"].dst, report["edges"].kind)}
    assert (frozenset(("v00", "v01")), "exact") in kinds
    assert (frozenset(("v02", "v03")), "frame_exact") in kinds
    assert (frozenset(("v08", "v09")), "exact") in kinds
    assert (frozenset(("v04", "v05")), "frame_near") in kinds


def test_trimmed_noised_match_frac(report):
    """The planted near pair survives verification with the expected
    symmetric fraction: 8 + 8 sampled frames, the trimmed copy's 8 all
    match, the original has ~2 frames with no counterpart."""
    fp = report["fingerprints"].set_index("video_id")
    ha = [int(x) for x in fp.loc["v04", "frame_hashes"]]
    hb = [int(x) for x in fp.loc["v05", "frame_hashes"]]
    matched_a = sum(1 for a in ha if any(hamming64(a, b) <= 6 for b in hb))
    matched_b = sum(1 for b in hb if any(hamming64(a, b) <= 6 for a in ha))
    frac = (matched_a + matched_b) / (len(ha) + len(hb))
    assert frac >= 0.5


def test_band_pigeonhole_recall(spark):
    """Property: any two hashes within Hamming < bands share >= 1 band
    key — candidate recall is guaranteed at that radius."""
    rng = np.random.default_rng(11)
    base = rng.integers(-(2**62), 2**62, size=50, dtype=np.int64)
    rows = []
    for i, h in enumerate(base):
        flip = rng.choice(64, size=rng.integers(0, 4), replace=False)
        h2 = int(h)
        for b in flip:
            h2 ^= 1 << int(b)
        h2 = h2 - (1 << 64) if h2 >= 1 << 63 else h2
        rows.append((f"a{i:02d}", [int(h)]))
        rows.append((f"b{i:02d}", [h2]))
    fps = spark.createDataFrame(
        rows, "video_id string, frame_hashes array<long>"
    )
    banded = frame_band_rows(fps, bands=4).toPandas()
    keys = {}
    for r in banded.itertuples():
        keys.setdefault(r.video_id, set()).add((r.band, r.key))
    for i in range(50):
        assert keys[f"a{i:02d}"] & keys[f"b{i:02d}"], i


def test_strict_raises_on_non_avi(spark):
    df = spark.createDataFrame(
        [("x", b"not-a-riff-payload")], "video_id string, bytes binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        video_fingerprints(df, strict=True).collect()


def test_empty_input(spark):
    empty = spark.createDataFrame([], "video_id string, bytes binary")
    r = video_dedup_report(empty)
    assert r["clusters"].count() == 0
    assert r["tiers"].count() == 0


def test_precomputed_fingerprints_reuse(corpus):
    """Production shape: a materialized fingerprint frame skips the
    decode pass and yields identical clusters."""
    fps = video_fingerprints(corpus, n_frames=8)
    r = video_dedup_report(corpus.limit(0), fingerprints=fps)
    cl = {x.video_id: x.cluster_id for x in r["clusters"].collect()}
    assert cl["v00"] == cl["v01"] and cl["v04"] == cl["v05"]


def test_payload_never_shuffled(corpus):
    """Plan gate: no Exchange in the fingerprint stage's plan below the
    mapInPandas — bytes stay partition-local."""
    fps = video_fingerprints(corpus)
    plan = fps._jdf.queryExecution().executedPlan().toString()
    head = plan.split("FlatMapGroupsInPandas")[0].split("MapInPandas")[0]
    assert "Exchange" not in head


def test_frames_matching_images(spark, corpus):
    """Cross-modal probe: images that ARE frames of videos match at
    hamming 0 with the right sample position; noised copies match at
    small hamming; unrelated images don't match."""
    from ordinarydumpdeduplicator_spark.operators.video_dedup import (
        frames_matching_images,
    )
    from ordinarydumpdeduplicator_spark.functions.phash import phash64

    fa = _frames("a")  # v00/v01's frames (10 frames, 8 sampled)
    rng = _rng(7, "imgnoise")
    noised = np.clip(
        fa[0].astype(np.int16)
        + rng.integers(-1, 2, size=fa[0].shape, dtype=np.int16),
        0, 255,
    ).astype(np.uint8)
    img_rows = [
        ("img_exact", int(phash64(fa[0]))),      # == sampled frame 0
        ("img_mid", int(phash64(fa[5]))),        # == a later sampled frame
        ("img_noised", int(phash64(noised))),    # near frame 0
        ("img_unrelated", int(phash64(_make_pixels(_rng(7, "other"), W, H)))),
    ]
    images = spark.createDataFrame(img_rows, "image_id string, phash long")
    fps = video_fingerprints(corpus, n_frames=8)
    m = frames_matching_images(fps, images, max_hamming=3).toPandas()
    got = {(r.video_id, r.frame_pos, r.image_id): r.hamming
           for r in m.itertuples()}
    # exact frame matches in BOTH byte-identical videos at position 0
    assert got[("v00", 0, "img_exact")] == 0
    assert got[("v01", 0, "img_exact")] == 0
    # frame 5 of the source is sampled (10 frames -> stride keeps 0,5 among
    # positions); find it at hamming 0 in v00
    assert any(v == 0 and k[0] == "v00" and k[2] == "img_mid"
               for k, v in got.items())
    assert any(k[2] == "img_noised" and k[0] in ("v00", "v01") and v <= 3
               for k, v in got.items())
    assert not any(k[2] == "img_unrelated" for k in got)


def test_frames_matching_images_plan_has_no_python(spark, corpus):
    """The cross-modal probe is built-ins end-to-end after the
    fingerprint pass: no Python eval nodes below the band join."""
    from ordinarydumpdeduplicator_spark.operators.video_dedup import (
        frames_matching_images,
    )
    images = spark.createDataFrame(
        [("i", 1)], "image_id string, phash long"
    )
    fps = video_fingerprints(corpus, n_frames=8).localCheckpoint(eager=False)
    df = frames_matching_images(fps, images)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_segment_novelty_video(spark, corpus):
    """Incremental dedup: a batch of (copy of v00's content re-muxed,
    trimmed+noised copy of v06's content, genuinely new video) against
    the corpus fingerprints as the reference snapshot."""
    from ordinarydumpdeduplicator_spark.operators.segment_dedup import (
        segment_novelty,
    )

    ref = video_fingerprints(corpus, n_frames=8)
    batch_rows = [
        ("b_remux", codecs.encode_avi_rgb(_frames("a"), fps=30)),
        ("b_near", codecs.encode_avi_rgb(_noise(_frames("d"), "d")[1:], fps=10)),
        ("b_new", codecs.encode_avi_rgb(_frames("zz"), fps=10)),
        ("b_broken", None),
    ]
    batch = video_fingerprints(
        spark.createDataFrame(batch_rows, "video_id string, bytes binary"),
        n_frames=8,
    )
    out = {r.video_id: r for r in segment_novelty(batch, ref).collect()}
    assert not out["b_remux"].is_novel
    assert out["b_remux"].match_ref_id in ("v00", "v01")
    assert out["b_remux"].match_frac == 1.0
    assert not out["b_near"].is_novel and out["b_near"].match_ref_id == "v06"
    assert out["b_new"].is_novel and out["b_new"].match_ref_id is None
    assert out["b_broken"].is_novel
