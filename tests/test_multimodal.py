"""Multimodal operators: real image plumbing, stubbed audio/video."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ordinarydumpdeduplicator_spark.fixtures import codecs
from ordinarydumpdeduplicator_spark.operators.multimodal import (
    audio_features,
    decode_images,
    image_stats,
    resize_images,
    video_frame_sample,
)
from tests.conftest import to_spark_images


def test_decode_images_roundtrip(spark, tiny_corpus):
    pdf, _ = tiny_corpus
    sample = pdf.iloc[:40]
    images = to_spark_images(spark, sample)
    rows = {r["image_id"]: r for r in decode_images(images).collect()}
    assert len(rows) == 40
    for rec in sample.itertuples():
        r = rows[rec.image_id]
        if rec._8 == "unreadable":  # _class column
            assert r["status"] == "unreadable" and r["pixels"] is None
        elif len(rec.bytes) == 0:
            assert r["status"] == "unreadable"
        else:
            px = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(
                r["h"], r["w"], 3
            )
            ref = codecs.decode(rec.bytes)
            # lossless formats roundtrip exactly; lossy within PSNR bound
            assert codecs.psnr(px, ref) == float("inf")


def test_resize_images(spark, tiny_corpus):
    pdf, _ = tiny_corpus
    ok = pdf[(pdf._class != "unreadable") & (pdf._class != "empty")].iloc[:10]
    images = to_spark_images(spark, ok)
    rows = resize_images(images, out_w=8, out_h=8).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["status"] == "ok"
        thumb = codecs.decode(r["bytes"])
        assert thumb.shape == (8, 8, 3)


def test_image_stats_match_numpy(spark, tiny_corpus):
    pdf, _ = tiny_corpus
    ok = pdf[(pdf._class != "unreadable") & (pdf._class != "empty")].iloc[:10]
    images = to_spark_images(spark, ok)
    rows = {r["image_id"]: r for r in image_stats(images).collect()}
    for rec in ok.itertuples():
        px = codecs.decode(rec.bytes).astype(np.float64)
        assert rows[rec.image_id]["mean_r"] == pytest.approx(px[:, :, 0].mean())


def _make_wav(freq_hz: float, sr: int = 8000, n: int = 4000,
              channels: int = 1, sampwidth: int = 2) -> bytes:
    """Synthesize a PCM WAV in memory with the stdlib writer."""
    import io
    import wave as _wave

    import numpy as np

    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * freq_hz * t)
    if sampwidth == 2:
        pcm = (x * 32767).astype("<i2")
    else:
        pcm = ((x * 127) + 128).astype("u1")
    if channels > 1:
        pcm = np.repeat(pcm[:, None], channels, axis=1)
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_audio_wav_real_decode(spark):
    """fmt=WAV is a REAL decode (stdlib wave), strict mode included."""
    import numpy as np

    wav = _make_wav(440.0)
    stereo = _make_wav(440.0, channels=2)
    audio = spark.createDataFrame(
        [("a1", wav), ("a2", stereo), ("a3", wav[:30])],
        "audio_id string, bytes binary",
    )
    rows = {r["audio_id"]: r
            for r in audio_features(audio, strict=True).collect()}
    assert rows["a1"]["status"] == "ok"
    assert rows["a1"]["n_samples"] == 4000
    assert rows["a1"]["sample_rate"] == 8000
    # sine rms = 1/sqrt(2); int16 quantization keeps it within 1e-3
    assert abs(rows["a1"]["rms"] - 1 / np.sqrt(2)) < 1e-3
    # 440 Hz over 0.5 s crosses zero ~2*440*0.5 times
    assert abs(rows["a1"]["zero_crossings"] - 440) <= 2
    # stereo averages to mono: same features
    assert rows["a2"]["n_samples"] == 4000
    assert abs(rows["a2"]["rms"] - rows["a1"]["rms"]) < 1e-4
    # truncated RIFF -> broken, not a crash
    assert rows["a3"]["status"] == "broken"


def test_audio_stub(spark):
    audio = spark.createDataFrame(
        [("a1", b"\x00" * 64), ("a2", b"\x01" * 64), ("a3", None)],
        "audio_id string, bytes binary",
    )
    # non-WAV payloads in strict mode raise inside the task
    with pytest.raises(Exception, match="codec"):
        audio_features(audio, strict=True).collect()
    rows = {r["audio_id"]: r for r in audio_features(audio).collect()}
    assert rows["a1"]["status"] == "fake_decode"
    assert rows["a1"]["n_samples"] == 4096
    assert rows["a3"]["status"] == "unreadable"
    # deterministic: rerun yields identical features
    rows2 = {r["audio_id"]: r for r in audio_features(audio).collect()}
    assert rows["a1"]["rms"] == rows2["a1"]["rms"]


def test_video_avi_real_decode(spark):
    """Uncompressed RGB AVI is a REAL decode: container parse, even-stride
    frame sampling, pixel-exact png re-encode — strict mode included."""
    import numpy as np

    from ordinarydumpdeduplicator_spark.fixtures import codecs

    rng = np.random.default_rng(7)
    src = [rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
           for _ in range(9)]
    avi = codecs.encode_avi_rgb(src, fps=3)
    video = spark.createDataFrame(
        [("v1", avi), ("v2", avi[:100]), ("v3", None)],
        "video_id string, bytes binary",
    )
    rows = video_frame_sample(video, n_frames=4, strict=True).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    got = sorted((r["frame_idx"] for r in by_vid["v1"]))
    assert got == [0, 2, 4, 6]  # even stride over 9 frames
    for r in by_vid["v1"]:
        px = codecs.decode(bytes(r["bytes"]))
        assert (px == src[r["frame_idx"]]).all()  # pixel-exact roundtrip
    assert by_vid["v2"][0]["status"] == "broken"
    assert by_vid["v3"][0]["status"] == "unreadable"


def test_video_frames_compose_with_image_ops(spark):
    video = spark.createDataFrame(
        [("v1", b"fakevideo1"), ("v2", b"fakevideo2")],
        "video_id string, bytes binary",
    )
    # non-AVI payloads in strict mode raise inside the task
    with pytest.raises(Exception, match="codec"):
        video_frame_sample(video, strict=True).collect()
    frames = video_frame_sample(video, n_frames=3)
    assert frames.count() == 6
    # frames are real png payloads: the image decode operator runs on them
    as_images = frames.select(
        F.concat_ws("#", "video_id", "frame_idx").alias("image_id"), "bytes"
    )
    decoded = decode_images(as_images)
    assert decoded.filter(F.col("status") == "ok").count() == 6


# ------------------------------------------------------ image quality filter


def test_image_quality_filter_hand_case(spark):
    from ordinarydumpdeduplicator_spark.operators.features import (
        image_quality_filter,
    )

    rows = [
        # image_id, status, w, h, gray_std, caption_sha
        ("good", "ok", 256, 192, 40.0, "c1"),
        ("broken", "error", None, None, None, "c2"),
        ("tiny", "ok", 32, 60, 40.0, "c3"),
        ("banner", "ok", 900, 100, 40.0, "c4"),
        ("blank", "ok", 256, 192, 0.5, "c5"),
        ("nocap", "ok", 256, 192, 40.0, None),
        ("all_bad", "ok", 10, 300, 0.1, None),
    ]
    feats = spark.createDataFrame(
        rows,
        "image_id string, status string, w_actual int, h_actual int, "
        "gray_std double, caption_sha string",
    )
    out = {r.image_id: r for r in image_quality_filter(feats).collect()}
    assert out["good"].keep and out["good"].reasons == []
    assert out["broken"].reasons == ["unreadable"]
    assert out["tiny"].reasons == ["too_small"]
    assert out["banner"].reasons == ["extreme_aspect"]
    assert out["blank"].reasons == ["near_constant"]
    assert out["nocap"].reasons == ["no_caption"]
    # fixed rule order, all firing
    assert out["all_bad"].reasons == [
        "too_small", "extreme_aspect", "near_constant", "no_caption"
    ]
    assert not any(
        out[k].keep for k in out if k != "good"
    )


def test_image_quality_filter_on_extracted_features(spark):
    """Integration: the verdict over REAL extract_features output — broken
    payloads (planted garbage bytes) come out unreadable, planted good
    images keep."""
    from ordinarydumpdeduplicator_spark.fixtures.generator import (
        IMAGE_COLS,
        make_corpus,
    )
    from ordinarydumpdeduplicator_spark.operators.features import (
        extract_features,
        image_quality_filter,
    )
    from ordinarydumpdeduplicator_spark.schemas import IMAGES_SCHEMA

    pdf, _ = make_corpus(300)
    images = spark.createDataFrame(pdf[IMAGE_COLS], schema=IMAGES_SCHEMA)
    feats = extract_features(images)
    # min_side sized to the 32x24 test corpus (the 64px default is tuned
    # for the 256x192 bench payloads)
    verdict = image_quality_filter(feats, min_side=16)
    # the generator plants 'unreadable' (garbage payload) rows — each must
    # carry the unreadable reason; readable rows must never carry it
    n_planted = int((pdf._class == "unreadable").sum())
    assert n_planted > 0
    bad_ids = {
        r.image_id
        for r in verdict.filter(
            F.array_contains("reasons", "unreadable")
        ).collect()
    }
    planted_ids = set(pdf[pdf._class == "unreadable"].image_id)
    assert planted_ids <= bad_ids
    kept = verdict.filter("keep").count()
    assert 0 < kept < len(pdf)
    assert verdict.count() == len(pdf)
