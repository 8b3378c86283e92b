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


def test_audio_stub(spark):
    audio = spark.createDataFrame(
        [("a1", b"\x00" * 64), ("a2", b"\x01" * 64), ("a3", None)],
        "audio_id string, bytes binary",
    )
    with pytest.raises(NotImplementedError):
        audio_features(audio, strict=True)
    rows = {r["audio_id"]: r for r in audio_features(audio).collect()}
    assert rows["a1"]["status"] == "fake_decode"
    assert rows["a1"]["n_samples"] == 4096
    assert rows["a3"]["status"] == "unreadable"
    # deterministic: rerun yields identical features
    rows2 = {r["audio_id"]: r for r in audio_features(audio).collect()}
    assert rows["a1"]["rms"] == rows2["a1"]["rms"]


def test_video_frames_compose_with_image_ops(spark):
    video = spark.createDataFrame(
        [("v1", b"fakevideo1"), ("v2", b"fakevideo2")],
        "video_id string, bytes binary",
    )
    with pytest.raises(NotImplementedError):
        video_frame_sample(video, strict=True)
    frames = video_frame_sample(video, n_frames=3)
    assert frames.count() == 6
    # frames are real png payloads: the image decode operator runs on them
    as_images = frames.select(
        F.concat_ws("#", "video_id", "frame_idx").alias("image_id"), "bytes"
    )
    decoded = decode_images(as_images)
    assert decoded.filter(F.col("status") == "ok").count() == 6
