"""Multimodal column operators: decode / resize / stats / frame-sample.

Media payloads are opaque ``binary`` columns with typed metadata (the
input-table shape mandated by BASELINE.json ``input_hint``). Everything
here is ``mapInPandas`` over Arrow batches — schema, partitioning and batch
shape are the real cluster-scale plumbing; the *codec* layer is pluggable:

- images: REAL — the engine ships pure-numpy png/bmp/quantized-jpg codecs
  (fixtures/codecs.py), so decode/resize/stats run end-to-end in tests.
- audio: REAL for RIFF/WAVE PCM (stdlib ``wave`` + numpy, 8/16/32-bit,
  multi-channel to mono); other containers stubbed (no libsndfile here).
- video: REAL for uncompressed 24-bit RGB AVI (RIFF parse + BI_RGB DIB
  frames, fixtures/codecs.decode_avi_rgb); compressed containers stubbed
  (no ffmpeg here). Stubbed paths raise ``NotImplementedError`` in strict
  mode or produce a clearly-marked deterministic fake (hash-seeded)
  otherwise — the Spark-side contract (schemas, vectorized batching,
  per-row error handling) is identical either way.

Arrow batch sizing note: decoded pixel rows are ~W*H*3 bytes; the session
caps ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
decoded frames stays well under executor memory (session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import malloc_tuning  # noqa: F401 (worker-side mallopt)
from ..fixtures import codecs
from ..fixtures.codecs import psnr  # noqa: F401  (re-export for callers)

DECODED_SCHEMA = (
    "image_id string, w int, h int, status string, pixels binary"
)
RESIZED_SCHEMA = "image_id string, w int, h int, status string, bytes binary"
STATS_SCHEMA = (
    "image_id string, status string, mean_r double, mean_g double, "
    "mean_b double, std_gray double"
)
AUDIO_FEATURES_SCHEMA = (
    "audio_id string, status string, n_samples long, sample_rate long, "
    "rms double, zero_crossings long"
)
FRAMES_SCHEMA = "video_id string, frame_idx int, status string, bytes binary"


def decode_images(images: DataFrame) -> DataFrame:
    """(image_id, bytes, ...) -> decoded raw RGB rows.

    pixels = H*W*3 uint8 buffer (row-major); undecodable rows get
    status='unreadable' with NULL pixels instead of failing the task —
    the permissive-mode analogue of the reference's per-subtree error
    swallowing (Common/FsUtils.cs:56-112)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px = codecs.decode(bytes(data) if data is not None else None)
                    out.append((img_id, px.shape[1], px.shape[0], "ok",
                                px.tobytes()))
                except ValueError:
                    out.append((img_id, 0, 0, "unreadable", None))
            yield pd.DataFrame(
                out, columns=["image_id", "w", "h", "status", "pixels"]
            )

    return images.select("image_id", "bytes").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def resize_images(images: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Thumbnail pass: decode -> area-mean resample -> re-encode png."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.phash import _area_mean_resample

        for pdf in batches:
            out = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px = codecs.decode(bytes(data) if data is not None else None)
                    resized = np.stack(
                        [
                            _area_mean_resample(
                                px[:, :, c].astype(np.float64), out_h, out_w
                            )
                            for c in range(3)
                        ],
                        axis=2,
                    )
                    thumb = codecs.encode(
                        np.clip(resized, 0, 255).astype(np.uint8), "png"
                    )
                    out.append((img_id, out_w, out_h, "ok", thumb))
                except ValueError:
                    out.append((img_id, 0, 0, "unreadable", None))
            yield pd.DataFrame(
                out, columns=["image_id", "w", "h", "status", "bytes"]
            )

    return images.select("image_id", "bytes").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def image_stats(images: DataFrame) -> DataFrame:
    """Per-image channel means + grayscale std — feature-extraction shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px = codecs.decode(
                        bytes(data) if data is not None else None
                    ).astype(np.float64)
                    gray = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
                    out.append(
                        (img_id, "ok", float(px[:, :, 0].mean()),
                         float(px[:, :, 1].mean()), float(px[:, :, 2].mean()),
                         float(gray.std()))
                    )
                except ValueError:
                    out.append((img_id, "unreadable", None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=["image_id", "status", "mean_r", "mean_g", "mean_b",
                         "std_gray"],
            )

    return images.select("image_id", "bytes").mapInPandas(
        run, schema=STATS_SCHEMA
    )


# ------------------------------------------------------------ audio / video


def _fake_waveform(seed_key: str, n: int = 4096) -> np.ndarray:
    """Deterministic FAKE decode (clearly marked): hash-seeded waveform.

    Stands in for a real libsndfile/ffmpeg decode, which is unavailable in
    this environment. Same (audio_id, bytes) -> same waveform."""
    h = hashlib.blake2b(seed_key.encode(), digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "little"))
    return rng.standard_normal(n).astype(np.float32)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """REAL RIFF/WAVE PCM decode via the stdlib ``wave`` module (public
    API, no external codec): returns (mono float32 waveform in [-1, 1],
    sample_rate). 8-bit unsigned / 16-bit / 32-bit signed PCM; channels
    are averaged to mono. Raises on anything wave can't parse."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(bytes(data)), "rb") as w:
        sw = w.getsampwidth()
        ch = w.getnchannels()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 1:  # WAV 8-bit is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        arr = arr[: len(arr) - len(arr) % ch].reshape(-1, ch).mean(axis=1)
        arr = arr.astype(np.float32)
    return arr, sr


def audio_features(audio: DataFrame, strict: bool = False) -> DataFrame:
    """(audio_id, bytes) -> per-clip rms / zero-crossing / rate features.

    RIFF/WAVE PCM payloads are REALLY decoded (stdlib ``wave`` + numpy —
    status 'ok'; truncated/corrupt RIFF -> 'broken'). Other containers
    (mp3/flac/ogg...) need codec libraries absent from this environment:
    strict=True raises NotImplementedError for them inside the task,
    strict=False substitutes the clearly-marked deterministic fake
    ('fake_decode') so the distributed plumbing stays testable end-to-end.

    Scale shape: same as decode_images — one mapInPandas pass, bytes never
    enter a shuffle, output is a skinny feature frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                if data is None:
                    out.append((aid, "unreadable", None, None, None, None))
                    continue
                b = bytes(data)
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    try:
                        wave, sr = decode_wav(b)
                    except Exception:
                        out.append((aid, "broken", None, None, None, None))
                        continue
                    status = "ok"
                elif strict:
                    raise NotImplementedError(
                        "non-WAV audio decode requires an external codec "
                        "library (e.g. libsndfile/ffmpeg); not available "
                        "in this environment"
                    )
                else:
                    wave = _fake_waveform(f"{aid}:{len(b)}")
                    sr, status = None, "fake_decode"
                zc = int(np.count_nonzero(np.diff(np.signbit(wave))))
                rms = float(np.sqrt((wave ** 2).mean())) if len(wave) else 0.0
                out.append((aid, status, len(wave), sr, rms, zc))
            yield pd.DataFrame(
                out,
                columns=["audio_id", "status", "n_samples", "sample_rate",
                         "rms", "zero_crossings"],
            )

    return audio.select("audio_id", "bytes").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def video_frame_sample(
    video: DataFrame, n_frames: int = 4, strict: bool = False
) -> DataFrame:
    """(video_id, bytes) -> sampled frame rows (one output row per frame,
    frame payloads re-encoded with the real png codec so downstream image
    operators — decode/phash/pixel-exact dedup — compose directly).

    Uncompressed 24-bit RGB AVI payloads (RIFF 'AVI ', BI_RGB '00db'
    frames) are REALLY decoded (fixtures/codecs.decode_avi_rgb, pure
    struct+numpy over the public RIFF/AVI layout): up to ``n_frames``
    frames sampled at even stride, status 'ok', frame_idx = the frame's
    index in the source stream. Corrupt/truncated RIFF or a compressed
    fourcc -> one 'broken' row. Other containers (mp4/mkv/webm...) need
    ffmpeg-like tooling absent here: strict=True raises inside the task,
    strict=False emits the clearly-marked deterministic fake frames.

    Row-expanding UDTF-shaped mapInPandas; bytes never enter a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                if data is None:
                    out.append((vid, -1, "unreadable", None))
                    continue
                b = bytes(data)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    try:
                        frames = codecs.decode_avi_rgb(b)
                    except Exception:
                        out.append((vid, -1, "broken", None))
                        continue
                    n = len(frames)
                    take = (
                        range(n)
                        if n <= n_frames
                        else [k * n // n_frames for k in range(n_frames)]
                    )
                    for idx in take:
                        out.append(
                            (vid, idx, "ok",
                             codecs.encode(frames[idx], "png"))
                        )
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-AVI video decode requires an external codec "
                        "library (ffmpeg); not available in this "
                        "environment"
                    )
                for k in range(n_frames):
                    h = hashlib.blake2b(
                        f"{vid}:{k}".encode(), digest_size=8
                    ).digest()
                    rng = np.random.default_rng(int.from_bytes(h, "little"))
                    frame = rng.integers(
                        0, 256, size=(16, 16, 3), dtype=np.uint8
                    )
                    out.append(
                        (vid, k, "fake_decode", codecs.encode(frame, "png"))
                    )
            yield pd.DataFrame(
                out, columns=["video_id", "frame_idx", "status", "bytes"]
            )

    return video.select("video_id", "bytes").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )
