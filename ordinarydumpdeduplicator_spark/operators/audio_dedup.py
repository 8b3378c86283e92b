"""Audio near-duplicate detection: per-segment spectral hashes ->
banded LSH -> verified segment-match fraction -> CC -> tier report.

The audio twin of operators/video_dedup.py, on the same
modality-agnostic core (operators/segment_dedup.py). Tier families:

  exact          byte-identical file (sha256 over the raw payload)
  segment_exact  identical ordered segment-hash signature — the same
                 recording re-encoded at a different PCM width (or
                 volume-normalized): container bytes differ, the
                 spectral SHAPE per segment doesn't
  segment_near   verified near duplicate — trimmed, lightly noised, or
                 partially overlapping recordings

The per-segment 64-bit hash follows the Haitsma-Kalker audio
fingerprinting idea (ISMIR 2002, public): threshold the SIGN of
band-energy differences across adjacent frequency bands, which is
invariant to amplitude scaling and robust to re-quantization — each
decoded segment's magnitude spectrum is folded into 65 geometrically
spaced bands and bit b = E[b] > E[b+1]. (The video chain's pHash plays
the same role per frame.)

Codec layer matches operators/multimodal.audio_features: RIFF/WAVE PCM
is REALLY decoded (stdlib ``wave`` + numpy, 8/16/32-bit, multi-channel
to mono); other containers (mp3/flac/ogg...) need codec libraries
absent here — strict=True raises inside the task, strict=False emits
clearly-marked deterministic fake segment hashes (status 'fake_decode';
hash-seeded per clip, so fakes never cross-match).

Scale shape: ONE mapInPandas pass over the payload column (bytes never
shuffle; only id + <= n_segments int64 hashes do); everything after is
the segment_dedup built-ins core — banded LSH with bucket caps,
codegen bit_count verify, CC over an edge frame orders of magnitude
below corpus size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .multimodal import decode_wav
from .segment_dedup import segment_dedup_report, tier_precedence

AUDIO_FP_SCHEMA = (
    "audio_id string, status string, file_sha string, "
    "n_samples int, segment_hashes array<long>"
)

AUDIO_TIER_PRECEDENCE = tier_precedence("segment")


def spectral_hash64(segment: np.ndarray) -> int:
    """64-bit Haitsma-Kalker-style spectral-shape hash of one waveform
    segment: magnitude spectrum -> 65 geometrically spaced bands ->
    bit b = E[b] > E[b+1] (signed int64, Spark LongType friendly).

    Amplitude-scale invariant (E ratios only) and stable under
    re-quantization noise; an all-silence segment hashes to 0."""
    n = len(segment)
    if n < 66:
        return 0
    mag = np.abs(np.fft.rfft(segment.astype(np.float64)))
    # geometric band edges over bins [1, n_bins) — skip DC; geometric
    # spacing weights the perceptually denser low end like a mel scale
    n_bins = len(mag)
    edges = np.unique(
        np.round(np.geomspace(1, n_bins - 1, num=66)).astype(np.int64)
    )
    if len(edges) < 66:  # short segments: fall back to linear edges
        edges = np.unique(np.linspace(1, n_bins - 1, num=66).astype(np.int64))
        if len(edges) < 66:
            return 0
    e = np.add.reduceat(mag, edges[:-1])
    bits = e[:-1] > e[1:]
    packed = np.packbits(bits[:64], bitorder="little")
    return int(np.frombuffer(packed.tobytes(), dtype="<i8")[0])


def audio_fingerprints(
    audio: DataFrame,
    n_segments: int = 8,
    seg_len: int = 2048,
    strict: bool = False,
) -> DataFrame:
    """(audio_id, bytes) -> one skinny fingerprint row per clip: sha256
    of the raw payload + up to ``n_segments`` evenly-strided
    FIXED-LENGTH (``seg_len`` samples) segment spectral hashes over the
    decoded mono waveform.

    Fixed-length segments — not an equal split of the clip — so a copy
    trimmed at segment granularity keeps its surviving segments
    bit-aligned with the original's (the same reason the video chain
    hashes whole frames): equal-count segmentation would move every
    boundary when the clip length changes, decorrelating all hashes.
    Fixed length also pins the FFT size and band edges.

    status: ok | broken (valid RIFF/WAVE magic, corrupt body) |
    unreadable (NULL payload) | fake_decode (non-WAV, strict=False)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                if data is None:
                    out.append((aid, "unreadable", None, None, None))
                    continue
                b = bytes(data)
                sha = hashlib.sha256(b).hexdigest()
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    try:
                        wave, _sr = decode_wav(b)
                    except Exception:
                        out.append((aid, "broken", sha, None, None))
                        continue
                    n = len(wave)
                    n_total = n // seg_len
                    if n_total < 1:
                        # shorter than one segment: hash what's there
                        hashes = [spectral_hash64(wave)]
                    else:
                        take = (
                            range(n_total)
                            if n_total <= n_segments
                            else [
                                k * n_total // n_segments
                                for k in range(n_segments)
                            ]
                        )
                        hashes = [
                            spectral_hash64(
                                wave[i * seg_len:(i + 1) * seg_len]
                            )
                            for i in take
                        ]
                    out.append((aid, "ok", sha, n, hashes))
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-WAV audio decode requires an external codec "
                        "library (e.g. libsndfile/ffmpeg); not available "
                        "in this environment"
                    )
                fake = []
                for k in range(n_segments):
                    h = hashlib.blake2b(
                        f"{aid}:{k}".encode(), digest_size=8
                    ).digest()
                    fake.append(int.from_bytes(h, "little", signed=True))
                out.append((aid, "fake_decode", sha, None, fake))
            # explicit nullable Int32: pandas would otherwise coerce a
            # [None, int] column to float64
            yield pd.DataFrame(
                {
                    "audio_id": [r[0] for r in out],
                    "status": [r[1] for r in out],
                    "file_sha": [r[2] for r in out],
                    "n_samples": pd.array(
                        [r[3] for r in out], dtype="Int32"
                    ),
                    "segment_hashes": [r[4] for r in out],
                }
            )

    return audio.select("audio_id", "bytes").mapInPandas(
        run, schema=AUDIO_FP_SCHEMA
    )


def audio_dedup_report(
    audio: DataFrame,
    n_segments: int = 8,
    seg_len: int = 2048,
    bands: int = 4,
    max_hamming: int = 6,
    min_match_frac: float = 0.5,
    bucket_cap: int = 64,
    strict: bool = False,
    fingerprints: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """End-to-end audio dedup: fingerprints, tagged edges, cluster
    assignment for EVERY clip (singletons -> themselves), per-clip tier
    attribution (exact / segment_exact / segment_near / canonical /
    unique). ``fingerprints``: pass a materialized fingerprint stage to
    skip the decode pass (production reuse)."""
    fps = (
        fingerprints
        if fingerprints is not None
        else audio_fingerprints(
            audio, n_segments=n_segments, seg_len=seg_len, strict=strict
        )
    )
    return segment_dedup_report(
        fps,
        id_col="audio_id",
        hashes_col="segment_hashes",
        prefix="segment",
        bands=bands,
        max_hamming=max_hamming,
        min_match_frac=min_match_frac,
        bucket_cap=bucket_cap,
    )
