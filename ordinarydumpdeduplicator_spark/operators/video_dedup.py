"""Video near-duplicate detection: frame fingerprints -> banded LSH ->
verified frame-match fraction -> connected components -> tier report.

The reference hashes every file as one opaque byte stream
(Common/FsUtils.cs:39-54), so a re-muxed or re-encoded video — same
frames, different container bytes — is invisible to its dedup. This
module extends the tier cascade (operators/tiers.py) to the video
modality over REAL decoded frames:

  exact        byte-identical file (sha256 over the raw payload; broken
               payloads still hash — reference semantics: unparseable
               content still has identity)
  frame_exact  identical ordered frame-pHash signature (re-mux / fps
               change / lossless re-encode: headers differ, frames don't)
  frame_near   verified near duplicate — banded frame-pHash LSH
               candidates, symmetric frame-match fraction >= threshold
               (catches trimmed, noised, or lightly re-quantized copies)

Codec layer matches operators/multimodal.video_frame_sample: uncompressed
24-bit RGB AVI is REALLY decoded (fixtures/codecs.decode_avi_rgb, pure
struct + numpy over the public RIFF layout); other containers need
ffmpeg-like tooling absent here — strict=True raises inside the task,
strict=False emits clearly-marked deterministic fake frame hashes
(status 'fake_decode'; hash-seeded per video, so fakes never cross-match).

Scale shape (the 100 TB question): fingerprinting is ONE mapInPandas
pass over the payload column — bytes never enter a shuffle; only
(video_id, <= n_frames int64 hashes) does, a ~100-byte row regardless of
video size. Candidates come through lsh.pairs_from_buckets (bucket caps
with star-edge fallback + `capped` marker), so pair volume is bounded;
each 64-bit frame hash splits into ``bands`` sub-keys, guaranteeing any
frame pair within Hamming < bands shares a bucket (pigeonhole) and
probabilistically catching more. Verify cost is linear in the candidate
count (<= n_frames^2 64-bit XORs per pair, pure built-ins inside
whole-stage codegen — no Python in the verify hot path).
The CC edge frame is orders of magnitude below corpus size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fixtures import codecs
from ..functions.phash import phash64
from .connected_components import connected_components
from .lsh import pairs_from_buckets
from .tiers import tier_attribution

VIDEO_FP_SCHEMA = (
    "video_id string, status string, file_sha string, "
    "n_frames_total int, frame_hashes array<long>"
)

# strongest identity first — same contract as tiers.IMAGE_TIER_PRECEDENCE
VIDEO_TIER_PRECEDENCE = ["exact", "frame_exact", "frame_near"]


def video_fingerprints(
    video: DataFrame, n_frames: int = 8, strict: bool = False
) -> DataFrame:
    """(video_id, bytes) -> one skinny fingerprint row per video:
    sha256 of the raw payload + up to ``n_frames`` evenly-strided
    frame pHashes (functions/phash.phash64 over each decoded frame).

    status: ok | broken (valid magic, corrupt body) | unreadable (NULL
    payload) | fake_decode (non-AVI container, strict=False).

    Everything downstream (banding, verify, CC) runs on this frame, so
    the multi-MB payload column is read exactly once and never shuffled.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                if data is None:
                    out.append((vid, "unreadable", None, None, None))
                    continue
                b = bytes(data)
                sha = hashlib.sha256(b).hexdigest()
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    try:
                        frames = codecs.decode_avi_rgb(b)
                    except Exception:
                        out.append((vid, "broken", sha, None, None))
                        continue
                    n = len(frames)
                    take = (
                        range(n)
                        if n <= n_frames
                        else [k * n // n_frames for k in range(n_frames)]
                    )
                    hashes = [phash64(frames[i]) for i in take]
                    out.append((vid, "ok", sha, n, hashes))
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-AVI video decode requires an external codec "
                        "library (ffmpeg); not available in this "
                        "environment"
                    )
                fake = []
                for k in range(n_frames):
                    h = hashlib.blake2b(
                        f"{vid}:{k}".encode(), digest_size=8
                    ).digest()
                    fake.append(int.from_bytes(h, "little", signed=True))
                out.append((vid, "fake_decode", sha, n_frames, fake))
            # explicit nullable Int32: pandas would otherwise coerce a
            # [None, int] column to float64 (see verify-skill gotcha)
            yield pd.DataFrame(
                {
                    "video_id": [r[0] for r in out],
                    "status": [r[1] for r in out],
                    "file_sha": [r[2] for r in out],
                    "n_frames_total": pd.array(
                        [r[3] for r in out], dtype="Int32"
                    ),
                    "frame_hashes": [r[4] for r in out],
                }
            )

    return video.select("video_id", "bytes").mapInPandas(
        run, schema=VIDEO_FP_SCHEMA
    )


def _band_slices(h, bands: int):
    """array<struct<band,key>>: a 64-bit hash split into ``bands``
    disjoint bit slices. Two hashes within Hamming < bands share at
    least one slice (pigeonhole). Pure built-ins
    (shiftrightunsigned/AND), whole-stage codegen."""
    assert 64 % bands == 0, "bands must divide 64"
    width = 64 // bands
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(h, b * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )


def frame_band_rows(fps: DataFrame, bands: int = 4) -> DataFrame:
    """Fingerprints -> distinct (video_id, band, key) LSH rows: every
    sampled frame hash split into ``bands`` disjoint bit slices
    (candidate recall guaranteed within Hamming < bands, see
    _band_slices). Frame position is deliberately NOT part of the key —
    a trimmed copy's surviving frames still collide. distinct bounds a
    video's bucket contributions."""
    return (
        fps.filter(F.col("frame_hashes").isNotNull())
        .select("video_id", F.explode("frame_hashes").alias("h"))
        .select("video_id", F.explode(_band_slices(F.col("h"), bands)).alias("s"))
        .select("video_id", F.col("s.band").alias("band"),
                F.col("s.key").alias("key"))
        .distinct()
    )


def _match_frac_expr(ha, hb, max_hamming: int):
    """Column expression: symmetric frame-match fraction
    (|a-frames with a Hamming<=r match in b| + |b-frames with a match in
    a|) / (|a| + |b|). Robust to trims and frame drops — an identical
    copy scores 1.0, a half-trimmed copy ~2/3.

    Pure built-ins (higher-order array filter/exists + bit_count on the
    XOR), so the verify stays inside whole-stage codegen — no Arrow
    round-trip for <= n_frames^2 64-bit popcounts per pair."""
    ha, hb = F.col(ha) if isinstance(ha, str) else ha, (
        F.col(hb) if isinstance(hb, str) else hb
    )
    r = F.lit(max_hamming)

    def matched(xs, ys):
        return F.size(
            F.filter(
                xs, lambda x: F.exists(ys, lambda y: F.bit_count(x.bitwiseXOR(y)) <= r)
            )
        )

    return (matched(ha, hb) + matched(hb, ha)) / (F.size(ha) + F.size(hb))


def video_near_pairs(
    fps: DataFrame,
    bands: int = 4,
    max_hamming: int = 6,
    min_match_frac: float = 0.5,
    bucket_cap: int = 64,
) -> DataFrame:
    """Fingerprints -> verified near-dup pairs
    (src, dst, match_frac, capped), src < dst.

    Candidate generation reuses lsh.pairs_from_buckets (hash-agg bucket
    stats, caps + star-edge fallback, shuffle-hash self-join — the exact
    machinery the text/caption chains run at scale); verification joins
    the two skinny hash arrays back and scores each pair with built-in
    higher-order array expressions (codegen; zero UDFs). The fingerprint frame is tiny relative
    to any real corpus, so AQE broadcasts it into the verify joins."""
    cand = pairs_from_buckets(
        frame_band_rows(fps, bands=bands),
        id_col="video_id",
        bucket_cap=bucket_cap,
    )
    sig = fps.filter(F.col("frame_hashes").isNotNull()).select(
        "video_id", "frame_hashes"
    )
    a = sig.select(
        F.col("video_id").alias("src"), F.col("frame_hashes").alias("ha")
    )
    b = sig.select(
        F.col("video_id").alias("dst"), F.col("frame_hashes").alias("hb")
    )
    return (
        cand.join(a, "src")
        .join(b, "dst")
        .withColumn(
            "match_frac", _match_frac_expr("ha", "hb", max_hamming)
        )
        .filter(F.col("match_frac") >= min_match_frac)
        .select("src", "dst", "match_frac", "capped")
    )


def _star_edges(
    rows: DataFrame, key_cols: list[str], kind: str
) -> DataFrame:
    """Star edges (hub member -> member) within each multi-member group
    keyed by ``key_cols`` — the linear-size clique representation.

    Hub selection is a TWO-phase numeric aggregate: ``min(string)`` has a
    var-length aggregation buffer, which forces SortAggregate — a
    per-partition sort of the ENTIRE fingerprint frame by the group key
    (measured in the executed plan). Aggregating ``min(xxhash64(id))``
    stays HashAggregate; the hub's actual id string is then resolved on
    the hash-min candidate frame (~1 row per multi-member group, min(id)
    tie-breaks the negligible within-group hash collisions — its
    SortAggregate touches only that tiny frame). The hub choice is
    arbitrary-but-deterministic; connected components relabels with the
    component-min id regardless, so cluster output is hub-invariant.
    Explicit repartition on the key feeds the aggregate and both join
    probes from ONE exchange (exact_dedup.exact_clusters' pattern)."""
    rows = rows.withColumn("_h", F.xxhash64("video_id")).repartition(
        *key_cols
    )
    groups = (
        rows.groupBy(*key_cols)
        .agg(F.min("_h").alias("_hmin"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    hubs = (
        rows.join(groups.hint("shuffle_hash"), key_cols)
        .filter(F.col("_h") == F.col("_hmin"))
        .groupBy(*key_cols)
        .agg(F.min("video_id").alias("mn"))
    )
    return (
        rows.join(hubs.hint("shuffle_hash"), key_cols)
        .filter(F.col("video_id") != F.col("mn"))
        .select(
            F.col("mn").alias("src"),
            F.col("video_id").alias("dst"),
            F.lit(kind).alias("kind"),
        )
    )


def video_edges(fps: DataFrame, **near_kwargs) -> DataFrame:
    """All three edge families over one fingerprint frame, tagged with
    `kind` for tier attribution (precedence: VIDEO_TIER_PRECEDENCE)."""
    exact = _star_edges(
        fps.filter(F.col("file_sha").isNotNull()).select(
            "video_id", "file_sha"
        ),
        ["file_sha"],
        "exact",
    )
    # ordered frame signature: ',' never occurs in a decimal int64, so
    # concat_ws is injective on hash sequences
    frame_sig = fps.filter(F.col("status") == "ok").select(
        "video_id",
        F.sha2(
            F.concat_ws(
                ",",
                F.transform(F.col("frame_hashes"), lambda x: x.cast("string")),
            ),
            256,
        ).alias("sig"),
    )
    frame_exact = _star_edges(frame_sig, ["sig"], "frame_exact")
    near = video_near_pairs(
        fps.filter(F.col("status") == "ok"), **near_kwargs
    ).select("src", "dst", F.lit("frame_near").alias("kind"))
    return exact.unionByName(frame_exact).unionByName(near)


def video_dedup_report(
    video: DataFrame,
    n_frames: int = 8,
    bands: int = 4,
    max_hamming: int = 6,
    min_match_frac: float = 0.5,
    bucket_cap: int = 64,
    strict: bool = False,
    fingerprints: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """End-to-end video dedup: fingerprints, tagged edges, cluster
    assignment for EVERY video (singletons -> themselves), and per-video
    tier attribution (exact / frame_exact / frame_near / canonical /
    unique) — the video-modality twin of plans/pipeline.NearDupPipeline.

    ``fingerprints``: pass a materialized fingerprint frame to skip the
    decode pass (production reuse — at 100x the fingerprint stage is
    always a checkpointed pipeline stage, exactly like
    tiers.dedup_tier_stats' `clusters=` parameter).

    Returns {"fingerprints", "edges", "clusters", "tiers"}; clusters is
    (video_id, cluster_id, is_dup)."""
    if fingerprints is not None:
        fps = fingerprints
    else:
        # LAZY cut: the fingerprint frame feeds SIX consumers (exact +
        # frame_exact group keys, band rows, both verify join sides, the
        # clusters left side) — without it each consumer re-runs the
        # decode+phash mapInPandas pass (same rationale as
        # lsh.pairs_from_buckets' checkpoint; production passes a
        # materialized `fingerprints=` stage instead)
        fps = video_fingerprints(
            video, n_frames=n_frames, strict=strict
        ).localCheckpoint(eager=False)
    # edges also feeds two consumers (CC + tier attribution) — without a
    # cut the LSH->verify chain executes once per consumer (seen in the
    # executed plan as duplicated aggregate subtrees)
    edges = video_edges(
        fps,
        bands=bands,
        max_hamming=max_hamming,
        min_match_frac=min_match_frac,
        bucket_cap=bucket_cap,
    ).localCheckpoint(eager=False)
    assign = connected_components(edges.select("src", "dst"))
    assign = assign.select(
        F.col("image_id").alias("video_id"), "cluster_id"
    )
    clusters = (
        fps.select("video_id")
        .join(assign, "video_id", "left")
        .select(
            "video_id",
            F.coalesce("cluster_id", "video_id").alias("cluster_id"),
            F.col("cluster_id").isNotNull().alias("is_dup"),
        )
    )
    tiers = tier_attribution(
        clusters, edges, VIDEO_TIER_PRECEDENCE, id_col="video_id"
    )
    return {
        "fingerprints": fps,
        "edges": edges,
        "clusters": clusters,
        "tiers": tiers,
    }


def frames_matching_images(
    fps: DataFrame,
    images: DataFrame,
    bands: int = 4,
    max_hamming: int = 4,
    image_bucket_cap: int = 1024,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """Cross-modal containment probe: which corpus IMAGES appear as
    (near-)frames of which VIDEOS — the dedup question a multimodal
    training pipeline asks before keeping both a video and stills
    extracted from it.

    fps: video_fingerprints output (or a materialized fingerprint
    stage); images: any frame with (id_col, phash_col) — the corpus
    images table already carries phash (schemas.IMAGES_SCHEMA).

    Output: (video_id, frame_pos, image_id, hamming) — one row per
    matching (sampled frame, image) pair with Hamming(frame_phash,
    image_phash) <= max_hamming. frame_pos is the SAMPLE position
    (0..n_frames-1), not the source frame index.

    Scale shape: both sides band into (band, key) buckets via
    _band_slices (recall guaranteed within Hamming < bands); the
    image side is capped per bucket with a min-id witness — the
    cross_dedup.cross_corpus_matches cap rule: a hash-aggregate joined
    back, never a window, so nothing sorts the band frames. The verify
    is bit_count over the XOR (codegen, zero UDFs), and only
    cross-side pairs are ever generated."""
    v_rows = (
        fps.filter(F.col("frame_hashes").isNotNull())
        .select(
            "video_id",
            F.posexplode("frame_hashes").alias("frame_pos", "h"),
        )
        .select(
            "video_id", "frame_pos", "h",
            F.explode(_band_slices(F.col("h"), bands)).alias("s"),
        )
        .select("video_id", "frame_pos", "h",
                F.col("s.band").alias("band"), F.col("s.key").alias("key"))
    )
    i_rows = (
        images.filter(F.col(phash_col).isNotNull())
        .select(
            F.col(id_col).alias("image_id"),
            F.col(phash_col).alias("ph"),
            F.explode(_band_slices(F.col(phash_col), bands)).alias("s"),
        )
        .select("image_id", "ph",
                F.col("s.band").alias("band"), F.col("s.key").alias("key"))
        # two consumers (bucket stats + join back) — cut so the explode
        # chain computes once
        .localCheckpoint(eager=False)
    )
    i_stats = i_rows.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("n"), F.min("image_id").alias("mn")
    )
    i_capped = (
        i_rows.join(i_stats, ["band", "key"])
        .filter(
            (F.col("n") <= image_bucket_cap)
            | (F.col("image_id") == F.col("mn"))
        )
        .select("band", "key", "image_id", "ph")
    )
    return (
        v_rows.join(i_capped.hint("shuffle_hash"), ["band", "key"])
        .filter(
            F.bit_count(F.col("h").bitwiseXOR(F.col("ph"))) <= max_hamming
        )
        .select(
            "video_id",
            "frame_pos",
            "image_id",
            F.bit_count(F.col("h").bitwiseXOR(F.col("ph"))).alias("hamming"),
        )
        .dropDuplicates(["video_id", "frame_pos", "image_id"])
    )
