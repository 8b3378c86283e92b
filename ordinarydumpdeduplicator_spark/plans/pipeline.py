"""End-to-end near-duplicate pipeline with per-stage checkpoint + metrics.

Reference lifecycle analogue (SURVEY.md §3): the reference persists every
intermediate entity during a scan (AddDirectory/AddFileState/AddBlobInfo —
OrdinaryDumpDeduplicator.cs:90,98,154,183), which is exactly stage-level
checkpointing; a re-run resumes from what is already stored. Here each
stage writes a parquet table under ``checkpoint_dir`` and is SKIPPED if its
``_SUCCESS`` marker exists (idempotent, resumable mid-pipeline), with one
metrics row per stage (rows_out, wall seconds) — the north rule's
"per-partition lineage + metrics" requirement. In a production deployment
the same writes target Iceberg tables (sources/iceberg.py).

Stages:
    features   one pass over `bytes` -> compact features (operators/features)
    edges      exact star edges + LSH candidates + verification
    cc         connected components fixpoint
    clusters   final assignment incl. singletons + report frames
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.connected_components import connected_components
from ..operators.exact_dedup import exact_edges, readable
from ..operators.features import extract_features
from ..operators.lsh import caption_candidates, phash_candidates
from ..operators.verify import verify_caption_pairs, verify_phash_pairs


@dataclass
class PipelineConfig:
    checkpoint_dir: str | None = None  # None -> in-memory cache() only
    bucket_cap: int = 256
    phash_band_mode: str = "c2x16"
    hamming_threshold: int = 8
    jaccard_threshold: float = 0.5
    run_id: str = "run_0"
    metrics: list[dict] = field(default_factory=list)


class NearDupPipeline:
    def __init__(self, spark: SparkSession, config: PipelineConfig | None = None):
        self.spark = spark
        self.cfg = config or PipelineConfig()

    # ------------------------------------------------------------ plumbing

    def _stage_path(self, stage: str) -> str | None:
        if self.cfg.checkpoint_dir is None:
            return None
        return os.path.join(self.cfg.checkpoint_dir, self.cfg.run_id, stage)

    def _stage(self, stage: str, build) -> DataFrame:
        """Run (or resume) one stage: if checkpointed output exists, read it
        back instead of recomputing — mid-pipeline resumability."""
        path = self._stage_path(stage)
        t0 = time.time()
        if path is not None:
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                df = self.spark.read.parquet(path)
                self._record(stage, "resumed", None, time.time() - t0)
                return df
            df = build()
            df.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
            self._record(stage, "complete", out.count(), time.time() - t0)
            return out
        df = build().cache()
        self._record(stage, "complete", df.count(), time.time() - t0)
        return df

    def _record(self, stage: str, status: str, rows, wall: float) -> None:
        self.cfg.metrics.append(
            dict(
                run_id=self.cfg.run_id,
                stage=stage,
                status=status,
                rows_out=rows,
                wall_sec=round(wall, 3),
            )
        )

    def write_metrics(self) -> None:
        if self.cfg.checkpoint_dir is None:
            return
        path = os.path.join(self.cfg.checkpoint_dir, self.cfg.run_id, "metrics.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.cfg.metrics, f, indent=2)

    # -------------------------------------------------------------- stages

    def features(self, images: DataFrame) -> DataFrame:
        return self._stage("features", lambda: extract_features(images))

    def edges(self, images: DataFrame, features: DataFrame) -> DataFrame:
        def build() -> DataFrame:
            ex = exact_edges(features)
            # The two candidate families are INDEPENDENT chains of jobs
            # (band explode -> bucket stats -> checkpoint -> pair join), so
            # each builds in its own thread: the Spark scheduler
            # interleaves their stages and fills the cluster instead of
            # running two half-idle shuffle chains back to back. The
            # verify stage stays OUT of this phase — fusing JVM shuffles
            # with Python UDF stages double-books every core of a
            # local[n_cores] run with a task thread AND a Python worker
            # (measured ~2.4x edges wall).
            from concurrent.futures import ThreadPoolExecutor

            def build_captions():
                pairs, star = caption_candidates(
                    features, bucket_cap=self.cfg.bucket_cap
                )
                return pairs.localCheckpoint(), star

            def build_phash():
                pairs, star = phash_candidates(
                    features,
                    mode=self.cfg.phash_band_mode,
                    bucket_cap=self.cfg.bucket_cap,
                )
                return pairs.localCheckpoint(), star

            with ThreadPoolExecutor(2) as tp:
                cap_f = tp.submit(build_captions)
                ph_f = tp.submit(build_phash)
                cap_pairs, cap_star = cap_f.result()
                ph_pairs, ph_star = ph_f.result()
            cap_near = verify_caption_pairs(
                cap_pairs, images, jaccard_threshold=self.cfg.jaccard_threshold
            )
            ph_near = verify_phash_pairs(
                ph_pairs, features, hamming_threshold=self.cfg.hamming_threshold
            )
            return (
                ex.unionByName(cap_star)
                .unionByName(ph_star)
                .unionByName(cap_near)
                .unionByName(ph_near)
            )

        return self._stage("edges", build)

    def components(self, edges: DataFrame) -> DataFrame:
        cc_stats: dict = {}
        out = self._stage(
            "cc",
            lambda: connected_components(
                edges.select("src", "dst"), stats=cc_stats
            ),
        )
        if cc_stats:  # convergence telemetry onto the stage metrics row
            self.cfg.metrics[-1].update(cc_stats)
        return out

    def clusters(self, features: DataFrame, assignments: DataFrame) -> DataFrame:
        """Final per-image cluster assignment. Singleton readable images get
        cluster_id = their own id (is_dup = false)."""

        def build() -> DataFrame:
            base = readable(features).select("image_id", "size", "sha")
            joined = base.join(assignments, "image_id", "left")
            return joined.select(
                "image_id",
                F.coalesce("cluster_id", "image_id").alias("cluster_id"),
                F.col("cluster_id").isNotNull().alias("is_dup"),
                "size",
                "sha",
            )

        return self._stage("clusters", build)

    # ----------------------------------------------------------------- run

    def run(self, images: DataFrame) -> dict[str, DataFrame]:
        feats = self.features(images)
        edges = self.edges(images, feats)
        assign = self.components(edges)
        clusters = self.clusters(feats, assign)
        self.write_metrics()
        return dict(
            features=feats, edges=edges, assignments=assign, clusters=clusters
        )
