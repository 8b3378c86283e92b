"""spark-submit job: run the near-dup image pipeline over a pre-materialized
corpus and report wall-clock + images/sec.

Submitted as:
    spark-submit --master local[N] --py-files /tmp/odd_pyfiles.zip \
        tools/scaling_job.py <corpus_parquet> <out_json>

The package is imported ONLY from the --py-files zip (this file never adds
the repo root to sys.path), which is the deployment mode the north rule
names: `spark-submit --py-files` on a multi-executor cluster. Master /
shuffle settings come from spark-submit --master/--conf so the SAME job
code runs at both cluster sizes.
"""

from __future__ import annotations

import json
import os
import sys
import time

# one BLAS thread per Python worker (see session.py) — must precede JVM start
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main() -> None:
    corpus_path, out_json = sys.argv[1], sys.argv[2]

    from pyspark.sql import SparkSession

    # No .master() here: spark-submit --master decides the cluster size.
    spark = SparkSession.builder.appName("odd_scaling_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism

    # package resolved from the --py-files zip
    from ordinarydumpdeduplicator_spark.plans.pipeline import (
        NearDupPipeline,
        PipelineConfig,
    )

    images = spark.read.parquet(corpus_path)
    n_images = images.count()  # warms FS cache/scan; excluded from timing

    def one_pass() -> tuple[float, PipelineConfig, int, int]:
        cfg = PipelineConfig()
        t0 = time.time()
        res = NearDupPipeline(spark, cfg).run(images)
        n_assigned = res["clusters"].count()
        n_dups = res["clusters"].filter("is_dup").count()
        wall = time.time() - t0
        # drop ALL blocks this pass pinned — the stage caches AND the
        # localCheckpoint intermediates (bucket frame, candidate pairs,
        # cc assignment). Without this, repeated passes accumulate
        # executor storage until eviction/GC pressure makes warm passes
        # SLOWER than the cold one (measured +20% at 4x2).
        for df in res.values():
            try:
                df.unpersist(blocking=True)
            except Exception:
                pass
        spark.catalog.clearCache()
        # the INTRA-stage lazy localCheckpoints (bucket frame, candidate
        # pairs inside edges) are locals of the stage builders — not in
        # `res`, not catalog-cached, so neither loop above frees them.
        # Left alone they accumulate across passes until executor storage
        # eviction/GC pressure makes pass walls DRIFT UP (measured
        # 88 -> 122 -> 152 s across 3 passes at 4x2 executors). Sweep every
        # persisted RDD the JVM still tracks.
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in jmap.values():
                jrdd.unpersist(True)
        except Exception:
            pass
        import gc

        gc.collect()  # drop py4j refs so ContextCleaner frees RDD blocks
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        return round(wall, 3), cfg, n_assigned, n_dups

    # Warmup pass + measured passes (same convention as bench.py): the
    # first pipeline pass in a fresh JVM pays one-time session costs —
    # HotSpot/Janino JIT of every codegen stage shape, Python worker pool
    # spin-up and imports — measured 3-4x on the candidate chains. A
    # production ingest service pays those once per executor lifetime, not
    # per batch, and the JIT wall is ~constant regardless of cluster size,
    # so a cold one-shot run systematically understates scaling. Steady
    # state (best measured pass) is the headline; the cold wall is kept in
    # the JSON alongside.
    wall_cold, _, n_assigned, n_dups = one_pass()
    # Several measured passes, best kept: the sandbox host shows ~2%
    # average CPU steal with multi-x bursts (hypervisor neighbors), so a
    # single pass is not a measurement. Pass count is tunable
    # (ODD_SCALE_PASSES): small corpora need 5 (walls keep decreasing
    # through pass 3-4 — page cache, malloc arenas, JIT tiers), larger
    # corpora amortize those and 3 suffices.
    n_passes = int(os.environ.get("ODD_SCALE_PASSES", "3"))
    measured = [one_pass() for _ in range(n_passes)]
    wall, cfg, n2, _ = min(measured, key=lambda m: m[0])
    assert n2 == n_assigned

    out = dict(
        cores=cores,
        master=spark.sparkContext.master,
        n_images=n_images,
        n_assigned=n_assigned,
        n_dup_rows=n_dups,
        wall_sec=wall,
        wall_sec_cold=wall_cold,
        wall_sec_passes=[m[0] for m in measured],
        images_per_sec=round(n_images / wall, 1),
        stage_metrics=cfg.metrics,
    )
    with open(out_json, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
