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

    cfg = PipelineConfig()
    t0 = time.time()
    res = NearDupPipeline(spark, cfg).run(images)
    n_assigned = res["clusters"].count()
    n_dups = res["clusters"].filter("is_dup").count()
    wall = time.time() - t0

    out = dict(
        cores=cores,
        master=spark.sparkContext.master,
        n_images=n_images,
        n_assigned=n_assigned,
        n_dup_rows=n_dups,
        wall_sec=round(wall, 3),
        images_per_sec=round(n_images / wall, 1),
        stage_metrics=cfg.metrics,
    )
    with open(out_json, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
