"""SparkSession factory tuned for the dedup engine.

Local-mode settings double as documentation of the cluster-mode intent:
AQE on (runtime skew-join + partition coalescing), Arrow enabled for the
pandas-UDF feature stages, shuffle partitions sized to cores locally
(on a real cluster: 2-3x total executor cores, or leave to AQE).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .functions import malloc_tuning  # noqa: F401 (driver-side mallopt)

# Arrow batch size: input rows carry multi-MB `bytes` payloads, so cap the
# rows per Arrow batch to bound executor memory (SURVEY.md §4 item 4).
ARROW_MAX_RECORDS = 1024


def get_spark(
    app_name: str = "odd_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    cores: parallelism for local mode; defaults to $SPARK_GRAFT_CPUS or '*'.
    """
    # One BLAS/OpenMP thread per Python worker: feature UDFs run one worker
    # per task slot, so intra-op threading only oversubscribes the box
    # (measured ~13%/core loss at 32 workers). Must be set before the JVM
    # starts — local-mode Python workers inherit this process's env.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n_cores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_cores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(n_cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS),
        )
        .config("spark.driver.memory", os.environ.get("ODD_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate turns posexplode(<Arrow-UDF array>) into
        # a size()>0 filter on the UDF column and pushes it below any
        # exchange — so the Python UDF materializes TWICE, the first time
        # on the PRE-repartition input (a single small parquet file = one
        # task, serializing the whole sketch computation on one core;
        # measured 11.9s -> 1.2s on the text banding chain at sf0.1). The
        # rule only pre-prunes generate inputs, which our chains never
        # need: every exploded array is UDF-produced and non-null by
        # construction.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
