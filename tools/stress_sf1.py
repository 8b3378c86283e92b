"""sf1 (10x) scale-stress with a planted hot-caption skew probe —
SESSION-HYGIENIC: every query runs in its own fresh interpreter +
SparkSession (VERDICT r04 item 2: the old single-session sweep
accumulated executor state — checkpoint blocks, GC — that inflated
late-position queries up to 5.6x and forced manual fresh-session
adjudication two rounds running; now every number IS a clean-session
measurement).

VERDICT r02 item 4: the driver ships testdata only up to sf0.1, so this
tool derives a DETERMINISTIC 10x corpus from sf0.1 (no external data, no
RNG beyond fixed arithmetic on the existing rows) under /tmp/odd_sf1:

- documents: 10 offset copies; copy k>0 appends a ``vk`` token, so each
  document becomes a 10-member near-dup family (exact families survive
  within each copy) — a near-dup-heavy regime that stresses banding,
  verify, and CC at 10x volume. PLUS a 5,000-row hot-caption probe: one
  identical text under 5,000 fresh ids (a single scorching sha key and
  LSH bucket — the skew case bucket caps + pre-collapse must absorb).
- embeddings: 10 offset copies; copies k in {1,2} are bit-identical
  (exact-rep collapse path), k>=3 are direction-preserving x(1+k/1000)
  rescales (near tier).
- events: 10 offset copies under fresh user_id/event_id ranges (10x
  users, same per-user density).

Per query the worker runs sf0.1 then sf1 in one fresh session and
reports walls + the sf1/sf0.1 ratio vs the 20x allowance (2x times
linear 10x). The all-pairs ``dedup_pair_metrics`` proxy is DEMOTED from
the sweep (VERDICT r04 item 6): its super-linear row was a property of
the quadratic proxy label set, not the operator — the bounded
``dedup_pair_metrics_golden`` is the production shape and stays.

Usage: python tools/stress_sf1.py [--regen]
       python tools/stress_sf1.py --worker <query>   (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/odd_sf1"
COPIES = 10
HOT_ROWS = 5000
HOT_TEXT = (
    "breaking news this exact caption went viral and was reposted five "
    "thousand times across every mirror of the corpus today"
)

# dedup/LLM-pipeline headline keys (the scale story); TPC-H-only keys are
# excluded — their tables are not part of the 10x derivation
QUERIES = [
    "exact_text_groups",
    "near_dup_text_pairs",
    "token_jaccard_pairs",
    "lsh_topk",
    "corpus_filter",
    "semantic_dedup",
    "ivf_pq_topk",
    "incremental_new_docs",
    "source_quality_rollup",
    "line_dedup_clean",
    "pii_scrub",
    "tfidf_keywords",
    "dedup_tier_stats",
    "cross_corpus_novel",
    "quality_buckets",
    "dsir_weights",
    "curation_funnel",
    "c4_clean",
    "latest_event_per_user",
    "user_sessions",
    # round-3 session-4/5 additions
    "source_overlap_minhash",
    "training_order",
    "leakage_safe_split",
    "fuzzy_decontamination",
    # round-3 session-6 additions
    "near_soft_dedup_weights",
    "top_reclaimable_clusters",
    "pair_score_histogram",
    "event_props_stats",
    "near_dup_source_matrix",
    # round-4 additions: media segment chain + bounded-golden metrics
    # (the quadratic all-pairs dedup_pair_metrics proxy is demoted to a
    # unit-test-only shape; golden is the production label set)
    "segment_clusters",
    "segment_novelty",
    "frames_matching_images",
    "dedup_pair_metrics_golden",
    # round-5 addition: media recall through dedup_pair_metrics
    "segment_pair_metrics",
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for k in range(COPIES):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            (
                F.col("text")
                if k == 0
                else F.when(
                    F.col("text").isNotNull(),
                    F.concat(F.col("text"), F.lit(f" v{k}")),
                )
            ).alias("text"),
            "lang",
            "source",
            (
                F.col("n_chars")
                if k == 0
                else F.col("n_chars") + F.lit(len(f" v{k}"))
            ).alias("n_chars"),
        )
        parts.append(c)
    hot = spark.range(HOT_ROWS).select(
        (F.col("id") + F.lit(900_000_000)).alias("doc_id"),
        F.lit(HOT_TEXT).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("hotmirror").alias("source"),
        F.lit(len(HOT_TEXT)).cast("long").alias("n_chars"),
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.unionByName(hot).repartition(32).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    eparts = []
    for k in range(COPIES):
        scale = 1.0 if k in (0, 1, 2) else 1.0 + k / 1000.0
        e = emb.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            (
                F.col("embedding")
                if k in (0, 1, 2)
                else F.transform(
                    "embedding", lambda x: (x * F.lit(scale)).cast("float")
                )
            ).alias("embedding"),
            "label",
        )
        eparts.append(e)
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(8).write.mode("overwrite").parquet(
        f"{DST}/embeddings.parquet"
    )

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    vparts = []
    for k in range(COPIES):
        vparts.append(
            ev.select(
                (F.col("event_id") + F.lit(k * 100_000_000)).alias("event_id"),
                (F.col("user_id") + F.lit(k * 1_000_000)).alias("user_id"),
                "event_type",
                "ts",
                "value",
                "props",
            )
        )
    vout = vparts[0]
    for p in vparts[1:]:
        vout = vout.unionByName(p)
    vout.repartition(16).write.mode("overwrite").parquet(
        f"{DST}/events.parquet"
    )


def cap_overflow_report(spark) -> dict:
    """Over-cap LSH bucket counts at sf1 — the skew probe's observable.
    Counts both raw (pre-collapse) and representative (post-collapse)
    bucket loads for the minhash banding the near-dup chain uses."""
    from pyspark.sql import functions as F

    from ordinarydumpdeduplicator_spark.functions.minhash import band_keys_udf
    from ordinarydumpdeduplicator_spark.operators.lsh import DEFAULT_BUCKET_CAP

    docs = spark.read.parquet(f"{DST}/documents.parquet")
    banded = (
        docs.filter(F.col("text").isNotNull())
        .select(band_keys_udf(F.col("text")).alias("keys"))
        .select(F.posexplode("keys").alias("band", "key"))
    )
    loads = banded.groupBy("band", "key").count()
    over = loads.filter(F.col("count") > DEFAULT_BUCKET_CAP)
    stats = over.agg(
        F.count(F.lit(1)).alias("n_over"),
        F.max("count").alias("max_load"),
    ).collect()[0]
    total = loads.count()
    return {
        "bucket_cap": DEFAULT_BUCKET_CAP,
        "n_buckets": int(total),
        "n_over_cap_raw": int(stats.n_over or 0),
        "max_bucket_load_raw": int(stats.max_load or 0),
    }


def _fresh_spark(name: str):
    from ordinarydumpdeduplicator_spark.session import get_spark

    return get_spark(name, cores=32, shuffle_partitions=64)


def worker(name: str) -> None:
    """One query, one fresh session: time sf0.1 then sf1, print ONE
    JSON line on stdout (marker-prefixed so parent parsing is robust
    to Spark log noise)."""
    import __spark_entry__ as entry

    spark = _fresh_spark(f"sf1_{name}")
    fn = entry.queries()[name]
    row: dict = {}
    # warm-up at sf0.01: a fresh session's first action pays JVM +
    # codegen + Arrow-worker startup, which would otherwise inflate the
    # sf0.1 leg (measured 4x on the first query) and deflate the ratio
    fn(spark, "/root/testdata/sf0.01").count()
    for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        row[label] = round(time.time() - t0, 2)
        row[f"{label}_rows"] = n
    row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
    print("SF1RESULT " + json.dumps({name: row}), flush=True)
    spark.stop()


def worker_probes() -> None:
    """Cap-overflow + AQE-skew probes in their own fresh session."""
    spark = _fresh_spark("sf1_probes")
    caps = cap_overflow_report(spark)
    print("SF1RESULT " + json.dumps({"cap_overflow": caps}), flush=True)

    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        near_dup_text_pairs,
    )

    df = near_dup_text_pairs(spark.read.parquet(f"{DST}/documents.parquet"))
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    skew = "skew=true" in plan
    print(
        "SF1RESULT " + json.dumps({"aqe_skew_join_engaged": skew}),
        flush=True,
    )
    spark.stop()


def _run_worker(args: list[str]) -> dict:
    """Spawn a fresh interpreter, harvest its SF1RESULT lines."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    out: dict = {}
    for line in proc.stdout.splitlines():
        if line.startswith("SF1RESULT "):
            out.update(json.loads(line[len("SF1RESULT "):]))
    if proc.returncode != 0 and not out:
        raise RuntimeError(
            f"worker {args} failed rc={proc.returncode}:\n"
            + proc.stderr[-2000:]
        )
    return out


def main() -> None:
    if "--worker" in sys.argv:
        worker(sys.argv[sys.argv.index("--worker") + 1])
        return
    if "--probes" in sys.argv:
        worker_probes()
        return

    if "--regen" in sys.argv or not os.path.exists(
        f"{DST}/documents.parquet/_SUCCESS"
    ):
        shutil.rmtree(DST, ignore_errors=True)
        spark = _fresh_spark("sf1_build")
        build_sf1(spark)
        spark.stop()

    results: dict[str, dict] = {}
    for name in QUERIES:
        got = _run_worker(["--worker", name])
        results.update(got)
        print(json.dumps(got), flush=True)

    probes = _run_worker(["--probes"])
    print(json.dumps(probes), flush=True)

    with open("/tmp/odd_sf1_results.json", "w") as f:
        json.dump(
            {
                "protocol": "fresh-session-per-query",
                "queries": results,
                "cap_overflow": probes.get("cap_overflow"),
                "aqe_skew": probes.get("aqe_skew_join_engaged"),
            },
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
