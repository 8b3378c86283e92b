"""sf1 (10x) scale-stress with a planted hot-caption skew probe.

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

Then the dedup/LLM headline queries run at both sf0.1 and sf1 on the same
session, and the report (BENCH/sf1.md) records walls, the sf1/sf0.1
ratio vs the 20x allowance (2x times linear 10x), bucket-cap overflow
counts (logged, not silent), and AQE skew-join engagement in the executed
plan of the hottest query.

Usage: python tools/stress_sf1.py [--regen]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    "dedup_pair_metrics",
    "fuzzy_decontamination",
    # round-3 session-6 additions
    "near_soft_dedup_weights",
    "top_reclaimable_clusters",
    "pair_score_histogram",
    "event_props_stats",
    "near_dup_source_matrix",
    # round-4 additions: media segment chain + bounded-golden metrics
    "segment_clusters",
    "segment_novelty",
    "frames_matching_images",
    "dedup_pair_metrics_golden",
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


def main() -> None:
    from ordinarydumpdeduplicator_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("stress_sf1", cores=32, shuffle_partitions=64)
    if "--regen" in sys.argv or not os.path.exists(
        f"{DST}/documents.parquet/_SUCCESS"
    ):
        shutil.rmtree(DST, ignore_errors=True)
        build_sf1(spark)

    qs = entry.queries()
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        row = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            row[label] = round(time.time() - t0, 2)
            row[f"{label}_rows"] = n
        row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    caps = cap_overflow_report(spark)
    print(json.dumps({"cap_overflow": caps}), flush=True)

    # AQE skew handling on the hottest stage: executed plan of the
    # near-dup pairs chain at sf1
    from ordinarydumpdeduplicator_spark.operators.text_dedup import (
        near_dup_text_pairs,
    )

    df = near_dup_text_pairs(spark.read.parquet(f"{DST}/documents.parquet"))
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    skew = "skew=true" in plan
    print(json.dumps({"aqe_skew_join_engaged": skew}), flush=True)

    with open("/tmp/odd_sf1_results.json", "w") as f:
        json.dump({"queries": results, "cap_overflow": caps,
                   "aqe_skew": skew}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
