"""End-to-end corpus curation walkthrough — every stage a training-data
team runs, wired through this repo's public operators on the bundled
testdata. Run it:

    python examples/curate_corpus.py [sf_dir]     # default sf0.01

Prints, in pipeline order:
  1. C4 line cleaning           (line_dedup.c4_line_filter)
  2. quality verdicts           (text_analysis.gopher_quality_filter)
  3. tier-cascade accounting    (tiers.dedup_tier_stats)
  4. the full curation funnel   (plans/curation.curation_funnel)
  5. tier drift after a wave    (tiers.tier_drift)
  6. DSIR importance weights    (sampling.dsir_importance_weights)

Everything here is the same code path the driver's oracle gate checks
value-for-value against DuckDB (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from ordinarydumpdeduplicator_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curate_example", cores=8, shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from ordinarydumpdeduplicator_spark.operators.line_dedup import (
        c4_line_filter,
    )
    from ordinarydumpdeduplicator_spark.operators.sampling import (
        dsir_importance_weights,
    )
    from ordinarydumpdeduplicator_spark.operators.text_analysis import (
        gopher_quality_filter,
    )
    from ordinarydumpdeduplicator_spark.operators.tiers import (
        dedup_tier_stats,
        dedup_tiers,
        tier_drift,
    )
    from ordinarydumpdeduplicator_spark.plans.curation import (
        curation_funnel,
    )

    print("== 1. C4 line cleaning (doc keep rate) ==")
    # the raw synthetic docs are single-line without terminal punctuation,
    # so wrap them in web-page shape first (banner / body / footer) —
    # exactly what the c4_clean contract query does
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("Please enable JavaScript to continue\n"),
            F.col("text"),
            F.lit(".\ncopyright footer all rights reserved"),
        ).alias("text"),
    )
    c4 = c4_line_filter(pages)
    c4.groupBy("doc_keep").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_kept").alias("kept_lines"),
    ).orderBy("doc_keep").show()

    print("== 2. Gopher quality verdicts (top drop reasons) ==")
    gq = gopher_quality_filter(docs)
    gq.select(F.explode("reasons").alias("reason")).groupBy(
        "reason"
    ).count().orderBy(F.desc("count")).show()

    print("== 3. Tier-cascade accounting ==")
    dedup_tier_stats(docs.select("doc_id", "text")).orderBy("tier").show()

    print("== 4. Curation funnel (quality -> dedup -> decontam -> mix) ==")
    train = docs.where(F.col("doc_id") % 10 != 0).select(
        "doc_id", "text", "lang"
    )
    ev = docs.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", "text", "lang"
    )
    curation_funnel(
        train, ev, targets={"en": 0.4, "de": 0.3, "fr": 0.3}
    ).orderBy("stage_idx").show(truncate=False)

    print("== 5. Tier drift after an ingest wave of exact copies ==")
    wave = docs.filter(F.col("doc_id") % 9 == 0).select(
        (-(F.col("doc_id") + 1)).alias("doc_id"), "text"
    )
    prev = dedup_tiers(docs.select("doc_id", "text"))
    cur = dedup_tiers(docs.select("doc_id", "text").unionByName(wave))
    tier_drift(prev, cur).orderBy("tier_from", "tier_to").show()

    print("== 6. DSIR importance weights (en as target) ==")
    dsir_importance_weights(docs, target=F.col("lang") == "en").groupBy(
        "lang"
    ).agg(
        F.round(F.avg("dsir_score"), 4).alias("mean_score"),
        F.count(F.lit(1)).alias("n_docs"),
    ).orderBy(F.desc("mean_score")).show()

    spark.stop()


if __name__ == "__main__":
    main()
