"""Dump formatted physical plans of the headline queries to BENCH/plans.md.

Planning only (no job execution, cheap): for each headline query build the
DataFrame against ``sf_dir`` and capture ``explain('formatted')`` plus a
mechanical summary of the plan properties the engine cares about at scale —
parquet pushdown/pruning, exchange count, whole-stage-codegen spans, and
the join strategies chosen. The summaries are the same invariants
tests/test_plans.py pins; this report exists so plan shape is REVIEWABLE
per round without re-deriving it from the test assertions.

Usage: python tools/explain_report.py [sf_dir] [out_path]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "exact_text_groups",
    "near_dup_text_pairs",
    "token_jaccard_pairs",
    "latest_event_per_user",
    "event_value_cdc",
    "pricing_summary",
    "nation_revenue",
    "orders_fully_shipped_early",
    "location_rollup_docs",
    "lsh_topk",
    "topk_similar",
    "exact_substring_spans",
    "corpus_filter",
    "repetition_stats",
    "decontamination",
    "ivf_pq_topk",
    "stratified_sample",
    "sequence_packing",
    "token_freq_quality",
    "gopher_filter",
    "incremental_new_docs",
    "user_sessions",
    "cluster_representatives",
    "source_quality_rollup",
    "dup_size_histogram",
    "line_dup_stats",
    "line_dedup_clean",
    "pii_scrub",
    "dedup_tiers",
    "dedup_tier_stats",
    "embedding_dedup_tiers",
    "cross_corpus_novel",
    "dsir_weights",
    "curation_funnel",
    "c4_clean",
    "source_overlap_minhash",
    "training_order",
    "leakage_safe_split",
    "dedup_pair_metrics",
    "fuzzy_decontamination",
    "near_soft_dedup_weights",
    "top_reclaimable_clusters",
    "pair_score_histogram",
    "event_props_stats",
    "near_dup_source_matrix",
    # round 4: media segment chain + bounded-golden metrics
    "segment_clusters",
    "segment_novelty",
    "frames_matching_images",
    "dedup_pair_metrics_golden",
    # round 5: media recall through dedup_pair_metrics
    "segment_pair_metrics",
]


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan_text(df) -> str:
    """Execute the frame and return the FINAL adaptive plan. The static
    formatted plan shows duplicate exchange subtrees that AQE replaces
    with ReusedExchange at runtime — only the executed plan proves which
    exchanges actually ran (verified: exact_text_groups' probe and
    aggregate sides share ONE scan+sha+shuffle at runtime)."""
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # keep the final plan section only; the initial plan repeats the static view
    marker = "== Initial Plan =="
    return s.split(marker)[0].rstrip()


def summarize_executed(plan: str) -> list[str]:
    out = []
    n_stage = len(set(re.findall(r"ShuffleQueryStage (\d+)", plan)))
    n_reuse = plan.count("ReusedExchange")
    out.append(f"shuffle stages actually run: {n_stage - n_reuse} (+{n_reuse} reused)")
    # ReusedExchange nodes reference a stage, they do not re-scan — the
    # FileScan count in the final plan IS the number of scans that ran
    n_scan = len(re.findall(r"FileScan parquet", plan))
    out.append(f"parquet scans actually run: {n_scan}")
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
    out.append(f"whole-stage codegen spans: {n_wsc}")
    if "AQEShuffleRead coalesced" in plan:
        out.append("AQE coalesced small shuffle reads")
    return out


def summarize(plan: str) -> list[str]:
    out = []
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if scans:
        pushed = [s for s in scans if s.strip()]
        out.append(
            f"parquet scans: {len(scans)}, with pushed filters: {len(pushed)}"
        )
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if reads:
        widths = [len(r.split(",")) if r else 0 for r in reads]
        out.append(f"scan column widths (pruned): {widths}")
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    out.append(f"planned shuffle exchanges: {n_ex}")
    joins = re.findall(
        r"\b(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )
    if joins:
        counts: dict[str, int] = {}
        for j in joins:
            counts[j] = counts.get(j, 0) + 1
        out.append("joins: " + ", ".join(f"{k} x{v}" for k, v in sorted(counts.items())))
    n_sort = len(re.findall(r"^\(\d+\) Sort\b", plan, flags=re.M))
    out.append(f"sorts: {n_sort}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "plans.md")
    )

    import __spark_entry__ as entrymod
    from ordinarydumpdeduplicator_spark.session import get_spark

    spark = get_spark("odd_explain", cores=4, shuffle_partitions=8)
    qs = entrymod.queries()

    lines = [
        "# Physical plans — headline queries",
        "",
        f"`explain('formatted')` of each headline query over `{sf_dir}`",
        "(plan construction only; AQE re-plans exchanges at runtime).",
        "Summaries are mechanical greps of the plan text; the hard",
        "invariants behind them are pinned by `tests/test_plans.py`.",
        "",
    ]
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        plan = plan_text(df)
        executed = executed_plan_text(df)
        lines += [f"## {name}", ""]
        lines += [f"- {s}" for s in summarize(plan)]
        lines += [f"- executed: {s}" for s in summarize_executed(executed)]
        lines += ["", "```", executed, "```", ""]

    # videos_dedup is bench-keyed, not a queries() entry (frame decode is
    # not SQL-expressible) — capture its executed tier-report plan over a
    # small generated corpus so the chain is reviewable like the rest
    from ordinarydumpdeduplicator_spark.fixtures.generator import (
        spark_videos_df,
    )
    from ordinarydumpdeduplicator_spark.operators.video_dedup import (
        video_dedup_report,
    )

    vdf = video_dedup_report(spark_videos_df(spark, 400))["tiers"]
    plan = plan_text(vdf)
    executed = executed_plan_text(vdf)
    lines += ["## videos_dedup (tiers output; bench key, no SQL oracle)", ""]
    lines += [f"- {s}" for s in summarize(plan)]
    lines += [f"- executed: {s}" for s in summarize_executed(executed)]
    lines += ["", "```", executed, "```", ""]

    from ordinarydumpdeduplicator_spark.fixtures.generator import (
        spark_audio_df,
    )
    from ordinarydumpdeduplicator_spark.operators.audio_dedup import (
        audio_dedup_report,
    )

    adf = audio_dedup_report(spark_audio_df(spark, 400))["tiers"]
    plan = plan_text(adf)
    executed = executed_plan_text(adf)
    lines += ["## audio_dedup (tiers output; bench key, no SQL oracle)", ""]
    lines += [f"- {s}" for s in summarize(plan)]
    lines += [f"- executed: {s}" for s in summarize_executed(executed)]
    lines += ["", "```", executed, "```", ""]

    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
