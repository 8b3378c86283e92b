"""The driver correctness gate records rows for only the FIRST ~50
entries of `queries()` (observed in r02 and r03). This pins the round-4
window invariants so a refactor cannot silently rotate a never-checked
entry out of the gate, and that every query has a same-named oracle."""

from __future__ import annotations

import __spark_entry__ as e

WINDOW = 50

# entries with NO driver-green row before round 4 — they MUST sit
# inside the gate window
NEVER_CHECKED = [
    "segment_clusters",
    "segment_novelty",
    "frames_matching_images",
    "dedup_pair_metrics_golden",
    "gopher_filter",
]

# r02-era-only green rows (VERDICT r03 item 2) — rotated into the
# round-4 window so their evidence refreshes on current code
R02_ERA = [
    "decontamination", "winnowing_fingerprints", "repetition_stats",
    "user_sessions", "cluster_flags_by_lang", "isolation_plan",
    "location_rollup_docs", "members_after_merge", "entities_docs",
    "directory_tree_docs", "lsh_topk", "topk_similar",
    "latest_event_per_user", "event_value_cdc",
    "orders_fully_shipped_early", "union_distinct_docs",
    "nation_revenue", "pricing_summary", "rollup_returnflag",
    "token_stats", "quality_features", "lang_id", "fingerprints",
    "bpe_token_stats", "lang_distribution",
]


def test_gate_window_leads_with_unchecked_entries():
    names = list(e.queries().keys())
    head = names[:WINDOW]
    assert names[: len(NEVER_CHECKED)] == NEVER_CHECKED
    for name in R02_ERA:
        assert name in head, f"{name} rotated out of the gate window"


def test_every_query_has_an_oracle_and_vice_versa():
    q = set(e.queries().keys())
    o = set(e.oracle_sql().keys())
    assert q == o, (sorted(q - o), sorted(o - q))
