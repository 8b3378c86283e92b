"""Pin the hash-sketch DuckDB oracles to the Spark queries — the driver's
CORRECTNESS gate, replicated in CI on a subset of the driver testdata.

The subset (150 docs / 400 vectors, written once per session to tmp
parquet) keeps the HUGEINT-heavy minhash oracle a few seconds instead of
~10s while exercising every code path: real duplicates survive the cut
because the subset is a prefix of doc_id order and the generator clusters
ids. Any drift between the engine's numpy hashing and the SQL mirror
(ordinarydumpdeduplicator_spark/oracles.py) fails here before the driver
sees it."""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def subset_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("oracle_subset"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs.orderBy("doc_id").limit(150).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/documents.parquet")
    embs.orderBy("vec_id").limit(400).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")
    return out


@pytest.fixture(scope="module")
def duck(subset_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{subset_dir}/{t}.parquet/*.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    ), [cols[i] for i in order]


def _assert_parity(spark_df, con, sql):
    rel = con.sql(sql)
    sn, sc = _norm(spark_df.columns, [tuple(r) for r in spark_df.collect()])
    dn, dc = _norm(rel.columns, rel.fetchall())
    assert sc == dc, f"columns differ: {sc} vs {dc}"
    assert len(sn) == len(dn), f"rowcount {len(sn)} vs {len(dn)}"
    diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not diffs, f"first diffs: {diffs[:3]}"


def test_minhash_candidates_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["minhash_candidates"](spark, subset_dir)
    assert df.count() > 0, "subset lost all candidate pairs"
    _assert_parity(df, duck, o.minhash_candidates_sql())


def test_near_dup_text_pairs_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["near_dup_text_pairs"](spark, subset_dir)
    _assert_parity(df, duck, o.near_dup_text_pairs_sql())


def test_cross_corpus_novel_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["cross_corpus_novel"](spark, subset_dir)
    matched = df.filter("not is_novel").count()
    assert matched > 0, "subset lost all cross-side near-dups"
    assert df.filter("is_novel").count() > 0, "no novel docs in subset"
    _assert_parity(df, duck, o.cross_corpus_novel_sql())


def test_near_dup_text_clusters_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["near_dup_text_clusters"](spark, subset_dir)
    _assert_parity(df, duck, o.near_dup_text_clusters_sql())


def test_dedup_tiers_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["dedup_tiers"](spark, subset_dir)
    _assert_parity(df, duck, o.dedup_tiers_sql(augmented=True))
    tiers = {r[0] for r in duck.sql(
        "SELECT DISTINCT tier FROM (" + o.dedup_tiers_sql(augmented=True) + ")"
    ).fetchall()}
    assert tiers == {"empty", "exact", "normalized", "near", "unique"}, tiers


def test_dedup_tier_stats_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["dedup_tier_stats"](spark, subset_dir)
    _assert_parity(df, duck, o.dedup_tier_stats_sql(augmented=True))


def test_embedding_dedup_tiers_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["embedding_dedup_tiers"](spark, subset_dir)
    sql = o.embedding_dedup_tiers_sql(dim=64, augmented=True)
    _assert_parity(df, duck, sql)
    tiers = {r[0] for r in duck.sql(
        f"SELECT DISTINCT tier FROM ({sql})"
    ).fetchall()}
    assert tiers == {"empty", "exact", "near", "unique"}, tiers


def test_tier_drift_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["tier_drift"](spark, subset_dir)
    _assert_parity(df, duck, e.oracle_sql()["tier_drift"])


def test_simhash_near_pairs_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["simhash_near_pairs"](spark, subset_dir)
    assert df.count() > 0, "subset lost all simhash pairs"
    _assert_parity(df, duck, o.simhash_near_pairs_sql())


def test_winnowing_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["winnowing_fingerprints"](spark, subset_dir)
    _assert_parity(df, duck, o.winnowing_fingerprints_sql())


def test_embedding_near_pairs_lsh_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["embedding_near_pairs_lsh"](spark, subset_dir)
    assert df.count() > 0, "subset lost all embedding near pairs"
    _assert_parity(
        df, duck, o.embedding_near_pairs_lsh_sql(dim=64, threshold=0.4, bands=16)
    )


def test_lsh_topk_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["lsh_topk"](spark, subset_dir)
    _assert_parity(df, duck, o.lsh_topk_sql(dim=64, k=3))


def test_exact_substring_spans_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["exact_substring_spans"](spark, subset_dir)
    assert df.count() > 0, "subset lost all duplicated spans"
    _assert_parity(df, duck, e.oracle_sql()["exact_substring_spans"])


def test_substring_dup_stats_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["substring_dup_stats"](spark, subset_dir)
    _assert_parity(df, duck, e.oracle_sql()["substring_dup_stats"])


def test_corpus_filter_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["corpus_filter"](spark, subset_dir)
    assert df.where("NOT keep").count() > 0, "subset lost all drops"
    _assert_parity(df, duck, e.oracle_sql()["corpus_filter"])


def test_repetition_stats_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["repetition_stats"](spark, subset_dir)
    assert df.where("dup_ngram_positions > 0").count() > 0
    _assert_parity(df, duck, e.oracle_sql()["repetition_stats"])


def test_c4_clean_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["c4_clean"](spark, subset_dir)
    assert df.where("NOT doc_keep").count() > 0, "no doc-level drops"
    assert df.where("doc_keep").count() > 0, "every doc dropped"
    _assert_parity(df, duck, e.oracle_sql()["c4_clean"])


def test_curation_funnel_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["curation_funnel"](spark, subset_dir)
    _assert_parity(df, duck, e.oracle_sql()["curation_funnel"])


def test_dsir_weights_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["dsir_weights"](spark, subset_dir)
    assert df.count() == 150, "one weight row per document"
    _assert_parity(df, duck, e.oracle_sql()["dsir_weights"])


def test_decontamination_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["decontamination"](spark, subset_dir)
    assert df.where("contaminated").count() > 0, "subset has no overlap"
    _assert_parity(df, duck, e.oracle_sql()["decontamination"])


def test_semantic_dedup_oracle(spark, subset_dir, duck):
    # trains on the SUBSET (the oracle must mirror what the query it is
    # compared against actually trained on) — the packaged oracle_sql()
    # entry instead trains on oracles.oracle_sf_dir(), the driver's gate sf
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark import oracles as o

    df = e.queries()["semantic_dedup"](spark, subset_dir)
    assert df.where("NOT is_kept").count() > 0, "subset lost all drops"
    cents = o.semantic_oracle_centroids(subset_dir)
    _assert_parity(df, duck, o.semantic_dedup_sql(cents, threshold=0.4))


def test_source_overlap_minhash_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["source_overlap_minhash"](spark, subset_dir)
    assert df.count() > 0
    _assert_parity(df, duck, e.oracle_sql()["source_overlap_minhash"])


def test_cross_source_dup_matrix_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["cross_source_dup_matrix"](spark, subset_dir)
    assert df.count() > 0, "planted mirrors lost"
    _assert_parity(df, duck, e.oracle_sql()["cross_source_dup_matrix"])


def test_training_order_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["training_order"](spark, subset_dir)
    assert df.count() == 150
    _assert_parity(df, duck, e.oracle_sql()["training_order"])


def test_leakage_safe_split_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["leakage_safe_split"](spark, subset_dir)
    assert df.count() == 150
    _assert_parity(df, duck, e.oracle_sql()["leakage_safe_split"])


def test_dedup_pair_metrics_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["dedup_pair_metrics"](spark, subset_dir)
    _assert_parity(df, duck, e.oracle_sql()["dedup_pair_metrics"])


def test_fuzzy_decontamination_oracle(spark, subset_dir, duck):
    import __spark_entry__ as e

    df = e.queries()["fuzzy_decontamination"](spark, subset_dir)
    assert df.count() == 135  # 150 docs minus the 15 eval ids
    _assert_parity(df, duck, e.oracle_sql()["fuzzy_decontamination"])


def test_event_props_stats_oracle_dirty_json(spark):
    """The driver's events table carries only clean props, so the gate
    never exercises the oracle's NULL-tolerance. This pins the oracle SQL
    to Spark from_json('k INT') semantics on EVERY adversarial shape:
    malformed JSON, absent field, string-typed "7", double 7.5, negative,
    null sidecar, and out-of-INT-range — all must agree cell-exact."""
    import __spark_entry__ as e
    from ordinarydumpdeduplicator_spark.operators.states import (
        event_props_stats,
    )

    rows = [
        ("click", '{"k": 10}'),
        ("click", '{"k": -4}'),
        ("click", '{"k": 7.5}'),            # double -> NULL
        ("click", '{"k": "7"}'),            # string-typed -> NULL
        ("view", "not json"),               # malformed -> NULL
        ("view", '{"other": 1}'),           # absent -> NULL
        ("view", None),                     # null sidecar
        ("view", '{"k": 99999999999999}'),  # out of INT range -> NULL
        ("view", '{"k": 3}'),
    ]
    events = spark.createDataFrame(rows, "event_type string, props string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_type VARCHAR, props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    _assert_parity(
        event_props_stats(events), con, e.oracle_sql()["event_props_stats"]
    )
