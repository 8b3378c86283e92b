"""Text analysis for a training-data pipeline: token stats, quality
features, language-ID heuristic, document fingerprints.

All built-in `pyspark.sql.functions` — no UDFs in any of these paths, so
every query is whole-stage-codegen and SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from .text_dedup import normalized_text

# tiny seeded stopword lists per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token counting (whitespace tokenizer, F.* only)."""
    toks = tokens_col(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        .alias("total_token_len"),
    )


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, punctuation count, digit count,
    uppercase-start flag; integer outputs (oracle-hash stable)."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(c).cast("long").alias("n_chars"),
        F.size(tokens_col(c)).cast("long").alias("n_tokens"),
        (F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))).cast("long").alias("n_punct"),
        (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))).cast("long").alias("n_digits"),
        (F.length(F.trim(c)) > 0).alias("non_empty"),
    )


def lang_id_heuristic(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-count language ID: score each language by marker-token hits
    within the token set; predict the argmax (ties -> 'und' = undetermined).

    Pure conditional aggregation over the token array — the same
    conditional-count shape as the reference's flag derivation O8
    (SameContentFilesInfo.cs:209-248)."""
    toks = tokens_col(F.col(text_col))
    scores = {
        lang: F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(m) for m in markers])
            )
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # deterministic tie-break: alpha order
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
        pred.alias("lang_pred"),
    )
    return out


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 + sha256 of normalized text (F1/F3
    analogues — BlobInfo hex identity, Common/BlobInfo.cs:114-126)."""
    norm = normalized_text(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fp_md5"),
        F.sha2(norm, 256).alias("fp_sha256"),
    )
