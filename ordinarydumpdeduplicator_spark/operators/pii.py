"""PII redaction over a text corpus — typed pattern scrubbing with counts.

A standard compliance pass in training-data pipelines: replace emails,
IPv4 addresses and phone-like number runs with typed placeholder tokens
(``<EMAIL>``, ``<IP>``, ``<PHONE>``) and report how many of each were
found per document. The reference has no analogue (it never inspects
content beyond the hash); this is part of the beyond-reference
training-pipeline surface (SURVEY.md §2.12).

Everything is JVM-side ``regexp_replace`` / ``regexp_count`` — one
codegen'd projection, no shuffle, no Python. The patterns deliberately
use only the regex subset shared by Java (Spark) and RE2 (DuckDB): no
backreferences, no lookaround — so the DuckDB oracle reproduces the scrub
byte-for-byte.

Scrub order is fixed and semantically load-bearing: emails first (their
local parts contain digits a later number pattern could half-eat), then
IPv4 (dotted digit runs the phone pattern would otherwise consume), then
phones over the already-scrubbed text. Each count is defined against the
text stage its own replacement sees, so n_<type> always equals the number
of placeholders inserted for that type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java+RE2 common subset. Phone: international-ish digit run (>= 9 chars
# total) allowing separators, anchored on digits at both ends; \b keeps it
# from nibbling longer identifiers.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\b\d[\d() -]{7,}\d\b"

# (column suffix, pattern, placeholder) in scrub order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ips", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
)


def _scrub_stages(text: Column) -> tuple[Column, list[Column]]:
    """-> (fully scrubbed text, per-type counts in scrub order), each
    count taken on the stage its replacement sees."""
    counts = []
    cur = text
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return cur, counts


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, clean_text, n_emails, n_ips, n_phones, has_pii).

    NULL text passes through as NULL with zero counts (nothing to scrub —
    the row is kept so downstream joins see the full corpus)."""
    scrubbed, counts = _scrub_stages(F.col(text_col))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(text_col).isNotNull(), scrubbed).alias("clean_text"),
        *counts,
    )
    # cast counts to long + zero-fill for NULL text, keep aliases stable
    for name, _pat, _tok in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.coalesce(F.col(f"n_{name}"), F.lit(0)).cast("long")
        )
    return out.withColumn(
        "has_pii",
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) > 0,
    )
