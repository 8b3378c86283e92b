"""Sequence packing: lay documents end-to-end into fixed-token-budget
training sequences (the "concat-and-chunk" step every LLM data pipeline
runs between dedup/filter and the trainer).

Semantics (deterministic, order-defined): within each ``part_col`` group,
documents are concatenated in ``order_col`` order into one token stream;
the stream is cut every ``budget`` tokens. Each document is assigned

- ``start_offset``  — its first token's position in the stream,
- ``seq_id``        — the chunk containing that first token,
- ``end_seq_id``    — the chunk containing its last token,
- ``n_seqs_spanned``— how many chunk boundaries it straddles (+1),

so the trainer-side writer can materialize chunk files and know exactly
which documents cross boundaries (candidates for document-masked
attention or re-packing). Empty and NULL-text documents occupy zero
tokens and sit at their predecessor's end offset, spanning one sequence
by convention.

This is a running-sum window per partition group — no UDF, no join, ONE
shuffle on ``part_col``. DuckDB expresses the identical windows, so the
driver oracle checks values exactly (`oracle_sql()['sequence_packing']`).

Scale shape: the window sorts within each part — pick ``part_col`` so
groups are executor-sized (source×shard-date at 10^12 rows; a single
global stream would serialize). Skewed parts are a *data layout* choice
here, not a shuffle-key accident: packing is order-defined, so the
engine cannot salt it away — re-shard the input instead (the docstring
contract callers rely on).

Reference analogue: none (beyond-reference training-pipeline operator,
SURVEY §2.12); the order-defined windowing reuses the same O5/O6 ranking
machinery as `operators/states.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count_col


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    part_col: str = "source",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its packed-sequence coordinates (see module
    docstring for the exact semantics)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # materialize n_tokens BEFORE the window so (a) the text column is
    # pruned before the Exchange (only 3 skinny columns shuffle) and
    # (b) the tokenizer expression evaluates once, not once per output
    # column (plan-gated in tests/test_plans.py)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(part_col).alias("part"),
        F.col(order_col).alias("__ord"),
        # NULL text = zero tokens (the empty-document convention above);
        # without the coalesce every downstream coordinate goes NULL
        F.coalesce(
            token_count_col(F.col(text_col)).cast("long"), F.lit(0)
        ).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy("__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    seq_id = F.floor(start / budget)
    # last token sits at cum-1; empty docs keep the start chunk
    end_seq = F.floor(F.greatest(F.col("cum") - F.lit(1), start) / budget)
    return cum.select(
        "doc_id",
        "part",
        "n_tokens",
        start.alias("start_offset"),
        seq_id.alias("seq_id"),
        end_seq.alias("end_seq_id"),
        (end_seq - seq_id + F.lit(1)).alias("n_seqs_spanned"),
    )
