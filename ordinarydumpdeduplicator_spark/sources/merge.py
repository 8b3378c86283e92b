"""Row-level MERGE: the production form of the actions commit (O17/O18).

``operators/actions.py`` plans isolate/delete as an actions DataFrame; the
reference applies them by mutating its object graph + filesystem in place
(DuplicatesProcessor.cs:98-183,185-248, persisted through the
DataControllerSimple add-methods, DataControllerSimple.cs:43-75). At
10^12 scale the same commit is an Iceberg row-level ``MERGE INTO``. This
module makes that claim executable rather than prose:

- ``MergeSpec``        — a declarative (ON keys, WHEN MATCHED ...,
  WHEN NOT MATCHED ...) description of the merge.
- ``merge_sql``        — renders the spec as the ANSI/Iceberg
  ``MERGE INTO`` statement a catalog-backed deployment runs verbatim.
- ``execute_merge``    — runs the SAME spec as DataFrame joins (one
  equi-join, clause selection via a when-chain), for parquet-backed
  tables without row-level-op support — and as the local test harness
  proving the generated SQL's semantics: first-matching-clause wins,
  multiple source matches for ONE TARGET ROW raise (Iceberg's
  cardinality error; duplicate source keys matching no target row are
  legal and insert per-row), unmatched target rows pass through.
- ``members_merge_spec`` — the concrete spec for committing an actions
  frame into a members table; ``execute_merge`` of it is equality-tested
  against ``operators.actions.maintain_members`` (tests/test_merge.py).

Scale shape: the executor is one shuffled equi-join on the merge keys
(broadcast when the actions side is small — it is bounded by the action
count) plus column-level ``when`` projections; no window, no collect.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a WHEN MATCHED action: None => DELETE, dict => UPDATE SET col -> SQL expr
# (expressions may reference t.<col> and s.<col>)
MatchedAction = dict[str, str] | None


@dataclass(frozen=True)
class MergeSpec:
    """Declarative MERGE description. Join keys must be non-null on both
    sides (enforced — null keys would silently never match)."""

    on: list[str]
    matched: list[tuple[str | None, MatchedAction]] = field(default_factory=list)
    # (condition SQL or None, col -> SQL expr); None disables INSERT
    not_matched: tuple[str | None, dict[str, str]] | None = None


def merge_sql(spec: MergeSpec, target_name: str, source_name: str) -> str:
    """Render the Iceberg/ANSI ``MERGE INTO`` statement for the spec."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in spec.on)
    lines = [f"MERGE INTO {target_name} t", f"USING {source_name} s", f"ON {on}"]
    for cond, action in spec.matched:
        head = "WHEN MATCHED" + (f" AND {cond}" if cond else "")
        if action is None:
            lines.append(f"{head} THEN DELETE")
        else:
            sets = ", ".join(f"t.{c} = {e}" for c, e in sorted(action.items()))
            lines.append(f"{head} THEN UPDATE SET {sets}")
    if spec.not_matched is not None:
        cond, ins = spec.not_matched
        head = "WHEN NOT MATCHED" + (f" AND {cond}" if cond else "")
        cols = ", ".join(sorted(ins))
        vals = ", ".join(ins[c] for c in sorted(ins))
        lines.append(f"{head} THEN INSERT ({cols}) VALUES ({vals})")
    return "\n".join(lines)


def _all(cols: list[Column]) -> Column:
    return reduce(lambda a, b: a & b, cols)


def execute_merge(
    target: DataFrame, source: DataFrame, spec: MergeSpec
) -> DataFrame:
    """Apply the spec to ``target`` with MERGE semantics, returning the
    post-merge table (same schema as ``target``).

    Matches Iceberg behavior: clauses are evaluated in order and the
    FIRST whose condition holds wins; more than one source row matching
    one target row raises (the engine cannot pick which update applies);
    a matched row that satisfies no clause passes through unchanged."""
    keys = spec.on
    # Iceberg's cardinality rule: an error only when ONE TARGET ROW has
    # multiple source matches. Duplicate source keys that match no target
    # row are legal — WHEN NOT MATCHED inserts each of them.
    dup = (
        source.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .join(target.select(*keys), keys, "left_semi")
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "execute_merge: multiple source rows match one target row on "
            f"keys {keys} (Iceberg MERGE cardinality violation)"
        )
    for df, side in ((target, "target"), (source, "source")):
        if df.filter(
            reduce(lambda a, b: a | b, [F.col(k).isNull() for k in keys])
        ).limit(1).count():
            raise ValueError(f"execute_merge: null merge key on the {side} side")

    t, s = target.alias("t"), source.alias("s")
    how = "full_outer" if spec.not_matched is not None else "left_outer"
    joined = t.join(
        s, _all([F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]), how
    )
    t_present = _all([F.col(f"t.{k}").isNotNull() for k in keys])
    s_present = _all([F.col(f"s.{k}").isNotNull() for k in keys])
    matched = t_present & s_present

    # first-matching-clause index (-1 = no clause applies / not matched)
    clause: Column | None = None
    for i, (cond, _) in enumerate(spec.matched):
        c = matched & (F.expr(cond) if cond else F.lit(True))
        clause = clause.when(c, i) if clause is not None else F.when(c, F.lit(i))
    clause_col = clause.otherwise(F.lit(-1)) if clause is not None else F.lit(-1)
    joined = joined.withColumn("__clause", clause_col)

    keep = F.lit(True)
    delete_idx = [i for i, (_, a) in enumerate(spec.matched) if a is None]
    if delete_idx:
        keep = keep & ~F.col("__clause").isin(delete_idx)
    if spec.not_matched is not None:
        nm_cond, _ = spec.not_matched
        insert_ok = F.expr(nm_cond) if nm_cond else F.lit(True)
        keep = keep & (t_present | insert_ok)

    out_cols = []
    for c in target.columns:
        v = F.col(f"t.{c}")
        for i, (_, action) in enumerate(spec.matched):
            if isinstance(action, dict) and c in action:
                v = F.when(F.col("__clause") == i, F.expr(action[c])).otherwise(v)
        if spec.not_matched is not None:
            _, ins = spec.not_matched
            nv = F.expr(ins[c]) if c in ins else F.lit(None).cast(
                target.schema[c].dataType
            )
            v = F.when(~t_present & s_present, nv).otherwise(v)
        out_cols.append(v.alias(c))
    return joined.filter(keep).select(*out_cols)


def members_merge_spec() -> MergeSpec:
    """The actions-commit merge: deletes drop the member row, isolates
    re-point sort/location — committing ``plan_isolation``/``plan_delete``
    output into the members table. Semantically identical to
    ``operators.actions.maintain_members`` (equality-tested), which is the
    join formulation a non-transactional parquet deployment uses."""
    return MergeSpec(
        on=["image_id"],
        matched=[
            ("s.action = 'delete'", None),
            (
                "s.action = 'isolate'",
                {"sort": "'isolated'", "location": "s.to_location"},
            ),
        ],
    )
