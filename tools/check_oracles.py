"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, then
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from ordinarydumpdeduplicator_spark.session import get_spark  # noqa: E402
from ordinarydumpdeduplicator_spark.sources.catalog import (  # noqa: E402
    TESTDATA_TABLES,
)


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    # rows may contain None (e.g. ROLLUP groups) — sort by repr for stability
    return sorted(normed, key=repr), [cols[i] for i in order]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # data-dependent oracles (IVF centroid literals) must train on the
    # same sf this run queries
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sn, sc = norm_rows(scols, [tuple(r) for r in srows])
        dn, dc = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif len(sn) != len(dn):
            print(f"FAIL  {name}: rowcount spark={len(sn)} duck={len(dn)}")
            n_fail += 1
        elif sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(sn)} rows")
    print("entry():", entrymod.entry(spark).count(), "rows")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
