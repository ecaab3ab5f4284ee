"""Time every queries() entry + oracle the way the driver would.

The driver uses its OWN plain SparkSession (no session.py conf) and runs each
Spark query to completion (toPandas-equivalent collect) plus the DuckDB oracle.
This harness reports per-query wall seconds so we can budget the driver's
correctness pass (CORRECTNESS_r01 truncated at 50/92 entries — time budget).

Usage: python tools/time_registry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    t0 = time.time()
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("time-registry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t_session = time.time() - t0

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = e.queries(), e.oracle_sql()
    timings = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t1 = time.time()
        try:
            fn(spark, sf_dir).toPandas()
        except Exception as ex:
            timings[name] = {"spark_s": -1.0, "err": str(ex)[:100]}
            continue
        t_spark = time.time() - t1
        t2 = time.time()
        if name in oracles:
            try:
                con.execute(oracles[name]).df()
            except Exception as ex:
                timings[name] = {"spark_s": round(t_spark, 2), "oracle_err": str(ex)[:100]}
                continue
        t_oracle = time.time() - t2
        timings[name] = {"spark_s": round(t_spark, 2), "oracle_s": round(t_oracle, 2)}

    total = sum(v.get("spark_s", 0) + v.get("oracle_s", 0) for v in timings.values())
    print(json.dumps({"session_s": round(t_session, 2), "total_s": round(total, 2)}))
    for name, v in sorted(timings.items(), key=lambda kv: -(kv[1].get("spark_s", 0) + kv[1].get("oracle_s", 0))):
        print(f"{v.get('spark_s', 0):7.2f}s spark {v.get('oracle_s', 0):6.2f}s oracle  {name}"
              + (f"  ERR {v.get('err') or v.get('oracle_err')}" if ("err" in v or "oracle_err" in v) else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
