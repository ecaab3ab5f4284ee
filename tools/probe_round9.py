"""Round-9 probe: the portable-sketch lane at x10 / x100 events (and x10
lineitem) — does each registered plan keep its documented scale shape when
the corpus grows two decades past the sf0.1 fixture?

Scaling model: replicate events with user_id/event_id offsets (distinct
users scale xN, daily counts scale xN, the CALENDAR stays fixed — exactly
the axis the calendar-bounded band joins must be invariant to) and
lineitem with l_orderkey offsets. Expected shapes:
* HLL lanes: register table stays <= 256 rows/day at ANY xN (the merge
  state), runtime ~linear in rows (hash+partial-max scan).
* KMV lanes: the per-day sort input is distinct users/day (xN) — linear-
  ithmic; the registered plan documents the per-partition bottom-k
  swap-in past that.
* EWMA / Holt / Mann-Kendall: calendar-bounded after the daily collapse —
  runtime flat in N once the pre-agg scan is paid.
* histogram quantiles: bucket table bounded (~120 x flags), exact lane
  narrowed to one bucket — ~linear scan cost.

Usage: python tools/probe_round9.py [x10|x100 ...]   (default: x10 x100)
Writes scaled tables under /tmp/spark_graft_probe9/<xN>/ once and reuses.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_probe9"
CAP_SEC = 360.0

PROBES = (
    "sketch_hll_portable_daily",
    "sketch_hll_union_monthly",
    "sketch_kmv_distinct_daily",
    "events_kmv_day_overlap",
    "events_ewma_daily",
    "events_holt_linear_daily",
    "events_mann_kendall_daily",
    "lineitem_histogram_quantiles",
    "lineitem_welch_ttest",
)


def build_scaled(spark, factor: int) -> str:
    out = os.path.join(OUT, f"x{factor}")
    if os.path.isdir(out) and os.path.isdir(os.path.join(out, "events.parquet")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    li_factor = min(factor, 10)  # x10 cap: the exact-audit lane is the bound
    reps_li = spark.range(li_factor).select(F.col("id").alias("rep"))
    (
        li.crossJoin(reps_li)
        .select(
            (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )
    return out


def main() -> int:
    factors = [int(a.lstrip("x")) for a in (sys.argv[1:] or ["x10", "x100"])]
    from mobsos_event_log_generator_spark.session import get_spark
    from mobsos_event_log_generator_spark.plans.queries import QUERIES

    spark = get_spark("probe-round9")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for factor in factors:
        sf_dir = build_scaled(spark, factor)
        print(f"== x{factor} (events {100_000 * factor:,}, "
              f"lineitem {600_000 * min(factor, 10):,}) ==")
        for name in PROBES:
            t0 = time.perf_counter()
            try:
                n = QUERIES[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                flag = "SLOW" if dt > CAP_SEC else "ok"
                print(f"{flag:5s} {name}: {dt:.1f}s, {n} rows")
                if dt > CAP_SEC:
                    failures.append((factor, name, dt))
            except Exception as ex:  # noqa: BLE001
                print(f"FAIL  {name}: {str(ex)[:200]}")
                failures.append((factor, name, None))
    print("failures:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
