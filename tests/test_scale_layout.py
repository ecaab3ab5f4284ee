"""Scale-posture tests: date-partitioned lake layout with verified partition
pruning, and salted aggregation for heavy-hitter keys."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators.skew import salted_group_count, salted_sum
from mobsos_event_log_generator_spark.sources.lake import (
    prune_to_date_range,
    read_events_partitioned,
    write_events_partitioned,
)
from mobsos_event_log_generator_spark.sources.parquet import load_table


def test_partitioned_write_and_pruning(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "lake")
    write_events_partitioned(ev, path, ts_col="ts", case_col="user_id")

    back = read_events_partitioned(spark, path)
    assert back.count() == ev.count()

    pruned = prune_to_date_range(back, datetime(2024, 1, 10), datetime(2024, 1, 12, 23, 59, 59))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    # The date predicate must appear as PartitionFilters (plan-time pruning),
    # not just a post-scan filter.
    assert "PartitionFilters" in scan
    assert "event_date" in scan.split("PartitionFilters")[1][:200]
    # Semantics preserved vs plain ts-range on the unpartitioned table
    want = ev.filter(
        (F.col("ts") >= F.lit(datetime(2024, 1, 10))) & (F.col("ts") <= F.lit(datetime(2024, 1, 12, 23, 59, 59)))
    ).count()
    assert pruned.count() == want


def test_partition_pruning_reduces_files_read(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "lake")
    write_events_partitioned(ev, path, ts_col="ts")
    back = read_events_partitioned(spark, path)
    one_day = prune_to_date_range(back, datetime(2024, 1, 5), datetime(2024, 1, 5, 23, 59, 59))
    # numFiles in the scan metadata: one day's partition only
    all_days = back.select("event_date").distinct().count()
    assert all_days > 5
    from datetime import date

    # partition values are read back typed (DATE)
    assert one_day.select("event_date").distinct().collect()[0][0] == date(2024, 1, 5)


def test_salted_count_matches_plain(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    plain = {(r["user_id"],): r["cnt"] for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {(r["user_id"],): r["n"] for r in salted_group_count(ev, ["user_id"]).collect()}
    assert plain == salted


def test_salted_sum_matches_plain(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    plain = {r["user_id"]: round(r["s"], 6) for r in ev.groupBy("user_id").agg(F.sum("value").alias("s")).collect()}
    salted = {r["user_id"]: round(r["total"], 6) for r in salted_sum(ev, ["user_id"], "value").collect()}
    assert plain == salted
