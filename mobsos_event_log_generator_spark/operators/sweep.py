"""Distributed sweep-line: global running aggregates without a global sort.

A naive global running sum is ``Window.orderBy(ts)`` with no partition key —
Spark executes that as a SINGLE partition holding the entire input, which is
the canonical 100-TB scale-killer. The two-phase shape here is the standard
distributed prefix-sum:

1. bucket rows by a fixed time grain and cumsum WITHIN each bucket (parallel
   across buckets, one shuffle);
2. cumsum the per-bucket totals (one row per bucket — days/hours, thousands of
   rows at any corpus size, so the single-partition window there is O(buckets)
   not O(rows)) and add each bucket's predecessor-offset back via an equi-join
   (broadcast: the offsets table is tiny).

The result equals the single-sort running sum exactly, for any total order
(ts, *tie_cols) that refines the bucket order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_running_sum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    tie_cols: list[str],
    out_col: str = "running",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Inclusive global running sum of ``value_col`` over the total order
    (``ts_col``, ``*tie_cols``). Adds ``out_col`` and keeps all input columns.
    ``tie_cols`` must make the order total or the result is nondeterministic.
    """
    bucket_us = bucket_seconds * 1_000_000
    bucketed = df.withColumn("__bucket", F.expr(f"unix_micros(`{ts_col}`) div {bucket_us}"))
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(ts_col), *[F.col(c) for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn("__within", F.sum(value_col).over(w_in))
    totals = bucketed.groupBy("__bucket").agg(F.sum(value_col).alias("__total"))
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket", F.coalesce(F.sum("__total").over(w_b), F.lit(0)).alias("__offset")
    )
    out = within.join(F.broadcast(offsets), "__bucket").withColumn(
        out_col, F.col("__offset") + F.col("__within")
    )
    return out.drop("__bucket", "__within", "__offset")


def interval_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    tie_cols: list[str],
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Change-point concurrency over closed intervals: one output row per
    boundary event with the number of intervals open immediately AFTER it.
    Touching intervals (one ends exactly where another starts) count as
    overlapping: at equal timestamps every +1 (start) is applied before any
    -1 (end). Columns: ``ts``, ``delta``, ``concurrent`` + the tie columns.
    """
    keep = [F.col(c) for c in tie_cols]
    starts = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta"), *keep
    )
    ends = intervals.select(F.col(end_col).alias("ts"), F.lit(-1).alias("delta"), *keep)
    points = starts.unionByName(ends)
    # delta DESC: starts (+1) sort before ends (-1) at the same instant.
    order_ties = ["__delta_order", *tie_cols]
    points = points.withColumn("__delta_order", -F.col("delta"))
    out = global_running_sum(
        points,
        ts_col="ts",
        value_col="delta",
        tie_cols=order_ties,
        out_col="concurrent",
        bucket_seconds=bucket_seconds,
    )
    return out.drop("__delta_order")
