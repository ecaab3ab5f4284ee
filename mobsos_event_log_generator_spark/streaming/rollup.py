"""Incremental materialized-view maintenance: a streaming daily rollup kept
exactly-once without a transactional table format.

The classic problem: a foreachBatch that ADDS a micro-batch's counts into a
rollup table double-counts on checkpoint replay. The classic solution (used
here): never update in place — each micro-batch writes its PARTIAL aggregate
to its own ``batch=<id>`` partition with mode=overwrite (a replayed batch
overwrites itself, so the dataset converges), and the queryable view re-
aggregates the partials. Compaction (fold many batch partials into one) is
the same maintenance job as ``sources/lake.py::compact_partition`` and never
changes the view's value because the aggregates are commutative monoids
(count/sum/min/max).

At scale: each partial is tiny (one row per day touched by the batch), the
view-time re-aggregation is map-side combined over a narrow table, and the
rollup read never touches raw events — the whole point of maintaining it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def make_rollup_batch_processor(out_dir: str, ts_col: str = "ts", value_col: str = "value"):
    def process(batch: DataFrame, batch_id: int) -> None:
        partial = batch.groupBy(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("event_date")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
        partial.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    return process


def run_daily_rollup(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    q = (
        stream.writeStream.foreachBatch(make_rollup_batch_processor(out_dir, ts_col, value_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def daily_rollup_view(spark: SparkSession, out_dir: str) -> DataFrame:
    """The maintained view: fold all batch partials. Monoid merge — count and
    sum add — so batch boundaries and replays are invisible here."""
    partials = spark.read.parquet(out_dir)
    return partials.groupBy("event_date").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("value_sum").alias("value_sum"),
    )
