"""Continuous distribution-drift monitoring (foreachBatch).

Feature stores and training pipelines watch every incoming batch for
distribution shift against what the model has already seen. This module
maintains a banded value histogram as a persisted, batch-partitioned index
(the same exactly-once layout as streaming/index_maintenance.py: each batch
OVERWRITES its own ``batch=<id>`` partition, and reads exclude the batch's
own partition so crash-replay is idempotent), and emits one drift row per
micro-batch comparing the batch against the cumulative history before it.

Drift is the integer L1 form from the weekly-drift operator (no float
frequencies): with band counts n_b for the current batch (total T_cur) and
h_b for history (total T_prev),

    l1_num = Σ_b |n_b·T_prev − h_b·T_cur|,   denom = T_cur·T_prev,
    drift_ppm = l1_num·10⁶ div denom   —   exact integers end to end.

(The L1 distance between the two normalized histograms is l1_num/denom ∈
[0, 2].) The first batch has no history and emits nothing.

Scale shape: per-batch work is one map-side-combined band aggregation (the
band table is O(bands), not O(rows)) plus a broadcast-sized read of the
history bands; state lives in the filesystem index, not executor memory, so
a year of history costs the same per batch as a day.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BAND_SCHEMA = "band BIGINT, n BIGINT"
BAND_SCHEMA_PARTITIONED = "band BIGINT, n BIGINT, batch BIGINT"


def read_bands(spark: SparkSession, index_dir: str, exclude_batch: int | None = None) -> DataFrame:
    """Cumulative per-band history counts. Missing index → empty; any other
    read failure propagates (silently dropping history would zero the
    baseline and mask real drift). ``exclude_batch`` removes the calling
    batch's own partition so crash-replay sees the pre-write view."""
    if not os.path.isdir(index_dir) or not any(
        name.startswith("batch=") for name in os.listdir(index_dir)
    ):
        return spark.createDataFrame([], BAND_SCHEMA)
    df = (
        spark.read.option("basePath", index_dir)
        .schema(BAND_SCHEMA_PARTITIONED)
        .parquet(index_dir)
    )
    if exclude_batch is not None:
        df = df.filter(F.col("batch") != F.lit(int(exclude_batch)))
    return df.groupBy("band").agg(F.sum("n").alias("n"))


def run_drift_monitor(
    spark: SparkSession,
    stream: DataFrame,
    band: Column,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Run the monitor over a finite stream (Trigger.AvailableNow) — each
    micro-batch appends its band counts to the index and, when history
    exists, writes one drift row to ``out_dir/batch=<id>``."""

    def process(batch: DataFrame, batch_id: int) -> None:
        cur = batch.select(band.alias("band")).groupBy("band").agg(
            F.count(F.lit(1)).alias("n")
        )
        hist = read_bands(spark, index_dir, exclude_batch=batch_id)
        t_cur = cur.agg(F.coalesce(F.sum("n"), F.lit(0))).first()[0]
        t_prev = hist.agg(F.coalesce(F.sum("n"), F.lit(0))).first()[0]
        if t_cur > 0 and t_prev > 0:
            joined = (
                cur.withColumnRenamed("n", "n_cur")
                .join(hist.withColumnRenamed("n", "n_prev"), "band", "full")
                .select(
                    F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
                    F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
                )
            )
            l1 = joined.agg(
                F.sum(F.abs(F.col("n_cur") * t_prev - F.col("n_prev") * t_cur)).alias("l1_num")
            ).first()[0]
            row = spark.createDataFrame(
                [
                    (
                        int(batch_id),
                        int(t_cur),
                        int(t_prev),
                        int(l1),
                        int(t_cur) * int(t_prev),
                        (int(l1) * 1_000_000) // (int(t_cur) * int(t_prev)),
                    )
                ],
                "batch_id BIGINT, t_cur BIGINT, t_prev BIGINT, l1_num BIGINT, denom BIGINT, drift_ppm BIGINT",
            )
            row.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
        if t_cur > 0:
            cur.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(index_dir, f"batch={batch_id}")
            )

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def drift_rows(spark: SparkSession, out_dir: str) -> DataFrame:
    """The emitted drift rows (empty schema-stable frame if none)."""
    schema = "batch_id BIGINT, t_cur BIGINT, t_prev BIGINT, l1_num BIGINT, denom BIGINT, drift_ppm BIGINT"
    if not os.path.isdir(out_dir) or not any(
        name.startswith("batch=") for name in os.listdir(out_dir)
    ):
        return spark.createDataFrame([], schema)
    part = "batch_id BIGINT, t_cur BIGINT, t_prev BIGINT, l1_num BIGINT, denom BIGINT, drift_ppm BIGINT, batch BIGINT"
    return (
        spark.read.option("basePath", out_dir)
        .schema(part)
        .parquet(out_dir)
        .select("batch_id", "t_cur", "t_prev", "l1_num", "denom", "drift_ppm")
    )
