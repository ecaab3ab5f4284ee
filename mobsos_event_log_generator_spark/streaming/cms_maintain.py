"""Streaming count-min sketch maintenance (foreachBatch).

Heavy-hitter screening over an unbounded stream: each micro-batch builds its
PARTIAL sketch (the ``operators/cms.py`` cell grid over just that batch) and
OVERWRITES its own ``batch=<id>`` partition of a persisted cell index — the
same exactly-once layout as ``streaming/drift.py`` and
``index_maintenance.py``: replay of a crashed batch overwrites its partition,
never double-counts. Because CMS merge is cell-wise ADDITION (associative and
commutative), the sum over all batch partitions equals the sketch built over
the full input in one pass — which is exactly what the oracle checks, so the
gate proves the merge algebra, not just the plumbing.

Scale shape: per-batch work is one explode + map-side-combined aggregation
whose shuffle carries at most depth × width counter rows per partition; the
merged sketch stays O(depth × width) forever, no matter how many batches or
rows went through — the sketch IS the state, and it lives in the filesystem
index, not executor memory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CMS_SCHEMA = "row BIGINT, col BIGINT, cnt BIGINT"
CMS_SCHEMA_PARTITIONED = "row BIGINT, col BIGINT, cnt BIGINT, batch BIGINT"


def read_merged_cms(spark: SparkSession, index_dir: str) -> DataFrame:
    """The merged sketch: cell-wise sum over every batch partition. Missing
    index → empty grid (schema-stable); other read failures propagate."""
    if not os.path.isdir(index_dir) or not any(
        name.startswith("batch=") for name in os.listdir(index_dir)
    ):
        return spark.createDataFrame([], CMS_SCHEMA)
    df = (
        spark.read.option("basePath", index_dir)
        .schema(CMS_SCHEMA_PARTITIONED)
        .parquet(index_dir)
    )
    return df.groupBy("row", "col").agg(F.sum("cnt").cast("long").alias("cnt"))


def run_cms_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    key_col: str,
    index_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 64,
) -> None:
    """Maintain the sketch over a finite stream (Trigger.AvailableNow)."""
    from mobsos_event_log_generator_spark.operators.cms import build_cms

    def process(batch: DataFrame, batch_id: int) -> None:
        cells = build_cms(batch, key_col, depth=depth, width=width)
        cells.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
