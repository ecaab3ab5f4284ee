"""Single-slice DataFrame builder for small driver-built result/dim tables.

``spark.createDataFrame(list, schema)`` splits even a 7-row list into
``defaultParallelism`` slices — at local[32] that is 32 single-row Python
tasks whose worker round-trips cost ~0.3 s of pure overhead per call
(measured r12; the noop-save stage of every driver-assembled report showed
32 tasks x ~300 ms with zero I/O). These tables are CONTRACTUALLY BOUNDED
(round reports, k winners, quantile grids), so one slice carries them in one
task; results are identical — partition count never affects row content, and
every consumer either aggregates, broadcasts, or is the final output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def driver_rows_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """``createDataFrame`` for a BOUNDED driver-side row list, in one slice."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
