"""Parquet lake sources.

The reference reads MySQL eagerly into pandas (event_reader.py:71-72). The lake
path here is columnar parquet: Catalyst prunes columns and pushes predicates
into the scan (verify with ``df.explain`` → ``PushedFilters`` / ``ReadSchema``),
and at 100 TB the event table is expected to be date-partitioned
(``partitionBy(event_date)``) so range filters prune whole partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KNOWN_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    The fixtures store ``events.ts`` as parquet TIMESTAMP(NANOS); Spark's
    reader only accepts it via ``spark.sql.legacy.parquet.nanosAsLong``, so it
    arrives as epoch-nanos LongType and is converted to a microsecond
    timestamp here (values are µs-precision, so truncation is lossless).
    """
    if name == "events":
        # Runtime-set so externally-created sessions (the driver's smoke
        # check passes its own SparkSession) can read the NANOS fixture too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # Integer div: epoch-nanos (~1.7e18) exceeds double's exact range.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Guard against pathological input layout (one giant/few files): if the
    scan yields fewer partitions than requested, round-robin repartition so
    downstream per-row-heavy operators use the whole cluster. A no-op on
    well-laid-out lake tables (thousands of splits), so it costs nothing at
    100 TB but un-serializes small local fixtures."""
    min_partitions = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = KNOWN_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_temp_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = KNOWN_TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` can use it."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
