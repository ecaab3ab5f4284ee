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

    Timestamp normalization: the fixtures store naive (no-timezone) parquet
    timestamps, which Spark 4 reads as TIMESTAMP_NTZ, while older fixture
    generations used TIMESTAMP(NANOS) (readable only via
    ``spark.sql.legacy.parquet.nanosAsLong`` as epoch-nanos LongType). Every
    timestamp column is normalized here to plain TIMESTAMP (LTZ) under a UTC
    session timezone, so downstream epoch math (``unix_micros``) and µs-string
    formatting behave identically in ANY caller session — including the
    driver's own plain SparkSession — and match DuckDB's naive-timestamp
    arithmetic on the same files. Confs are runtime-set (not builder-set) for
    exactly that reason.
    """
    # NTZ→LTZ cast interprets the wall clock in the session timezone; pin UTC
    # so the interpretation is deterministic and matches the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # Integer div: epoch-nanos (~1.7e18) exceeds double's exact range.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if ntz_cols:
        # One projection (not a withColumn chain) keeps the analyzed plan flat.
        df = df.select(
            *[
                F.col(f.name).cast(T.TimestampType()).alias(f.name) if f.name in ntz_cols else F.col(f.name)
                for f in df.schema.fields
            ]
        )
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
