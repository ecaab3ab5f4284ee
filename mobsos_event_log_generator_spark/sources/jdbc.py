"""Partitioned JDBC source for the MobSOS MySQL tables.

Reference behavior: a single-threaded ``pd.read_sql`` over SQLAlchemy+PyMySQL
(event_reader.py:71-85) — one connection, fully materialized in driver memory.
Here the scan is Spark's JDBC data source with range partitioning on
``TIME_STAMP`` so N executors read N disjoint slices in parallel, and Catalyst
pushes filters/column pruning into the generated SQL (same effect as the
reference's hand-built WHERE clause, event_reader.py:59-69, but automatic).

No MySQL is available in the test environment; the live JDBC path is
integration-tested end-to-end against embedded Apache Derby (bundled with
Spark — ``tests/test_jdbc_derby.py``: partitioned range scan, filter/column
pushdown, high-watermark incremental polling, DB→XES pipeline), and the
MySQL-specific option construction is covered by unit tests.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

EVENTLOG_TABLE = "LAS2PEERMON.EVENTLOG"
MESSAGE_TABLE = "LAS2PEERMON.MESSAGE"
DEFAULT_NUM_PARTITIONS = 64


def jdbc_reader_options(
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str = "TIME_STAMP",
    lower_bound: datetime | str | None = None,
    upper_bound: datetime | str | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    driver: str = "com.mysql.cj.jdbc.Driver",
) -> dict[str, str]:
    """Build the option dict for a partitioned JDBC read.

    ``partitionColumn``/bounds split the scan into ``num_partitions`` parallel
    range queries — the scale-out replacement for the reference's single
    cursor. Bounds only shape the split; they do NOT filter (Spark adds
    unbounded first/last partitions), so correctness never depends on them.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": driver,
        "fetchsize": "10000",
        # Push aggregates (MIN/MAX/COUNT) into MySQL when possible (DSv2).
        "pushDownAggregate": "true",
        "pushDownLimit": "true",
    }
    if lower_bound is not None and upper_bound is not None:
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def read_jdbc_table(spark: SparkSession, **options: str) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
