"""Lake-table layout for the event log at scale (SURVEY.md §7.4.5).

At 100 TB the event table must be date-partitioned so the reference's
ubiquitous time-range queries (F5) prune whole directories instead of
scanning: ``events/event_date=YYYY-MM-DD/part-*.parquet``. This module owns
that layout:

* ``write_events_partitioned`` — lands an EVENTLOG/events DataFrame
  partitioned by the UTC date of its timestamp. Within a partition, rows are
  sorted by the case key so per-case data co-locates in row groups (better
  compression + row-group skipping for resource/case filters).
* ``read_events_partitioned`` — reads the layout back; any ``event_date``
  filter (or a timestamp range rewritten onto it) becomes partition pruning,
  visible as ``PartitionFilters`` in the scan.
* ``prune_to_date_range`` — rewrites a timestamp closed interval into the
  redundant-but-prunable ``event_date`` predicate (Catalyst cannot infer
  ``date(ts) BETWEEN`` from ``ts BETWEEN`` across a partition column).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "event_date"


def write_events_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    case_col: str | None = None,
    max_records_per_file: int | None = 5_000_000,
) -> None:
    out = df.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    if case_col is not None:
        # Co-locate each case's rows within files (row-group locality).
        out = out.repartition(F.col(PARTITION_COL)).sortWithinPartitions(PARTITION_COL, case_col, ts_col)
    writer = out.write.mode("overwrite").partitionBy(PARTITION_COL)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_events_partitioned(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Read the layout back. ``merge_schema=True`` reconciles schema
    evolution across partitions (columns added over the table's lifetime):
    the unified schema is the union of all file schemas and early files
    surface the late-added columns as NULL. Off by default — schema merging
    footers across a 100 TB table is a planning-time cost you opt into, and
    writers should evolve additively (never retype a column: parquet footer
    merging refuses conflicting types)."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def prune_to_date_range(
    df: DataFrame,
    start: datetime | str | None,
    end: datetime | str | None,
    ts_col: str = "ts",
) -> DataFrame:
    """Apply a closed timestamp interval AND its date-partition projection.

    The ``event_date`` bounds are derivable from the ts bounds (date truncation
    is monotone), so adding them is semantics-preserving — but only the
    explicit date predicate prunes partitions at plan time."""
    if start is not None:
        df = df.filter(
            (F.col(ts_col) >= F.lit(start)) & (F.col(PARTITION_COL) >= F.date_format(F.lit(start), "yyyy-MM-dd"))
        )
    if end is not None:
        df = df.filter(
            (F.col(ts_col) <= F.lit(end)) & (F.col(PARTITION_COL) <= F.date_format(F.lit(end), "yyyy-MM-dd"))
        )
    return df


def upsert_partitions(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    case_col: str | None = None,
    max_records_per_file: int | None = 5_000_000,
) -> None:
    """Idempotent partition-level upsert without a table format: dynamic
    partition overwrite replaces ONLY the date partitions present in ``df``
    and leaves every other partition untouched — the non-Delta idiom for
    late-arriving or corrected event slices ("re-land day X") on a
    date-partitioned lake. Static overwrite mode would silently truncate
    the whole table, so the dynamic conf is pinned per-write and restored.

    Replayable by construction: landing the same slice twice converges to
    the same bytes, which is what checkpointed ingest (streaming/ingest.py)
    needs from its sink on recovery."""
    spark = df.sparkSession
    out = df.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    if case_col is not None:
        out = out.repartition(F.col(PARTITION_COL)).sortWithinPartitions(PARTITION_COL, case_col, ts_col)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer = out.write.mode("overwrite").partitionBy(PARTITION_COL)
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.parquet(path)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def compact_partition(
    spark: SparkSession,
    path: str,
    partition_value: str,
    target_files: int = 1,
    case_col: str | None = None,
    ts_col: str = "ts",
) -> int:
    """Rewrite one date partition's small files into ``target_files`` sorted
    files (the maintenance job every streaming-landed lake needs: per-trigger
    micro-batches each land a file, and a month of 1-minute triggers is 43k
    tiny files whose footer reads dominate scan planning). Reads only the one
    partition directory, writes via a temp staging dir, then swaps — the
    partition is briefly absent rather than ever double-counted. Returns the
    number of rows compacted.

    The staging dir is DOT-PREFIXED (``.compact_tmp_...``) inside the table
    root: Spark/Hadoop file listing skips ``.``/``_``-prefixed paths, so a
    concurrent reader never sees staged rows as a phantom partition — not
    during the swap, and not permanently if the job dies between the staged
    write and the swap (a crash leaves only an invisible dir that the next
    compaction run overwrites). Same filesystem as the partition, so the
    final ``os.replace`` stays an atomic rename."""
    import os
    import shutil

    part_dir = os.path.join(path, f"{PARTITION_COL}={partition_value}")
    part = spark.read.parquet(part_dir)
    n = part.count()
    staged = part.coalesce(target_files)
    if case_col is not None:
        staged = staged.sortWithinPartitions(case_col, ts_col)
    tmp = os.path.join(path, f".compact_tmp_{PARTITION_COL}={partition_value}")
    staged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(part_dir)
    os.replace(tmp, part_dir)
    # Drop the staging _SUCCESS marker noise; the swapped dir is the partition.
    success = os.path.join(part_dir, "_SUCCESS")
    if os.path.exists(success):
        os.remove(success)
    return n


def interleave_bits(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two NORMALIZED integer columns in
    ``[0, 2^bits)``: bit j of x lands at position 2j, bit j of y at 2j+1.
    The multi-dimensional clustering key behind data-skipping layouts
    (Delta OPTIMIZE ZORDER, Iceberg sort orders): sorting files by the
    interleaved value keeps rows close in BOTH dimensions close in file
    order, so per-file min/max stays tight per dimension and a filter on
    either column prunes files.

    Pure integral multiply/add arithmetic (bit j extracted as
    ``(v div 2^j) % 2``) — bit-identical on any engine, no floats anywhere.
    Callers normalize with exact integer math, e.g.
    ``((v - lo) * (2^bits - 1)) div (hi - lo)`` via ``F.expr``."""
    xl = x.cast("long")
    yl = y.cast("long")
    out = F.lit(0).cast("long")
    for j in range(bits):
        xbit = F.shiftright(xl, j) % 2
        ybit = F.shiftright(yl, j) % 2
        out = out + xbit * F.lit(2 ** (2 * j)) + ybit * F.lit(2 ** (2 * j + 1))
    return out


def zorder_layout(
    df: DataFrame,
    zvalue_col: str,
    out_dir: str,
    num_files: int = 32,
) -> None:
    """Write ``df`` clustered by a precomputed Z-order value: range-partition
    on the z-value (sampled range boundaries — a total order without a
    single-partition sort) and sort within each file. Each output file then
    covers one compact segment of the space-filling curve, which is what
    makes per-file min/max skipping effective on every interleaved
    dimension."""
    (
        df.repartitionByRange(num_files, F.col(zvalue_col))
        .sortWithinPartitions(zvalue_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
