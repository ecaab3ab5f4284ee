"""Streaming dedup-index maintenance: continuous corpus dedup via foreachBatch.

The batch operator ``dedup_against_corpus`` (operators/dedup.py) answers "is
this NEW slice a duplicate of the historical corpus?" once; a live ingest
pipeline needs the same decision per micro-batch with the index GROWING as
batches are accepted. ``run_incremental_dedup`` wires that loop:

    per micro-batch B (foreachBatch):
      1. key B by a content digest; keep min(id) per digest  (in-batch dedup)
      2. anti-join the keyed batch against the persisted digest index
      3. append the surviving digests to the index, partitioned by batch id
      4. write the accepted (digest, id) rows to the output, same partitioning

Exactly-once without a transactional store: both writes go to
``.../batch=<batch_id>/`` with mode=overwrite, so a replayed micro-batch
(checkpoint recovery) overwrites its own previous output instead of
double-appending — idempotent by construction. The index is an ordinary
partitioned parquet dataset; at 100 TB the anti-join is a shuffle join on a
narrow digest column (the same shape as ``dedup_against_corpus``, which
measured sub-linear in BASELINE.md), and the per-batch append is O(new
uniques). Reading the index back each batch is a metadata-cheap parquet scan
that Catalyst prunes to the digest column.

Ordering note: cross-batch "first occurrence" is arrival order (earlier batch
wins), which is the streaming-correct semantics; within a batch the winner is
min(id), making every batch deterministic under replay.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INDEX_SCHEMA = T.StructType([T.StructField("digest", T.StringType(), False)])
# On-disk layout: index_dir/batch=<id>/*.parquet — `batch` is a partition
# column, so per-batch reads/excludes are directory-pruned, never scanned.
INDEX_SCHEMA_PARTITIONED = T.StructType(
    [
        T.StructField("digest", T.StringType(), False),
        T.StructField("batch", T.LongType(), True),
    ]
)


def read_index(
    spark: SparkSession, index_dir: str, exclude_batch: int | None = None
) -> DataFrame:
    """The digest index as a DataFrame.

    Empty ONLY when nothing has been accepted yet (the directory does not
    exist or holds no batch partitions); any real read failure — corrupt
    footer, permission error — propagates and fails the micro-batch instead
    of silently disabling dedup and admitting duplicates.

    ``exclude_batch`` drops that batch's own partition from the read. A
    replayed micro-batch (crash after the index write but before the
    checkpoint commit) must not see the digests IT wrote: the anti-join
    would find every row "already indexed", compute an empty survivor set,
    and overwrite both out/batch=N and index/batch=N with nothing —
    silently losing the batch. Excluding batch=N restores the exact
    pre-write view, making replay a true overwrite-with-same-data.
    """
    if not os.path.isdir(index_dir) or not any(
        name.startswith("batch=") for name in os.listdir(index_dir)
    ):
        return spark.createDataFrame([], INDEX_SCHEMA)
    df = (
        spark.read.option("basePath", index_dir)
        .schema(INDEX_SCHEMA_PARTITIONED)
        .parquet(index_dir)
    )
    if exclude_batch is not None:
        df = df.filter(F.col("batch") != F.lit(int(exclude_batch)))
    return df.select("digest")


def make_dedup_batch_processor(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    digest: Column,
    id_col: str = "doc_id",
):
    """The foreachBatch callback implementing steps 1-4 above."""

    def process(batch: DataFrame, batch_id: int) -> None:
        keyed = batch.select(F.col(id_col), digest.alias("digest"))
        batch_first = keyed.groupBy("digest").agg(F.min(id_col).alias(id_col))
        fresh = batch_first.join(
            read_index(spark, index_dir, exclude_batch=batch_id), "digest", "left_anti"
        )
        # Overwrite-into-batch-dir makes checkpoint replays idempotent.
        # ORDER MATTERS: the accepted output materializes FIRST (one action —
        # its plan reads the index WITHOUT this batch); the index append then
        # reads those materialized rows back rather than re-evaluating
        # `fresh`, whose anti-join would now see its own digests and emit
        # nothing (lazy-plan recompute hazard).
        accepted_dir = os.path.join(out_dir, f"batch={batch_id}")
        fresh.write.mode("overwrite").parquet(accepted_dir)
        spark.read.parquet(accepted_dir).select("digest").write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )

    return process


def run_incremental_dedup(
    spark: SparkSession,
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    digest: Column,
    id_col: str = "doc_id",
) -> None:
    """Run the maintenance loop over a (finite or live) stream; with
    Trigger.AvailableNow this catches up on everything unprocessed and stops,
    leaving the index and accepted-output datasets on disk."""
    q = (
        stream.writeStream.foreachBatch(
            make_dedup_batch_processor(spark, index_dir, out_dir, digest, id_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def accepted(spark: SparkSession, out_dir: str, id_col: str = "doc_id") -> DataFrame:
    """The accepted (digest, id) rows across all batches so far."""
    df = spark.read.parquet(out_dir)
    return df.select("digest", F.col(id_col).cast("long").alias(id_col))
