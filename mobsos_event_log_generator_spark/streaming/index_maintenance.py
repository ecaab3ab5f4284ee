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


def read_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The digest index as a DataFrame (empty if nothing accepted yet)."""
    try:
        return spark.read.schema(INDEX_SCHEMA).parquet(index_dir).select("digest")
    except Exception:
        return spark.createDataFrame([], INDEX_SCHEMA)


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
        fresh = batch_first.join(read_index(spark, index_dir), "digest", "left_anti")
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
