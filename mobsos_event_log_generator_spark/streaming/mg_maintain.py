"""Streaming Misra-Gries heavy-hitter maintenance (foreachBatch).

The SECOND streaming sketch family next to ``cms_maintain``: where CMS keeps
a fixed grid and merges by cell-wise ADDITION (order-free, partition-sum),
Misra-Gries keeps at most k (key, count) counters and merges SEQUENTIALLY —
state_t = reduce(merge(state_{t-1}, batch_t counts)) with reduce subtracting
the (k+1)-th largest merged count from every counter and dropping the
non-positive ones (Misra & Gries 1982; the mergeable-summaries reduction of
Agarwal et al. PODS'12 — public algorithms). The classic guarantee carries
through merges: every key's true count is undercounted by at most the sum of
subtracted thresholds, and any key with true count > n/(k+1) is still
present.

Exactly-once under replay: batch b reads the IMMUTABLE state written by
batch b-1 and OVERWRITES ``batch=<b>`` — a crashed batch recomputes from the
same input state, never double-subtracts. The per-batch reduction is
deterministic: the (k+1)-th largest under the total order (count DESC, key)
via a distributed top-(k+1) (TakeOrderedAndProject — never a global
single-partition sort), so the whole state trajectory is replayable by the
oracle batch for batch.

Scale shape: per-batch work is one map-side-combined count aggregation plus
a union with <= k state rows; the state is O(k) forever. This is the sketch
for "which keys dominate", where CMS answers "how often is THIS key".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MG_SCHEMA = "key BIGINT, cnt BIGINT"


def _reduce_mg(merged: DataFrame, k: int) -> DataFrame:
    """Drop to <= k counters: subtract the (k+1)-th largest count (0 when
    fewer than k+1 keys) and keep the strictly positive remainder.

    The merged (state ∪ batch) aggregate is checkpointed so it computes
    once per micro-batch — the crossJoin-of-own-threshold form re-ran it
    for the top-(k+1), the threshold, and the subtraction; the threshold
    itself is k+1 collected rows (bounded by the sketch size), folded in
    as a literal.

    Fault-tolerance note (r11 ADVICE): ``localCheckpoint`` blocks live in
    executor storage only — they are NOT fault-tolerant, so an executor
    loss mid-batch fails the streaming query instead of recomputing
    lineage. Acceptable in local mode (this engine's test posture); on a
    cluster the exactly-once contract still holds because foreachBatch
    replays the failed batch from the stream checkpoint, at the cost of a
    restart. Use a reliable ``checkpoint()`` on durable storage if batch
    restarts are too expensive at your scale."""
    merged = merged.localCheckpoint(eager=True)
    top = merged.orderBy(F.col("cnt").desc(), F.col("key")).limit(k + 1).collect()
    t = min(r["cnt"] for r in top) if len(top) == k + 1 else 0
    return merged.select("key", (F.col("cnt") - F.lit(t)).alias("cnt")).filter(
        F.col("cnt") > 0
    )


def read_mg_state(spark: SparkSession, state_dir: str, batch_id: int) -> DataFrame:
    path = os.path.join(state_dir, f"batch={batch_id}")
    if not os.path.isdir(path):
        return spark.createDataFrame([], MG_SCHEMA)
    return spark.read.schema(MG_SCHEMA).parquet(path)


def read_final_mg(spark: SparkSession, state_dir: str) -> DataFrame:
    """The state written by the LAST completed batch."""
    if not os.path.isdir(state_dir):
        return spark.createDataFrame([], MG_SCHEMA)
    ids = [
        int(name.split("=", 1)[1])
        for name in os.listdir(state_dir)
        if name.startswith("batch=")
    ]
    if not ids:
        return spark.createDataFrame([], MG_SCHEMA)
    return read_mg_state(spark, state_dir, max(ids))


def run_mg_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    key_col: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 8,
) -> None:
    """Maintain the k-counter summary over a finite stream (AvailableNow)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        counts = batch.groupBy(F.col(key_col).cast("long").alias("key")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        prev = read_mg_state(spark, state_dir, batch_id - 1)
        merged = (
            prev.unionByName(counts)
            .groupBy("key")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        reduced = _reduce_mg(merged, k)
        reduced.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
