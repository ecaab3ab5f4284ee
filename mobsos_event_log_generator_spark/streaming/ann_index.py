"""Streaming ANN index maintenance: a continuously-ingested IVF index.

Composes the persisted IVF lake layout (``operators/similarity.py::
ivf_write_index`` — centroid table + corpus partitioned by cell, so probes
are pruned directory reads) with the foreachBatch maintenance loop of
``streaming/index_maintenance.py``:

    per micro-batch B (foreachBatch):
      1. if no quantizer exists yet: train one on B (deterministic md5 seeds
         + Lloyd refinement) and persist it — the streaming analogue of
         training on the first corpus snapshot;
      2. assign B's vectors to their nearest persisted centroid;
      3. write the assigned rows to ``lists/batch=<id>/cid=<c>/`` —
         overwrite-into-own-batch-dir, so checkpoint replays converge.

The maintained index is readable AT ANY TIME with the same probe-and-score
path as the batch index (``read_lists`` exposes batch+cid as partition
columns; cid-equi-join probes still prune to the probed cells). Appending
with FIXED centroids is the production ANN maintenance model (FAISS/ScaNN
style): assignment is per-row and embarrassingly parallel, while centroid
drift is handled by a periodic offline rebuild (``ivf_write_index`` over the
accumulated corpus — exactly the compaction job of ``sources/lake.py``, and
cheap relative to re-embedding). Equivalence contract (oracle-gated by
``streaming_ann_index_maintenance`` + replay units): after N micro-batches
the index holds exactly the batch assignment of the full corpus under the
batch-0-trained quantizer — batch boundaries and replays are invisible.

Crash safety mirrors the dedup index: the centroid write is guarded by its
``_SUCCESS`` marker (a torn write retrains on the same deterministic batch-0
data), and every list write lands in its own ``batch=<id>`` dir with
mode=overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mobsos_event_log_generator_spark.operators.similarity import (
    ivf_assign,
    ivf_probe_and_score,
    ivf_train,
)


def _centroids_ready(cent_dir: str) -> bool:
    return os.path.exists(os.path.join(cent_dir, "_SUCCESS"))


def make_ivf_batch_processor(
    spark: SparkSession,
    index_dir: str,
    num_centroids: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
):
    """The foreachBatch callback implementing steps 1-3 above."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        cent_dir = os.path.join(index_dir, "centroids")
        if not _centroids_ready(cent_dir):
            cents = ivf_train(batch, num_centroids, iters, id_col, vec_col, dim)
            cents.write.mode("overwrite").parquet(cent_dir)
        cents = spark.read.parquet(cent_dir)
        # dim must reach the assignment kernel (it sizes the unrolled
        # distance chain) — omitting it silently assigned over the first
        # 64 components of a wider index (r11 ADVICE class).
        assigned = ivf_assign(batch, cents, 1, id_col, vec_col, dim)
        # Cluster by cell before the partitioned write (see
        # multitable_write_index): unclustered, each batch emitted
        # tasks x num_centroids tiny files.
        (
            batch.join(assigned, id_col)
            .repartition("cid")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(os.path.join(index_dir, "lists", f"batch={batch_id}"))
        )

    return process


def run_ivf_index_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    num_centroids: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> None:
    """Run the maintenance loop; with Trigger.AvailableNow this catches up on
    every unprocessed micro-batch and stops, leaving the index on disk."""
    q = (
        stream.writeStream.foreachBatch(
            make_ivf_batch_processor(
                spark, index_dir, num_centroids, iters, id_col, vec_col, dim
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_lists(spark: SparkSession, index_dir: str) -> DataFrame:
    """The accumulated inverted lists; ``batch`` and ``cid`` surface as
    partition columns (nested ``batch=<id>/cid=<c>/`` discovery), so probe
    joins on cid still prune directories."""
    lists_dir = os.path.join(index_dir, "lists")
    return spark.read.option("basePath", lists_dir).parquet(lists_dir)


def query_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Query the streaming-maintained index — same probe-and-score core as
    the batch ``ivf_query_index``. ``dim`` defaults to the dimensionality
    persisted with the index (derived from the centroid vectors)."""
    from mobsos_event_log_generator_spark.operators.similarity import (
        index_dim_from_centroids,
    )

    cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
    if dim is None:
        dim = index_dim_from_centroids(cents)
    return ivf_probe_and_score(
        cents, read_lists(spark, index_dir), queries, k, nprobe, id_col, vec_col, dim
    )
