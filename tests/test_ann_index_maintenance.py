"""Streaming IVF index maintenance (streaming/ann_index.py): batch
equivalence after N micro-batches, checkpoint-replay idempotency, and
partition pruning on the maintained lists."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators.similarity import ivf_assign, ivf_train
from mobsos_event_log_generator_spark.sources.parquet import ensure_min_partitions, load_table
from mobsos_event_log_generator_spark.streaming.ann_index import (
    make_ivf_batch_processor,
    query_index,
    read_lists,
    run_ivf_index_maintenance,
)

SF = "/root/testdata/sf0.001"


def _slices(emb, n=4):
    mn, mx = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    span = int(mx) + 1 - int(mn)
    return [
        emb.filter(
            (F.col("vec_id") >= int(mn) + span * i // n)
            & (F.col("vec_id") < int(mn) + span * (i + 1) // n)
        )
        for i in range(n)
    ]


def _stream_fixture(spark, emb, root):
    import shutil

    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)
    for i, part in enumerate(_slices(emb)):
        tmp = os.path.join(root, f"part_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        pq = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"slice_{i}.parquet")
        shutil.copyfile(os.path.join(tmp, pq), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return src


def test_streamed_index_equals_batch_assignment(spark, tmp_path):
    """After 4 micro-batches the maintained lists hold EXACTLY the batch
    assignment of the full corpus under the batch-0-trained quantizer, and
    re-running the finished stream changes nothing."""
    root = str(tmp_path)
    emb = ensure_min_partitions(load_table(spark, SF, "embeddings"))
    src = _stream_fixture(spark, emb, root)
    index_dir = os.path.join(root, "index")

    def run():
        stream = (
            spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        run_ivf_index_maintenance(
            spark, stream, index_dir, os.path.join(root, "ck"), num_centroids=8, iters=1
        )

    run()
    cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
    # Quantizer == ivf_train on the batch-0 slice.
    want_cents = {
        r["cid"]: tuple(r["cvec"])
        for r in ivf_train(_slices(emb)[0], num_centroids=8, iters=1).collect()
    }
    got_cents = {r["cid"]: tuple(r["cvec"]) for r in cents.collect()}
    assert got_cents == want_cents

    # Lists == full-corpus assignment under those centroids (batch-invisible).
    want = {
        (r["vec_id"], r["cid"]) for r in ivf_assign(emb, cents, 1).collect()
    }
    got = {(r["vec_id"], r["cid"]) for r in read_lists(spark, index_dir).select("vec_id", "cid").collect()}
    assert got == want and len(got) == emb.count()

    run()  # finished checkpoint: replay is a no-op
    again = {(r["vec_id"], r["cid"]) for r in read_lists(spark, index_dir).select("vec_id", "cid").collect()}
    assert again == got


def test_processor_replay_same_batch_is_idempotent(spark, tmp_path):
    """Re-delivering a batch id (crash between writes and the checkpoint
    commit) must converge: centroids keep their _SUCCESS-guarded first
    training, the batch dir is overwritten with identical content."""
    root = str(tmp_path)
    emb = ensure_min_partitions(load_table(spark, SF, "embeddings"))
    b0, b1 = _slices(emb)[0], _slices(emb)[1]
    index_dir = os.path.join(root, "index")
    process = make_ivf_batch_processor(spark, index_dir, num_centroids=8, iters=1)

    process(b0, 0)
    first = {(r["vec_id"], r["cid"]) for r in read_lists(spark, index_dir).select("vec_id", "cid").collect()}
    process(b0, 0)  # replay
    assert {
        (r["vec_id"], r["cid"]) for r in read_lists(spark, index_dir).select("vec_id", "cid").collect()
    } == first

    process(b1, 1)
    n_all = read_lists(spark, index_dir).count()
    assert n_all == b0.count() + b1.count()


def test_query_index_prunes_cells_and_matches_probe_core(spark, tmp_path):
    """Querying the maintained index prunes list partitions on cid (DPP) and
    returns exact top-k inside the probed cells."""
    root = str(tmp_path)
    emb = ensure_min_partitions(load_table(spark, SF, "embeddings"))
    src = _stream_fixture(spark, emb, root)
    index_dir = os.path.join(root, "index")
    stream = spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    run_ivf_index_maintenance(
        spark, stream, index_dir, os.path.join(root, "ck"), num_centroids=8, iters=1
    )

    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = query_index(spark, index_dir, queries, k=5, nprobe=2)
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["rank"] <= 5 for r in rows)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cid" in plan
    assert "dynamicpruning" in plan.lower()
