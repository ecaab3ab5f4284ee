"""Streaming dedup-index maintenance (streaming/index_maintenance.py):
cross-batch duplicate drops, checkpoint-replay idempotency, and incremental
catch-up on newly arrived files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import pytest

from mobsos_event_log_generator_spark.streaming.index_maintenance import (
    accepted,
    make_dedup_batch_processor,
    read_index,
    run_incremental_dedup,
)


def _write_slice(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    tmp = path + "_tmp"
    df.write.mode("overwrite").parquet(tmp)
    pq = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, pq), path)
    os.utime(path, (mtime, mtime))


def _run(spark, root):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "src"))
    )
    run_incremental_dedup(
        spark,
        stream,
        index_dir=os.path.join(root, "index"),
        out_dir=os.path.join(root, "out"),
        checkpoint_dir=os.path.join(root, "ck"),
        digest=F.md5("text"),
    )


def test_cross_batch_duplicates_dropped_and_replay_idempotent(spark, tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "src"))
    # batch 0: two docs, one internal dup pair (same text) -> min id 1 wins
    _write_slice(
        spark,
        os.path.join(root, "src", "a.parquet"),
        [(2, "alpha"), (1, "alpha"), (3, "beta")],
        1_700_000_000,
    )
    # batch 1: replays 'alpha' (cross-batch dup, must drop) + new 'gamma'
    _write_slice(
        spark,
        os.path.join(root, "src", "b.parquet"),
        [(9, "alpha"), (4, "gamma")],
        1_700_000_060,
    )
    _run(spark, root)
    got = {
        (r["doc_id"]) for r in accepted(spark, os.path.join(root, "out")).collect()
    }
    assert got == {1, 3, 4}  # 2 lost in-batch to 1; 9 lost cross-batch
    n_index = read_index(spark, os.path.join(root, "index")).count()
    assert n_index == 3

    # Re-running the finished stream (same checkpoint) must change nothing.
    _run(spark, root)
    assert read_index(spark, os.path.join(root, "index")).count() == 3
    assert accepted(spark, os.path.join(root, "out")).count() == 3


def test_replay_after_index_write_is_not_destructive(spark, tmp_path):
    """Crash window: the index write for batch N lands but the micro-batch
    never commits, so the engine re-delivers batch N. The replayed anti-join
    must not see batch N's OWN digests (or it would overwrite out/batch=N and
    index/batch=N with empty data, silently losing the rows)."""
    root = str(tmp_path)
    index_dir, out_dir = os.path.join(root, "index"), os.path.join(root, "out")
    process = make_dedup_batch_processor(spark, index_dir, out_dir, F.md5("text"))
    batch = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")

    process(batch, 0)  # normal run: out/batch=0 and index/batch=0 written
    assert accepted(spark, out_dir).count() == 2
    process(batch, 0)  # replay of the SAME batch id (post-index-write crash)
    assert accepted(spark, out_dir).count() == 2  # not emptied
    assert read_index(spark, index_dir).count() == 2

    # A genuinely new batch still dedups against batch 0's digests.
    process(spark.createDataFrame([(9, "alpha"), (4, "gamma")], "doc_id long, text string"), 1)
    assert {r["doc_id"] for r in accepted(spark, out_dir).collect()} == {1, 2, 4}


def test_read_index_raises_on_corrupt_index(spark, tmp_path):
    """A real read failure must fail the batch, not silently disable dedup."""
    index_dir = os.path.join(str(tmp_path), "index")
    os.makedirs(os.path.join(index_dir, "batch=0"))
    with open(os.path.join(index_dir, "batch=0", "part-0.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")
    with pytest.raises(Exception):
        read_index(spark, index_dir).count()


def test_read_index_empty_cases(spark, tmp_path):
    """Missing dir and existing-but-partitionless dir both mean 'no index yet'."""
    missing = os.path.join(str(tmp_path), "nope")
    assert read_index(spark, missing).count() == 0
    empty = os.path.join(str(tmp_path), "empty")
    os.makedirs(empty)
    assert read_index(spark, empty).count() == 0


def test_catchup_processes_only_new_files(spark, tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "src"))
    _write_slice(spark, os.path.join(root, "src", "a.parquet"), [(1, "x")], 1_700_000_000)
    _run(spark, root)
    assert accepted(spark, os.path.join(root, "out")).count() == 1

    # New file arrives after the first run: 'x' is already indexed, 'y' is new.
    _write_slice(
        spark, os.path.join(root, "src", "c.parquet"), [(7, "x"), (8, "y")], 1_700_000_120
    )
    _run(spark, root)
    got = {r["doc_id"] for r in accepted(spark, os.path.join(root, "out")).collect()}
    assert got == {1, 8}


def test_daily_rollup_replay_and_catchup(spark, tmp_path):
    """Partial-aggregate rollup: batch replay converges (overwrite) and new
    files fold into the view monotonically."""
    import datetime

    from mobsos_event_log_generator_spark.streaming.rollup import (
        daily_rollup_view,
        run_daily_rollup,
    )

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "src"))

    def slice_rows(rows, name, mtime):
        df = spark.createDataFrame(rows, "ts timestamp, value decimal(18,6)").coalesce(1)
        tmp = os.path.join(root, name + "_tmp")
        df.write.mode("overwrite").parquet(tmp)
        pq = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(root, "src", name)
        os.replace(os.path.join(tmp, pq), dst)
        os.utime(dst, (mtime, mtime))

    d1 = datetime.datetime(2024, 1, 1, 10)
    d2 = datetime.datetime(2024, 1, 2, 10)
    from decimal import Decimal

    slice_rows([(d1, Decimal("1.5")), (d2, Decimal("2.0"))], "a.parquet", 1_700_000_000)
    slice_rows([(d1, Decimal("3.0"))], "b.parquet", 1_700_000_060)

    def run():
        stream = (
            spark.readStream.schema("ts timestamp, value decimal(18,6)")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "src"))
        )
        run_daily_rollup(
            spark, stream, out_dir=os.path.join(root, "out"), checkpoint_dir=os.path.join(root, "ck")
        )

    run()
    view = {r["event_date"]: (r["n_events"], float(r["value_sum"])) for r in daily_rollup_view(spark, os.path.join(root, "out")).collect()}
    assert view == {"2024-01-01": (2, 4.5), "2024-01-02": (1, 2.0)}
    run()  # replay: nothing new, view unchanged
    view2 = {r["event_date"]: (r["n_events"], float(r["value_sum"])) for r in daily_rollup_view(spark, os.path.join(root, "out")).collect()}
    assert view2 == view
    # late-arriving slice for day 1
    slice_rows([(d1, Decimal("0.5"))], "c.parquet", 1_700_000_120)
    run()
    view3 = {r["event_date"]: (r["n_events"], float(r["value_sum"])) for r in daily_rollup_view(spark, os.path.join(root, "out")).collect()}
    assert view3 == {"2024-01-01": (3, 5.0), "2024-01-02": (1, 2.0)}
