"""Structured Streaming tests: session-window trace assembly, incremental
catch-up across restarts, foreachBatch XES sink, JDBC-style watermark poller."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.streaming.ingest import JdbcIncrementalSource, stream_events
from mobsos_event_log_generator_spark.streaming.sessionize import (
    run_available_now,
    sessionized_traces,
    stream_xes_sink,
)

SRC = "/root/testdata/sf0.001/events.parquet"


def test_streaming_equals_batch_sessionization(spark, tmp_path):
    """AvailableNow streaming session_window == batch gap-sessionization for
    every session the watermark has finalized."""
    traces = sessionized_traces(stream_events(spark, SRC))
    out = run_available_now(traces, str(tmp_path / "ck"), queryName="t_batch_eq")

    from mobsos_event_log_generator_spark.sources.parquet import load_table
    from pyspark.sql.window import Window

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sess = (
        ev.withColumn("ns", F.when(gap_us.isNull() | (gap_us >= 30 * 60 * 1_000_000), 1).otherwise(0))
        .withColumn("sid", F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    finalized = sess.filter(F.col("en") + F.expr("INTERVAL 30 MINUTES") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
    assert out.count() == finalized.count()
    got = {(r["case"], r["session_start"], r["n_events"]) for r in out.collect()}
    want = {(r["user_id"], r["st"], r["n"]) for r in finalized.collect()}
    assert got == want


def test_incremental_catchup_across_restarts(spark, tmp_path):
    """Checkpointed AvailableNow: a second run after new files arrive emits
    only the newly-finalized sessions (no duplicates, no loss) — the
    exactly-once incremental contract."""
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    ck = str(tmp_path / "ck")

    from mobsos_event_log_generator_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").orderBy("ts")
    first, second = ev.limit(600), ev.subtract(ev.limit(600))
    first.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "batch1"))

    def run_once(qname):
        stream = sessionized_traces(
            stream_events(spark, str(src_dir) + "/*", ts_is_nanos=False), watermark_delay="1 hour"
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once("r1")
    n1 = spark.read.parquet(str(tmp_path / "out")).count()
    second.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "batch2"))
    run_once("r2")
    out = spark.read.parquet(str(tmp_path / "out"))
    n2 = out.count()
    assert n2 > n1
    # no duplicate (case, session_start) pairs across restarts
    assert out.groupBy("case", "session_start").count().filter("count > 1").count() == 0


def test_stream_xes_sink_writes_parseable_shards(spark, tmp_path):
    from mobsos_event_log_generator_spark.sinks.xes import read_xes

    traces = sessionized_traces(stream_events(spark, SRC))
    q = stream_xes_sink(
        traces,
        out_dir=str(tmp_path / "xes"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination()
    files = glob.glob(str(tmp_path / "xes" / "batch=*" / "*.xes"))
    assert files
    total_traces = sum(len(read_xes(f)) for f in files)
    assert total_traces == 944  # == finalized sessions


def test_jdbc_incremental_source_watermark(spark, tmp_path):
    """High-watermark poller: successive polls see only new rows; commit
    advances the watermark atomically."""
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")

    def loader(hwm):
        return ev.filter(F.col("ts") > F.lit(hwm)) if hwm else ev

    src = JdbcIncrementalSource(checkpoint_path=str(tmp_path / "hwm.json"), ts_col="ts", load_slice=loader)
    s1 = src.poll()
    assert s1.count() == 1000  # first poll: everything
    mid = ev.orderBy("ts").limit(500).agg(F.max("ts")).collect()[0][0]
    src.write_watermark(str(mid))
    s2 = src.poll()
    assert s2.count() == 500  # only rows after the watermark
    src.commit(s2)
    assert src.poll().count() == 0  # fully caught up


def test_sliding_window_fanout_and_alignment(spark):
    from datetime import datetime

    from mobsos_event_log_generator_spark.streaming.sessionize import sliding_window_counts

    rows = [
        (datetime(2026, 1, 1, 0, 7), "click"),
        (datetime(2026, 1, 1, 0, 20), "click"),
        (datetime(2026, 1, 1, 0, 20), "view"),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    # batch mode: withWatermark is a no-op, so every window is emitted
    out = sliding_window_counts(df, window="30 minutes", slide="15 minutes").collect()
    # every event lands in exactly window/slide = 2 hopping windows
    assert sum(r["n_events"] for r in out) == 2 * len(rows)
    by_key = {(str(r["window_start"]), r["event_type"]): r["n_events"] for r in out}
    # the [00:00, 00:30) window holds both clicks; [00:15, 00:45) only the second
    assert by_key[("2026-01-01 00:00:00", "click")] == 2
    assert by_key[("2026-01-01 00:15:00", "click")] == 1
    assert by_key[("2026-01-01 00:15:00", "view")] == 1


def test_drift_monitor_known_values_and_replay(spark, tmp_path):
    """Two crafted micro-batches: batch0 all band 0, batch1 half band 0 /
    half band 1 -> L1 vs history = |5*10-10*10| + |5*10-0| = 100, denom 100,
    drift_ppm 1_000_000. Replay of a batch (same id) must not double-count
    its own index partition."""
    import os

    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.streaming.drift import (
        drift_rows,
        read_bands,
        run_drift_monitor,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = spark.createDataFrame([(i, 5.0) for i in range(10)], "id long, value double")
    b1 = spark.createDataFrame(
        [(100 + i, 5.0) for i in range(5)] + [(200 + i, 15.0) for i in range(5)],
        "id long, value double",
    )
    b0.coalesce(1).write.parquet(src + "/s0")
    b1.coalesce(1).write.parquet(src + "/s1")
    # order by mtime
    for i, d in enumerate(["s0", "s1"]):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (1_700_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream.schema("id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/s*")
    )
    idx, out, ck = (str(tmp_path / n) for n in ["idx", "out", "ck"])
    run_drift_monitor(
        spark, stream, F.floor(F.col("value") / 10).cast("long"), idx, out, ck
    )
    rows = {r["batch_id"]: r for r in drift_rows(spark, out).collect()}
    assert list(rows) == [1]
    r = rows[1]
    assert (r["t_cur"], r["t_prev"]) == (10, 10)
    assert r["l1_num"] == 100 and r["denom"] == 100 and r["drift_ppm"] == 1_000_000
    # replay semantics: excluding a batch's own partition restores pre-write view
    hist_all = {x["band"]: x["n"] for x in read_bands(spark, idx).collect()}
    assert hist_all == {0: 15, 1: 5}
    hist_excl = {x["band"]: x["n"] for x in read_bands(spark, idx, exclude_batch=1).collect()}
    assert hist_excl == {0: 10}


def test_cms_maintenance_merge_equals_one_pass_and_replay(spark, tmp_path):
    """The merged per-batch partial sketches must equal the one-pass batch
    sketch (CMS merge = cell-wise addition), and overwriting a batch's own
    partition (crash replay) must not double-count."""
    import os

    from mobsos_event_log_generator_spark.operators.cms import build_cms
    from mobsos_event_log_generator_spark.streaming.cms_maintain import (
        read_merged_cms,
        run_cms_maintenance,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = spark.createDataFrame([(i, i % 3) for i in range(20)], "id long, user_id long")
    b1 = spark.createDataFrame([(100 + i, i % 5) for i in range(20)], "id long, user_id long")
    b0.coalesce(1).write.parquet(src + "/s0")
    b1.coalesce(1).write.parquet(src + "/s1")
    for i, d in enumerate(["s0", "s1"]):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (1_700_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream.schema("id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/s*")
    )
    idx, ck = str(tmp_path / "idx"), str(tmp_path / "ck")
    run_cms_maintenance(spark, stream, "user_id", idx, ck, depth=4, width=64)

    merged = {(r["row"], r["col"]): r["cnt"] for r in read_merged_cms(spark, idx).collect()}
    one_pass = {
        (r["row"], r["col"]): r["cnt"]
        for r in build_cms(b0.union(b1), "user_id", depth=4, width=64).collect()
    }
    assert merged == one_pass
    # crash replay: re-writing batch 0's partition overwrites, never adds
    cells0 = build_cms(b0, "user_id", depth=4, width=64)
    cells0.coalesce(1).write.mode("overwrite").parquet(os.path.join(idx, "batch=0"))
    again = {(r["row"], r["col"]): r["cnt"] for r in read_merged_cms(spark, idx).collect()}
    assert again == one_pass


def test_mg_maintenance_matches_python_replay_and_replay_safe(spark, tmp_path):
    """The final MG state must equal a python replay of the sequential
    merge+reduce recurrence, stay at <= k counters, and re-running a crashed
    batch from its predecessor state must be idempotent."""
    import os

    from mobsos_event_log_generator_spark.streaming.mg_maintain import (
        read_final_mg,
        read_mg_state,
        run_mg_maintenance,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [(i, i % 3) for i in range(30)],          # keys 0,1,2 heavy
        [(100 + i, i % 7) for i in range(21)],    # spread across 0..6
        [(200 + i, 0) for i in range(10)],        # key 0 surge
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "id long, user_id long")
        df.coalesce(1).write.parquet(src + f"/s{i}")
        for f in os.listdir(os.path.join(src, f"s{i}")):
            os.utime(os.path.join(src, f"s{i}", f), (1_700_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream.schema("id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/s*")
    )
    state, ck = str(tmp_path / "state"), str(tmp_path / "ck")
    k = 3
    run_mg_maintenance(spark, stream, "user_id", state, ck, k=k)

    got = {r["key"]: r["cnt"] for r in read_final_mg(spark, state).collect()}

    def reduce_mg(counts):
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        thr = ordered[k][1] if len(ordered) > k else 0
        return {key: c - thr for key, c in counts.items() if c - thr > 0}

    want = {}
    for rows in batches:
        merged = dict(want)
        for _, u in rows:
            merged[u] = merged.get(u, 0) + 1
        want = reduce_mg(merged)
    assert got == want
    assert len(got) <= k
    # crash replay of the LAST batch: recompute from state 1, overwrite state 2
    prev = read_mg_state(spark, state, 1)
    b2 = spark.createDataFrame(batches[2], "id long, user_id long")
    merged = (
        prev.unionByName(
            b2.groupBy(F.col("user_id").cast("long").alias("key")).agg(
                F.count(F.lit(1)).cast("long").alias("cnt")
            )
        )
        .groupBy("key")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    from mobsos_event_log_generator_spark.streaming.mg_maintain import _reduce_mg

    _reduce_mg(merged, k).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state, "batch=2")
    )
    again = {r["key"]: r["cnt"] for r in read_final_mg(spark, state).collect()}
    assert again == want
