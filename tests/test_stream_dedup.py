"""Streaming dedup + hot-bucket guard tests."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators import dedup as D
from mobsos_event_log_generator_spark.streaming.dedup_stream import dedup_content_stream, dedup_exact_stream
from mobsos_event_log_generator_spark.streaming.ingest import stream_events


def _collect_stream(spark, stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_exact_dedup_drops_replays(spark, tmp_path):
    base = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 1, "click", 0.0, "{}"),
        (1, base, 1, "click", 0.0, "{}"),          # exact replay -> dropped
        (2, base + timedelta(minutes=1), 1, "view", 0.0, "{}"),
        (2, base + timedelta(minutes=2), 1, "view", 0.0, "{}"),  # same event_id -> dropped
        (3, base + timedelta(minutes=3), 2, "click", 0.0, "{}"),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(src))
    stream = dedup_exact_stream(stream_events(spark, str(src), ts_is_nanos=False), key_cols=["event_id"])
    out = _collect_stream(spark, stream, tmp_path, "dedup_ids")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3]


def test_stream_content_dedup(spark, tmp_path):
    base = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 1, "click", 0.0, '{"k": 1}'),
        (2, base + timedelta(minutes=1), 1, "click", 0.0, '{"k": 1}'),  # same content -> dropped
        (3, base + timedelta(minutes=2), 1, "click", 0.0, '{"k": 2}'),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(src))
    stream = dedup_content_stream(stream_events(spark, str(src), ts_is_nanos=False), content_col="props")
    out = _collect_stream(spark, stream, tmp_path, "dedup_content")
    assert out.count() == 2
    assert {r["props"] for r in out.collect()} == {'{"k": 1}', '{"k": 2}'}


def test_lsh_hot_bucket_guard(spark):
    """With a tiny cap, degenerate buckets are skipped; pairs that also share
    a non-hot bucket survive."""
    docs = spark.createDataFrame(
        [
            (i, "alpha beta gamma delta epsilon zeta " + ("x" if i == 0 else "y"), "en")
            for i in range(6)
        ],
        "doc_id long, text string, lang string",
    )
    sh = D.doc_shingles(docs)
    bands = D.lsh_bands(D.minhash_signatures(sh))
    unguarded = D.lsh_candidate_pairs(bands).count()
    guarded = D.lsh_candidate_pairs(bands, max_bucket_size=2).count()
    assert unguarded > 0
    assert guarded <= unguarded  # cap can only shrink the candidate set


def test_rate_limited_multi_batch_ingest(spark, tmp_path):
    """maxFilesPerTrigger=1 over 3 shards → AvailableNow drains in ≥3
    micro-batches; dedup state carries across batches within the watermark
    horizon so cross-batch replays are still dropped."""
    base = datetime(2024, 1, 1, 10, 0, 0)
    src = tmp_path / "src"
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    for i, rows in enumerate(
        [
            [(1, base, 1, "click", 0.0, "{}")],
            [(1, base + timedelta(minutes=1), 1, "click", 0.0, "{}")],  # replayed id, later file
            [(2, base + timedelta(minutes=2), 1, "view", 0.0, "{}")],
        ]
    ):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / f"shard={i}"))
    stream = dedup_exact_stream(
        stream_events(spark, str(src) + "/*", ts_is_nanos=False, max_files_per_trigger=1),
        key_cols=["event_id"],
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ratelimited")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_rate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 3  # the rate limit actually split the backlog
    assert sorted(r["event_id"] for r in spark.table("ratelimited").collect()) == [1, 2]


def test_rocksdb_state_store_provider(spark, tmp_path):
    """The RocksDB state store (the big-state scale path: state spills to
    local disk instead of living on the JVM heap) must run the same dedup
    query and produce identical results to the default HDFS-backed provider."""
    base = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 1, "click", 0.0, "{}"),
        (1, base, 1, "click", 0.0, "{}"),
        (2, base + timedelta(minutes=1), 1, "view", 0.0, "{}"),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(src))
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        stream = dedup_exact_stream(stream_events(spark, str(src), ts_is_nanos=False), key_cols=["event_id"])
        out = _collect_stream(spark, stream, tmp_path, "dedup_rocks")
        assert sorted(r["event_id"] for r in out.collect()) == [1, 2]
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
