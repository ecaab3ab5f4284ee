"""Stream-stream interval join: results equal the equivalent batch range
join over the same finite input."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.sources.parquet import load_table
from mobsos_event_log_generator_spark.streaming.ingest import stream_events
from mobsos_event_log_generator_spark.streaming.joins import interval_join


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    clicks_s = stream_events(spark, src).filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases_s = (
        stream_events(spark, src).filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    )
    joined = interval_join(clicks_s, purchases_s, key="user_id", window_seconds=3600)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["event_id"], r["r_event_id"]) for r in spark.table("ssj").collect()}

    # batch ground truth: purchases within [click.ts, click.ts + 1h]
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    want = {
        (r["cid"], r["pid"])
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 3600 SECONDS")),
        ).collect()
    }
    assert want, "fixture should produce at least one attribution pair"
    assert got == want
