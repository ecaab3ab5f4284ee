"""Single-pass observed quality metrics (observability.py)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.observability import (
    observe_quality,
    observe_quality_stream,
)


def test_observe_quality_matches_direct_counts(spark):
    df = spark.range(1000).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE id END AS user_id",
        "CAST(id % 7 AS DOUBLE) AS value"
    )
    rules = {
        "null_user": F.col("user_id").isNull(),
        "value_out_of_range": ~F.col("value").between(0, 5),
    }
    instrumented, obs = observe_quality(df, rules)
    instrumented.write.format("noop").mode("overwrite").save()  # the main job
    got = obs.get
    assert got["rows"] == 1000
    assert got["null_user"] == df.filter(rules["null_user"]).count()
    assert got["value_out_of_range"] == df.filter(rules["value_out_of_range"]).count()


def test_observe_quality_stream_per_batch_metrics(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    spark.range(100).selectExpr(
        "id", "CASE WHEN id % 4 = 0 THEN NULL ELSE id END AS user_id"
    ).coalesce(1).write.parquet(src)

    collected = []

    from pyspark.sql.streaming import StreamingQueryListener

    class L(StreamingQueryListener):
        def onQueryStarted(self, e): pass
        def onQueryProgress(self, e):
            om = e.progress.observedMetrics
            if "quality" in om:
                collected.append(om["quality"])
        def onQueryIdle(self, e): pass
        def onQueryTerminated(self, e): pass

    listener = L()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema("id long, user_id long").parquet(src)
        instrumented = observe_quality_stream(stream, {"null_user": F.col("user_id").isNull()})
        q = (
            instrumented.writeStream.format("noop")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener delivery is async; progress events land shortly after
        for _ in range(40):
            if collected:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)
    assert collected, "no observed metrics delivered"
    total = sum(r["rows"] for r in collected)
    nulls = sum(r["null_user"] for r in collected)
    assert total == 100 and nulls == 25
