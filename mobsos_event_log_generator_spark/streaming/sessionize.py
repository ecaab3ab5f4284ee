"""Streaming trace assembly: watermark + session windows (SURVEY.md §7.4.4).

The reference's traces are request-scoped batch groupings (pm4py groups the
full result, app.py:216-217). In streaming, cases have no explicit end event,
so the idiomatic Spark design is ``session_window`` with an inactivity gap:

    events.withWatermark("ts", delay)
          .groupBy(session_window(ts, gap), case)
          .agg(...)

* the watermark bounds state: a session closes when the watermark passes its
  end, so state size is O(active sessions), not O(history);
* the gap is the tunable the reference never had (pure design freedom, but
  deterministic for the correctness gate: with ``Trigger.AvailableNow`` over a
  finite input, output equals the batch gap-sessionization).

``stream_xes_sink`` closes the loop: each finalized micro-batch of traces is
appended as XES shards via ``foreachBatch`` → the batch XES writer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized_traces(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
    case_col: str = "user_id",
    ts_col: str = "ts",
    activity_col: str = "event_type",
) -> DataFrame:
    """Streaming per-(case, session) trace summaries.

    Output: case, session_start/end (the observed event span), window_end
    (start + gap after last event — the session's expiry), n_events, and the
    (ts, activity)-sorted activity path.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(case_col).alias("case"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(activity_col).alias("activity")))
                    ),
                    lambda x: x["activity"],
                ),
                ",",
            ).alias("activity_path"),
        )
        .select(
            "case",
            "n_events",
            "session_start",
            "session_end",
            F.col("w.end").alias("window_end"),
            "activity_path",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, queryName: str = "sessionize") -> DataFrame:
    """Execute a streaming DataFrame to completion with Trigger.AvailableNow
    into an in-memory sink; returns the complete result as a batch DataFrame.
    (Test/driver harness — production uses ``stream_xes_sink``.)"""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(queryName)


def stream_xes_sink(
    traces_or_events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    case_col: str = "case",
    ts_col: str = "session_start",
    activity_col: str = "activity_path",
    available_now: bool = True,
):
    """foreachBatch XES sink: every finalized micro-batch is written as a
    sharded XES log under ``out_dir/batch=<id>/`` (each shard a complete,
    independently-parseable document — append-only, replay-safe because the
    batch id is in the path).

    One XES trace per SESSION: the trace identity is ``case#session_start``
    (a bare case key would merge all of a case's sessions into one trace)."""
    from mobsos_event_log_generator_spark.sinks.xes import write_xes

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with_trace = batch_df.withColumn(
            "trace_id",
            F.concat_ws("#", F.col(case_col).cast("string"), F.col(ts_col).cast("string")),
        )
        write_xes(
            with_trace,
            os.path.join(out_dir, f"batch={batch_id}"),
            case_col="trace_id",
            ts_col=ts_col,
            activity_col=activity_col,
            single_file=False,
        )

    writer = (
        traces_or_events.writeStream.foreachBatch(emit)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sliding_window_counts(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "15 minutes",
    watermark_delay: str = "1 hour",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked sliding-window aggregation (overlapping hopping windows):
    each event lands in window/slide windows; append mode emits a window only
    once the watermark passes its end, so late events inside the delay still
    count and state stays bounded at O(open windows × keys).

    The scale point vs tumbling: the window key IS the shuffle key, so an
    event fans out window/slide ways map-side and each copy partial-aggregates
    before the exchange — no per-event state, just per-(window,key) sums."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window, slide).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )
