"""applyInPandasWithState capped sessionizer: hand-computable synthetic case
plus equivalence with session_window when the cap is inert."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from mobsos_event_log_generator_spark.streaming.ingest import stream_events
from mobsos_event_log_generator_spark.streaming.sessionize import run_available_now, sessionized_traces
from mobsos_event_log_generator_spark.streaming.stateful import capped_sessions


def _run(spark, tmp_path, src_dir, qname, ts_is_nanos=None, **kwargs):
    ev = stream_events(spark, str(src_dir), ts_is_nanos=ts_is_nanos)
    sess = capped_sessions(ev, **kwargs)
    q = (
        sess.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def test_cap_splits_sessions_deterministically(spark, tmp_path):
    base = datetime(2024, 1, 1, 10, 0, 0)
    rows = [(i, base + timedelta(minutes=i), 1, "click", 0.0, "{}") for i in range(7)]
    # watermark pusher: a far-future event for another user flushes user 1
    rows.append((99, base + timedelta(days=2), 999, "click", 0.0, "{}"))
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(src / "b1"))

    out = _run(
        spark, tmp_path, str(src / "b1"), "capped_synth",
        gap_seconds=1800, max_events=3, watermark_delay="0 seconds",
    ).collect()
    u1 = sorted([r for r in out if r["case"] == 1], key=lambda r: r["session_start"])
    # 7 one-minute-spaced events, cap 3: [0,1,2] cap, [3,4,5] cap, [6] timeout
    assert [(r["n_events"], r["closed_by"]) for r in u1] == [(3, "cap"), (3, "cap"), (1, "timeout")]
    assert u1[0]["session_start"] == base
    assert u1[0]["session_end"] == base + timedelta(minutes=2)
    assert u1[2]["session_start"] == base + timedelta(minutes=6)


def test_inert_cap_matches_session_window(spark, tmp_path):
    """With an unreachable cap, the custom operator must emit exactly the
    session_window result (same finalized sessions, same bounds/counts)."""
    out = _run(
        spark, tmp_path, "/root/testdata/sf0.001/events.parquet", "capped_equiv",
        gap_seconds=1800, max_events=10**9, watermark_delay="1 hour",
    )
    got = {(r["case"], r["session_start"], r["session_end"], r["n_events"]) for r in out.collect()}

    builtin = run_available_now(
        sessionized_traces(
            stream_events(spark, "/root/testdata/sf0.001/events.parquet"),
            gap="30 minutes",
            watermark_delay="1 hour",
        ),
        str(tmp_path / "ck_builtin"),
        queryName="builtin_sessions",
    )
    want = {(r["case"], r["session_start"], r["session_end"], r["n_events"]) for r in builtin.collect()}
    assert got == want


def test_stateful_needs_streaming_input(spark, tmp_path):
    """ts_is_nanos wiring sanity: the stateful op rejects batch DataFrames."""
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    with pytest.raises(Exception):
        capped_sessions(ev).collect()


def test_transform_with_state_cumulative(spark, tmp_path):
    """Spark 4 transformWithStateInPandas wiring: per-user ValueState totals
    across two micro-batches. Skips where google.protobuf (required by the
    transformWithState state-server protocol) is unavailable."""
    import os

    import pytest

    pytest.importorskip("google.protobuf")

    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.streaming.tws import cumulative_user_stats

    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = spark.createDataFrame([(1, 100), (1, 50), (2, 10)], "user_id long, cents long")
    b1 = spark.createDataFrame([(1, 25), (3, 7)], "user_id long, cents long")
    b0.coalesce(1).write.parquet(src + "/s0")
    b1.coalesce(1).write.parquet(src + "/s1")
    for i, d in enumerate(["s0", "s1"]):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (1_700_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream.schema("user_id long, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/s*")
    )
    out = cumulative_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_unit")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r["user_id"], r["cum_events"], r["cum_cents"])
            for r in spark.table("tws_unit").collect()}
    assert rows == {(1, 2, 150), (2, 1, 10), (1, 3, 175), (3, 1, 7)}
