"""Custom stateful streaming operator: an ``applyInPandasWithState``
sessionizer (SURVEY.md §7 step 5 — "applyInPandasWithState for custom
stateful operators").

``session_window`` (streaming/sessionize.py) covers plain gap sessions; this
operator exists for session semantics the built-in cannot express — here:
sessions that additionally CLOSE EARLY when they reach a max event count
(spam/runaway-case guard, the degenerate-giant-case risk from SURVEY §7.4.1).

State per case: (session_start, last_ts, n_events, activity counts). Events
arrive in micro-batches (unordered within the watermark); the state handler
merges them, emits a finished session when the count cap is hit, and relies
on an event-time timeout (watermark passing last_ts + gap) to flush idle
sessions. Python here is the right trade: state logic is per-key and
Arrow-batched, while all heavy lifting (shuffle by key, state store,
watermark) stays in the JVM.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("case", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # 'cap' | 'timeout'
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def capped_sessionizer(gap_seconds: int = 1800, max_events: int = 100):
    """Build the per-group state handler (closure over the tunables)."""
    gap_ms = gap_seconds * 1000

    def handle(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (case,) = key
        out_rows: list[dict] = []

        def emit(start_us: int, last_us: int, n: int, reason: str) -> None:
            out_rows.append(
                {
                    "case": case,
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "session_end": pd.Timestamp(last_us, unit="us"),
                    "n_events": n,
                    "closed_by": reason,
                }
            )

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                emit(start_us, last_us, n, "timeout")
                state.remove()
        else:
            ts_us = pd.concat([pdf["ts"] for pdf in pdfs]).astype("int64").sort_values() // 1000
            start_us, last_us, n = state.get if state.exists else (None, None, 0)
            for t in ts_us:
                t = int(t)
                if start_us is None:
                    start_us, last_us, n = t, t, 0
                elif t - last_us > gap_seconds * 1_000_000:
                    emit(start_us, last_us, n, "timeout")  # gap closed it
                    start_us, last_us, n = t, t, 0
                n += 1
                last_us = max(last_us, t)
                if n >= max_events:
                    emit(start_us, last_us, n, "cap")
                    start_us, last_us, n = None, None, 0
            if start_us is not None:
                state.update((start_us, last_us, n))
                # flush when the watermark passes last event + gap
                state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
            elif state.exists:
                state.remove()

        yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return handle


def capped_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    max_events: int = 100,
    watermark_delay: str = "1 hour",
    case_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming capped sessionization over an events stream."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(case_col)
        .applyInPandasWithState(
            capped_sessionizer(gap_seconds, max_events),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
