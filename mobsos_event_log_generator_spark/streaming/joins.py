"""Stream-stream joins: watermarked interval join of two event streams.

The canonical shape (attribute a purchase to the click that preceded it
within an attribution window): both sides carry watermarks so the join state
is bounded — a left row can be dropped once the watermark guarantees no
right row inside its interval can still arrive.

State bound: left retains ``max_delay + window`` of data, right ``max_delay``;
without the time-range predicate Spark would have to keep both sides forever
(and rejects the plan in append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with equal keys where r.ts in [l.ts, l.ts + window].

    Left columns keep names, right columns arrive ``r_``-prefixed.

    ``how="left_outer"`` additionally emits every unmatched left row with
    NULL right columns — but only once the watermark has passed
    ``l.ts + window`` (the engine must PROVE no matching right row can still
    arrive before declaring the left row unmatched; rows closer than
    ``window + delay`` to the stream head stay in state, unemitted). That
    delayed-NULL emission is the semantic difference from a batch left
    join, and the oracle for the gated query models it explicitly.
    """
    l = left.withWatermark(left_ts, watermark_delay).alias("l")
    r_cols = right.columns
    r = (
        right.select([F.col(c).alias(f"r_{c}") for c in r_cols])
        .withWatermark(f"r_{right_ts}", watermark_delay)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.r_{key}"))
        & (F.col(f"r.r_{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.r_{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return l.join(r, cond, how)
