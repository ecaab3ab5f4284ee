"""Time-series resampling (downsampling) over an event stream.

``resample_ohlc`` buckets events into fixed epoch-aligned intervals per key
and emits open/high/low/close/count/sum per bucket — the standard
time-series bar aggregation, as ONE hash aggregation: open and close are
``min_by``/``max_by`` over a total-order key (no window, no self-join, no
per-bucket sort). At 100 TB the bucket is the shuffle key and everything
partial-aggregates map-side.

Determinism: the ordering key is a zero-padded string of (epoch_us, row id),
so first/last are well-defined even for equal timestamps and identical
across engines (DuckDB's ``arg_min``/``arg_max`` accept varchar comparators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators import exactmath as XM


def _order_key(ts_col: str, id_col: str) -> Column:
    return F.concat(
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 20, "0"),
        F.lpad(F.col(id_col).cast("string"), 12, "0"),
    )


def resample_ohlc(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "6 hours",
) -> DataFrame:
    """Per-(key, bucket) bars: open (first value), high, low, close (last
    value), n, vsum. Buckets are Spark ``window`` tumbling intervals
    (epoch-aligned, matching DuckDB's ``time_bucket``)."""
    order = _order_key(ts_col, id_col)
    return (
        df.groupBy(F.window(ts_col, bucket).alias("win"), key_col)
        .agg(
            F.min_by(value_col, order).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, order).alias("close"),
            F.count(F.lit(1)).alias("n"),
            XM.sum_round(F.sum(XM.int_units(F.col(value_col))), 6).alias("vsum"),
        )
        .select(
            F.col("win.start").alias("bucket_start"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "n",
            "vsum",
        )
    )
