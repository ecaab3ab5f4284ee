"""Skew mitigation helpers.

AQE's skew-join splitting (on by default in session.py) handles most runtime
skew; these helpers cover the two shapes AQE cannot fix:

* ``salted_group_count`` — heavy-hitter aggregation: a single hot key (one
  bot spamming events, one degenerate case id) funnels its entire partition
  through one reducer. Two-phase aggregate: group on (key, salt) first —
  spreading the hot key over N reducers — then re-aggregate by key. Works for
  any algebraic aggregate; exposed here for counts/sums.
* ``salted_broadcast_join`` is intentionally NOT provided: for map-side joins
  broadcast already avoids skew entirely; for shuffle joins AQE's
  ``skewJoin`` split is strictly better than static salting because it only
  splits the partitions that are actually skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame,
    key_cols: list[str],
    num_salts: int = 16,
    count_alias: str = "n",
) -> DataFrame:
    """COUNT(*) per key via two-phase salted aggregation.

    Deterministic result (counts are associative); the salt is random per row
    (spreads a hot key uniformly) and disappears in the second phase."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(*key_cols).agg(F.sum("__partial").cast("long").alias(count_alias))


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    num_salts: int = 16,
    sum_alias: str = "total",
) -> Column | DataFrame:
    salted = df.withColumn("__salt", (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(F.sum(value_col).alias("__partial"))
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias(sum_alias))
