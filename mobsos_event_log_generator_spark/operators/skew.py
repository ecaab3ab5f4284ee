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


def detect_heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    threshold_fraction: float = 0.01,
    sample_fraction: float = 0.01,
    min_sample_rows: int = 10_000,
    seed: int = 42,
) -> list[tuple]:
    """Estimate hot grouping keys from a sample: keys whose share of sampled
    rows is ≥ ``threshold_fraction``.

    One cheap sampled aggregation (at 100 TB a 1% Bernoulli sample is still a
    full scan — callers amortize it by sampling an already-loaded/cached
    slice, or drop ``sample_fraction`` to 1e-4; row-level Bernoulli sampling
    never shuffles). A key owning ≥1% of ALL rows is exactly the shape AQE's
    post-shuffle split can't pre-empt for aggregation, since the hot key
    still hashes to one reducer."""
    sampled = df.select(*key_cols).sample(fraction=sample_fraction, seed=seed)
    counts = sampled.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    total = sampled.count()
    if total < min_sample_rows:
        # sample too small to call anything hot reliably — and small inputs
        # don't skew-bind a reducer anyway
        return []
    cutoff = max(1, int(total * threshold_fraction))
    hot = counts.filter(F.col("__n") >= cutoff).select(*key_cols).collect()
    return [tuple(r) for r in hot]


def adaptive_group_count(
    df: DataFrame,
    key_cols: list[str],
    num_salts: int = 16,
    count_alias: str = "n",
    threshold_fraction: float = 0.01,
    sample_fraction: float = 0.01,
    min_sample_rows: int = 10_000,
) -> DataFrame:
    """COUNT(*) per key, salting ONLY detected heavy hitters.

    Cold keys take the ordinary single-shuffle aggregate (no extra phase paid
    where there is no skew); rows of detected hot keys are routed through the
    two-phase salted aggregate and the results unioned. The hot-key set is
    broadcast as a literal IN-list (it is tiny by construction — at most
    1/threshold_fraction keys exist above the threshold). Exact counts either
    way; detection only changes the execution plan, never the result."""
    hot = detect_heavy_hitters(
        df, key_cols, threshold_fraction, sample_fraction, min_sample_rows
    )
    if not hot:
        return df.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias(count_alias))
    key_struct = F.struct(*[F.col(c) for c in key_cols])
    key_types = {f.name: f.dataType for f in df.schema.fields}
    hot_lits = [
        F.struct(*[F.lit(v).cast(key_types[c]) for c, v in zip(key_cols, row)]) for row in hot
    ]
    is_hot = key_struct.isin(*hot_lits)
    cold = (
        df.filter(~is_hot)
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias(count_alias))
    )
    hot_agg = salted_group_count(df.filter(is_hot), key_cols, num_salts, count_alias)
    return cold.unionByName(hot_agg)
