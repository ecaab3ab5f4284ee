"""Count-min sketch as pure DataFrame algebra (companion to ``bloom.py``).

A (depth × width) counter grid: each key increments one counter per row
(position = md5 of a per-row seed + key, mod width); a key's frequency
estimate is the MIN over its depth counters — always >= the true count,
inflated only by collisions. Building is one explode + groupBy with map-side
combine: the shuffle carries at most depth × width counter rows per
partition, regardless of input size. The materialized sketch is tiny and
broadcastable, so estimation never shuffles the probe side.

The 100 TB use case: approximate frequency / heavy-hitter screening over a
key space too large to count exactly per query — build once, probe cheaply.
Deterministic md5 positions mean the DuckDB oracle reproduces every counter
and every estimate (including collision inflation) exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 256


def _position(key: Column, row: int, width: int) -> Column:
    from mobsos_event_log_generator_spark.operators.sampling import hash_bucket

    return hash_bucket(F.concat(F.lit(f"c{row}|"), key.cast("string")), width)


def build_cms(
    df: DataFrame,
    key_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Build the counter grid: (row, col, cnt) — only touched counters are
    materialized (absent counter = 0)."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _position(F.col(key_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    ).select(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def estimate_counts(
    keys: DataFrame,
    cms: DataFrame,
    key_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Estimate each key's frequency: min over its depth counters (0 for a
    counter never touched). The sketch side is broadcast."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("row"), _position(F.col(key_col), r, width).alias("col"))
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(F.col(key_col), F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    return (
        probes.join(F.broadcast(cms), ["row", "col"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two grids built with identical (depth, width): counters add.
    Exactly equals building one sketch over the concatenated input (counts
    are linear), so sketches can be maintained per batch and merged."""
    return a.unionByName(b).groupBy("row", "col").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
