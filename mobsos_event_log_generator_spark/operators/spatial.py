"""Spatial proximity join via grid bucketing.

"All point pairs within distance d" is the 2-D sibling of the LSH candidate
join: the naive form is a quadratic cross join with a distance filter, which
Spark would execute as BroadcastNestedLoop/Cartesian — the canonical
scale-killer. Grid bucketing makes it an equi-join: hash every point to a
⌈d⌉-sized cell; any pair within distance d lands in the same or an adjacent
cell, so candidates come from joining one side's cell against the other
side's 3×3 neighborhood (a 9-way explode on ONE side — the other side stays
un-replicated), then an EXACT integer squared-distance verify prunes the
corners. Work scales with occupied-cell density, never |A|·|B|.

All arithmetic is integer (coordinates are ints, d² compare in int64), so
the DuckDB oracle reproduces the result bit-for-bit from the quadratic
truth — proving the 3×3 neighborhood loses no pairs (a theorem: |Δx| ≤ d
⇒ cells differ by ≤ 1 on that axis when cell = coord div d, d ≥ 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_distance_join(
    a: DataFrame,
    b: DataFrame,
    max_dist: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All (a, b) pairs with squared Euclidean distance ≤ max_dist² (integer
    coordinates). Output: (id_a, id_b, dist_sq). Self-joins: pass the same
    frame twice and filter id_a < id_b downstream if unordered pairs are
    wanted."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    d = int(max_dist)
    left = a.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).cast("long").alias("xa"),
        F.col(y_col).cast("long").alias("ya"),
        F.expr(f"CAST({x_col} AS BIGINT) div {d}").alias("cx"),
        F.expr(f"CAST({y_col} AS BIGINT) div {d}").alias("cy"),
    )
    # replicate ONE side into its 3x3 cell neighborhood; the other side
    # stays single-copy, so the shuffle volume is 9|A| + |B|, not |A||B|.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    right = (
        b.select(
            F.col(id_col).alias("id_b"),
            F.col(x_col).cast("long").alias("xb"),
            F.col(y_col).cast("long").alias("yb"),
            F.expr(f"CAST({x_col} AS BIGINT) div {d}").alias("bx"),
            F.expr(f"CAST({y_col} AS BIGINT) div {d}").alias("by"),
        )
        .withColumn("__o", F.explode(offsets))
        .select(
            "id_b",
            "xb",
            "yb",
            (F.col("bx") + F.col("__o.dx")).alias("cx"),
            (F.col("by") + F.col("__o.dy")).alias("cy"),
        )
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .withColumn("dist_sq", dist_sq.cast("long"))
        .filter(F.col("dist_sq") <= d * d)
        .select("id_a", "id_b", "dist_sq")
    )
