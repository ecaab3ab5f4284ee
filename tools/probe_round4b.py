"""Round-4 second-wave scale probes (BASELINE.md): spatial grid join at
1M points, triangle counting at x10 lineitem, 2-D skyline at x100 parts.
Warm operator cores on local[32] — run manually, results recorded in
BASELINE.md next to the other probes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {out} in {time.time() - t0:.1f}s", flush=True)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from mobsos_event_log_generator_spark.operators.graph import triangle_counts
    from mobsos_event_log_generator_spark.operators.skyline import skyline_2d
    from mobsos_event_log_generator_spark.operators.spatial import grid_distance_join

    # --- spatial: 1M points on a 100k x 100k grid, d=50 ------------------
    pts = spark.range(1_000_000).select(
        F.col("id"),
        (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit("x"))), 1, 8), 16, 10)
         .cast("long") % 100_000).alias("x"),
        (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit("y"))), 1, 8), 16, 10)
         .cast("long") % 100_000).alias("y"),
    )
    timed(
        "spatial 1M pts d=50 pairs",
        lambda: grid_distance_join(pts, pts, 50).filter("id_a < id_b").count(),
    )

    # --- triangles: x10 lineitem basket graph ----------------------------
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    big = li
    for i in range(1, 10):
        big = big.union(
            li.select((F.col("l_orderkey") + i * 100_000_000).alias("l_orderkey"), "l_partkey")
        )
    b = big.distinct()
    a = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("s"))
    c = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("d"))
    edges = (
        a.join(c, "l_orderkey")
        .filter(F.col("s") < F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("s", "d")
    )
    timed(
        "triangles x10 lineitem (6M rows) nodes-with-triangles",
        lambda: triangle_counts(edges, "s", "d").count(),
    )

    # --- skyline: x100 parts (2M rows, perturbed) ------------------------
    part = spark.read.parquet("/root/testdata/sf0.1/part.parquet").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    bigp = part
    for i in range(1, 100):
        bigp = bigp.union(
            part.select(
                (F.col("p_partkey") + i * 10_000_000).alias("p_partkey"),
                (F.col("p_retailprice") + i * 0.001).alias("p_retailprice"),
                "p_size",
            )
        )
    timed(
        "skyline_2d x100 parts (2M rows) frontier size",
        lambda: skyline_2d(bigp, "p_retailprice", "p_size").count(),
    )

    spark.stop()


if __name__ == "__main__":
    main()
