"""Round-4 operator scale probes (BASELINE.md): pagerank_fixed_point on a
large synthetic graph, semdedup with corpus-scaled centroid counts, z-order
curve + layout at x10. Warm operator cores on local[32] — run manually,
results recorded in BASELINE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.2f} s" + (f" ({out})" if out is not None else ""))


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mobsos_event_log_generator_spark.operators.graph import pagerank_fixed_point
    from mobsos_event_log_generator_spark.operators.similarity import semdedup
    from mobsos_event_log_generator_spark.sources.lake import interleave_bits

    # --- PageRank: synthetic power-law-ish directed graph, 100k nodes ----
    # dst = md5-mixed so hubs emerge (mod-biased); fully deterministic.
    for n_edges in (100_000, 1_000_000, 10_000_000):
        edges = spark.range(n_edges).selectExpr(
            "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 6), 16, 10) % 100000 AS BIGINT) AS src",
            "CAST(conv(substr(md5(CAST(id AS STRING)), 7, 6), 16, 10) % 1000 AS BIGINT) AS dst",
        )
        edges.write.format("noop").mode("overwrite").save()  # warm input path
        timed(
            f"pagerank 3 iters, {n_edges:,} edges",
            lambda e=edges: pagerank_fixed_point(e, iterations=3).count(),
        )

    # --- SemDeDup: embeddings x20 (10k vectors), centroids fixed vs scaled
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    big = emb.selectExpr("vec_id", "embedding")
    reps = [big.selectExpr(f"vec_id + {i * 1_000_000} AS vec_id", "embedding") for i in range(20)]
    corpus = reps[0]
    for r in reps[1:]:
        corpus = corpus.union(r)
    corpus = corpus.repartition(32)
    corpus.write.format("noop").mode("overwrite").save()
    timed(
        "semdedup 10k vecs, 8 centroids (cells ~1250: quadratic-in-cell)",
        lambda: semdedup(corpus, threshold=0.4225, num_centroids=8, iters=1).count(),
    )
    timed(
        "semdedup 10k vecs, 64 centroids (cells ~160: scaled with corpus)",
        lambda: semdedup(corpus, threshold=0.4225, num_centroids=64, iters=1).count(),
    )

    # --- Z-order curve at x10 events (1M rows): projection-only cost -----
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    base = load_table(spark, "/root/testdata/sf0.1", "events").selectExpr(
        "event_id", "user_id", "unix_micros(ts) AS ts_us"
    )
    ev = base
    for i in range(1, 10):  # x10 -> 1M rows
        ev = ev.union(base.selectExpr(f"event_id + {i * 10_000_000} AS event_id", "user_id", "ts_us"))
    b = ev.agg(
        F.min("user_id").alias("u_lo"), F.max("user_id").alias("u_hi"),
        F.min("ts_us").alias("t_lo"), F.max("ts_us").alias("t_hi"),
    )
    span = 2**16 - 1
    z = ev.crossJoin(F.broadcast(b)).select(
        "event_id",
        F.expr(f"((user_id - u_lo) * {span}) div (u_hi - u_lo)").alias("zx"),
        F.expr(f"((ts_us - t_lo) * {span}) div (t_hi - t_lo)").alias("zy"),
    ).select("event_id", interleave_bits(F.col("zx"), F.col("zy")).alias("zvalue"))
    z.write.format("noop").mode("overwrite").save()  # warm
    timed("zorder curve 1M events (noop sink)", lambda: z.write.format("noop").mode("overwrite").save())

    probe_hierarchy(spark)



def probe_hierarchy(spark) -> None:
    """Pointer doubling on pathological shapes: a deep chain (the case that
    kills height-many self-join recursion) and a wide shallow forest."""
    from mobsos_event_log_generator_spark.operators.graph import resolve_hierarchy

    deep = spark.range(10_000).selectExpr("id", "CASE WHEN id = 0 THEN NULL ELSE id - 1 END AS parent")
    timed("hierarchy 10k-deep chain (14 doubling rounds)",
          lambda: resolve_hierarchy(deep, max_rounds=20).count())
    wide = spark.range(1_000_000).selectExpr(
        "id", "CASE WHEN id < 1000 THEN NULL ELSE id % 1000 END AS parent"
    )
    timed("hierarchy 1M nodes, depth 1 (2 rounds)",
          lambda: resolve_hierarchy(wide, max_rounds=5).count())


if __name__ == "__main__":
    main()
