"""Scale probe for the round-3 operators: replicate the sf0.1 fixtures xN
(ids offset per replica) and time the operator cores, so BASELINE.md can
record how wall-clock grows vs data for span dedup, eventually-follows,
gap-fill, and the trailing range frame.

Usage: python tools/probe_round3.py [factor]   (default 10)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s ({n} rows)")
    return dt


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mobsos_event_log_generator_spark.operators import text as X
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="probe_r3_")

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    (
        docs.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n_docs)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{tmp}/documents")
    )
    ev = load_table(spark, sf_dir, "events")
    n_ev = ev.count()
    (
        ev.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * n_ev)
        .withColumn("user_id", F.col("user_id") + (F.col("rep") % 10) * 1000)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{tmp}/events")
    )

    def span_dedup(d):
        words = d.select("doc_id", X.tokens("text").alias("words")).filter(F.size("words") > 0)
        segs = words.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, size(words) - 1, 16),"
                    " s -> array_join(slice(words, s + 1, 16), ' '))"
                )
            ).alias("seg_idx", "seg"),
        )
        segs = segs.withColumn("h", F.md5("seg"))
        firsts = segs.groupBy("h").agg(F.min(F.struct("doc_id", "seg_idx")).alias("f"))
        return firsts.groupBy(F.col("f.doc_id").alias("doc_id")).agg(
            F.count(F.lit(1)).alias("n_kept")
        )

    def efg(e):
        # suffix-count form (O(n*|alphabet|)) — mirrors plans/procmining.py
        case_types = e.select("user_id", F.col("event_type").alias("dst")).distinct()
        fanned = e.join(case_types, "user_id")
        wrun = (
            Window.partitionBy("user_id", "dst")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wall = Window.partitionBy("user_id", "dst")
        is_dst = F.when(F.col("event_type") == F.col("dst"), 1).otherwise(0)
        suffixed = fanned.select(
            F.col("event_type").alias("src"),
            "dst",
            (F.sum(is_dst).over(wall) - F.sum(is_dst).over(wrun)).alias("sfx"),
        )
        return suffixed.groupBy("src", "dst").agg(F.sum("sfx").alias("n_pairs"))

    def trailing(e):
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros("ts"))
            .rangeBetween(-1_800_000_000, 0)
        )
        return e.filter(F.col("event_type") == "purchase").select(
            "event_id", F.count(F.lit(1)).over(w).alias("n")
        )

    for label, base, scaled_path, fn in [
        ("span_dedup", docs, f"{tmp}/documents", span_dedup),
        ("efg", ev, f"{tmp}/events", efg),
        ("trailing_range", ev, f"{tmp}/events", trailing),
    ]:
        t1 = timed(f"{label} x1", lambda: fn(base).count())
        big = spark.read.parquet(scaled_path)
        tN = timed(f"{label} x{factor}", lambda: fn(big).count())
        print(f"{label}: x{factor} data -> {tN / t1:.2f}x wall")


if __name__ == "__main__":
    main()
