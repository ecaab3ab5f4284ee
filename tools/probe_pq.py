"""PQ-ADC scale probes (BASELINE.md): index build cost, ADC scan vs
brute-force float-cosine at the same corpus/query scale, and the byte
footprint argument (4 int codes vs 64 float64s per vector). Warm operator
cores on local[32] — run manually, results recorded in BASELINE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.2f} s" + (f" ({out})" if out is not None else ""))
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mobsos_event_log_generator_spark.operators import exactmath as XM
    from mobsos_event_log_generator_spark.operators.similarity import (
        _pq_assign,
        _pq_subvectors,
        _sqdist,
        cosine,
        cosine_topk,
        pq_train,
    )

    def emb(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), "
                "i -> cast(pmod(hash(id * 131 + i), 1000) as float) / 500.0 - 1.0)"
            ).alias("embedding"),
        )

    for n in (100_000, 500_000):
        corpus = emb(n).cache()
        corpus.count()
        queries = corpus.filter(F.col("vec_id") % (n // 20) == 0).cache()
        nq = queries.count()
        print(f"\n=== corpus {n:,} / {nq} queries ===")

        cb = pq_train(corpus)
        cb_rows = cb.collect()  # codebook is tiny; freeze it like a real index
        cb_frozen = spark.createDataFrame(cb_rows, cb.schema).cache()
        sub = _pq_subvectors(corpus, "neighbor_id", 4, 16)
        codes = _pq_assign(sub, cb_frozen, "neighbor_id", "code").cache()
        timed("index build (train + encode, one-time)", lambda: codes.count())
        print(f"index bytes/vector: 4 codes (~{4*4} B int32) vs 64 float64 ({64*8} B) = {64*8/(4*4):.0f}x")

        def bf():
            return cosine_topk(corpus, queries, k=5).count()

        def adc():
            qsub = _pq_subvectors(queries, "query_id", 4, 16)
            dtab = qsub.join(F.broadcast(cb_frozen), "m").select(
                "query_id", "m", "cid",
                XM.int_units_long(_sqdist(F.col("sub"), F.col("cvec")), 6).alias("d_micro"),
            )
            adc_df = (
                codes.join(F.broadcast(dtab), (codes["m"] == dtab["m"]) & (codes["code"] == dtab["cid"]))
                .filter(F.col("query_id") != F.col("neighbor_id"))
                .groupBy("query_id", "neighbor_id")
                .agg(F.sum("d_micro").cast("long").alias("adc_micro"))
            )
            w = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
            short = adc_df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 50)
            qv = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
            cv = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
            rr = (
                short.join(F.broadcast(qv), "query_id")
                .join(cv, "neighbor_id")
                .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
            )
            wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
            return rr.withColumn("rank", F.row_number().over(wr)).filter(F.col("rank") <= 5).count()

        timed("brute-force float-cosine top-5", bf)
        timed("PQ-ADC + rerank top-5 (codes cached, codebook frozen)", adc)
        corpus.unpersist()
        queries.unpersist()
        codes.unpersist()
        cb_frozen.unpersist()


if __name__ == "__main__":
    main()
