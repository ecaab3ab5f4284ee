"""Round-6 third-continuation probes (BASELINE.md): SRP signature ANN —
signature build cost and the Hamming stage-1 shortlist cost vs the
brute-force float-cosine stage at the same corpus/query scale. The point to
measure: once signatures exist, stage 1 touches 8 bytes/vector instead of
256, and the pair scoring is one xor+popcount instead of a 64-dim float
fold. Warm operator cores on local[32] — run manually, results recorded in
BASELINE.md."""

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


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mobsos_event_log_generator_spark.operators.similarity import cosine, srp_signatures
    from mobsos_event_log_generator_spark.plans.llm import _SRP_SIGNS

    def emb(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), "
                "i -> cast(pmod(hash(id * 131 + i), 1000) as float) / 500.0 - 1.0)"
            ).alias("embedding"),
        )

    def signatures(corpus):
        return srp_signatures(corpus, _SRP_SIGNS)

    for n, qmod in ((20_000, 500), (200_000, 5_000), (2_000_000, 50_000)):
        corpus = emb(n)
        sig = signatures(corpus).localCheckpoint(eager=True)  # the persisted index
        nq = 40

        # stage 1a: Hamming shortlist over precomputed signatures
        q = sig.filter(F.col("vec_id") % qmod == 0).select(
            F.col("vec_id").alias("query_id"), F.col("sig").alias("q_sig")
        )
        c = sig.select(F.col("vec_id").alias("neighbor_id"), F.col("sig").alias("c_sig"))
        w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
        ham = (
            q.join(c, F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.bit_count(F.col("q_sig").bitwiseXOR(F.col("c_sig"))).cast("long").alias("hamming"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20)
        )
        ham.count()  # warm
        timed(f"srp hamming stage  n={n:>9,} q={nq}", lambda h=ham: h.count())

        # baseline: brute-force float cosine shortlist, same pairs
        emb_q = corpus.filter(F.col("vec_id") % qmod == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        emb_c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
        w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
        bf = (
            emb_q.join(emb_c, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
            .withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= 20)
        )
        bf.count()  # warm
        timed(f"bruteforce cosine  n={n:>9,} q={nq}", lambda b=bf: b.count())

        # signature build (amortized once per corpus version)
        timed(f"signature build    n={n:>9,}", lambda cp=corpus: signatures(cp).count())


if __name__ == "__main__":
    main()
