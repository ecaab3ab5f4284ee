"""Round-6 operator scale probes (BASELINE.md): epoch_shuffle on synthetic
corpora up to 50M ids, mmr_rerank at growing corpus/query scale (pool-bounded
diversification should track the candidate scan, not blow up), and the
hybrid-RRF fusion stage cost relative to its two parent retrievals. Warm
operator cores on local[32] — run manually, results recorded in BASELINE.md."""

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

    from mobsos_event_log_generator_spark.operators.sampling import epoch_shuffle
    from mobsos_event_log_generator_spark.operators.similarity import mmr_rerank

    # --- epoch_shuffle: ×10/×100/×1000 ids, shards fixed at 64 -----------
    for n in (50_000, 500_000, 5_000_000, 50_000_000):
        df = spark.range(n).withColumnRenamed("id", "doc_id")
        # warm
        epoch_shuffle(df, "doc_id", epoch=1, num_shards=64).count()
        timed(
            f"epoch_shuffle n={n:>9,}",
            lambda df=df: epoch_shuffle(df, "doc_id", epoch=1, num_shards=64).count(),
        )

    # --- mmr_rerank: synthetic embeddings, corpus and query set ×10 ------
    # dim 64 deterministic pseudo-random floats from the id (no RNG).
    def emb(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), "
                "i -> cast(pmod(hash(id * 131 + i), 1000) as float) / 500.0 - 1.0)"
            ).alias("embedding"),
        )

    for n, qmod in ((2_000, 50), (20_000, 500), (200_000, 5_000)):
        corpus = emb(n)
        queries = corpus.filter(F.col("vec_id") % qmod == 0)  # 40 queries each
        mmr_rerank(corpus, queries, k=5, pool=10).count()  # warm
        timed(
            f"mmr_rerank corpus={n:>7,} queries=40",
            lambda c=corpus, q=queries: mmr_rerank(c, q, k=5, pool=10).count(),
        )

    spark.stop()


if __name__ == "__main__":
    main()
