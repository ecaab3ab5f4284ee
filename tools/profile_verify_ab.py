"""Interleaved A/B of jaccard_verify formulations at sf0.1, tau=0.5."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators import exactmath as XM
from mobsos_event_log_generator_spark.operators.dedup import doc_shingles
from mobsos_event_log_generator_spark.operators.setjoin import (
    prefix_filter_candidates,
    prefix_postings,
)
from mobsos_event_log_generator_spark.session import get_spark
from mobsos_event_log_generator_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.1"
THRESH = 0.5


def verify_postings(candidates, shingles, threshold):
    counts = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    s1 = shingles.select(F.col("doc_id").alias("id1"), "shingle")
    s2 = shingles.select(F.col("doc_id").alias("id2"), "shingle")
    inter = (
        candidates.join(s1, "id1")
        .join(s2, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    c1 = counts.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(c1, "id1")
        .join(c2, "id2")
        .withColumn(
            "jaccard",
            XM.ratio_round(F.col("n_inter"), F.col("n1") + F.col("n2") - F.col("n_inter"), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def verify_arrays(candidates, shingles, threshold):
    sets_ = shingles.groupBy("doc_id").agg(F.collect_list("shingle").alias("sh_arr"))
    a = sets_.select(
        F.col("doc_id").alias("id1"), F.col("sh_arr").alias("sh1"), F.size("sh_arr").alias("n1")
    )
    b = sets_.select(
        F.col("doc_id").alias("id2"), F.col("sh_arr").alias("sh2"), F.size("sh_arr").alias("n2")
    )
    return (
        candidates.join(a, "id1")
        .join(b, "id2")
        .withColumn("n_inter", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn(
            "jaccard",
            XM.ratio_round(F.col("n_inter"), F.col("n1") + F.col("n2") - F.col("n_inter"), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def main():
    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents")
    sh = doc_shingles(docs)
    cand = prefix_filter_candidates(prefix_postings(sh, threshold=THRESH), threshold=THRESH)
    times = {"postings": [], "arrays": []}
    for rep in range(4):
        for name, fn in (("postings", verify_postings), ("arrays", verify_arrays)):
            t0 = time.monotonic()
            n = fn(cand, sh, THRESH).count()
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"rep{rep} {name:9s} rows={n} {dt:6.2f}s", flush=True)
    for name, ts in times.items():
        ts2 = sorted(ts)[:-1]  # drop worst
        print(f"{name:9s} best={min(ts):5.2f} median3={ts2[len(ts2)//2]:5.2f}")


if __name__ == "__main__":
    main()
