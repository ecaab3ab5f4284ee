"""Micro-profile of doc_shingles sub-steps at sf0.1."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators.text import tokens, word_shingles
from mobsos_event_log_generator_spark.session import get_spark
from mobsos_event_log_generator_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.1"


def timed(label, df, reps=2):
    best = float("inf")
    n = None
    for _ in range(reps):
        t0 = time.monotonic()
        n = df.count()
        best = min(best, time.monotonic() - t0)
    print(f"{label:40s} rows={n:>10d}  best={best:6.2f}s", flush=True)


def main():
    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents")
    timed("docs scan", docs)
    timed("docs text length", docs.select(F.length("text").alias("L")).groupBy().sum("L"))
    words = docs.select("doc_id", tokens("text").alias("words"))
    timed("tokens (size agg)", words.select(F.size("words").alias("s")).groupBy().sum("s"))
    sh_pre = words.select("doc_id", F.explode(word_shingles(F.col("words"), 3)).alias("shingle"))
    timed("shingles pre-distinct", sh_pre)
    timed("shingles distinct", sh_pre.distinct())
    # alternative tokenizer: split + array_remove instead of HOF filter
    words2 = docs.select(
        "doc_id", F.array_remove(F.split(F.col("text"), r"\s+"), "").alias("words")
    )
    timed("tokens v2 (array_remove)", words2.select(F.size("words").alias("s")).groupBy().sum("s"))
    sh2 = words2.select("doc_id", F.explode(word_shingles(F.col("words"), 3)).alias("shingle"))
    timed("shingles v2 pre-distinct", sh2)
    timed("shingles v2 distinct", sh2.distinct())
    # v3: SQL-native shingles via aggregate-free transform on sequence
    docs.createOrReplaceTempView("docs_v")
    sh3 = spark.sql(
        r"""
        SELECT doc_id, explode(
          CASE WHEN size(w) >= 3 THEN
            transform(sequence(0, size(w) - 3),
                      i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
          ELSE array() END) AS shingle
        FROM (SELECT doc_id, array_remove(split(text, '\\s+'), '') AS w FROM docs_v)
        """
    )
    timed("shingles v3 (subscript) pre-distinct", sh3)
    timed("shingles v3 distinct", sh3.distinct())


if __name__ == "__main__":
    main()
