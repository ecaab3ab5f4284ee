"""Stage-level profile of er_fellegi_sunter at sf0.1 (warm timings).

Measures where the ~10 s warm cost goes: shingles, prefixes, candidates,
verified pairs, full query. Each stage timed on its own action after one
warm-up, so JIT/compile are excluded.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from mobsos_event_log_generator_spark.operators.dedup import doc_shingles, jaccard_verify
from mobsos_event_log_generator_spark.operators.setjoin import (
    prefix_filter_candidates,
    prefix_filter_jaccard_join,
    prefix_postings,
)
from mobsos_event_log_generator_spark.plans.llm import er_fellegi_sunter
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
    print(f"{label:35s} rows={n:>9d}  best={best:6.2f}s", flush=True)
    return best


def main():
    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents")
    sh = doc_shingles(docs)
    timed("doc_shingles", sh)
    pref = prefix_postings(sh, threshold=0.5)
    timed("prefix_postings(0.5)", pref)
    cand = prefix_filter_candidates(pref, threshold=0.5)
    timed("candidates(0.5)", cand)
    ver = jaccard_verify(cand, sh, threshold=0.5)
    timed("verified_pairs(0.5)", ver)
    full = prefix_filter_jaccard_join(docs, threshold=0.5)
    timed("prefix_filter_jaccard_join", full)
    fs = er_fellegi_sunter(spark, SF_DIR)
    timed("er_fellegi_sunter full", fs)


if __name__ == "__main__":
    main()
