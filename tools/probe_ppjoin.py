"""PPJoin positional-filter probe: candidate-set growth and wall time of the
prefix-filter Jaccard lane at x1 / x10 document volume.

Reuses probe_round7b's token-salted x-factor corpus (replicas live in
disjoint shingle universes, so the TRUE pair count grows exactly linearly —
any superlinear candidate growth is filter leakage, not data). Reports, per
factor and threshold: plain prefix+size candidates, positional-filter
candidates, verified pairs, and wall time of the full join — the evidence
that the positional filter's pruning HOLDS at scale rather than washing out.

Usage: python tools/probe_ppjoin.py [factors...]   (default: 1 10)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_round7b import SRC, build_scaled  # noqa: E402


def plain_prefix_candidates(prefixes, threshold):
    """The pre-positional-filter candidate set (prefix equi-join + size
    filter only) — the baseline the positional filter prunes."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    frac = Fraction(threshold).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    a = prefixes.select(
        F.col("doc_id").alias("id1"), F.col("shingle").alias("sh1"), F.col("n_sh").alias("n1")
    )
    b = prefixes.select(
        F.col("doc_id").alias("id2"), F.col("shingle").alias("sh2"), F.col("n_sh").alias("n2")
    )
    return (
        a.join(
            b,
            (F.col("sh1") == F.col("sh2"))
            & (F.col("id1") < F.col("id2"))
            & (F.col("n2") * den >= F.col("n1") * num)
            & (F.col("n1") * den >= F.col("n2") * num),
        )
        .select("id1", "id2")
        .distinct()
    )


def main() -> None:
    factors = [int(a.lstrip("x")) for a in sys.argv[1:]] or [1, 10]

    from mobsos_event_log_generator_spark.operators.dedup import doc_shingles
    from mobsos_event_log_generator_spark.operators.setjoin import (
        prefix_filter_candidates,
        prefix_filter_jaccard_join,
        prefix_postings,
    )
    from mobsos_event_log_generator_spark.session import get_spark
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    spark = get_spark("probe_ppjoin")
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        sf_dir = SRC if factor == 1 else build_scaled(spark, factor)
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        for tau in (0.5, 0.8):
            sh = doc_shingles(docs)
            pref = prefix_postings(sh, threshold=tau)
            n_plain = plain_prefix_candidates(pref, tau).count()
            n_pos = prefix_filter_candidates(pref, threshold=tau).count()
            t0 = time.monotonic()
            n_ver = prefix_filter_jaccard_join(docs, threshold=tau).count()
            wall = time.monotonic() - t0
            pruned = 100.0 * (1 - n_pos / n_plain) if n_plain else 0.0
            print(
                f"x{factor} docs={n_docs} tau={tau}: plain={n_plain} "
                f"positional={n_pos} (pruned {pruned:.1f}%) verified={n_ver} "
                f"full-join wall={wall:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
