"""Round-7 probe: end-to-end wall-clock across the real sf ladder
(sf0.001 -> sf0.01 -> sf0.1, x10 data each step) for the heaviest bench
queries — the ones the r6 design audit called "plan sound, cost inherent".

Kernel-level x10..x1000 probes live in earlier probe scripts / BASELINE.md;
this one cross-checks the ASSEMBLED queries: if wall grows far below 10x
per step the cost is fixed overhead (plan/compile/stage launch), and the
per-row slope — the thing that survives to 100 TB — is the delta between
the last two rungs. Warm lane only (cold is compile-dominated at these SFs).

Usage: python tools/probe_round7.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LADDER = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
DEFAULT = (
    "er_fellegi_sunter",
    "search_hybrid_rrf",
    "parts_densest_subgraph",
    "semdedup_embeddings_arrow",
    "dedup_jaccard_prefix_join",
)


def main() -> int:
    names = sys.argv[1:] or list(DEFAULT)
    from mobsos_event_log_generator_spark.plans.queries import QUERIES
    from mobsos_event_log_generator_spark.session import get_spark

    spark = get_spark("probe-r7", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(f"{'query':34s} " + " ".join(f"{os.path.basename(d):>9s}" for d in LADDER)
          + "   step ratios (x10 data each)")
    for name in names:
        fn = QUERIES[name]
        walls = []
        for sf_dir in LADDER:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm plan+cache
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        ratios = [walls[i + 1] / walls[i] for i in range(len(walls) - 1)]
        print(f"{name:34s} " + " ".join(f"{w:8.2f}s" for w in walls)
              + "   " + " ".join(f"x{r:.1f}" for r in ratios))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
