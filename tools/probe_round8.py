"""Round-8 probe: verify the demo-query-set decoupling (r7 verdict #5) and
the new ANN-backed hybrid (verdict #4) at x100 — the scale where the old
`vec_id % 50` parameterization made MMR / PQ-ADC / brute-force / hybrid-RRF
quadratic (4000 queries x 200k vectors; MMR 339 s and PQ 113 s only with a
hand-fixed 40-query set, hybrid RRF >10 min AS REGISTERED).

After the cap (`vec_id % 50 = 0 AND vec_id < 2000`) the registered entries
carry a FIXED <=40-query set at any corpus size, so each must now complete
as registered. Pass bar: every probed query finishes and the whole-entry
wall stays inside the 360 s cap the r7 probes used.

Reuses probe_round7b's x-factor corpus builder (replica token salting keeps
the near-dup structure honest; embeddings re-key with unchanged vectors).

Usage: python tools/probe_round8.py [x10|x100 ...]   (default x100)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_round7b import SRC, build_scaled  # noqa: E402

CAP_SEC = 360.0
QUERIES_TO_PROBE = (
    # the five decoupled entries (r7 verdict #5)
    "similarity_topk_bruteforce",
    "similarity_truncated_dim_audit",
    "similarity_mmr_diversified",
    "similarity_mmr_arrow",
    "similarity_topk_pq_adc",
    # hybrid baseline (now capped) + the new ANN scale path (verdict #4)
    "search_hybrid_rrf",
    "search_hybrid_rrf_ann",
)


def main() -> int:
    factors = [int(a.lstrip("x")) for a in sys.argv[1:]] or [100]
    from mobsos_event_log_generator_spark.plans.queries import QUERIES
    from mobsos_event_log_generator_spark.session import get_spark

    spark = get_spark("probe-r8", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(name, sf_dir):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    base = {n: timed(n, SRC) for n in QUERIES_TO_PROBE}
    failures = []
    for factor in factors:
        d = build_scaled(spark, factor)
        n_vecs = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        print(f"\n-- x{factor} corpus at {d}: {n_vecs} vectors --")
        print(f"{'query':34s} {'sf0.1':>8s} {'x' + str(factor):>9s}   ratio   cap({CAP_SEC:.0f}s)")
        for n in QUERIES_TO_PROBE:
            w = timed(n, d)
            ok = "ok" if w < CAP_SEC else "OVER CAP"
            if w >= CAP_SEC:
                failures.append(f"{n} x{factor}: {w:.1f}s")
            print(f"{n:34s} {base[n]:7.2f}s {w:8.2f}s   x{w / base[n]:5.1f}   {ok}")
            sys.stdout.flush()
    if failures:
        print("\nOVER-CAP:", failures, file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
