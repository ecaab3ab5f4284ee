"""Round-11 probe: the two new lanes AS REGISTERED at scale.

(a) recall@5 of the high-recall multiprobe (`similarity_topk_ann_multiprobe_hq`,
    query-directed probing sequence, T=64 of 256 buckets) vs exact brute
    force — on the base sf0.1 corpus and the x10/x100 PERTURBED corpora
    (probe_round10's build_recall_corpus: replicas carry deterministic
    +-0.25 per-element noise; the r10-verdict floor is >=0.7 at x10) —
    alongside the blind-H1 base lane it upgrades;
(b) wall-clock of the persisted-signature-index lane
    (`similarity_topk_ann_multitable_indexed`, write+query as registered)
    at sf0.1 and x-factor, capped like every probe.

Usage: python tools/probe_round11.py [x10|x100 ...]   (default x10)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_round7b import SRC, build_scaled  # noqa: E402
from probe_round10 import build_recall_corpus, recall_at_5  # noqa: E402

CAP_SEC = 360.0

RECALL_LANES = (
    "similarity_topk_ann_multiprobe",
    "similarity_topk_ann_multiprobe_hq",
    "similarity_topk_ann_multitable",
)
TIMED = (
    "similarity_topk_ann_multiprobe_hq",
    "similarity_topk_ann_multitable",
    "similarity_topk_ann_multitable_indexed",
)


def main() -> int:
    factors = [int(a.lstrip("x")) for a in sys.argv[1:]] or [10]
    from mobsos_event_log_generator_spark.plans.queries import QUERIES
    from mobsos_event_log_generator_spark.session import get_spark

    spark = get_spark("probe-r11", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(name, sf_dir):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    base = {n: timed(n, SRC) for n in TIMED}
    print(f"{'recall@5 vs brute, sf0.1':40s} "
          + "  ".join(f"{l.split('_')[-1]}={recall_at_5(spark, SRC, l):.2f}"
                      for l in RECALL_LANES))
    failures = []
    for factor in factors:
        d = build_scaled(spark, factor)
        print(f"\n-- x{factor} timing corpus --")
        print(f"{'query':40s} {'sf0.1':>8s} {'x' + str(factor):>9s}   ratio   cap({CAP_SEC:.0f}s)")
        for n in TIMED:
            w = timed(n, d)
            ok = "ok" if w < CAP_SEC else "OVER CAP"
            if w >= CAP_SEC:
                failures.append(f"{n} x{factor}: {w:.1f}s")
            print(f"{n:40s} {base[n]:7.2f}s {w:8.2f}s   x{w / base[n]:5.1f}   {ok}")
            sys.stdout.flush()
        rd = build_recall_corpus(spark, factor)
        print(f"{'recall@5 vs brute, x' + str(factor) + ' (perturbed)':40s} "
              + "  ".join(f"{l.split('_')[-1]}={recall_at_5(spark, rd, l):.2f}"
                          for l in RECALL_LANES))
    if failures:
        print("\nOVER-CAP:", failures, file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
