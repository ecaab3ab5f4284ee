"""Full-registry codegen audit: run EVERY registry query at one SF with the
bench codegen watch attached and report any query whose plan fails
whole-stage codegen compilation (Janino errors, WSC fallbacks).

Why: bench.py's per-query watch (round 10) only covers the 42 headline
queries; an interpreted stage in any OTHER registered query is the same
silent 2-7x row-cost regression at scale. This sweeps all of them once.

The expression-interpreted classes the repo accepts by design (Arrow
kernels, HOF folds documented as oracle-exact forms) do NOT log codegen
ERRORs — only actual compile failures and WholeStageCodegenExec fallbacks
count, so a clean run means "zero silent Janino breakage anywhere".

Usage: python tools/codegen_audit.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bench import _codegen_log_conf
    from mobsos_event_log_generator_spark.session import get_spark

    java_opt, watch = _codegen_log_conf()
    spark = get_spark(
        "codegen-audit",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": java_opt,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mobsos_event_log_generator_spark.plans.queries import QUERIES

    failures: dict[str, int] = {}
    errors: dict[str, str] = {}
    watch.poll()  # drain startup noise
    t_all = time.perf_counter()
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:  # keep auditing; parity gates own correctness
            errors[name] = str(ex)[:120]
        n = watch.poll()
        if n:
            failures[name] = n
            print(f"CODEGEN FAIL  {name}: {n} event(s)", flush=True)
        if i % 50 == 0:
            print(f"  ...{i}/{len(QUERIES)} audited "
                  f"({time.perf_counter() - t_all:.0f}s)", flush=True)
    print(f"\naudited {len(QUERIES)} queries at {sf_dir} in "
          f"{time.perf_counter() - t_all:.0f}s")
    if errors:
        print("run errors (audit-only; see parity gates):", errors)
    if failures:
        print("CODEGEN FAILURES:", failures)
        return 1
    print("zero codegen failures across the registry")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
