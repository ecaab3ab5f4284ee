"""Bench-style repeated timer for a subset of queries (guide §1).

Times `fn(spark, sf_dir).write.format("noop")` — build + plan + exec, the
same region bench.py times — N consecutive times in one session after the
standard warm-up, so JIT/codegen noise settles and run-to-run variance is
visible. Usage:

    python tools/time_query.py [--n 4] [--sf-dir DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from mobsos_event_log_generator_spark.session import get_spark
    from mobsos_event_log_generator_spark.plans.queries import QUERIES

    spark = get_spark("time_query",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py-equivalent warm-up: JVM codegen + Python/Arrow worker pool.
    spark.range(1_000_000).selectExpr("sum(id * 2)").collect()
    import pandas as pd  # noqa: F401

    def _noop_batches(it):
        for b in it:
            yield b

    spark.range(10).mapInPandas(_noop_batches, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in args.names:
        fn = QUERIES[name]
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(json.dumps({name: runs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
