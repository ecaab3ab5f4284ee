"""Round-11 measurement harness (optimization guide §1: measure first).

For every bench headline query, split the cold wall into its components so
optimization effort lands where the time actually goes:

* build_s — Python-side DataFrame construction (plan tree assembly);
* plan_s  — analysis + optimization + physical planning
            (`queryExecution().executedPlan()` forced, no execution);
* cold_s  — first noop-sink execution (includes codegen compile + JIT);
* warm_s  — immediate second noop-sink execution (row-work proxy).

Also writes `plans/r11/<name>_{before,after}.txt` with the
`.explain("formatted")` output (suffix from --suffix), and an
`Exchange`/`BatchEvalPython` node census per query so plan-shape claims in
OPTIMIZATION_r11.md are backed by committed artifacts.

Usage:
    python tools/profile_r11.py                      # all headline queries
    python tools/profile_r11.py --suffix after q1 q2 # subset, after-capture
    python tools/profile_r11.py --no-exec            # plans only (fast)

Output: one JSON line per query on stdout + PROFILE_R11.json summary.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench HEADLINE)")
    ap.add_argument("--suffix", default="before", help="plans/r11/<name>_<suffix>.txt")
    ap.add_argument("--no-exec", action="store_true", help="skip noop executions")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None, help="summary JSON path")
    args = ap.parse_args()

    from bench import HEADLINE
    from mobsos_event_log_generator_spark.session import get_spark
    from mobsos_event_log_generator_spark.plans.queries import QUERIES

    names = args.names or list(HEADLINE)
    plans_dir = os.path.join(REPO, "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("profile_r11",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # Same warm-up as bench.py: JVM/codegen + the Python/Arrow worker pool.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop_batches(it):
        for batch in it:
            yield batch

    spark.range(64, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        _noop_batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    rows: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile_r11: {name}")
        rec: dict[str, object] = {}
        try:
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            rec["build_s"] = round(time.perf_counter() - t0, 3)

            t0 = time.perf_counter()
            qe = df._jdf.queryExecution()
            qe.executedPlan()  # analysis + optimization + physical planning
            rec["plan_s"] = round(time.perf_counter() - t0, 3)

            formatted = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(formatted)
            rec["exchanges"] = len(re.findall(r"\bExchange\b", formatted))
            rec["python_nodes"] = len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", formatted)
            )
            rec["smj"] = len(re.findall(r"SortMergeJoin", formatted))
            rec["bhj"] = len(re.findall(r"BroadcastHashJoin", formatted))
            rec["plan_lines"] = formatted.count("\n")

            if not args.no_exec:
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                rec["cold_s"] = round(time.perf_counter() - t0, 3)
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                rec["warm_s"] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001 — record, keep profiling
            rec["err"] = str(ex)[:300]
        rows[name] = rec
        print(json.dumps({name: rec}), flush=True)
        spark.sparkContext.setJobDescription(None)

    out = args.out or os.path.join(REPO, f"PROFILE_R11_{args.suffix}.json")
    merged: dict[str, dict] = {}
    if os.path.exists(out):  # accumulate across subset invocations
        try:
            merged = json.load(open(out)).get("rows", {})
        except Exception:  # noqa: BLE001
            merged = {}
    merged.update(rows)
    with open(out, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "suffix": args.suffix, "rows": merged}, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
