"""Round-12 measurement harness (optimization guide §1: measure first).

profile_r11.py's successor, per the r11 verdict (#2): the biggest-win lanes
now run their real work inside localCheckpoint jobs that `.explain` cannot
see (0-Exchange/8-line dumps), so the plan census alone lost regression
visibility. This round the census counts EXECUTED work per query from the
Spark UI REST API (stages completed between query start/end, their shuffle
bytes, task counts and executor run time) — checkpointed work is measured,
not hidden.

Per query:

* build_s    — Python-side DataFrame construction (includes any checkpoint/
               collect jobs an operator runs at build time);
* plan_s     — analysis + optimization + physical planning;
* cold_s     — first noop-sink execution;
* warm_s     — immediate second noop-sink execution;
* exec_*     — REST census over build+cold: n_jobs, n_stages, n_tasks,
               shuffle_write_mb, shuffle_read_mb, executor_run_s;
* warm_*     — same census over the warm execution alone.

Also writes `plans/r12/<name>_{before,after}.txt` (`.explain("formatted")`)
plus the Exchange/Python-node text census, so plan-shape claims in
OPTIMIZATION_r12.md stay backed by committed artifacts.

Usage:
    python tools/profile_r12.py                      # all headline queries
    python tools/profile_r12.py --suffix after q1 q2 # subset, after-capture
    python tools/profile_r12.py --no-exec            # plans only (fast)

Output: one JSON line per query on stdout + PROFILE_R12_<suffix>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _StageCensus:
    """Executed-stage census via the Spark UI REST API (local mode).

    The UI store is fed by the listener bus, so this measures what actually
    ran — including localCheckpoint jobs — unlike the `.explain` text.
    Stages are attributed to a query by snapshotting completed stage ids
    before and after the timed region (queries run sequentially here)."""

    def __init__(self, spark) -> None:
        self.base = None
        ui = spark.sparkContext.uiWebUrl
        if ui:
            app_id = spark.sparkContext.applicationId
            self.base = f"{ui}/api/v1/applications/{app_id}"

    def _stages(self) -> dict[tuple[int, int], dict]:
        if not self.base:
            return {}
        try:
            with urllib.request.urlopen(f"{self.base}/stages?status=complete", timeout=10) as r:
                data = json.load(r)
        except Exception:  # noqa: BLE001 — census is best-effort
            return {}
        return {(s["stageId"], s["attemptId"]): s for s in data}

    def snapshot(self) -> set[tuple[int, int]]:
        return set(self._stages())

    def since(self, before: set[tuple[int, int]]) -> dict:
        stages = self._stages()
        new = [s for k, s in stages.items() if k not in before]
        return {
            "n_stages": len(new),
            "n_tasks": sum(s.get("numCompleteTasks", 0) for s in new),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 3
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 3
            ),
            "executor_run_s": round(
                sum(s.get("executorRunTime", 0) for s in new) / 1e3, 3
            ),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench HEADLINE)")
    ap.add_argument("--suffix", default="before", help="plans/r12/<name>_<suffix>.txt")
    ap.add_argument("--no-exec", action="store_true", help="skip noop executions")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None, help="summary JSON path")
    args = ap.parse_args()

    from bench import HEADLINE
    from mobsos_event_log_generator_spark.session import get_spark
    from mobsos_event_log_generator_spark.plans.queries import QUERIES

    names = args.names or list(HEADLINE)
    plans_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("profile_r12",
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  # session.py disables the UI; the REST
                                  # census reads the UI store, so re-enable
                                  # it for profiling only.
                                  "spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    # Same warm-up as bench.py: JVM/codegen + the Python/Arrow worker pool.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop_batches(it):
        for batch in it:
            yield batch

    spark.range(64, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        _noop_batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    census = _StageCensus(spark)

    rows: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile_r12: {name}")
        rec: dict[str, object] = {}
        try:
            snap0 = census.snapshot()
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
                rec["exec"] = census.since(snap0)  # build + plan + cold
                snap1 = census.snapshot()
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                rec["warm_s"] = round(time.perf_counter() - t0, 3)
                rec["warm"] = census.since(snap1)
        except Exception as ex:  # noqa: BLE001 — record, keep profiling
            rec["err"] = str(ex)[:300]
        rows[name] = rec
        print(json.dumps({name: rec}), flush=True)
        spark.sparkContext.setJobDescription(None)

    out = args.out or os.path.join(REPO, f"PROFILE_R12_{args.suffix}.json")
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
