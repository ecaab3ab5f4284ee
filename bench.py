"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query materializes through the noop sink (full execution, no driver
collect overhead) — the same way a cluster job would be bounded by the write.

Two lanes per query:
* cold (the headline "value"/"queries") — first execution in the process;
  includes analysis/optimization/codegen compile. Comparable to BASELINE.md.
* warm ("value_warm"/"queries_warm") — an immediate second execution; JIT
  and codegen caches are hot, so this tracks per-ROW cost. At sf0.1 the
  cold numbers are plan-compile-dominated (eventlog_normalize: 3.2 s cold
  vs 0.45 s warm), so real row-cost regressions only show in the warm lane.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


# --- Per-query codegen-failure attribution (r9 verdict #3) -----------------
# BENCH_r09's stderr tail carried one Janino UnitCompiler stack with no way
# to tell WHICH query compiled interpreted — correctness-neutral, but an
# interpreted stage in a headline query is a silent 2-7x row-cost regression
# at scale. The JVM's log4j2 output is routed to an additional file appender
# (console untouched, so the driver's tail capture is unchanged) and the
# file is polled between queries, attributing every codegen ERROR/WARN to
# the query that was executing.

_LOG4J2_TEMPLATE = """\
rootLogger.level = error
rootLogger.appenderRef.stderr.ref = console
rootLogger.appenderRef.benchfile.ref = benchfile
appender.console.type = Console
appender.console.name = console
appender.console.target = SYSTEM_ERR
appender.console.layout.type = PatternLayout
appender.console.layout.pattern = %d{{yy/MM/dd HH:mm:ss}} %p %c{{1}}: %m%n
appender.benchfile.type = File
appender.benchfile.name = benchfile
appender.benchfile.fileName = {logfile}
appender.benchfile.layout.type = PatternLayout
appender.benchfile.layout.pattern = %p %c{{1}}: %m%n
logger.codegen.name = org.apache.spark.sql.catalyst.expressions.codegen
logger.codegen.level = warn
logger.wsc.name = org.apache.spark.sql.execution.WholeStageCodegenExec
logger.wsc.level = warn
"""


class _CodegenWatch:
    """Incremental scanner over the bench log4j file: counts codegen compile
    failures (Janino errors, whole-stage fallbacks) appearing since the last
    poll. ``setLogLevel("ERROR")`` raises the ROOT level only; the two
    explicit warn-level loggers above keep the fallback warnings flowing."""

    # Count EVENTS (one per logged failure/fallback message), not the
    # hundreds of Janino stack-frame lines that follow each one.
    PAT = re.compile(
        r"^(ERROR CodeGenerator|WARN (CodeGenerator|WholeStageCodegenExec))"
    )

    def __init__(self, path: str) -> None:
        self.path = path
        self.pos = 0

    def poll(self) -> int:
        try:
            with open(self.path, errors="replace") as f:
                f.seek(self.pos)
                chunk = f.read()
                self.pos = f.tell()
        except OSError:
            return 0
        return sum(1 for ln in chunk.splitlines() if self.PAT.search(ln))


def _codegen_log_conf() -> tuple[str, _CodegenWatch]:
    """Write the log4j2 properties + empty log file; return (java opt, watch)."""
    d = tempfile.mkdtemp(prefix="bench_log4j_")
    logfile = os.path.join(d, "spark.log")
    props = os.path.join(d, "log4j2.properties")
    with open(props, "w") as f:
        f.write(_LOG4J2_TEMPLATE.format(logfile=logfile))
    return f"-Dlog4j2.configurationFile=file:{props}", _CodegenWatch(logfile)

HEADLINE = [
    "eventlog_normalize",
    "eventlog_traces",
    "xes_trace_xml",
    "events_sessionization",
    "asof_last_click_before_purchase",
    "range_join_events_near_errors",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "window_top_orders_per_customer",
    "text_stats_docs",
    "dedup_minhash_lsh",
    "simhash_docs",
    "corpus_prep",
    "similarity_topk_bruteforce",
    "similarity_topk_ann_bucketed",
    # round 3 additions
    "corpus_span_dedup",
    "eventlog_eventually_follows",
    "events_gapfill_interpolate",
    # round 4 additions (semdedup rides the Arrow pair-sweep scale path;
    # the JVM fold variant shares its oracle and stays registry-gated)
    "semdedup_embeddings_arrow",
    "eventlog_pagerank_activities",
    "dedup_canonical_urls",
    "multimodal_audio_features",
    # round 4 second wave: the exact-Jaccard scale path, the orientation-
    # bounded graph triangle count, and the integer KS drift monitor
    "dedup_jaccard_prefix_join",
    "parts_cooccur_triangles",
    "events_ks_drift",
    # round 6 additions: the hybrid retrieval ensemble (BM25 + dense + RRF
    # fusion) and the Arrow greedy-MMR kernel (its JVM twin shares the
    # oracle and stays registry-gated)
    "search_hybrid_rrf",
    "similarity_mmr_arrow",
    # round 6 fourth wave: the compression ANN path (PQ train + encode +
    # integer-micro ADC + rerank) and the one-scan Poisson bootstrap
    "similarity_topk_pq_adc",
    "orders_poisson_bootstrap",
    # round 6 seventh wave: the integer power-iteration families (PCA top
    # component, bipartite HITS), the FastSS edit-distance join, the
    # Morton/ntile layout audit, and the banded-range attribution models
    "embedding_pca_power",
    "customer_supplier_hits",
    "parts_fuzzy_name_pairs",
    "lineitem_zorder_layout",
    "events_multitouch_attribution",
    # round 6 eighth wave: the exact Cramer-solve Markov attribution, the
    # PPJoin-fed Fellegi-Sunter linkage scorer, the integer micro-nat
    # naive-Bayes classifier, and the densest-subgraph peeling loop
    "events_markov_attribution",
    "er_fellegi_sunter",
    "text_naive_bayes_langid",
    "parts_densest_subgraph",
    # round 8: the ANN-backed hybrid retrieval scale path (RRF fusion over
    # the SRP-Hamming dense lane; the brute-force hybrid above stays as the
    # labeled exactness baseline)
    "search_hybrid_rrf_ann",
    # round 9: the portable-register HLL (hash-checked mergeable sketch —
    # the per-day register lane is the 100 TB rollup state)
    "sketch_hll_portable_daily",
    # round 10: the high-recall hybrid (multitable-LSH dense parent,
    # recall@5 0.96-1.00 vs the cheap SRP lane's 0.12-0.17 — BASELINE.md
    # recall/cost menu); tracks the expensive end of the retrieval stack
    "search_hybrid_rrf_ann_hq",
]


# Warm-lane regression gate: cold numbers carry a ±25% plan-compile noise
# band (BASELINE.md), so trend deltas alert on the warm lane only.
WARM_REGRESSION_PCT = 30.0


def _cpus() -> int:
    """The core count this bench runs at (the driver also runs an 8-cpu
    scaling lane; see _deltas_vs_prev)."""
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def _prev_bench() -> tuple[str, dict] | None:
    """Latest BENCH_r{N}.json in the repo root, if any."""
    import re

    best: tuple[int, str] | None = None
    for fn in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), fn)
    if best is None:
        return None
    try:
        with open(os.path.join(REPO, best[1])) as f:
            rec = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    # The driver wraps the bench JSON line as {"n", "rc", "tail", "parsed"}.
    if isinstance(rec.get("parsed"), dict):
        rec = rec["parsed"]
    # r7's artifact had "parsed": null (record line exceeded the driver's
    # tail capture). When the wrapper carries no usable cold map, fall back
    # to the committed BENCH_DETAIL.json sidecar from the same run so
    # cross-round trending survives an unparseable official record.
    if "queries" not in rec:
        try:
            with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
                detail = json.load(f)
            if detail.get("detail_sidecar") and "queries" in detail:
                return f"{best[1]} (via BENCH_DETAIL.json)", detail
        except (OSError, json.JSONDecodeError):
            return None
        return None
    # The short final line carries only the cold lane (2dp) + warm total; the
    # full-precision lanes live in the BENCH_DETAIL.json sidecar written by
    # the same run. Supplement when the sidecar clearly belongs to the
    # recorded run (same cold timings at the line's 2dp precision).
    if "queries_warm" not in rec:
        try:
            with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
                detail = json.load(f)
            d2 = {n: round(t, 2) for n, t in (detail.get("queries") or {}).items()}
            r2 = {n: round(t, 2) for n, t in (rec.get("queries") or {}).items()}
            if d2 == r2:
                rec = dict(rec, queries=detail["queries"],
                           queries_warm=detail.get("queries_warm", {}))
        except (OSError, json.JSONDecodeError):
            pass
    return best[1], rec


def _deltas_vs_prev(timings: dict, warm: dict) -> tuple[dict, list[str]] | None:
    """Per-query cold/warm % deltas vs the latest BENCH_r{N}.json, plus the
    list of warm-lane regressions past WARM_REGRESSION_PCT (verdict r3 #7)."""
    prev = _prev_bench()
    if prev is None:
        return None
    prev_name, prev_rec = prev
    # Core-count guard (r11 verdict #6 "BENCH_DETAIL trap"): the driver also
    # runs bench at a LOWER core count for the scaling block, and an 8-cpu
    # sidecar once overwrote BENCH_DETAIL.json — its warm_regressions list
    # compared 8-core walls against 32-core history. Never trend across
    # mismatched core counts; records without a cpus field predate the
    # guard and are assumed 32.
    prev_cpus = int(prev_rec.get("cpus", 32))
    if prev_cpus != _cpus():
        return {"vs": prev_name,
                "skipped": f"cpu mismatch (prev {prev_cpus}, now {_cpus()})"}, []
    prev_cold = prev_rec.get("queries", {})
    prev_warm = prev_rec.get("queries_warm", {})
    deltas: dict[str, dict] = {"vs": prev_name}
    regressions: list[str] = []
    for name in timings:
        entry: dict[str, float] = {}
        if name in prev_cold and prev_cold[name] > 0:
            entry["cold_pct"] = round(100.0 * (timings[name] / prev_cold[name] - 1.0), 1)
        if name in warm and name in prev_warm and prev_warm[name] > 0:
            wpct = round(100.0 * (warm[name] / prev_warm[name] - 1.0), 1)
            entry["warm_pct"] = wpct
            if wpct > WARM_REGRESSION_PCT:
                regressions.append(f"{name}: warm {prev_warm[name]}s -> {warm[name]}s (+{wpct}%)")
        if entry:
            deltas[name] = entry
    return deltas, regressions


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from mobsos_event_log_generator_spark.session import get_spark
    from mobsos_event_log_generator_spark.plans.queries import QUERIES

    # No console progress bars: the driver captures only the output tail, and
    # progress redraw lines truncated the r4 record into "parsed": null.
    java_opt, cgwatch = _codegen_log_conf()
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": java_opt,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # r6's official capture overlapped other JVMs on the host and produced
    # phantom +30..+465% warm deltas on queries with unchanged code (the
    # clean re-run was fine — BASELINE.md "Round-7 clean bench"). Timings
    # are only comparable on an idle host; r7's guard only RECORDED load
    # (6.2 at start, waits 0) because its threshold was 8.0 — the r7 verdict
    # (#7) asks it to actually WAIT until 1-min load < ~2, with a bounded
    # timeout and a loud note in the record when it gives up.
    load_waits = 0
    load_guard_note = None
    try:
        while os.getloadavg()[0] > 2.0 and load_waits < 60:  # <= 5 min
            time.sleep(5)
            load_waits += 1
        load_at_start = round(os.getloadavg()[0], 1)
        if load_at_start > 2.0:
            load_guard_note = (
                f"HOST NOT IDLE: load {load_at_start} after "
                f"{load_waits * 5}s wait — timings may carry contention noise"
            )
            print(load_guard_note, file=sys.stderr)
    except OSError:  # platform without getloadavg: proceed untimed-guarded
        load_at_start = None

    # Warm the JVM/codegen paths once with a trivial job so the first timed
    # query doesn't pay one-off start-up costs.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Warm the Python/Arrow worker pool too: the first mapInPandas job forks
    # one Python worker per core and each imports pandas/pyarrow (~8-15 s for
    # 32 workers on a contended host — observed charging semdedup_arrow /
    # multimodal_audio instead of the engine). Same rationale as the JVM
    # warm-up: cold numbers should measure the query, not one-off pool spawn.
    import pandas as _pd  # noqa: F401  (driver-side import is instant here)

    def _noop_batches(it):
        for batch in it:
            yield batch

    spark.range(64, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        _noop_batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Host-speed calibration scalar (r9): a fixed-size JVM job timed twice,
    # best-of-2, recorded as "calib" so cross-round bench totals can be
    # normalized for host-side interference — round-9 observed the SAME
    # commit swing 109 -> 174 s cold between idle captures, with per-query
    # blow-ups moving between runs (BASELINE.md round-9 section). A calib
    # far off its ~baseline flags the whole capture as noise-contaminated.
    def _calib() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 3 % 7)", "count(if(id % 11 = 0, 1, NULL))"
        ).collect()
        return time.perf_counter() - t0

    calib = round(min(_calib(), _calib()), 3)

    codegen_errors: dict[str, int] = {}
    n = cgwatch.poll()  # warm-up/calib jobs attribute to a _setup bucket
    if n:
        codegen_errors["_setup"] = n

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # one broken query must not kill the record
            errors[name] = str(ex)[:200]
            n = cgwatch.poll()
            if n:
                codegen_errors[name] = n
            continue
        t1 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t1, 3)
        n = cgwatch.poll()
        if n:
            codegen_errors[name] = n

    total = round(sum(timings.values()), 3)
    # The final stdout line must stay SHORT: the driver's tail capture is
    # ~2 kB, and BOTH r4 and r7 produced "parsed": null records by exceeding
    # it (r4: nested deltas; r7: the folded full-precision warm map pushed
    # the line to ~2.7 kB — r7 verdict #2). The durable contract: cold map at
    # 2dp + totals + a warm-total SCALAR ride the line (<1900 bytes, hard
    # asserted below); the full-precision warm map, deltas, regressions and
    # error detail live in the BENCH_DETAIL.json sidecar, which bench
    # consumers and the next round's _prev_bench() read.
    record = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "sf": float(sf),
        "value_warm": round(sum(warm.values()), 3),
        "calib": calib,
        "cpus": _cpus(),
    }
    detail = dict(record, queries=timings, queries_warm=warm,
                  detail_sidecar=True, load_at_start=load_at_start,
                  load_waits=load_waits)
    if load_guard_note:
        detail["load_guard_note"] = load_guard_note
    if errors:
        record["errors"] = {n: e[:60] for n, e in errors.items()}
        detail["errors"] = errors
    if codegen_errors:
        # Compact on the record line (tail budget); full map in the sidecar.
        record["codegen"] = codegen_errors
        detail["codegen_errors"] = codegen_errors
        print("CODEGEN FAILURES attributed per query: %s" % codegen_errors,
              file=sys.stderr)
    trend = _deltas_vs_prev(timings, warm)
    if trend is not None:
        deltas, regressions = trend
        detail["deltas_vs_prev"] = deltas
        if regressions:
            detail["warm_regressions"] = regressions
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    if trend is not None and regressions:
        print("WARM-LANE REGRESSIONS (> +%.0f%% vs prior round):" % WARM_REGRESSION_PCT,
              file=sys.stderr)
        for line in regressions:
            print("  " + line, file=sys.stderr)
        if os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
            line = json.dumps(record)
            assert len(line) < 1900, f"record line {len(line)}B >= 1900B tail budget"
            print(line)
            sys.exit(1)
    line = json.dumps(record)
    # Hard gate on the driver-tail budget (r7 verdict #2): a line the driver
    # cannot capture whole is worse than a shorter one — fail loudly here.
    assert len(line) < 1900, f"record line {len(line)}B >= 1900B tail budget"
    print(line)


if __name__ == "__main__":
    main()
