"""Process-mining analytics over the normalized event log.

The reference's downstream consumer is pm4py process discovery
(/root/reference/example.ipynb cell-3; app.py:216-217 writes the XES it
parses), so these are the log-statistics queries a reference user runs next:
activity service times (lifecycle start/complete pairing), the
eventually-follows relation, rework detection, start/end activity
distributions, and the organizational (resource-type) workload profile.
Everything is plain DataFrame algebra over the same E1/E2 pipeline the gate
already verifies — one shuffle on the case key per query family, mirrored
1:1 in DuckDB SQL.

Scale posture: every query here keys its shuffle on the case id (or
(case, activity)), the same key the trace-assembly sink uses, so at 100 TB
these share partitioning with the rest of the event-log path; the one
super-linear shape (eventually-follows is quadratic in case length) is
bounded by the trace-length cap documented in operators/traces.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mobsos_event_log_generator_spark.operators import exactmath as XM
from mobsos_event_log_generator_spark.plans.eventlog import EVENTS_FIXTURE_AS_EVENTLOG_SQL
from mobsos_event_log_generator_spark.plans.queries import (
    _normalized_eventlog,
    register,
)
from mobsos_event_log_generator_spark.schema import (
    XES_ACTIVITY,
    XES_CASE,
    XES_LIFECYCLE,
    XES_TIMESTAMP,
)
from mobsos_event_log_generator_spark.sources.parquet import load_table

# Starts-kept pipeline (include_life_cycle_start=True): F1 + F3 + P2 + F6 +
# P1 + P4(COALESCE lifecycle) — the quadrant where 'start' events survive so
# start/complete pairing is observable.
_CTE_STARTS_KEPT = f"""
WITH eventlog AS ({EVENTS_FIXTURE_AS_EVENTLOG_SQL}),
kept AS (
  SELECT
    "CASE_ID" AS "case",
    "ACTIVITY_NAME" AS activity,
    "TIME_STAMP" AS ts,
    COALESCE("LIFECYCLE_PHASE", 'complete') AS lifecycle
  FROM eventlog
  WHERE "CASE_ID" IS NOT NULL
    AND "EVENT_TYPE" <> 'view'
    AND CASE "EVENT_TYPE"
          WHEN 'click' THEN 'USER_MESSAGE'
          WHEN 'view' THEN 'BOT_MESSAGE'
          WHEN 'purchase' THEN 'SERVICE_REQUEST'
          ELSE "EVENT_TYPE" END IN ('SERVICE_REQUEST', 'USER_MESSAGE')
)
"""

# All-event-types pipeline (include_bot_messages=True, default lifecycle
# flags): F1 + F4(3VL null-drop) + F7 — the quadrant with the full 5-activity
# domain, completed events only.
_CTE_ALL_TYPES_COMPLETE = f"""
WITH eventlog AS ({EVENTS_FIXTURE_AS_EVENTLOG_SQL}),
kept AS (
  SELECT
    "CASE_ID" AS "case",
    "ACTIVITY_NAME" AS activity,
    "TIME_STAMP" AS ts,
    "RESOURCE" AS resource,
    "RESOURCE_TYPE" AS resource_type
  FROM eventlog
  WHERE "CASE_ID" IS NOT NULL
    AND "LIFECYCLE_PHASE" IS NOT NULL
    AND "LIFECYCLE_PHASE" <> 'start'
)
"""


def _all_types_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _normalized_eventlog(spark, sf_dir, include_bot_messages=True)
    return df.select(
        F.col(XES_CASE).alias("case"),
        F.col(XES_ACTIVITY).alias("activity"),
        F.col(XES_TIMESTAMP).alias("ts"),
        F.col("RESOURCE").alias("resource"),
        F.col("RESOURCE_TYPE").alias("resource_type"),
    )


@register(
    "eventlog_activity_service_times",
    _CTE_STARTS_KEPT
    + f"""
, numbered AS (
  SELECT "case", activity, ts, lifecycle,
         row_number() OVER (PARTITION BY "case", activity, lifecycle
                            ORDER BY ts) AS k
  FROM kept
),
paired AS (
  SELECT "case", activity, k,
         max(CASE WHEN lifecycle = 'start' THEN ts END) AS start_ts,
         max(CASE WHEN lifecycle = 'complete' THEN ts END) AS complete_ts
  FROM numbered
  GROUP BY 1, 2, 3
)
SELECT activity,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(epoch_us(complete_ts) - epoch_us(start_ts)) AS BIGINT) AS total_service_us,
       {XM.sql_mean_round('sum(epoch_us(complete_ts) - epoch_us(start_ts))', 'count(*)', 4, in_scale=0)} AS avg_service_us
FROM paired
WHERE start_ts IS NOT NULL AND complete_ts IS NOT NULL
  AND complete_ts >= start_ts
GROUP BY 1
""",
)
def eventlog_activity_service_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity service times via FIFO lifecycle pairing: the k-th 'start' of
    an activity within a case pairs with its k-th 'complete' (pm4py's
    interval-log view of start/complete transitions). One window pass keyed
    on (case, activity, lifecycle) assigns k, one groupBy on
    (case, activity, k) aligns the pair — two shuffles on case-derived keys,
    no join, no per-case Python. Pairs missing a side (unmatched start at
    log end) or running backwards (complete logged before any start) are
    dropped; durations are integral µs so sums are exact cross-engine."""
    df = _normalized_eventlog(spark, sf_dir, include_life_cycle_start=True)
    base = df.select(
        F.col(XES_CASE).alias("case"),
        F.col(XES_ACTIVITY).alias("activity"),
        F.col(XES_TIMESTAMP).alias("ts"),
        F.col(XES_LIFECYCLE).alias("lifecycle"),
    )
    w = Window.partitionBy("case", "activity", "lifecycle").orderBy("ts")
    numbered = base.withColumn("k", F.row_number().over(w))
    paired = numbered.groupBy("case", "activity", "k").agg(
        F.max(F.when(F.col("lifecycle") == "start", F.col("ts"))).alias("start_ts"),
        F.max(F.when(F.col("lifecycle") == "complete", F.col("ts"))).alias("complete_ts"),
    )
    dur = F.unix_micros(F.col("complete_ts")) - F.unix_micros(F.col("start_ts"))
    return (
        paired.filter(
            F.col("start_ts").isNotNull()
            & F.col("complete_ts").isNotNull()
            & (F.col("complete_ts") >= F.col("start_ts"))
        )
        .groupBy("activity")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(dur).cast("long").alias("total_service_us"),
            XM.mean_round(F.sum(dur), F.count(F.lit(1)), 4, in_scale=0).alias(
                "avg_service_us"
            ),
        )
    )


@register(
    "eventlog_eventually_follows",
    _CTE_ALL_TYPES_COMPLETE
    + """
, numbered AS (
  SELECT "case", activity,
         row_number() OVER (PARTITION BY "case" ORDER BY ts, activity) AS pos
  FROM kept
)
SELECT a.activity AS src, b.activity AS dst,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT a."case") AS BIGINT) AS n_cases
FROM numbered a JOIN numbered b
  ON a."case" = b."case" AND a.pos < b.pos
GROUP BY 1, 2
""",
)
def eventlog_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eventually-follows relation (pm4py's EFG): for every ordered pair of
    events in a case (not just adjacent ones), count occurrences and
    distinct cases.

    The DEFINITION is quadratic (all i<j pairs — the oracle SQL states it as
    the pos< self-join), but materializing pairs is O(case_length²) rows and
    measurably melts at scale (a ×100 events probe GC-thrashed on ~3×10⁹
    join rows). This implementation is the O(n·|alphabet|) form instead:
    fan each event out by the case's distinct dst activities (≤5× here —
    bounded by the activity alphabet, not case length), then in each
    (case, dst) window partition compute suffix_dst(i) = total_dst −
    running_dst(i), the count of dst events strictly after row i. Summing
    suffixes grouped by (src=activity(i), dst) yields exactly the pair
    counts; a suffix>0 marks the case for n_cases. One ≤|A|× fan-out join
    on the case key + one window shuffle — survives arbitrarily long cases.
    Tie order inside a case is (ts, activity); equal-tuple ties are safe
    because tied identical rows contribute symmetric counts."""
    e = _all_types_complete(spark, sf_dir).select("case", "activity", "ts")
    case_types = e.select("case", F.col("activity").alias("dst")).distinct()
    fanned = e.join(case_types, "case")
    wrun = (
        Window.partitionBy("case", "dst")
        .orderBy("ts", "activity")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("case", "dst")
    is_dst = F.when(F.col("activity") == F.col("dst"), 1).otherwise(0)
    suffixed = fanned.select(
        "case",
        F.col("activity").alias("src"),
        "dst",
        (F.sum(is_dst).over(wall) - F.sum(is_dst).over(wrun)).alias("suffix_dst"),
    )
    return (
        suffixed.groupBy("src", "dst")
        .agg(
            F.sum("suffix_dst").cast("long").alias("n_pairs"),
            F.countDistinct(F.when(F.col("suffix_dst") > 0, F.col("case"))).alias("n_cases"),
        )
        .filter(F.col("n_pairs") > 0)
    )


@register(
    "eventlog_rework_summary",
    _CTE_ALL_TYPES_COMPLETE
    + """
, per_case AS (
  SELECT "case", activity, CAST(count(*) AS BIGINT) AS n_occ
  FROM kept GROUP BY 1, 2
)
SELECT activity,
       CAST(count(*) AS BIGINT) AS n_cases,
       CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rework_cases,
       CAST(max(n_occ) AS BIGINT) AS max_repeats,
       CAST(sum(n_occ) AS BIGINT) AS n_events
FROM per_case
GROUP BY 1
""",
)
def eventlog_rework_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rework detection: per activity, how many cases execute it more than
    once (loops the discovered model must explain). Two-level aggregation —
    (case, activity) counts then an activity rollup — so the second level is
    map-side combined; no window, no join."""
    e = _all_types_complete(spark, sf_dir)
    per_case = e.groupBy("case", "activity").agg(F.count(F.lit(1)).alias("n_occ"))
    return per_case.groupBy("activity").agg(
        F.count(F.lit(1)).alias("n_cases"),
        F.sum(F.when(F.col("n_occ") >= 2, 1).otherwise(0)).cast("long").alias("n_rework_cases"),
        F.max("n_occ").cast("long").alias("max_repeats"),
        F.sum("n_occ").cast("long").alias("n_events"),
    )


@register(
    "eventlog_start_end_matrix",
    _CTE_ALL_TYPES_COMPLETE
    + """
, ranked AS (
  SELECT "case", activity,
         row_number() OVER (PARTITION BY "case" ORDER BY ts, activity) AS rn_first,
         row_number() OVER (PARTITION BY "case" ORDER BY ts DESC, activity DESC) AS rn_last
  FROM kept
),
ends AS (
  SELECT "case",
         max(CASE WHEN rn_first = 1 THEN activity END) AS start_activity,
         max(CASE WHEN rn_last = 1 THEN activity END) AS end_activity
  FROM ranked GROUP BY 1
)
SELECT start_activity, end_activity, CAST(count(*) AS BIGINT) AS n_cases
FROM ends GROUP BY 1, 2
""",
)
def eventlog_start_end_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Start/end activity distribution (pm4py's log start/end statistics —
    the first sanity check on a discovered model's source/sink places).
    Both endpoints come from one shuffle on the case id: two row_numbers
    over opposite orderings of the same partition, then a case-level
    pivot-to-columns aggregation."""
    e = _all_types_complete(spark, sf_dir)
    w_first = Window.partitionBy("case").orderBy(F.col("ts").asc(), F.col("activity").asc())
    w_last = Window.partitionBy("case").orderBy(F.col("ts").desc(), F.col("activity").desc())
    ranked = e.select(
        "case",
        "activity",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    ends = ranked.groupBy("case").agg(
        F.max(F.when(F.col("rn_first") == 1, F.col("activity"))).alias("start_activity"),
        F.max(F.when(F.col("rn_last") == 1, F.col("activity"))).alias("end_activity"),
    )
    return ends.groupBy("start_activity", "end_activity").agg(
        F.count(F.lit(1)).alias("n_cases")
    )


@register(
    "eventlog_org_profile",
    _CTE_ALL_TYPES_COMPLETE
    + """
SELECT resource_type, activity,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT "case") AS BIGINT) AS n_cases,
       CAST(count(DISTINCT resource) AS BIGINT) AS n_resources
FROM kept
GROUP BY 1, 2
""",
)
def eventlog_org_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Organizational profile (pm4py's org-mining entry point): workload per
    (resource_type, activity) with distinct case/resource counts. A single
    groupBy with two distinct aggregates — Spark expands to one
    partial-aggregated shuffle per distinct column, both keyed on the group
    key, which AQE coalesces at scale."""
    e = _all_types_complete(spark, sf_dir)
    return e.groupBy("resource_type", "activity").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("case").alias("n_cases"),
        F.countDistinct("resource").alias("n_resources"),
    )


@register(
    "eventlog_conformance_dfg",
    _CTE_ALL_TYPES_COMPLETE
    + f"""
, trans AS (
  SELECT "case", activity AS src,
         lead(activity) OVER (PARTITION BY "case" ORDER BY ts, activity) AS dst
  FROM kept
),
t AS (SELECT "case", src, dst FROM trans WHERE dst IS NOT NULL),
tot AS (SELECT count(*) AS n_total FROM t),
model AS (
  SELECT src, dst
  FROM t, tot
  GROUP BY src, dst, n_total
  HAVING count(*) * 20 >= n_total
)
SELECT t."case",
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(sum(CASE WHEN m.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_conforming,
       {XM.sql_ratio_round('sum(CASE WHEN m.src IS NOT NULL THEN 1 ELSE 0 END)',
                           'count(*)', 6)} AS fitness
FROM t LEFT JOIN model m ON t.src = m.src AND t.dst = m.dst
GROUP BY 1
""",
)
def eventlog_conformance_dfg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footprint conformance checking: discover the frequent-edge DFG model
    (edges carrying ≥5 % of all transitions — the integer form
    `count·20 ≥ total` keeps the cut exact cross-engine), then score every
    case by the fraction of its directly-follows transitions the model
    explains (token-replay's footprint approximation; pm4py's
    conformance entry point over the same DFG its miners consume). Plan:
    one window pass builds transitions (trace-assembly shuffle key), the
    model is a tiny aggregate broadcast into the scoring join, and fitness
    is a ratio of small exact integers rounded 6 dp."""
    from pyspark.sql.window import Window

    e = _all_types_complete(spark, sf_dir)
    w = Window.partitionBy("case").orderBy("ts", "activity")
    t = (
        e.withColumn("dst", F.lead("activity").over(w))
        .filter(F.col("dst").isNotNull())
        .select("case", F.col("activity").alias("src"), "dst")
    )
    total = t.agg(F.count(F.lit(1)).alias("n_total"))
    model = (
        t.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * 20 >= F.col("n_total"))
        .select("src", "dst", F.lit(True).alias("in_model"))
    )
    scored = t.join(F.broadcast(model), ["src", "dst"], "left")
    conforming = F.sum(F.when(F.col("in_model"), 1).otherwise(0))
    return scored.groupBy("case").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        conforming.cast("long").alias("n_conforming"),
        XM.ratio_round(conforming, F.count(F.lit(1)), 6).alias("fitness"),
    )


@register(
    "eventlog_trigram_paths",
    _CTE_ALL_TYPES_COMPLETE
    + """
, t AS (
  SELECT "case", activity AS a1,
         lead(activity, 1) OVER w AS a2,
         lead(activity, 2) OVER w AS a3
  FROM kept
  WINDOW w AS (PARTITION BY "case" ORDER BY ts, activity)
)
SELECT a1, a2, a3,
       CAST(count(*) AS BIGINT) AS n_paths,
       CAST(count(DISTINCT "case") AS BIGINT) AS n_cases
FROM t
WHERE a3 IS NOT NULL
GROUP BY 1, 2, 3
""",
)
def eventlog_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-step path fragments — the granularity between the DFG
    (2-grams) and full trace variants (whole paths): long enough to expose
    loops and detours, short enough to aggregate across cases. One window
    pass with two leads over the trace-assembly shuffle key; linear in the
    log (every event starts at most one trigram)."""
    e = _all_types_complete(spark, sf_dir)
    w = Window.partitionBy("case").orderBy("ts", "activity")
    t = (
        e.select(
            "case",
            F.col("activity").alias("a1"),
            F.lead("activity", 1).over(w).alias("a2"),
            F.lead("activity", 2).over(w).alias("a3"),
        )
        .filter(F.col("a3").isNotNull())
    )
    return t.groupBy("a1", "a2", "a3").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.countDistinct("case").alias("n_cases"),
    )


# ---------------------------------------------------------------------------
# PageRank over the directly-follows graph (fixed-point integer arithmetic)
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 3
_PR_DAMP = 85


def _pr_iter_cte(k: int) -> str:
    prev = f"it{k - 1}" if k > 1 else "r0"
    return f"""
it{k} AS (
  SELECT v.node,
         ((100 - {_PR_DAMP}) * {_PR_SCALE}) // (100 * (SELECT n FROM nn))
           + ({_PR_DAMP} * COALESCE(s.s, 0)) // 100 AS pagerank_fp
  FROM nodes v LEFT JOIN (
    SELECT e.dst AS node, sum(r.pagerank_fp // o.out_deg) AS s
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst
  ) s ON v.node = s.node
)"""


_SQL_PAGERANK = (
    _CTE_ALL_TYPES_COMPLETE
    + f"""
, pairs AS (
  SELECT activity AS src,
         lead(activity) OVER (PARTITION BY "case" ORDER BY ts, activity) AS dst
  FROM kept
),
edges AS (SELECT DISTINCT src, dst FROM pairs WHERE dst IS NOT NULL),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
),
nn AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY 1),
r0 AS (
  SELECT node, {_PR_SCALE} // (SELECT n FROM nn) AS pagerank_fp FROM nodes
),
{",".join(_pr_iter_cte(k) for k in range(1, _PR_ITERS + 1))}
SELECT node AS activity, CAST(pagerank_fp AS BIGINT) AS pagerank_fp
FROM it{_PR_ITERS}
"""
)


@register("eventlog_pagerank_activities", _SQL_PAGERANK)
def eventlog_pagerank_activities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity centrality: PageRank over the directly-follows graph of the
    full 5-activity pipeline (process-mining hub analysis — which activities
    the control flow concentrates on). Runs the generic distributed
    ``pagerank_fixed_point`` operator: 3 power iterations in fixed-point
    BIGINT arithmetic (scale 10^12), so every intermediate rank is
    bit-identical across engines — integer sums are associative, immune to
    the float-association pitfall that compounds across iterations. The
    oracle unrolls the identical three iterations as CTEs, proving the whole
    trajectory, not just the final ranking. Per iteration one src equi-join
    + one groupBy(dst) — the canonical distributed PageRank shuffle shape;
    the graph here is the activity alphabet (tiny, broadcastable), but the
    operator never assumes that."""
    from mobsos_event_log_generator_spark.operators.graph import pagerank_fixed_point

    e = _all_types_complete(spark, sf_dir)
    w = Window.partitionBy("case").orderBy("ts", "activity")
    edges = (
        e.select(F.col("activity").alias("src"), F.lead("activity").over(w).alias("dst"))
        .filter(F.col("dst").isNotNull())
    )
    ranks = pagerank_fixed_point(
        edges, iterations=_PR_ITERS, scale=_PR_SCALE, damping_pct=_PR_DAMP
    )
    return ranks.select(F.col("node").alias("activity"), "pagerank_fp")


# ---------------------------------------------------------------------------
# Concept drift: week-over-week DFG distribution distance (exact integers)
# ---------------------------------------------------------------------------


@register(
    "eventlog_weekly_drift",
    _CTE_ALL_TYPES_COMPLETE
    + """
, seq AS (
  SELECT date_trunc('week', ts) AS wk, activity AS src,
         lead(activity) OVER (PARTITION BY "case" ORDER BY ts, activity) AS dst
  FROM kept
),
edges AS (
  SELECT wk, src, dst, count(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2, 3
),
totals AS (SELECT wk, sum(n) AS t FROM edges GROUP BY 1),
aligned AS (
  SELECT COALESCE(cur.wk, prev.wk + INTERVAL 7 DAY) AS wk,
         COALESCE(cur.n, 0) AS n_cur, COALESCE(prev.n, 0) AS n_prev
  FROM edges cur
  FULL JOIN edges prev
    ON cur.wk = prev.wk + INTERVAL 7 DAY AND cur.src = prev.src AND cur.dst = prev.dst
  WHERE COALESCE(cur.wk, prev.wk + INTERVAL 7 DAY) IN (SELECT wk FROM totals)
    AND COALESCE(cur.wk, prev.wk + INTERVAL 7 DAY) - INTERVAL 7 DAY IN (SELECT wk FROM totals)
),
drift AS (
  SELECT a.wk,
         sum(abs(a.n_cur * tp.t - a.n_prev * tc.t)) AS l1_num,
         any_value(tc.t * tp.t) AS denom
  FROM aligned a
  JOIN totals tc ON tc.wk = a.wk
  JOIN totals tp ON tp.wk = a.wk - INTERVAL 7 DAY
  GROUP BY a.wk
)
SELECT strftime(wk, '%Y-%m-%d') AS week,
       CAST(l1_num AS BIGINT) AS l1_num,
       CAST(denom AS BIGINT) AS denom,
       CAST((l1_num * 1000000) // denom AS BIGINT) AS drift_ppm
FROM drift
""",
)
def eventlog_weekly_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process concept-drift detector: week-over-week L1 distance between
    directly-follows edge DISTRIBUTIONS (Bose et al., "Handling Concept
    Drift in Process Mining", public). The distance is computed in EXACT
    integer arithmetic — Σ|n_w·T_prev − n_prev·T_w| over the cross-
    multiplied counts, emitted as numerator/denominator plus an integer-
    division ppm — so no float summation ever enters the pipeline and the
    week trajectory is bit-identical across engines. Shuffle shape: one
    window pass per case, one groupBy per (week, edge), then a self-join of
    the TINY per-week edge table (|alphabet|² rows per week) against its
    7-day shift — the fact table is touched once."""
    e = _all_types_complete(spark, sf_dir)
    w = Window.partitionBy("case").orderBy("ts", "activity")
    seq = e.select(
        F.date_trunc("week", F.col("ts")).alias("wk"),
        F.col("activity").alias("src"),
        F.lead("activity").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    edges = seq.groupBy("wk", "src", "dst").agg(F.count(F.lit(1)).alias("n"))
    totals = edges.groupBy("wk").agg(F.sum("n").alias("t"))
    prev = edges.select(
        (F.col("wk") + F.expr("INTERVAL 7 DAY")).alias("wk"),
        "src",
        "dst",
        F.col("n").alias("n_prev"),
    )
    aligned = (
        edges.withColumnRenamed("n", "n_cur")
        .join(prev, ["wk", "src", "dst"], "full")
        .select(
            "wk",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
        )
        .join(F.broadcast(totals.select(F.col("wk"), F.col("t").alias("t_cur"))), "wk")
        .join(
            F.broadcast(
                totals.select(
                    (F.col("wk") + F.expr("INTERVAL 7 DAY")).alias("wk"),
                    F.col("t").alias("t_prev"),
                )
            ),
            "wk",
        )
    )
    drift = aligned.groupBy("wk").agg(
        F.sum(F.abs(F.col("n_cur") * F.col("t_prev") - F.col("n_prev") * F.col("t_cur"))).alias(
            "l1_num"
        ),
        F.first(F.col("t_cur") * F.col("t_prev")).alias("denom"),
    )
    return drift.select(
        F.date_format("wk", "yyyy-MM-dd").alias("week"),
        F.col("l1_num").cast("long").alias("l1_num"),
        F.col("denom").cast("long").alias("denom"),
        F.expr("(l1_num * 1000000L) div denom").cast("long").alias("drift_ppm"),
    )


@register(
    "events_sequence_patterns",
    r"""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s,
         count(*) AS n_events
  FROM events
  GROUP BY user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(s, 'c+p')) AS BIGINT) AS direct_conversions,
       CAST(len(regexp_extract_all(s, 'v[^e]*p')) AS BIGINT) AS clean_view_purchases,
       CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT) AS error_bursts
FROM seq
""",
)
def events_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regex pattern detection over per-case ordered
    event sequences. Each case's trace compresses to a single-char-per-event
    string (the 5 fixture event types have distinct initials), then pattern
    counts are plain `regexp_count` — `c+p` = click-run straight into a
    purchase, `v[^e]*p` = view converted with no intervening error, `ee+` =
    error bursts. Non-overlapping leftmost-greedy counts agree between Java
    regex and DuckDB's RE2 for these alternation-free patterns; the gate
    proves it.

    Scale shape: one groupBy(case) with an in-group array_sort — per-case
    work is bounded by trace length exactly like sessionization/trace
    assembly (SURVEY A2); the regex runs once per CASE, not per event, and
    the pattern library extends without another shuffle (all counts share
    the one sequence column)."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("c")
                            )
                        )
                    ),
                    lambda x: x["c"],
                ),
                "",
            ).alias("s"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return seq.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.regexp_count(F.col("s"), F.lit(r"c+p")).cast("long").alias("direct_conversions"),
        F.regexp_count(F.col("s"), F.lit(r"v[^e]*p")).cast("long").alias("clean_view_purchases"),
        F.regexp_count(F.col("s"), F.lit(r"ee+")).cast("long").alias("error_bursts"),
    )


@register(
    "eventlog_alignment_cost",
    _CTE_ALL_TYPES_COMPLETE
    + """
, alpha AS (
  SELECT activity, chr(64 + CAST(row_number() OVER (ORDER BY activity) AS INTEGER)) AS code
  FROM (SELECT DISTINCT activity FROM kept)
),
seqs AS (
  SELECT k."case",
         string_agg(a.code, '' ORDER BY k.ts, k.activity) AS seq,
         string_agg(k.activity, ',' ORDER BY k.ts, k.activity) AS variant
  FROM kept k JOIN alpha a ON a.activity = k.activity
  GROUP BY 1
),
vars AS (SELECT variant, seq, CAST(count(*) AS BIGINT) AS n_cases FROM seqs GROUP BY 1, 2),
modal AS (SELECT seq AS mseq, variant AS mvariant FROM vars ORDER BY n_cases DESC, variant LIMIT 1)
SELECT v.variant, v.n_cases,
       CAST(levenshtein(v.seq, m.mseq) AS BIGINT) AS alignment_cost,
       v.variant = m.mvariant AS is_modal
FROM vars v CROSS JOIN modal m
""",
)
def eventlog_alignment_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant alignment cost: edit distance from every trace variant to
    the MODAL variant (most-frequent ordered activity sequence; count
    tie-break on the variant string) — the cheap sequence-alignment
    approximation of pm4py's alignment-based conformance, scored at
    ACTIVITY granularity by first recoding each activity to one character
    of a deterministic alphabet (sorted distinct activities → chr(65+i)),
    so levenshtein counts activity edits, not character edits inside
    names. Plan: the alphabet is an alphabet-bounded distinct + window
    (O(|activities|) rows), variants reuse the trace-assembly shuffle,
    the modal row is a 1-row TakeOrdered broadcast, and the edit distance
    runs once per VARIANT (not per case) — variants are the Pareto-small
    side of any real log."""
    e = _all_types_complete(spark, sf_dir)
    acts = e.select("activity").distinct()
    wa = Window.orderBy("activity")
    alpha = acts.withColumn("rn", F.row_number().over(wa)).select(
        "activity", F.expr("char(64 + rn)").alias("code")
    )
    enr = e.join(F.broadcast(alpha), "activity")
    seqs = enr.groupBy(F.col("case")).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ts"), F.col("activity"), F.col("code")))
                ),
                lambda x: x["code"],
            ),
            "",
        ).alias("seq"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("ts"), F.col("activity")))),
                lambda x: x["activity"],
            ),
            ",",
        ).alias("variant"),
    )
    variants = seqs.groupBy("variant", "seq").agg(F.count(F.lit(1)).alias("n_cases"))
    modal = (
        variants.orderBy(F.col("n_cases").desc(), "variant")
        .limit(1)
        .select(F.col("seq").alias("mseq"), F.col("variant").alias("mvariant"))
    )
    return variants.crossJoin(F.broadcast(modal)).select(
        "variant",
        "n_cases",
        F.levenshtein("seq", "mseq").cast("long").alias("alignment_cost"),
        (F.col("variant") == F.col("mvariant")).alias("is_modal"),
    )


@register(
    "eventlog_handover_network",
    _CTE_ALL_TYPES_COMPLETE
    + """
, seq AS (
  SELECT "case", resource AS src_resource,
         lead(resource) OVER (PARTITION BY "case"
                              ORDER BY ts, activity, resource NULLS FIRST)
           AS dst_resource
  FROM kept
),
h AS (
  SELECT "case", src_resource, dst_resource
  FROM seq WHERE dst_resource IS NOT NULL
),
tot AS (SELECT count(*) AS n_total FROM h)
SELECT src_resource, dst_resource,
       CAST(count(*) AS BIGINT) AS n_handovers,
       CAST(count(DISTINCT "case") AS BIGINT) AS n_cases,
       CAST((count(*) * 1000000) // n_total AS BIGINT) AS share_ppm
FROM h, tot
GROUP BY src_resource, dst_resource, n_total
""",
)
def eventlog_handover_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Handover-of-work social network (pm4py's org/sna miner over the XES
    the reference emits, app.py:216-217): within each case ordered by
    timestamp, every consecutive event pair hands work from one resource
    to the next; edges aggregate handover counts, distinct cases, and the
    exact-integer ppm share of all handovers. Same single trace-assembly
    window shuffle as the DFG (keyed on case — co-partitioned with every
    other per-case query at 100 TB); the edge table is bounded by
    |resources|^2, so the share join is a 1-row broadcast total. Ties at
    equal (ts, activity) break on resource so successor pairs are
    engine-deterministic."""
    e = _all_types_complete(spark, sf_dir)
    w = Window.partitionBy("case").orderBy("ts", "activity", "resource")
    h = (
        e.withColumn("dst_resource", F.lead("resource").over(w))
        .filter(F.col("dst_resource").isNotNull())
        .select("case", F.col("resource").alias("src_resource"), "dst_resource")
    )
    tot = h.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        h.groupBy("src_resource", "dst_resource")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_handovers"),
            F.countDistinct("case").cast("long").alias("n_cases"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "src_resource",
            "dst_resource",
            "n_handovers",
            "n_cases",
            F.expr("(n_handovers * 1000000L) div n_total").cast("long").alias("share_ppm"),
        )
    )


@register(
    "eventlog_dependency_graph",
    _CTE_ALL_TYPES_COMPLETE
    + """
, seq AS (
  SELECT "case", activity AS src,
         lead(activity) OVER (PARTITION BY "case" ORDER BY ts, activity) AS dst
  FROM kept
),
d AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
),
pairs AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         CAST(sum(CASE WHEN src < dst THEN n ELSE 0 END) AS BIGINT) AS n_ab,
         CAST(sum(CASE WHEN src > dst THEN n ELSE 0 END) AS BIGINT) AS n_ba
  FROM d WHERE src <> dst GROUP BY 1, 2
),
oriented AS (
  SELECT CASE WHEN n_ab >= n_ba THEN a ELSE b END AS src,
         CASE WHEN n_ab >= n_ba THEN b ELSE a END AS dst,
         greatest(n_ab, n_ba) AS n_forward,
         least(n_ab, n_ba) AS n_reverse
  FROM pairs
)
SELECT src, dst, n_forward, n_reverse,
       CAST(((n_forward - n_reverse) * 1000000)
            // (n_forward + n_reverse + 1) AS BIGINT) AS dep_ppm,
       FALSE AS is_loop
FROM oriented
UNION ALL
SELECT src, dst, n AS n_forward, CAST(0 AS BIGINT) AS n_reverse,
       CAST((n * 1000000) // (n + 1) AS BIGINT) AS dep_ppm,
       TRUE AS is_loop
FROM d WHERE src = dst
""",
)
def eventlog_dependency_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristics-miner dependency graph (Weijters & van der Aalst; pm4py's
    heuristics_miner over the XES the reference emits, app.py:216-217):
    each unordered activity pair {a,b} is oriented in its dominant
    directly-follows direction and scored dep = (f-r)/(f+r+1); length-1
    loops score n/(n+1). Orienting the edge before dividing keeps the
    numerator non-negative, so truncating integer division IS floor
    division and the ppm measure is exact on both engines (ties orient
    lexicographically a->b). Reuses the DFG's single case-keyed window
    shuffle (ts, activity tie-break makes successor pairs deterministic);
    everything after the edge count is algebra over a table bounded by
    |activity alphabet|^2 -- nothing downstream scales with the log."""
    e = _all_types_complete(spark, sf_dir)
    w = Window.partitionBy("case").orderBy("ts", "activity")
    d = (
        e.withColumn("dst", F.lead("activity").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col("activity").alias("src"), "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    loops = d.filter(F.col("src") == F.col("dst")).select(
        "src",
        "dst",
        F.col("n").alias("n_forward"),
        F.lit(0).cast("long").alias("n_reverse"),
        F.expr("(n * 1000000L) div (n + 1)").cast("long").alias("dep_ppm"),
        F.lit(True).alias("is_loop"),
    )
    pairs = (
        d.filter(F.col("src") != F.col("dst"))
        .groupBy(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .agg(
            F.sum(F.when(F.col("src") < F.col("dst"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_ab"),
            F.sum(F.when(F.col("src") > F.col("dst"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_ba"),
        )
    )
    fwd = F.col("n_ab") >= F.col("n_ba")
    oriented = pairs.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.greatest("n_ab", "n_ba").alias("n_forward"),
        F.least("n_ab", "n_ba").alias("n_reverse"),
    ).select(
        "src",
        "dst",
        "n_forward",
        "n_reverse",
        F.expr("((n_forward - n_reverse) * 1000000L) div (n_forward + n_reverse + 1)")
        .cast("long")
        .alias("dep_ppm"),
        F.lit(False).alias("is_loop"),
    )
    return oriented.unionByName(loops)
