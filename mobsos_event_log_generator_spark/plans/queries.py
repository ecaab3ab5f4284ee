"""Named query registry: every SURVEY.md §2 operator as a (Spark, DuckDB-oracle)
pair consumed by ``__spark_entry__``.

Contract (driver): each Spark callable takes ``(spark, sf_dir)`` and returns a
DataFrame; the oracle SQL runs on DuckDB over the same parquet tables
(pre-registered views). Column names and types must match — every computed
column is aliased identically on both sides; timestamps that appear in result
sets are formatted to microsecond strings so engine-internal timestamp
representations can never skew the value hash; floating-point aggregates are
rounded to fixed decimals.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators.traces import trace_stats
from mobsos_event_log_generator_spark.plans.eventlog import (
    EVENTS_FIXTURE_AS_EVENTLOG_SQL,
    EventLogParams,
    FIXTURE_RAW_BOT_CODE,
    FIXTURE_RECODE,
    build_eventlog,
    events_fixture_as_eventlog,
)
from mobsos_event_log_generator_spark.schema import (
    XES_ACTIVITY,
    XES_CASE,
    XES_LIFECYCLE,
    XES_TIMESTAMP,
)
from mobsos_event_log_generator_spark.sources.parquet import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def register(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver records a rows-only check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _fmt_ts(col_name: str) -> F.Column:
    return F.date_format(F.col(col_name), TS_FMT_SPARK)


# --------------------------------------------------------------------------
# Reference pipeline queries (E1/E2 semantics; SURVEY.md §2.2-2.4, §3)
# --------------------------------------------------------------------------

_FIXTURE_PARAMS = dict(recode_map=FIXTURE_RECODE, raw_bot_code=FIXTURE_RAW_BOT_CODE)

# Shared oracle CTEs: adapter + default-flag pipeline (F1,F3,F4,P2,F6,F7,P1).
_ORACLE_EVENTLOG_CTE = f"""
WITH eventlog AS ({EVENTS_FIXTURE_AS_EVENTLOG_SQL}),
normalized AS (
  SELECT
    "CASE_ID" AS "case:concept:name",
    "ACTIVITY_NAME" AS "concept:name",
    "TIME_STAMP" AS "time:timestamp",
    "LIFECYCLE_PHASE" AS "lifecycle:transition",
    CASE "EVENT_TYPE"
      WHEN 'click' THEN 'USER_MESSAGE'
      WHEN 'view' THEN 'BOT_MESSAGE'
      WHEN 'purchase' THEN 'SERVICE_REQUEST'
      ELSE "EVENT_TYPE" END AS "EVENT_TYPE",
    "RESOURCE", "RESOURCE_TYPE", "REMARKS"
  FROM eventlog
  WHERE "CASE_ID" IS NOT NULL
    AND "EVENT_TYPE" <> 'view'
    AND "LIFECYCLE_PHASE" <> 'start'
)
, kept AS (
  SELECT * FROM normalized
  WHERE "EVENT_TYPE" IN ('SERVICE_REQUEST', 'USER_MESSAGE')
    AND "lifecycle:transition" = 'complete'
)
"""


def _normalized_eventlog(spark: SparkSession, sf_dir: str, **overrides) -> DataFrame:
    events = events_fixture_as_eventlog(load_table(spark, sf_dir, "events"))
    params = EventLogParams(**{**_FIXTURE_PARAMS, **overrides})
    return build_eventlog(events, params)


@register(
    "eventlog_normalize",
    _ORACLE_EVENTLOG_CTE
    + f"""
SELECT "case:concept:name", "concept:name",
       strftime("time:timestamp", '{TS_FMT_DUCK}') AS "time:timestamp",
       "lifecycle:transition", "EVENT_TYPE", "RESOURCE", "RESOURCE_TYPE", "REMARKS"
FROM kept
""",
)
def eventlog_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 default-flag pipeline: F1+F3+F4+P2+F6+P1+F7+P3+P4 (SURVEY §3 E1)."""
    df = _normalized_eventlog(spark, sf_dir)
    return df.select(
        F.col(XES_CASE),
        F.col(XES_ACTIVITY),
        _fmt_ts(XES_TIMESTAMP).alias(XES_TIMESTAMP),
        F.col(XES_LIFECYCLE),
        "EVENT_TYPE",
        "RESOURCE",
        "RESOURCE_TYPE",
        "REMARKS",
    )


@register(
    "eventlog_normalize_full",
    f"""
WITH eventlog AS ({EVENTS_FIXTURE_AS_EVENTLOG_SQL})
SELECT
  "CASE_ID" AS "case:concept:name",
  "ACTIVITY_NAME" AS "concept:name",
  strftime("TIME_STAMP", '{TS_FMT_DUCK}') AS "time:timestamp",
  COALESCE("LIFECYCLE_PHASE", 'complete') AS "lifecycle:transition",
  CASE "EVENT_TYPE"
    WHEN 'click' THEN 'USER_MESSAGE'
    WHEN 'view' THEN 'BOT_MESSAGE'
    WHEN 'purchase' THEN 'SERVICE_REQUEST'
    ELSE "EVENT_TYPE" END AS "EVENT_TYPE",
  "RESOURCE", "RESOURCE_TYPE", "REMARKS",
  json_extract_string("REMARKS", '$.k') AS "k"
FROM eventlog
WHERE "CASE_ID" IS NOT NULL
""",
)
def eventlog_normalize_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-flags-on variant: bot messages + lifecycle starts kept, NULL
    lifecycle filled 'complete' (P4), REMARKS key flattened (P5/P6)."""
    df = _normalized_eventlog(
        spark,
        sf_dir,
        include_bot_messages=True,
        include_life_cycle_start=True,
        deserialize_remarks=True,
        remarks_keys=["k"],
    )
    return df.select(
        F.col(XES_CASE),
        F.col(XES_ACTIVITY),
        _fmt_ts(XES_TIMESTAMP).alias(XES_TIMESTAMP),
        F.col(XES_LIFECYCLE),
        "EVENT_TYPE",
        "RESOURCE",
        "RESOURCE_TYPE",
        "REMARKS",
        "k",
    )


@register(
    "eventlog_resource_window",
    _ORACLE_EVENTLOG_CTE
    + f"""
SELECT "case:concept:name", "concept:name",
       strftime("time:timestamp", '{TS_FMT_DUCK}') AS "time:timestamp",
       "lifecycle:transition", "EVENT_TYPE", "RESOURCE", "RESOURCE_TYPE", "REMARKS"
FROM kept
WHERE "RESOURCE" IN ('1', '3', '5', '7')
  AND "time:timestamp" >= TIMESTAMP '2024-01-05 00:00:00'
  AND "time:timestamp" <= TIMESTAMP '2024-01-15 00:00:00'
""",
)
def eventlog_resource_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 semantics (POST /resources): IN-list resources + closed ts range
    (F2+F5; app.py:102-127)."""
    df = _normalized_eventlog(
        spark,
        sf_dir,
        resource_ids=["1", "3", "5", "7"],
        start_date=datetime(2024, 1, 5),
        end_date=datetime(2024, 1, 15),
    )
    return df.select(
        F.col(XES_CASE),
        F.col(XES_ACTIVITY),
        _fmt_ts(XES_TIMESTAMP).alias(XES_TIMESTAMP),
        F.col(XES_LIFECYCLE),
        "EVENT_TYPE",
        "RESOURCE",
        "RESOURCE_TYPE",
        "REMARKS",
    )


@register(
    "eventlog_traces",
    _ORACLE_EVENTLOG_CTE
    + f"""
SELECT "case:concept:name" AS "case",
       CAST(count(*) AS BIGINT) AS num_events,
       strftime(min("time:timestamp"), '{TS_FMT_DUCK}') AS trace_start,
       strftime(max("time:timestamp"), '{TS_FMT_DUCK}') AS trace_end,
       epoch_us(max("time:timestamp")) - epoch_us(min("time:timestamp")) AS duration_us,
       string_agg("concept:name", ',' ORDER BY "time:timestamp", "concept:name") AS activity_path
FROM kept
GROUP BY 1
""",
)
def eventlog_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — group-into-traces with per-trace timestamp ordering (the pm4py
    write_xes grouping, app.py:216-217), as one shuffle on the case key."""
    df = _normalized_eventlog(spark, sf_dir)
    out = trace_stats(df)
    return out.select(
        "case",
        "num_events",
        _fmt_ts("trace_start").alias("trace_start"),
        _fmt_ts("trace_end").alias("trace_end"),
        "duration_us",
        "activity_path",
    )


@register(
    "eventlog_directly_follows",
    _ORACLE_EVENTLOG_CTE
    + """
SELECT src, dst, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(gap_us) AS BIGINT) AS total_gap_us
FROM (
  SELECT "concept:name" AS src,
         lead("concept:name") OVER w AS dst,
         epoch_us(lead("time:timestamp") OVER w) - epoch_us("time:timestamp") AS gap_us
  FROM kept
  WINDOW w AS (PARTITION BY "case:concept:name"
               ORDER BY "time:timestamp", "concept:name")
)
WHERE dst IS NOT NULL
GROUP BY 1, 2
""",
)
def eventlog_directly_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Performance-annotated directly-follows graph over the normalized log —
    THE process-mining primitive the reference's downstream consumes
    (pm4py's inductive miner discovers the Petri net from exactly these
    case-ordered successor pairs, example.ipynb cell-3), with the summed
    inter-event gap per edge (mean latency = total_gap_us / n_edges). One
    window pass per case (the same shuffle key as trace assembly) then a
    global edge count; ties at equal timestamps break on activity name so
    successor pairs are engine-deterministic, and gaps are integral
    microseconds so the sums are exact."""
    from pyspark.sql.window import Window

    df = _normalized_eventlog(spark, sf_dir)
    w = Window.partitionBy(XES_CASE).orderBy(F.col(XES_TIMESTAMP), F.col(XES_ACTIVITY))
    return (
        df.withColumn("dst", F.lead(F.col(XES_ACTIVITY)).over(w))
        .withColumn(
            "gap_us",
            F.unix_micros(F.lead(F.col(XES_TIMESTAMP)).over(w)) - F.unix_micros(F.col(XES_TIMESTAMP)),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col(XES_ACTIVITY).alias("src"), "dst")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("gap_us").cast("long").alias("total_gap_us"),
        )
    )


@register(
    "eventlog_trace_variants",
    _ORACLE_EVENTLOG_CTE
    + """
SELECT variant, CAST(count(*) AS BIGINT) AS n_cases
FROM (
  SELECT string_agg("concept:name", ',' ORDER BY "time:timestamp", "concept:name") AS variant
  FROM kept
  GROUP BY "case:concept:name"
)
GROUP BY 1
""",
)
def eventlog_trace_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trace-variant analysis (pm4py's variants view): cases sharing the
    same ordered activity sequence collapse into one variant with its case
    count — the Pareto view process analysts read first. Reuses the trace
    assembly shuffle; the variant string is the deterministic activity_path
    already gated byte-exact in eventlog_traces."""
    df = _normalized_eventlog(spark, sf_dir)
    return (
        trace_stats(df)
        .groupBy(F.col("activity_path").alias("variant"))
        .agg(F.count(F.lit(1)).alias("n_cases"))
    )


@register(
    "eventlog_minmax",
    _ORACLE_EVENTLOG_CTE
    + f"""
SELECT strftime(min("time:timestamp"), '{TS_FMT_DUCK}') AS min_ts,
       strftime(max("time:timestamp"), '{TS_FMT_DUCK}') AS max_ts,
       CAST(count(*) AS BIGINT) AS num_events
FROM kept
""",
)
def eventlog_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — global min/max timestamp + count (event_reader.py:26-29)."""
    df = _normalized_eventlog(spark, sf_dir)
    return df.agg(
        F.date_format(F.min(XES_TIMESTAMP), TS_FMT_SPARK).alias("min_ts"),
        F.date_format(F.max(XES_TIMESTAMP), TS_FMT_SPARK).alias("max_ts"),
        F.count(F.lit(1)).alias("num_events"),
    )


@register(
    "event_type_recode_counts",
    f"""
WITH eventlog AS ({EVENTS_FIXTURE_AS_EVENTLOG_SQL})
SELECT CASE "EVENT_TYPE"
         WHEN 'click' THEN 'USER_MESSAGE'
         WHEN 'view' THEN 'BOT_MESSAGE'
         WHEN 'purchase' THEN 'SERVICE_REQUEST'
         ELSE "EVENT_TYPE" END AS event_type,
       CAST(count(*) AS BIGINT) AS n
FROM eventlog
WHERE "CASE_ID" IS NOT NULL
GROUP BY 1
""",
)
def event_type_recode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 recode distribution (all types kept) — isolates the recode operator."""
    df = _normalized_eventlog(spark, sf_dir, include_bot_messages=True, include_life_cycle_start=True)
    return df.groupBy(F.col("EVENT_TYPE").alias("event_type")).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# XES sink (S5) — the serialized trace XML itself, oracle-checked
# --------------------------------------------------------------------------


@register(
    "xes_trace_xml",
    _ORACLE_EVENTLOG_CTE
    + """
SELECT "case:concept:name" AS "case",
       chr(9) || '<trace>' || chr(10)
       || chr(9) || chr(9) || '<string key="concept:name" value="' || "case:concept:name" || '"/>' || chr(10)
       || string_agg(
            chr(9) || chr(9) || '<event>' || chr(10)
            || chr(9) || chr(9) || chr(9) || '<string key="concept:name" value="' || "concept:name" || '"/>' || chr(10)
            || chr(9) || chr(9) || chr(9) || '<date key="time:timestamp" value="' || strftime("time:timestamp", '%Y-%m-%dT%H:%M:%S.%f') || 'Z"/>' || chr(10)
            || chr(9) || chr(9) || chr(9) || '<string key="lifecycle:transition" value="' || "lifecycle:transition" || '"/>' || chr(10)
            || chr(9) || chr(9) || chr(9) || '<string key="EVENT_TYPE" value="' || "EVENT_TYPE" || '"/>' || chr(10)
            || chr(9) || chr(9) || '</event>' || chr(10),
            '' ORDER BY "time:timestamp", "concept:name", "lifecycle:transition", "EVENT_TYPE")
       || chr(9) || '</trace>' || chr(10) AS xml
FROM kept
GROUP BY 1
""",
)
def xes_trace_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 — per-trace XES XML, built entirely JVM-side (sinks/xes.py). The
    oracle reconstructs the exact same template in SQL, proving the
    serializer's grouping, ordering, and formatting byte-for-byte."""
    from mobsos_event_log_generator_spark.sinks.xes import traces_to_xml

    df = _normalized_eventlog(spark, sf_dir).select(
        XES_CASE, XES_ACTIVITY, XES_TIMESTAMP, XES_LIFECYCLE, "EVENT_TYPE"
    )
    return traces_to_xml(df, event_attrs=[XES_LIFECYCLE, "EVENT_TYPE"])


# Register the extended operator families (import side effect populates the
# registry; placed at module end to avoid circular imports). Streaming
# registers LAST on purpose: the driver's correctness pass walks the
# registry in registration order under a wall-clock budget, and the
# streaming entries are the slowest (real micro-batch execution) with the
# weakest check (two are rows-only) — if anything gets cut, cut those.
from mobsos_event_log_generator_spark.plans import analytics  # noqa: E402,F401
from mobsos_event_log_generator_spark.plans import llm  # noqa: E402,F401
from mobsos_event_log_generator_spark.plans import temporal  # noqa: E402,F401
from mobsos_event_log_generator_spark.plans import procmining  # noqa: E402,F401  isort:skip
from mobsos_event_log_generator_spark.plans import streaming_queries  # noqa: E402,F401  isort:skip
from mobsos_event_log_generator_spark.plans import sketches  # noqa: E402,F401  isort:skip


@register(
    "eventlog_keep_starts_no_bots",
    _ORACLE_EVENTLOG_CTE.replace(
        """    AND "LIFECYCLE_PHASE" <> 'start'
""",
        "",
    ).replace(
        """    AND "lifecycle:transition" = 'complete'
""",
        "",
    )
    + f"""
SELECT "case:concept:name", "concept:name",
       strftime("time:timestamp", '{TS_FMT_DUCK}') AS "time:timestamp",
       COALESCE("lifecycle:transition", 'complete') AS "lifecycle:transition",
       "EVENT_TYPE", "RESOURCE", "RESOURCE_TYPE", "REMARKS"
FROM kept
""",
)
def eventlog_keep_starts_no_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining flag quadrant in the gate: lifecycle starts KEPT (F4/F7
    off, NULLs filled 'complete' by P4) while bot messages stay excluded
    (F3+F6 on)."""
    df = _normalized_eventlog(spark, sf_dir, include_life_cycle_start=True)
    return df.select(
        F.col(XES_CASE),
        F.col(XES_ACTIVITY),
        _fmt_ts(XES_TIMESTAMP).alias(XES_TIMESTAMP),
        F.col(XES_LIFECYCLE),
        "EVENT_TYPE",
        "RESOURCE",
        "RESOURCE_TYPE",
        "REMARKS",
    )


@register(
    "xes_roundtrip_source",
    _ORACLE_EVENTLOG_CTE
    + """
SELECT "case:concept:name" AS trace,
       CAST(count(*) AS BIGINT) AS n_events,
       min(strftime("time:timestamp", '%Y-%m-%dT%H:%M:%S.%f') || 'Z') AS first_ts,
       max(strftime("time:timestamp", '%Y-%m-%dT%H:%M:%S.%f') || 'Z') AS last_ts
FROM kept
GROUP BY 1
""",
)
def xes_roundtrip_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 write + first-class read-back: the normalized log goes out through
    the sharded XES sink (8 complete XES shards), comes back in through the
    Python Data Source API (`spark.read.format("xes")`, one input partition
    per shard), and is re-aggregated per trace. The oracle computes the same
    per-trace stats straight from the pipeline, so the gate proves the full
    serialize→parse cycle loses nothing. ISO-8601 'Z' timestamps are
    fixed-width, so string min/max is chronological min/max."""
    from mobsos_event_log_generator_spark.sinks.xes import write_xes
    from mobsos_event_log_generator_spark.sources.xes_source import register_xes_source
    from mobsos_event_log_generator_spark.workdirs import scratch_dir

    df = _normalized_eventlog(spark, sf_dir).select(XES_CASE, XES_ACTIVITY, XES_TIMESTAMP, XES_LIFECYCLE)
    out = scratch_dir("xes_rt_")
    write_xes(df, out, single_file=False, num_shards=8)
    register_xes_source(spark)
    back = spark.read.format("xes").load(out)
    return back.groupBy("trace").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
