"""Temporal join queries: as-of and banded range joins over the events table,
oracle-checked against window/range SQL formulations in DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators import exactmath as XM
from mobsos_event_log_generator_spark.operators.asof import asof_join, banded_range_join
from mobsos_event_log_generator_spark.plans.queries import TS_FMT_DUCK, TS_FMT_SPARK, register
from mobsos_event_log_generator_spark.sources.parquet import load_table


@register(
    "asof_last_click_before_purchase",
    f"""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
  FROM events WHERE event_type IN ('purchase', 'click')
),
swept AS (
  SELECT user_id, ts, event_id, side,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
           OVER w AS ref_ts,
         last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
           OVER w AS ref_event_id
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS ts,
       ref_event_id,
       strftime(ref_ts, '{TS_FMT_DUCK}') AS ref_ts,
       epoch_us(ts) - epoch_us(ref_ts) AS lag_us
FROM swept WHERE side = 1
""",
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the user's latest click at-or-before it
    (union + ordered-window sweep — one shuffle, no per-key cross product)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = asof_join(
        purchases, clicks, key_col="user_id", ts_col="ts", tie_col="event_id", ref_payload=["event_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        "ref_event_id",
        F.date_format("ref_ts", TS_FMT_SPARK).alias("ref_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ref_ts"))).alias("lag_us"),
    )


@register(
    "range_join_events_near_errors",
    f"""
SELECT e.event_id,
       CAST(count(n.event_id) AS BIGINT) AS n_neighbors
FROM events e
LEFT JOIN events n
  ON n.user_id = e.user_id
 AND n.event_id <> e.event_id
 AND abs(epoch_us(n.ts) - epoch_us(e.ts)) <= 300000000
WHERE e.event_type = 'error'
GROUP BY e.event_id
""",
)
def range_join_events_near_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: per error event, how many same-user events fall
    within ±5 minutes — time-bucketed equi-join (3x fan-out) instead of a
    per-user cross product."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    others = ev.select("event_id", "user_id", "ts")
    pairs = banded_range_join(errors, others, key_col="user_id", ts_col="ts", band_seconds=300)
    pairs = pairs.filter(F.col("r_event_id") != F.col("event_id"))
    return (
        errors.join(
            pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n")), "event_id", "left"
        )
        .select("event_id", F.coalesce("n", F.lit(0)).cast("long").alias("n_neighbors"))
    )


@register(
    "events_ohlc_resample",
    f"""
SELECT strftime(time_bucket(INTERVAL 6 HOUR, ts), '{TS_FMT_DUCK}') AS bucket_start,
       event_type,
       arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                      || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                      || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
       CAST(count(*) AS BIGINT) AS n,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('value')})", 6)} AS vsum
FROM events
GROUP BY 1, 2
""",
)
def events_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to 6-hour bars per event type: open/close by
    a total-order min_by/max_by (no window function, no per-bucket sort —
    one hash aggregation, map-side combined), high/low/count/sum alongside.
    DuckDB's arg_min/arg_max over the same padded ordering key reproduces
    first/last exactly."""
    from mobsos_event_log_generator_spark.operators.resample import resample_ohlc
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    bars = resample_ohlc(ev, bucket="6 hours")
    return bars.select(
        F.date_format("bucket_start", TS_FMT_SPARK).alias("bucket_start"),
        "event_type",
        "open",
        "high",
        "low",
        "close",
        "n",
        "vsum",
    )


@register(
    "events_funnel_stages",
    """
WITH c AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'click' GROUP BY 1
),
v AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t1
  WHERE e.event_type = 'view' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT 'click' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM c
UNION ALL SELECT 'view', CAST(count(*) AS BIGINT) FROM v
UNION ALL SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p
""",
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (click → view → purchase): stage N counts
    users whose earliest stage-N event strictly follows their earliest
    qualifying stage-(N-1) event. Each stage is one filtered aggregate
    joined forward — per-user state never leaves the executors, and every
    join key is user_id so the stages co-partition under one shuffle."""
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(F.min("ts").alias("t1"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        c.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("click").alias("stage"), "n_users"),
        v.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view").alias("stage"), "n_users"),
        p.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("purchase").alias("stage"), "n_users"),
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.unionByName(df)
    return out


@register(
    "asof_next_purchase_after_click",
    f"""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS probe
  FROM events WHERE event_type IN ('purchase', 'click')
),
swept AS (
  SELECT user_id, ts, event_id, probe,
         first_value(CASE WHEN probe = 0 THEN ts END IGNORE NULLS)
           OVER w AS ref_ts,
         first_value(CASE WHEN probe = 0 THEN event_id END IGNORE NULLS)
           OVER w AS ref_event_id
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, probe DESC, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS ts,
       ref_event_id,
       strftime(ref_ts, '{TS_FMT_DUCK}') AS ref_ts,
       epoch_us(ref_ts) - epoch_us(ts) AS lead_us
FROM swept WHERE probe = 1
""",
)
def asof_next_purchase_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every click, the user's earliest purchase
    at-or-after it — the mirrored union + ordered-window sweep (one shuffle,
    no per-key cross product; pandas' merge_asof(direction='forward'))."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = asof_join(
        clicks,
        purchases,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        ref_payload=["event_id"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        "ref_event_id",
        F.date_format("ref_ts", TS_FMT_SPARK).alias("ref_ts"),
        (F.unix_micros(F.col("ref_ts")) - F.unix_micros(F.col("ts"))).alias("lead_us"),
    )


@register(
    "events_peak_concurrency",
    """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM gaps
),
sessions AS (
  SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
  FROM sess GROUP BY 1, 2
),
points AS (
  SELECT s AS ts, 1 AS delta, user_id, session_id FROM sessions
  UNION ALL
  SELECT e AS ts, -1 AS delta, user_id, session_id FROM sessions
),
swept AS (
  SELECT ts, sum(delta) OVER (ORDER BY ts, -delta, user_id, session_id
                              ROWS UNBOUNDED PRECEDING) AS concurrent
  FROM points
)
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(max(concurrent) AS BIGINT) AS peak_concurrent
FROM swept
GROUP BY 1
""",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent user sessions per day: gap-sessionize (30-min
    inactivity), then a distributed sweep-line over session [start, end]
    intervals (operators/sweep.py) — two-phase prefix sum, never a
    single-partition global sort. Touching sessions count as overlapping."""
    from pyspark.sql.window import Window

    from mobsos_event_log_generator_spark.operators.sweep import interval_concurrency

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("is_new_session", is_new).withColumn(
        "session_id",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    sessions = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    swept = interval_concurrency(sessions, "s", "e", tie_cols=["user_id", "session_id"])
    return swept.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.max("concurrent").cast("long").alias("peak_concurrent")
    )


@register(
    "events_rolling_active_users",
    """
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM ud)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
""",
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users (WAU) per event day. Sliding DISTINCT
    windows have no window-function form in either engine; the scale shape is
    a bounded fan-out: each distinct (user, day) pair replicates to the <=7
    future days it supports (narrow rows, 7x), then one count-distinct per
    day — instead of a days x activity range join whose skew grows with the
    calendar."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    fanned = ud.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("target_day"),
        "user_id",
    )
    return (
        fanned.join(days.withColumnRenamed("day", "target_day"), "target_day", "left_semi")
        .groupBy(F.date_format("target_day", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@register(
    "events_cohort_retention",
    """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1
),
activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(a.day - f.cohort AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM activity a JOIN first f USING (user_id)
GROUP BY 1, 2
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted on
    each later active day as an offset from their cohort day — the classic
    retention triangle. Two aggregations over one scan; the join key is
    user_id so first-seen and activity co-partition."""
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_gapfill_interpolate",
    f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(CAST((2 * sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                    + 100 * count(value))
                   // (200 * count(value)) AS BIGINT) AS DOUBLE) / 10000 AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
),
grid AS (
  SELECT t.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM (SELECT DISTINCT event_type FROM events) t, bounds b
),
j AS (
  SELECT g.event_type, g.bucket, h.n_events, h.v
  FROM grid g LEFT JOIN hourly h USING (event_type, bucket)
),
f AS (
  SELECT *,
         last_value(v IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS prev_b,
         first_value(v IGNORE NULLS) OVER wn AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wn AS next_b
  FROM j
  WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       strftime(bucket, '{TS_FMT_DUCK}') AS bucket,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       CASE WHEN v IS NOT NULL THEN v
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
              floor((prev_v + (next_v - prev_v)
                     * (CAST(epoch_us(bucket) - epoch_us(prev_b) AS DOUBLE)
                        / CAST(epoch_us(next_b) - epoch_us(prev_b) AS DOUBLE)))
                    * 10000 + 0.5) / 10000
            WHEN prev_v IS NOT NULL THEN prev_v
            ELSE next_v END AS value_filled,
       (v IS NULL) AS is_gap
FROM f
""",
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB-style time_bucket_gapfill + interpolate: densify the
    hourly per-event-type series over the observed range (≈6 % of cells are
    empty at this SF) and fill each gap by linear interpolation between its
    bracketing observed buckets (forward/backward fill at the edges). The
    grid is a broadcast cross of the tiny type dim × generated hour sequence;
    fills come from two frame-bounded IGNORE NULLS window passes over the
    SAME (event_type, bucket) sort — one shuffle total, no self-join, no
    driver loop. Endpoints are pre-rounded 4 dp so both engines interpolate
    from identical doubles; gap fractions are ratios of exact integral µs."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    # Exact 4-dp per-bucket mean: quantize each value to integer micro-units
    # via a DECIMAL(18,6) cast (deterministic per row on both engines), then
    # half-up integer division — round(avg(double), 4) drifted one ulp
    # between Spark's partial-merge sum order and DuckDB's sequential sum at
    # sf0.1, flipping the 4-dp digit exactly at a .00005 midpoint.
    micro = (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micro).alias("__a"),
            F.count("value").alias("__nv"),
        )
        .withColumn(
            "v",
            (F.expr("(2 * __a + 100 * __nv) div (200 * __nv)")).cast("double") / 10_000,
        )
        .drop("__a", "__nv")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
        )
    )
    j = grid.join(hourly, ["event_type", "bucket"], "left")
    wp = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    f = (
        j.withColumn("prev_v", F.last("v", ignorenulls=True).over(wp))
        .withColumn("prev_b", F.last(obs_bucket, ignorenulls=True).over(wp))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(wn))
        .withColumn("next_b", F.first(obs_bucket, ignorenulls=True).over(wn))
    )
    frac = (
        (F.unix_micros("bucket") - F.unix_micros("prev_b")).cast("double")
        / (F.unix_micros("next_b") - F.unix_micros("prev_b")).cast("double")
    )
    return f.select(
        "event_type",
        F.date_format("bucket", TS_FMT_SPARK).alias("bucket"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            # floor(x·1e4 + 0.5)/1e4 instead of round(x, 4): Spark rounds via
            # decimal HALF_UP, DuckDB via fp multiply — they disagree at
            # decimal midpoints; this form is the same IEEE ops in both.
            F.floor((F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac) * 10000 + 0.5)
            .cast("double")
            / 10000.0,
        )
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.col("next_v"))
        .alias("value_filled"),
        F.col("v").isNull().alias("is_gap"),
    )


@register(
    "events_trailing_window_stats",
    f"""
SELECT event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS ts,
       CAST(count(*) OVER w AS BIGINT) AS n_in_window,
       {XM.sql_mean_round('sum(' + XM.sql_int_units('value', 2) + ') OVER w', 'count(*) OVER w', 4, in_scale=2)} AS avg_value_30m
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
""",
)
def events_trailing_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: for every purchase, the count and mean
    value of the same user's purchases in the trailing 30 minutes — the
    event-time sliding aggregate expressed as a native range frame (ordered
    by integral epoch-µs, frame = [-30 min, now]) instead of a self-join.
    One shuffle on user_id; range frames are tie-safe by construction
    (equal order keys always share a frame, so no tie-break is needed)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-1_800_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
        # Exact integer-unit windowed mean (operators/exactmath.py): one
        # trailing frame per purchase row is the densest dice-roll surface
        # in the registry for the fixed-precision-mean midpoint bug.
        XM.mean_round(
            F.sum(XM.int_units_long(F.col("value"), 2)).over(w),
            F.count(F.lit(1)).over(w),
            4,
            in_scale=2,
        ).alias("avg_value_30m"),
    )


@register(
    "events_session_window_batch",
    f"""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
i AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id,
       strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '{TS_FMT_DUCK}') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM i
GROUP BY user_id, sid
""",
)
def events_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` in BATCH mode (the same operator the
    streaming path uses, without watermarks): Spark merges events closer
    than the 30-min gap into one growing window ending at last_event+gap.
    The oracle derives identical sessions from first principles — gap-break
    islands via two window passes — proving the built-in operator against
    the definition. Equal-timestamp ties are gap-0 and always co-session,
    so ts-only ordering is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", TS_FMT_SPARK).alias("session_start"),
            F.date_format("w.end", TS_FMT_SPARK).alias("session_end"),
            "n_events",
        )
    )


@register(
    "asof_tolerance_attribution",
    f"""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
  FROM events WHERE event_type IN ('purchase', 'click')
),
swept AS (
  SELECT user_id, ts, event_id, side,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
           OVER w AS ref_ts,
         last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
           OVER w AS ref_event_id
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS ts,
       CASE WHEN abs(epoch_us(ts) - epoch_us(ref_ts)) <= 600000000
            THEN ref_event_id END AS ref_event_id,
       CASE WHEN abs(epoch_us(ts) - epoch_us(ref_ts)) <= 600000000
            THEN strftime(ref_ts, '{TS_FMT_DUCK}') END AS ref_ts
FROM swept WHERE side = 1
""",
)
def asof_tolerance_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas ``merge_asof(tolerance=)``
    parity): the user's last click at-or-before each purchase counts only
    within 10 minutes — stale references null out. Same single-shuffle
    union + window sweep; the tolerance is a free post-sweep projection."""
    from mobsos_event_log_generator_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = asof_join(
        purchases, clicks, key_col="user_id", ts_col="ts", tie_col="event_id",
        ref_payload=["event_id"], tolerance_seconds=600,
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        "ref_event_id",
        F.date_format("ref_ts", TS_FMT_SPARK).alias("ref_ts"),
    )


@register(
    "events_scd2_user_state",
    f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, state,
       strftime(valid_from, '{TS_FMT_DUCK}') AS valid_from,
       strftime(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id),
                '{TS_FMT_DUCK}') AS valid_to
FROM changes
""",
)
def events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (SCD type 2) build from a change stream:
    collapse each user's event sequence into validity intervals of their
    latest event type — new row only when the state CHANGES, valid_to =
    next change (NULL = current). The standard warehouse dimension-build:
    two windows on the same (user) shuffle key, no join; downstream
    point-in-time lookups become the as-of join this engine already
    ships."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", F.col("event_type").alias("state"), F.col("ts").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.date_format("valid_from", TS_FMT_SPARK).alias("valid_from"),
        F.date_format(F.lead("valid_from").over(w2), TS_FMT_SPARK).alias("valid_to"),
    )


@register(
    "scd2_point_in_time_join",
    f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WHERE event_type <> 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
dim AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{{TS_FMT_DUCK}}') AS ts,
       d.state AS state_at_purchase,
       round(p.value, 2) AS value
FROM events p
LEFT JOIN dim d
  ON d.user_id = p.user_id
 AND d.valid_from <= p.ts
 AND (d.valid_to IS NULL OR p.ts < d.valid_to)
WHERE p.event_type = 'purchase'
""".replace("{{", "{").replace("}}", "}").format(TS_FMT_DUCK=TS_FMT_DUCK),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against an SCD type-2 dimension: every purchase
    is enriched with the state interval valid AT its timestamp. The oracle
    does the textbook interval join (valid_from <= ts < valid_to); the plan
    exploits that SCD2 intervals PARTITION the per-key timeline, so
    "containing interval" = "latest valid_from <= ts" — a single-shuffle
    backward as-of sweep (operators/asof.py), never an inequality join.
    Purchases before a user's first state row keep NULL (LEFT semantics)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") != "purchase")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        probes,
        dim,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        ref_payload=["state"],
        direction="backward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        F.col("ref_state").alias("state_at_purchase"),
        F.round("value", 2).alias("value"),
    )


@register(
    "asof_nearest_error_context",
    f"""
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
c AS (SELECT event_id AS ref_event_id, user_id, ts AS ref_ts, value FROM events WHERE event_type = 'click'),
ranked AS (
  SELECT e.event_id, e.user_id, e.ts, c.ref_event_id, c.ref_ts, c.value,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY abs(epoch_us(c.ref_ts) - epoch_us(e.ts)),
                    CASE WHEN c.ref_ts <= e.ts THEN 0 ELSE 1 END,
                    c.ref_event_id
         ) AS rn
  FROM e LEFT JOIN c ON c.user_id = e.user_id
)
SELECT event_id, user_id,
       strftime(ts, '{{F}}') AS ts,
       ref_event_id,
       strftime(ref_ts, '{{F}}') AS ref_ts,
       round(value, 2) AS ref_value
FROM ranked WHERE rn = 1
""".replace("{F}", TS_FMT_DUCK),
)
def asof_nearest_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof(direction='nearest'): every error event paired with the
    user's temporally CLOSEST click, before or after — backward + forward
    single-shuffle sweeps composed, equal-distance ties to the earlier
    reference then the smaller id (pandas' preference, replayed by the
    oracle's explicit ordering). The naive form is the |Δt|-ranked full
    join the oracle runs — quadratic per user; the sweeps stay linear."""
    from mobsos_event_log_generator_spark.operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    out = asof_join_nearest(
        errors, clicks, key_col="user_id", ts_col="ts", tie_col="event_id",
        ref_payload=["event_id", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        F.col("ref_event_id"),
        F.date_format("ref_ts", TS_FMT_SPARK).alias("ref_ts"),
        F.round("ref_value", 2).alias("ref_value"),
    )


@register(
    "events_multitouch_attribution",
    """
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT c.conv_id, e.event_id AS touch_id, e.event_type, e.ts
  FROM conv c JOIN events e
    ON e.user_id = c.user_id
   AND e.event_type IN ('click', 'view')
   AND e.ts < c.conv_ts
   AND e.ts >= c.conv_ts - INTERVAL 3600 SECONDS
),
ranked AS (
  SELECT conv_id, touch_id, event_type,
         row_number() OVER (PARTITION BY conv_id ORDER BY ts, touch_id) AS rk,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM touch
),
credits AS (
  SELECT 'first_touch' AS model, event_type,
         CASE WHEN rk = 1 THEN 1000000 ELSE 0 END AS credit
  FROM ranked
  UNION ALL
  SELECT 'last_touch', event_type,
         CASE WHEN rk = n THEN 1000000 ELSE 0 END
  FROM ranked
  UNION ALL
  SELECT 'linear', event_type,
         1000000 // n + CASE WHEN rk = n THEN 1000000 - n * (1000000 // n) ELSE 0 END
  FROM ranked
)
SELECT model, event_type,
       CAST(sum(credit) AS BIGINT) AS credit_micro,
       CAST(count(*) FILTER (WHERE credit > 0) AS BIGINT) AS n_credited
FROM credits
GROUP BY 1, 2
""",
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution (the ad-tech model family):
    every purchase credits the clicks/views of the SAME user in the hour
    before it under three models — first-touch (100% to the earliest),
    last-touch (100% to the latest), linear (1/n split). Credit is exact
    integer micro: linear gives each touch 1e6 div n and parks the
    division remainder on the LAST touch, so per-conversion credit sums
    to exactly 1e6 under every model and the corpus totals reconcile to
    n_conversions * 1e6 — auditable conservation no float split gives.
    The conversion x touch pairing runs through ``banded_range_join``
    (bucketed equi-join on (user, time-band) — never a cross product;
    the exact window filter prunes corners); per-conversion ranking is a
    window PARTITIONED by conversion (bounded by touches-per-hour).
    Reference analog: none (beyond-reference temporal-analytics op)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", F.col("ts").alias("conv_ts")
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    paired = banded_range_join(
        conv.withColumnRenamed("conv_ts", "ts"), touches, "user_id", "ts", 3600
    ).filter(
        (F.col("r_ts") < F.col("ts"))
        & (F.col("r_ts") >= F.col("ts") - F.expr("INTERVAL 3600 SECONDS"))
    )
    w = Window.partitionBy("conv_id").orderBy("r_ts", "r_event_id")
    ranked = paired.select(
        "conv_id",
        F.col("r_event_type").alias("event_type"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("n"),
    )
    first = ranked.select(
        F.lit("first_touch").alias("model"),
        "event_type",
        F.when(F.col("rk") == 1, 1_000_000).otherwise(0).alias("credit"),
    )
    last = ranked.select(
        F.lit("last_touch").alias("model"),
        "event_type",
        F.when(F.col("rk") == F.col("n"), 1_000_000).otherwise(0).alias("credit"),
    )
    linear = ranked.select(
        F.lit("linear").alias("model"),
        "event_type",
        (
            F.expr("1000000 div n")
            + F.when(
                F.col("rk") == F.col("n"),
                F.lit(1_000_000) - F.col("n") * F.expr("1000000 div n"),
            ).otherwise(0)
        ).alias("credit"),
    )
    return (
        first.unionByName(last)
        .unionByName(linear)
        .groupBy("model", "event_type")
        .agg(
            F.sum("credit").cast("long").alias("credit_micro"),
            F.sum(F.when(F.col("credit") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_credited"),
        )
    )


@register(
    "events_twap_by_type",
    """
WITH seq AS (
  SELECT event_type, user_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro,
         epoch_us(lead(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id)) - epoch_us(ts) AS dur_us
  FROM events
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_intervals,
         CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
         CAST(sum(CAST(v_micro AS HUGEINT) * dur_us) AS HUGEINT) AS wsum
  FROM seq WHERE dur_us IS NOT NULL GROUP BY 1
)
SELECT event_type, n_intervals, total_dur_us,
       CAST(wsum // total_dur_us AS BIGINT) AS twap_micro
FROM agg
""",
)
def events_twap_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP — the step-function mean financial
    and metrics systems need, where a value HOLDS until the next
    observation): per event type, each user's reading is weighted by the
    exact microseconds until their next same-type event, and the type's
    TWAP is the truncating-div micro ratio of Σ v·dur over Σ dur.
    Everything integer: values quantize half-up to micros, durations are
    unix-micros differences, the weighted sum rides decimal(38,0)/HUGEINT.
    The only window is PARTITIONED BY (user, type) — per-user series,
    never a per-type single partition over row-scaled data (the reason
    TWAP is defined over user streams here). Open intervals (each
    series' last reading) carry no weight by definition.
    Reference analog: none (beyond-reference temporal-aggregate op)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long").alias("v_micro"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    agg = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dur_us").cast("long").alias("total_dur_us"),
        F.sum(F.col("v_micro").cast("decimal(38,0)") * F.col("dur_us")).cast("decimal(38,0)").alias("wsum"),
    )
    return agg.select(
        "event_type",
        "n_intervals",
        "total_dur_us",
        F.expr("wsum div total_dur_us").cast("long").alias("twap_micro"),
    )


@register(
    "events_gap_sla_percentiles",
    """
WITH seq AS (
  SELECT event_type,
         epoch_us(lead(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
  FROM events
),
h AS (
  SELECT event_type, gap_us, CAST(count(*) AS BIGINT) AS cnt
  FROM seq WHERE gap_us IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT event_type, gap_us, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY gap_us
                        ROWS UNBOUNDED PRECEDING) AS cumn,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
),
q AS (SELECT unnest([50, 95, 99]) AS pct)
SELECT c.event_type, CAST(q.pct AS BIGINT) AS pct,
       CAST(min(c.gap_us) AS BIGINT) AS gap_us,
       CAST(min(c.n) AS BIGINT) AS n_gaps
FROM c CROSS JOIN q
WHERE 100 * c.cumn >= q.pct * c.n
GROUP BY 1, 2
""",
)
def events_gap_sla_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT latency-SLA percentiles (p50/p95/p99) of the inter-event gap
    per event type — the ops-dashboard report where approx quantiles are
    exactly what you can't ship when the SLA is contractual. The gap
    histogram per type is the only row-scaled aggregation; percentile
    selection is the smallest gap whose cumulative count reaches
    ceil(q·n/100) — pure integer inequality (100·cum >= q·n), no
    interpolation, the lower-quantile definition. The cumulative runs
    over the (type, gap) HISTOGRAM partitioned by type; gap extraction
    windows are keyed (user, type) per the TWAP scale rule. The 3-row
    percentile dim cross-joins in before one filtered min per (type, q).
    Reference analog: none (beyond-reference SLA-reporting op)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    h = seq.groupBy("event_type", "gap_us").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("gap_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    c = h.withColumn("cumn", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(wt)
    )
    q = spark.createDataFrame([(50,), (95,), (99,)], "pct long")
    return (
        c.crossJoin(F.broadcast(q))
        .filter(100 * F.col("cumn") >= F.col("pct") * F.col("n"))
        .groupBy("event_type", "pct")
        .agg(
            F.min("gap_us").cast("long").alias("gap_us"),
            F.min("n").cast("long").alias("n_gaps"),
        )
        .select("event_type", F.col("pct").cast("long").alias("pct"), "gap_us", "n_gaps")
    )


@register(
    "events_markov_attribution",
    """
WITH ev AS (
  SELECT user_id, event_id, event_type AS t, epoch_us(ts) AS tsu
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
seq AS (
  SELECT user_id, event_id, t, tsu,
         lag(t) OVER w AS pt, lag(tsu) OVER w AS ptsu
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
marked AS (
  SELECT user_id, event_id, t, tsu, pt,
         CASE WHEN pt IS NULL OR ptsu < tsu - 3600000000 OR pt = 'purchase'
              THEN 1 ELSE 0 END AS is_start
  FROM seq
),
nx AS (
  SELECT user_id, t, pt, is_start,
         lead(is_start) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS nis
  FROM marked
),
trans AS (
  SELECT 'start' AS src, t AS dst FROM nx WHERE is_start = 1
  UNION ALL
  SELECT pt AS src, t AS dst FROM nx WHERE is_start = 0
  UNION ALL
  SELECT t AS src, 'null' AS dst FROM nx
  WHERE t <> 'purchase' AND (nis IS NULL OR nis = 1)
),
m AS (
  SELECT
    CAST(COALESCE(sum(CASE WHEN src='start' AND dst='view' THEN 1 END), 0) AS BIGINT) AS sv,
    CAST(COALESCE(sum(CASE WHEN src='start' AND dst='click' THEN 1 END), 0) AS BIGINT) AS sc,
    CAST(COALESCE(sum(CASE WHEN src='start' AND dst='purchase' THEN 1 END), 0) AS BIGINT) AS sp,
    CAST(COALESCE(sum(CASE WHEN src='view' AND dst='view' THEN 1 END), 0) AS BIGINT) AS vv,
    CAST(COALESCE(sum(CASE WHEN src='view' AND dst='click' THEN 1 END), 0) AS BIGINT) AS vc,
    CAST(COALESCE(sum(CASE WHEN src='view' AND dst='purchase' THEN 1 END), 0) AS BIGINT) AS vp,
    CAST(COALESCE(sum(CASE WHEN src='click' AND dst='view' THEN 1 END), 0) AS BIGINT) AS cv,
    CAST(COALESCE(sum(CASE WHEN src='click' AND dst='click' THEN 1 END), 0) AS BIGINT) AS cc,
    CAST(COALESCE(sum(CASE WHEN src='click' AND dst='purchase' THEN 1 END), 0) AS BIGINT) AS cp,
    CAST(COALESCE(sum(CASE WHEN src='start' THEN 1 END), 0) AS BIGINT) AS n_s,
    CAST(COALESCE(sum(CASE WHEN src='view' THEN 1 END), 0) AS BIGINT) AS n_v,
    CAST(COALESCE(sum(CASE WHEN src='click' THEN 1 END), 0) AS BIGINT) AS n_c,
    CAST(count(*) AS BIGINT) AS n_transitions
  FROM trans
),
sol AS (
  SELECT *,
         CAST(n_v - vv AS HUGEINT) * (n_c - cc) - CAST(vc AS HUGEINT) * cv AS d2
  FROM m
),
sol2 AS (
  SELECT *,
         CAST(vp AS HUGEINT) * (n_c - cc) + CAST(vc AS HUGEINT) * cp AS xv_num,
         CAST(cp AS HUGEINT) * (n_v - vv) + CAST(cv AS HUGEINT) * vp AS xc_num
  FROM sol
),
sol3 AS (
  SELECT *,
         CAST(sp AS HUGEINT) * d2 + CAST(sv AS HUGEINT) * xv_num
           + CAST(sc AS HUGEINT) * xc_num AS xs_num,
         CAST(n_s AS HUGEINT) * d2 AS xs_den
  FROM sol2
),
conv AS (
  SELECT *,
         CAST(xs_num * 1000000 // NULLIF(xs_den, 0) AS BIGINT) AS conv_full_ppm,
         CAST((CAST(sp AS HUGEINT) * (n_c - cc) + CAST(sc AS HUGEINT) * cp) * 1000000
              // NULLIF(CAST(n_s AS HUGEINT) * (n_c - cc), 0) AS BIGINT) AS wo_view_ppm,
         CAST((CAST(sp AS HUGEINT) * (n_v - vv) + CAST(sv AS HUGEINT) * vp) * 1000000
              // NULLIF(CAST(n_s AS HUGEINT) * (n_v - vv), 0) AS BIGINT) AS wo_click_ppm
  FROM sol3
),
re AS (
  SELECT *,
         1000000 - wo_view_ppm * 1000000 // NULLIF(conv_full_ppm, 0) AS re_view,
         1000000 - wo_click_ppm * 1000000 // NULLIF(conv_full_ppm, 0) AS re_click
  FROM conv
)
SELECT 'view' AS channel,
       CAST(n_s AS BIGINT) AS n_sessions, n_transitions, conv_full_ppm,
       wo_view_ppm AS conv_removed_ppm,
       CAST(re_view AS BIGINT) AS removal_effect_ppm,
       CAST(re_view * 1000000 // NULLIF(re_view + re_click, 0) AS BIGINT) AS credit_share_ppm
FROM re
UNION ALL
SELECT 'click',
       CAST(n_s AS BIGINT), n_transitions, conv_full_ppm,
       wo_click_ppm,
       CAST(re_click AS BIGINT),
       CAST(re_click * 1000000 // NULLIF(re_view + re_click, 0) AS BIGINT)
FROM re
""",
)
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (the data-driven alternative to
    the heuristic first/last/linear models of events_multitouch_attribution):
    user journeys become a first-order Markov chain over states
    {start, view, click} with absorbing {purchase, null} — sessions break
    on >1h gaps or after a purchase — and each channel's credit is its
    REMOVAL EFFECT: how much the start->purchase absorption probability
    drops when that channel's inbound transitions are redirected to null
    (row totals unchanged, so the removed chain stays substochastic).
    The absorption probabilities are solved EXACTLY: multiplying each
    balance equation by its row total turns (I-Q)x=b into an integer
    3x3 system (start is never re-entered, so it reduces to a 2x2 core),
    solved in closed form by Cramer's rule over HUGEINT/decimal(38,0)
    (count products pass int64 around 2e6 rows per state) and quantized
    once to truncating-div ppm; removal effects and credit shares are
    second-stage integer divisions of those ppm values, so both engines
    replay bit-identical arithmetic. Scale shapes: the only wide work is
    two user-partitioned sequence windows and one 12-cell aggregate —
    the solve itself is a 1-row select. Zero-denominator corners
    (no clicks, no conversions) surface as NULL via NULLIF in both
    engines rather than a crash. Reference analog: none
    (beyond-reference attribution op)."""
    from pyspark.sql.window import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            "event_id",
            F.col("event_type").alias("t"),
            F.unix_micros("ts").alias("tsu"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "t",
        "tsu",
        F.lag("t").over(w).alias("pt"),
        F.lag("tsu").over(w).alias("ptsu"),
    )
    marked = seq.withColumn(
        "is_start",
        F.when(
            F.col("pt").isNull()
            | (F.col("ptsu") < F.col("tsu") - 3600000000)
            | (F.col("pt") == "purchase"),
            1,
        ).otherwise(0),
    )
    nx = marked.select(
        "user_id", "t", "pt", "is_start", F.lead("is_start").over(w).alias("nis")
    )
    trans = (
        nx.filter(F.col("is_start") == 1)
        .select(F.lit("start").alias("src"), F.col("t").alias("dst"))
        .unionByName(
            nx.filter(F.col("is_start") == 0).select(
                F.col("pt").alias("src"), F.col("t").alias("dst")
            )
        )
        .unionByName(
            nx.filter(
                (F.col("t") != "purchase")
                & (F.col("nis").isNull() | (F.col("nis") == 1))
            ).select(F.col("t").alias("src"), F.lit("null").alias("dst"))
        )
    )

    def _cell(s: str, d: str, alias: str) -> F.Column:
        return (
            F.coalesce(
                F.sum(F.when((F.col("src") == s) & (F.col("dst") == d), 1)), F.lit(0)
            )
            .cast("long")
            .alias(alias)
        )

    m = trans.agg(
        _cell("start", "view", "sv"),
        _cell("start", "click", "sc"),
        _cell("start", "purchase", "sp"),
        _cell("view", "view", "vv"),
        _cell("view", "click", "vc"),
        _cell("view", "purchase", "vp"),
        _cell("click", "view", "cv"),
        _cell("click", "click", "cc"),
        _cell("click", "purchase", "cp"),
        F.coalesce(F.sum(F.when(F.col("src") == "start", 1)), F.lit(0))
        .cast("long")
        .alias("n_s"),
        F.coalesce(F.sum(F.when(F.col("src") == "view", 1)), F.lit(0))
        .cast("long")
        .alias("n_v"),
        F.coalesce(F.sum(F.when(F.col("src") == "click", 1)), F.lit(0))
        .cast("long")
        .alias("n_c"),
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
    )
    DEC = "CAST({} AS DECIMAL(38,0))"
    re = (
        m.selectExpr(
            "*",
            f"{DEC.format('n_v - vv')} * (n_c - cc) - {DEC.format('vc')} * cv AS d2",
        )
        .selectExpr(
            "*",
            f"{DEC.format('vp')} * (n_c - cc) + {DEC.format('vc')} * cp AS xv_num",
            f"{DEC.format('cp')} * (n_v - vv) + {DEC.format('cv')} * vp AS xc_num",
        )
        .selectExpr(
            "*",
            f"{DEC.format('sp')} * d2 + {DEC.format('sv')} * xv_num"
            f" + {DEC.format('sc')} * xc_num AS xs_num",
            f"{DEC.format('n_s')} * d2 AS xs_den",
        )
        .selectExpr(
            "*",
            "CAST(xs_num * 1000000 div NULLIF(xs_den, 0) AS BIGINT) AS conv_full_ppm",
            f"CAST(({DEC.format('sp')} * (n_c - cc) + {DEC.format('sc')} * cp) * 1000000"
            f" div NULLIF({DEC.format('n_s')} * (n_c - cc), 0) AS BIGINT) AS wo_view_ppm",
            f"CAST(({DEC.format('sp')} * (n_v - vv) + {DEC.format('sv')} * vp) * 1000000"
            f" div NULLIF({DEC.format('n_s')} * (n_v - vv), 0) AS BIGINT) AS wo_click_ppm",
        )
        .selectExpr(
            "*",
            "1000000 - wo_view_ppm * 1000000 div NULLIF(conv_full_ppm, 0) AS re_view",
            "1000000 - wo_click_ppm * 1000000 div NULLIF(conv_full_ppm, 0) AS re_click",
        )
    )
    view_row = re.selectExpr(
        "'view' AS channel",
        "CAST(n_s AS BIGINT) AS n_sessions",
        "n_transitions",
        "conv_full_ppm",
        "wo_view_ppm AS conv_removed_ppm",
        "CAST(re_view AS BIGINT) AS removal_effect_ppm",
        "CAST(re_view * 1000000 div NULLIF(re_view + re_click, 0) AS BIGINT)"
        " AS credit_share_ppm",
    )
    click_row = re.selectExpr(
        "'click' AS channel",
        "CAST(n_s AS BIGINT) AS n_sessions",
        "n_transitions",
        "conv_full_ppm",
        "wo_click_ppm AS conv_removed_ppm",
        "CAST(re_click AS BIGINT) AS removal_effect_ppm",
        "CAST(re_click * 1000000 div NULLIF(re_view + re_click, 0) AS BIGINT)"
        " AS credit_share_ppm",
    )
    return view_row.unionByName(click_row)


@register(
    "events_position_attribution",
    """
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT c.conv_id, c.conv_ts, e.event_id AS touch_id, e.event_type, e.ts
  FROM conv c JOIN events e
    ON e.user_id = c.user_id
   AND e.event_type IN ('click', 'view')
   AND e.ts < c.conv_ts
   AND e.ts >= c.conv_ts - INTERVAL 3600 SECONDS
),
ranked AS (
  SELECT conv_id, touch_id, event_type, ts,
         row_number() OVER (PARTITION BY conv_id ORDER BY ts, touch_id) AS rk,
         count(*) OVER (PARTITION BY conv_id) AS n,
         1000000 // (1 << CAST((epoch_us(conv_ts) - epoch_us(ts)) // 1800000000
                               AS BIGINT)) AS w
  FROM touch
),
dec AS (
  SELECT conv_id, event_type, w,
         sum(w) OVER (PARTITION BY conv_id ORDER BY ts, touch_id
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(w) OVER (PARTITION BY conv_id) AS wtot
  FROM ranked
),
credits AS (
  SELECT 'u_shaped' AS model, event_type,
         CASE WHEN n = 1 THEN 1000000
              WHEN n = 2 THEN 500000
              WHEN rk = 1 THEN 400000
              WHEN rk = n THEN 400000 + 200000 - (n - 2) * (200000 // (n - 2))
              ELSE 200000 // (n - 2) END AS credit
  FROM ranked
  UNION ALL
  SELECT 'time_decay', event_type,
         cumw * 1000000 // wtot - (cumw - w) * 1000000 // wtot
  FROM dec
)
SELECT model, event_type,
       CAST(sum(credit) AS BIGINT) AS credit_micro,
       CAST(count(*) FILTER (WHERE credit > 0) AS BIGINT) AS n_credited
FROM credits GROUP BY 1, 2
""",
)
def events_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based and time-decay attribution — the remaining two
    heuristic models next to first/last/linear
    (events_multitouch_attribution) and the Markov removal effect:
    U-shaped gives 40/20/40 with the middle split by truncating div and
    the division remainder parked on the LAST touch, and time-decay
    halves a touch's weight per 30 minutes of age via an INTEGER shift
    (1e6 div (1 << steps) — no float pow), with per-conversion credit
    shares in the telescoping form cum*1e6 div tot - prev*1e6 div tot so
    every conversion books exactly 1e6 under BOTH models (the same
    conservation audit as the base family). Same banded-range pairing
    (equi-join on (user, time band), never a cross product);
    per-conversion windows bounded by touches-per-hour. Reference
    analog: none (beyond-reference attribution op)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", F.col("ts").alias("conv_ts")
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    paired = banded_range_join(
        conv.withColumnRenamed("conv_ts", "ts"), touches, "user_id", "ts", 3600
    ).filter(
        (F.col("r_ts") < F.col("ts"))
        & (F.col("r_ts") >= F.col("ts") - F.expr("INTERVAL 3600 SECONDS"))
    )
    w = Window.partitionBy("conv_id").orderBy("r_ts", "r_event_id")
    ranked = paired.select(
        "conv_id",
        F.col("r_event_type").alias("event_type"),
        F.col("r_ts").alias("tts"),
        F.col("r_event_id").alias("touch_id"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("n"),
        F.expr(
            "1000000 div shiftleft(1, CAST((unix_micros(ts) - unix_micros(r_ts))"
            " div 1800000000 AS INT))"
        ).alias("wgt"),
    )
    wd = Window.partitionBy("conv_id").orderBy("tts", "touch_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = ranked.select(
        "conv_id",
        "event_type",
        "wgt",
        F.sum("wgt").over(wd).alias("cumw"),
        F.sum("wgt").over(Window.partitionBy("conv_id")).alias("wtot"),
    )
    u_shaped = ranked.selectExpr(
        "'u_shaped' AS model",
        "event_type",
        "CASE WHEN n = 1 THEN 1000000"
        " WHEN n = 2 THEN 500000"
        " WHEN rk = 1 THEN 400000"
        " WHEN rk = n THEN 400000 + 200000 - (n - 2) * (200000 div (n - 2))"
        " ELSE 200000 div (n - 2) END AS credit",
    )
    decay = dec.selectExpr(
        "'time_decay' AS model",
        "event_type",
        "cumw * 1000000 div wtot - (cumw - wgt) * 1000000 div wtot AS credit",
    )
    return (
        u_shaped.unionByName(decay)
        .groupBy("model", "event_type")
        .agg(
            F.sum("credit").cast("long").alias("credit_micro"),
            F.sum(F.when(F.col("credit") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_credited"),
        )
    )


@register(
    "events_self_exciting_ratio",
    """
WITH seq AS (
  SELECT event_type, ts,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
flags AS (
  SELECT event_type,
         CASE WHEN prev_us IS NOT NULL AND epoch_us(ts) - prev_us <= 600000000
              THEN 1 ELSE 0 END AS triggered
  FROM seq
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(triggered) AS BIGINT) AS n_triggered,
       CAST(sum(triggered) * 1000000 // count(*) AS BIGINT) AS branching_ppm
FROM flags GROUP BY 1
""",
)
def events_self_exciting_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-excitation (burst-triggering) profile per event type: the
    share of events landing within 10 minutes of the same user's
    previous event — the empirical branching-ratio proxy of a Hawkes
    process (near 1e6 ppm = cascade-dominated arrivals where naive
    Poisson capacity planning fails; the burstiness/Fano report shows
    the same physics at day grain, this one at event grain). One
    user-partitioned lag window + a per-type aggregate, integers
    end-to-end. Reference analog: none (beyond-reference
    temporal-analytics op)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    flags = seq.select(
        "event_type",
        F.when(
            F.col("prev_us").isNotNull()
            & (F.col("us") - F.col("prev_us") <= 600000000),
            1,
        )
        .otherwise(0)
        .alias("triggered"),
    )
    return flags.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("triggered").cast("long").alias("n_triggered"),
        F.expr("CAST(sum(triggered) * 1000000 div count(*) AS BIGINT)").alias(
            "branching_ppm"
        ),
    )
