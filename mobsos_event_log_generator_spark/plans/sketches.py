"""Round-9 sketch/estimator coverage: portable mergeable sketches whose
REGISTERS — not just an error bound — are hash-checked against the DuckDB
oracle, plus exact-integer smoothing and allocation estimators.

Why these exist (SURVEY.md §2 extension lane, 100 TB pipeline ops):
* `sketch_distinct_users_daily` (analytics.py) can only contract an error
  BOUND because Spark's HLL++ registers are engine-internal. The portable
  HLL here derives its registers from md5 — byte-identical in Spark and
  DuckDB (proven: identical digests, identical `ln`/`pow` doubles) — so the
  whole estimate is value-hash-checked, and the register table is exactly
  the mergeable state a 1000-executor rollup would union (max per bucket is
  associative/commutative → map-side partial aggregation, 256 rows per day
  per partition ceiling).
* KMV (k-minimum-values / bottom-k) is the other classical mergeable
  distinct sketch; bottom-k sets union by re-taking the k smallest.
* The histogram quantile sketch is the mergeable fixed-grid equi-width
  profile (bucket counts add across partitions/executors); its exact-lane
  audit narrows to ONE bucket before sorting, so no per-group full sort.
* EWMA rides the repo's exact-integer-math discipline (XM): power-of-two
  decay weights are IEEE-exact in both engines, summed order-free as
  integers (decimal(38,0) per the r7/r8 accumulator-audit rule).

Scale notes per query live in each docstring. No UDFs anywhere — every
expression is JVM-side built-ins (whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mobsos_event_log_generator_spark.operators import exactmath as XM
from mobsos_event_log_generator_spark.plans.queries import register
from mobsos_event_log_generator_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# Portable HyperLogLog (m = 256 buckets, md5-derived registers)
# ---------------------------------------------------------------------------

# rho = 1 + number of leading zero BITS of the 52-bit tail (13 hex chars),
# capped at 50 so 2^(50-rho) stays an exact BIGINT (empty bucket -> 2^50;
# 256 * 2^50 = 2^58 < int64 max). All-zero tail (p = 2^-52) also caps to 50.
_HEX_LZ_CASE = (
    "CASE WHEN {d} IN ('8','9','a','b','c','d','e','f') THEN 0 "
    "WHEN {d} IN ('4','5','6','7') THEN 1 "
    "WHEN {d} IN ('2','3') THEN 2 ELSE 3 END"
)

# alpha_256 * m^2 * 2^50, written as one arithmetic expression so BOTH
# engines constant-fold it with identical IEEE doubles.
_HLL_NUM = "(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 1099511627776.0"


def _rho_sql(tail: str) -> str:
    """Leading-zero rank of a 13-hex-char tail, identical text for both
    engines (regexp_extract'^0*' and substring are 1-indexed in each)."""
    lz = f"length(regexp_extract({tail}, '^0*'{{g}}))"
    first = f"substring({tail}, {lz} + 1, 1)"
    return (
        f"CASE WHEN {lz} >= 13 THEN 50 "
        f"ELSE least(4 * {lz} + " + _HEX_LZ_CASE.format(d=first) + " + 1, 50) END"
    )


_RHO_SPARK = _rho_sql("tail").replace("{g}", ", 0")  # Spark needs group idx
_RHO_DUCK = _rho_sql("tail").replace("{g}", "")


@register(
    "sketch_hll_portable_daily",
    f"""
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
         user_id,
         md5('hll|' || CAST(user_id AS VARCHAR)) AS hx
  FROM events
),
r AS (
  SELECT event_date,
         substring(hx, 1, 2) AS bucket,
         {_RHO_DUCK.replace('tail', 'substring(hx, 3, 13)')} AS rho
  FROM h
),
reg AS (
  SELECT event_date, bucket, max(rho) AS rmax
  FROM r GROUP BY 1, 2
),
day AS (
  SELECT event_date,
         CAST(sum(CAST(pow(2, 50 - rmax) AS BIGINT)) AS BIGINT) AS z_used,
         CAST(count(*) AS BIGINT) AS buckets_used
  FROM reg GROUP BY 1
),
ex AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1
),
est AS (
  SELECT d.event_date, ex.exact_users, d.buckets_used,
         CASE
           WHEN ({_HLL_NUM} / (d.z_used + (256 - d.buckets_used) * 1125899906842624))
                  <= 640.0 AND d.buckets_used < 256
           THEN 256.0 * ln(256.0 / (256 - d.buckets_used))
           ELSE {_HLL_NUM} / (d.z_used + (256 - d.buckets_used) * 1125899906842624)
         END AS e
  FROM day d JOIN ex ON ex.event_date = d.event_date
)
SELECT event_date, exact_users, buckets_used,
       round(e, 4) AS hll_estimate,
       round(abs(e - exact_users) / exact_users * 100.0, 4) AS rel_err_pct
FROM est
""",
)
def sketch_hll_portable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-users-per-day whose registers AND
    estimate are value-hash-checked (md5 buckets + leading-zero ranks are
    byte-identical across engines; `sketch_distinct_users_daily` can only
    contract a bound). m=256 (rsd ~6.5%), standard small-range linear
    counting below 2.5m. Scale shape: one (day,bucket) partial-max shuffle
    — each map task emits <= 256 rows/day regardless of input size — then a
    calendar-bounded day rollup; the register table is the mergeable state
    (MAX is associative), so 1000 executors union registers, never rows.
    The exact lane (count distinct) is the audit, kept per fixture SFs."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.col("user_id"),
        F.md5(F.concat(F.lit("hll|"), F.col("user_id").cast("string"))).alias("hx"),
    )
    r = h.select(
        "event_date",
        F.substring("hx", 1, 2).alias("bucket"),
        F.expr(_RHO_SPARK.replace("tail", "substring(hx, 3, 13)")).alias("rho"),
    )
    reg = r.groupBy("event_date", "bucket").agg(F.max("rho").alias("rmax"))
    day = reg.groupBy("event_date").agg(
        F.sum(F.pow(F.lit(2.0), 50 - F.col("rmax")).cast("bigint")).alias("z_used"),
        F.count(F.lit(1)).alias("buckets_used"),
    )
    ex = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    e_raw = F.expr(
        f"{_HLL_NUM} / (z_used + (256 - buckets_used) * 1125899906842624)"
    )
    e = F.when(
        (e_raw <= 640.0) & (F.col("buckets_used") < 256),
        256.0 * F.log(256.0 / (256 - F.col("buckets_used"))),
    ).otherwise(e_raw)
    return (
        day.join(ex, "event_date")
        .select(
            "event_date",
            "exact_users",
            "buckets_used",
            F.round(e, 4).alias("hll_estimate"),
            F.round(F.abs(e - F.col("exact_users")) / F.col("exact_users") * 100.0, 4).alias(
                "rel_err_pct"
            ),
        )
    )


# ---------------------------------------------------------------------------
# HLL register-merge rollup: monthly distinct from max-merged DAILY registers
# ---------------------------------------------------------------------------


@register(
    "sketch_hll_union_monthly",
    f"""
WITH h AS (
  SELECT strftime(ts, '%Y-%m') AS month,
         strftime(ts, '%Y-%m-%d') AS event_date,
         user_id,
         md5('hll|' || CAST(user_id AS VARCHAR)) AS hx
  FROM events
),
r AS (
  SELECT month, event_date,
         substring(hx, 1, 2) AS bucket,
         {_RHO_DUCK.replace('tail', 'substring(hx, 3, 13)')} AS rho
  FROM h
),
daily_reg AS (
  SELECT month, event_date, bucket, max(rho) AS rmax
  FROM r GROUP BY 1, 2, 3
),
merged AS (
  SELECT month, bucket, max(rmax) AS rmax
  FROM daily_reg GROUP BY 1, 2
),
mon AS (
  SELECT month,
         CAST(sum(CAST(pow(2, 50 - rmax) AS BIGINT)) AS BIGINT) AS z_used,
         CAST(count(*) AS BIGINT) AS buckets_used
  FROM merged GROUP BY 1
),
exd AS (
  SELECT strftime(ts, '%Y-%m') AS month,
         strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(count(DISTINCT user_id) AS BIGINT) AS daily_users
  FROM events GROUP BY 1, 2
),
ex AS (
  SELECT month,
         CAST(sum(daily_users) AS BIGINT) AS sum_daily_users,
         CAST(count(*) AS BIGINT) AS n_days
  FROM exd GROUP BY 1
),
exm AS (
  SELECT strftime(ts, '%Y-%m') AS month,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1
),
est AS (
  SELECT m.month, exm.exact_users, ex.sum_daily_users, ex.n_days,
         m.buckets_used,
         CASE
           WHEN ({_HLL_NUM} / (m.z_used + (256 - m.buckets_used) * 1125899906842624))
                  <= 640.0 AND m.buckets_used < 256
           THEN 256.0 * ln(256.0 / (256 - m.buckets_used))
           ELSE {_HLL_NUM} / (m.z_used + (256 - m.buckets_used) * 1125899906842624)
         END AS e
  FROM mon m JOIN exm ON exm.month = m.month JOIN ex ON ex.month = m.month
)
SELECT month, exact_users, sum_daily_users, n_days, buckets_used,
       CAST(sum_daily_users - exact_users AS BIGINT) AS repeat_user_days,
       round(e, 4) AS hll_union_estimate,
       round(abs(e - exact_users) / exact_users * 100.0, 4) AS rel_err_pct
FROM est
""",
)
def sketch_hll_union_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA on the portable HLL: monthly distinct users estimated
    from the max-merge (union) of the DAILY register tables — the exact
    motion a 1000-executor / partitioned-lake rollup performs: daily
    sketches persist (256 rows/day), months aggregate registers, never
    rows. MAX is associative+commutative so merged registers equal the
    direct monthly sketch (unit-pinned property); `repeat_user_days`
    (sum of daily distincts minus monthly distinct) reads out cross-day
    overlap without any pairwise set intersection. Exact lanes are the
    audit; at scale only the register lane survives."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.col("user_id"),
        F.md5(F.concat(F.lit("hll|"), F.col("user_id").cast("string"))).alias("hx"),
    )
    r = h.select(
        "month",
        "event_date",
        F.substring("hx", 1, 2).alias("bucket"),
        F.expr(_RHO_SPARK.replace("tail", "substring(hx, 3, 13)")).alias("rho"),
    )
    daily_reg = r.groupBy("month", "event_date", "bucket").agg(F.max("rho").alias("rmax"))
    merged = daily_reg.groupBy("month", "bucket").agg(F.max("rmax").alias("rmax"))
    mon = merged.groupBy("month").agg(
        F.sum(F.pow(F.lit(2.0), 50 - F.col("rmax")).cast("bigint")).alias("z_used"),
        F.count(F.lit(1)).alias("buckets_used"),
    )
    exd = ev.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
    ).agg(F.countDistinct("user_id").alias("daily_users"))
    ex = exd.groupBy("month").agg(
        F.sum("daily_users").alias("sum_daily_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exm = ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    e_raw = F.expr(
        f"{_HLL_NUM} / (z_used + (256 - buckets_used) * 1125899906842624)"
    )
    e = F.when(
        (e_raw <= 640.0) & (F.col("buckets_used") < 256),
        256.0 * F.log(256.0 / (256 - F.col("buckets_used"))),
    ).otherwise(e_raw)
    return (
        mon.join(exm, "month")
        .join(ex, "month")
        .select(
            "month",
            "exact_users",
            "sum_daily_users",
            "n_days",
            "buckets_used",
            (F.col("sum_daily_users") - F.col("exact_users"))
            .cast("bigint")
            .alias("repeat_user_days"),
            F.round(e, 4).alias("hll_union_estimate"),
            F.round(F.abs(e - F.col("exact_users")) / F.col("exact_users") * 100.0, 4).alias(
                "rel_err_pct"
            ),
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch
# ---------------------------------------------------------------------------

# 60-bit md5-derived hash (first 15 hex chars), like the HLL lane: the r9
# MINSTD permutation was only a bijection for user_id < 2^31-1 — ids past
# that collapsed (mod p) and id ≡ p-1 hashed to 0, outside the claimed
# range (r9 ADVICE). md5 keeps the hash uniform on [0, 2^60) at ANY id
# domain; collisions are ~n²/2^61 (birthday), immaterial to a sketch whose
# rsd is 1/sqrt(k-1) ≈ 13%, and the hv VALUE at any rank is deterministic
# even under ties (sorting a multiset), so the ORDER BY hv lanes stay
# order-free. Spark computes it as conv(hex, 16, 10); DuckDB casts the
# '0x'-prefixed hex string — different spellings, identical 60-bit values.
_KMV_R = 1 << 60  # hash range (15 hex chars)
_KMV_K = 64

_KMV_HASH_DUCK = "CAST('0x' || substring(md5('kmv|' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)"


def _kmv_hash_spark() -> "F.Column":
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


@register(
    "sketch_kmv_distinct_daily",
    f"""
WITH u AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS event_date, user_id
  FROM events
),
h AS (
  SELECT event_date,
         {_KMV_HASH_DUCK} AS hv
  FROM u
),
r AS (
  SELECT event_date, hv,
         row_number() OVER (PARTITION BY event_date ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_date) AS cnt
  FROM h
)
SELECT event_date,
       CAST(cnt AS BIGINT) AS exact_users,
       CAST(rn AS BIGINT) AS k_used,
       round(CASE WHEN cnt < {_KMV_K} THEN CAST(cnt AS DOUBLE)
                  ELSE ({_KMV_K} - 1) * {float(_KMV_R)} / hv END, 4) AS kmv_estimate,
       round(abs(CASE WHEN cnt < {_KMV_K} THEN CAST(cnt AS DOUBLE)
                      ELSE ({_KMV_K} - 1) * {float(_KMV_R)} / hv END
                 - cnt) / cnt * 100.0, 4) AS rel_err_pct
FROM r
WHERE rn = least({_KMV_K}, cnt)
""",
)
def sketch_kmv_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values (bottom-k) distinct sketch per day, k=64: estimate
    (k-1)·R / h_(k) from the k-th smallest value of a 60-bit md5-derived
    hash (domain-independent — see the _KMV_R comment; the r9 MINSTD
    permutation silently collapsed user ids ≥ 2^31-1). Under k distinct ->
    estimate = exact (the sketch IS the set). The bottom-k set is the other
    classical mergeable distinct state: union = re-take k smallest. Fixture
    lane uses a per-day window sort; the 100 TB path pre-prunes each map
    partition to its local bottom-k (k·partitions rows) before the per-day
    merge — same answer, documented here as the swap-in (the distinct
    pre-shuffle already bounds the sort input to distinct users/day)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "user_id"
    ).distinct()
    h = u.select("event_date", _kmv_hash_spark().alias("hv"))
    w = Window.partitionBy("event_date")
    r = h.select(
        "event_date",
        "hv",
        F.row_number().over(w.orderBy("hv")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    ).filter(F.col("rn") == F.least(F.lit(_KMV_K), F.col("cnt")))
    est = F.when(
        F.col("cnt") < _KMV_K, F.col("cnt").cast("double")
    ).otherwise(F.lit(float(_KMV_K - 1)) * float(_KMV_R) / F.col("hv"))
    return r.select(
        "event_date",
        F.col("cnt").cast("bigint").alias("exact_users"),
        F.col("rn").cast("bigint").alias("k_used"),
        F.round(est, 4).alias("kmv_estimate"),
        F.round(F.abs(est - F.col("cnt")) / F.col("cnt") * 100.0, 4).alias("rel_err_pct"),
    )


# ---------------------------------------------------------------------------
# Mergeable fixed-grid histogram quantiles + single-bucket exact audit
# ---------------------------------------------------------------------------

_HQ_WIDTH = 100000  # bucket width in cents -> $1000.00 equi-width bins


@register(
    "lineitem_histogram_quantiles",
    f"""
WITH c AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         {XM.sql_int_units('l_extendedprice', 2)} AS cents
  FROM lineitem
),
hist AS (
  SELECT l_returnflag, cents // {_HQ_WIDTH} AS bucket,
         CAST(count(*) AS BIGINT) AS bcnt
  FROM c GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, bucket, bcnt,
         sum(bcnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum_n,
         sum(bcnt) OVER (PARTITION BY l_returnflag) AS n_rows
  FROM hist
),
q AS (SELECT unnest([50, 90, 99]) AS q_pct),
tgt AS (
  SELECT cum.*, q.q_pct, (q.q_pct * n_rows + 99) // 100 AS k
  FROM cum CROSS JOIN q
),
hit AS (
  SELECT l_returnflag, q_pct, k, n_rows, bucket, bcnt,
         cum_n - bcnt AS cum_prev
  FROM tgt
  WHERE cum_n >= k AND cum_n - bcnt < k
),
exact AS (
  SELECT h.l_returnflag, h.q_pct,
         c.cents AS exact_cents,
         h.cum_prev + row_number() OVER (
           PARTITION BY h.l_returnflag, h.q_pct
           ORDER BY c.cents, c.l_orderkey, c.l_linenumber) AS grk,
         h.k
  FROM hit h JOIN c ON c.l_returnflag = h.l_returnflag
                   AND c.cents // {_HQ_WIDTH} = h.bucket
)
SELECT h.l_returnflag,
       CAST(h.q_pct AS BIGINT) AS q_pct,
       CAST(h.n_rows AS BIGINT) AS n_rows,
       round(CAST(h.bucket * {_HQ_WIDTH}
             + ((h.k - h.cum_prev) * {_HQ_WIDTH}) // h.bcnt AS DOUBLE) / 100.0,
             2) AS est_quantile,
       round(CAST(e.exact_cents AS DOUBLE) / 100.0, 2) AS exact_quantile,
       round(abs(CAST(h.bucket * {_HQ_WIDTH}
             + ((h.k - h.cum_prev) * {_HQ_WIDTH}) // h.bcnt AS DOUBLE)
             - e.exact_cents) / 100.0, 2) AS abs_err
FROM hit h
JOIN exact e ON e.l_returnflag = h.l_returnflag AND e.q_pct = h.q_pct
            AND e.grk = e.k
""",
)
def lineitem_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch (P50/P90/P99 of
    l_extendedprice per returnflag, $1000 bins on exact cents) with an
    exact-order-statistic audit. Scale shape: bucket counts ADD across
    partitions (one partial-agg shuffle to ~120 buckets x 3 flags), the
    estimate interpolates inside the target bucket with pure integer
    arithmetic, and the exact k-th value is found WITHOUT a per-group full
    sort: the histogram locates the one bucket containing rank k, rows are
    semi-joined down to that bucket (~1/120th of the group), and only that
    slice is ranked (offset by the bucket's cumulative base). DuckDB oracle
    mirrors every integer step; ties broken by (orderkey, linenumber) don't
    affect the k-th VALUE but keep the rank lane deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    # LONG `div` everywhere an integer quotient is needed (r9 ADVICE): the
    # old (x - x % b)/b double-division trick is exact only below 2^53 —
    # k * 100000 crosses that at ~9e10 rows/flag, a scale-only divergence
    # from the oracle's `//` integer path. `div` on BIGINT never rounds.
    c = li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        XM.int_units_long(F.col("l_extendedprice"), 2).alias("cents"),
    ).withColumn("bucket", F.expr(f"cents div {_HQ_WIDTH}"))
    hist = c.groupBy("l_returnflag", "bucket").agg(F.count(F.lit(1)).alias("bcnt"))
    wflag = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "bucket",
        "bcnt",
        F.sum("bcnt").over(wflag.orderBy("bucket")).alias("cum_n"),
        F.sum("bcnt").over(wflag).alias("n_rows"),
    )
    q = spark.range(1).select(F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("q_pct"))
    tgt = cum.crossJoin(F.broadcast(q)).withColumn(
        "k", F.expr("(q_pct * n_rows + 99) div 100").cast("bigint")
    )
    hit = tgt.filter(
        (F.col("cum_n") >= F.col("k")) & (F.col("cum_n") - F.col("bcnt") < F.col("k"))
    ).select(
        "l_returnflag",
        "q_pct",
        "k",
        "n_rows",
        "bucket",
        "bcnt",
        (F.col("cum_n") - F.col("bcnt")).alias("cum_prev"),
    )
    # Exact lane: rank only inside the located bucket (hit is <= 9 rows ->
    # broadcast; the semi-join prunes lineitem to ~1 bucket per (flag, q)).
    cl, ht = c.alias("cl"), hit.alias("ht")
    joined = cl.join(
        F.broadcast(ht),
        (F.col("cl.l_returnflag") == F.col("ht.l_returnflag"))
        & (F.col("cl.bucket") == F.col("ht.bucket")),
    ).select(
        F.col("ht.l_returnflag").alias("flag"),
        F.col("ht.q_pct").alias("q_pct"),
        F.col("ht.k").alias("k"),
        F.col("ht.cum_prev").alias("cum_prev"),
        F.col("cl.cents").alias("cents"),
        F.col("cl.l_orderkey").alias("l_orderkey"),
        F.col("cl.l_linenumber").alias("l_linenumber"),
    )
    wq = Window.partitionBy("flag", "q_pct").orderBy("cents", "l_orderkey", "l_linenumber")
    exact = (
        joined.withColumn("grk", F.col("cum_prev") + F.row_number().over(wq))
        .filter(F.col("grk") == F.col("k"))
        .select(F.col("flag").alias("l_returnflag"), "q_pct", F.col("cents").alias("exact_cents"))
    )
    est_cents = F.expr(f"bucket * {_HQ_WIDTH} + ((k - cum_prev) * {_HQ_WIDTH}) div bcnt")
    out = hit.join(exact, ["l_returnflag", "q_pct"]).select(
        "l_returnflag",
        F.col("q_pct").cast("bigint").alias("q_pct"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(est_cents.cast("bigint").cast("double") / 100.0, 2).alias("est_quantile"),
        F.round(F.col("exact_cents").cast("double") / 100.0, 2).alias("exact_quantile"),
        F.round(
            F.abs(est_cents.cast("bigint").cast("double") - F.col("exact_cents")) / 100.0, 2
        ).alias("abs_err"),
    )
    return out


# ---------------------------------------------------------------------------
# Exact-integer EWMA over daily event counts
# ---------------------------------------------------------------------------

_EWMA_HORIZON = 30  # weights 2^-d truncate past 30 days (< 1e-9 relative)


@register(
    "events_ewma_daily",
    f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(count(*) AS BIGINT) AS daily_count
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY event_date) AS t
  FROM daily
),
conv AS (
  SELECT a.event_type, a.event_date, a.daily_count,
         sum(CAST(b.daily_count AS HUGEINT)
             * CAST(pow(2, {_EWMA_HORIZON} - (a.t - b.t)) AS BIGINT)) AS num_q,
         sum(CAST(pow(2, {_EWMA_HORIZON} - (a.t - b.t)) AS BIGINT)) AS den_q
  FROM idx a JOIN idx b
    ON b.event_type = a.event_type
   AND b.t BETWEEN a.t - {_EWMA_HORIZON} AND a.t
  GROUP BY 1, 2, 3
)
SELECT event_type, event_date, daily_count,
       {XM.sql_ratio_round('num_q', 'den_q', 4)} AS ewma
FROM conv
""",
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted EWMA (alpha = 1/2) of daily event counts per type via
    EXACT integer arithmetic: decay weights 2^-d are scaled to 2^(30-d)
    BIGINTs (IEEE-exact pow both engines), the weighted sum accumulates in
    decimal(38,0)/HUGEINT (r7/r8 accumulator-audit rule — daily counts
    ~1e10 at 100 TB x 2^30 x 31 terms stays ~3e20, 17 orders inside
    decimal(38,0)), and the ratio rounds half-up via XM.ratio_round with no
    double addition anywhere (float sums are partitioning-order-dependent;
    integer sums are order-free). Weights past 30 days truncate to 0 —
    < 1e-9 relative, invisible at 4dp. Scale shape: events collapse to the
    calendar FIRST (one partial-agg shuffle to ~types x days rows), so the
    41-wide band self-join runs on a bounded series, never on raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    ).agg(F.count(F.lit(1)).alias("daily_count"))
    idx = daily.withColumn(
        "t", F.row_number().over(Window.partitionBy("event_type").orderBy("event_date"))
    )
    a, b = idx.alias("a"), idx.alias("b")
    d = F.col("a.t") - F.col("b.t")
    w = F.pow(F.lit(2.0), _EWMA_HORIZON - d).cast("bigint")
    conv = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.t") >= F.col("a.t") - _EWMA_HORIZON)
            & (F.col("b.t") <= F.col("a.t")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.event_date").alias("event_date"),
            F.col("a.daily_count").alias("daily_count"),
        )
        .agg(
            # Cast to decimal(38,0) BEFORE multiplying by w: a BIGINT product
            # daily_count * 2^30 wraps silently past int64 (~8.6e9/day hits
            # it) with ANSI off — the oracle multiplies in HUGEINT, so the
            # divergence would be invisible at fixture SFs (r9 ADVICE, same
            # class as the r8 ks_statistic overflow).
            F.sum(F.col("b.daily_count").cast("decimal(38,0)") * w).alias("num_q"),
            F.sum(w).alias("den_q"),
        )
    )
    return conv.select(
        "event_type",
        "event_date",
        "daily_count",
        XM.ratio_round(F.col("num_q"), F.col("den_q"), 4).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# KMV set algebra: consecutive-day user overlap from bottom-k sketches
# ---------------------------------------------------------------------------


@register(
    "events_kmv_day_overlap",
    f"""
WITH u AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS event_date, user_id
  FROM events
),
h AS (
  SELECT event_date,
         {_KMV_HASH_DUCK} AS hv
  FROM u
),
bot AS (
  SELECT event_date, hv FROM (
    SELECT event_date, hv,
           row_number() OVER (PARTITION BY event_date ORDER BY hv) AS rn
    FROM h
  ) WHERE rn <= {_KMV_K}
),
days AS (SELECT DISTINCT event_date FROM u),
pairs AS (
  SELECT d.event_date AS day_a,
         strftime(CAST(d.event_date AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d') AS day_b
  FROM days d
  JOIN days n ON n.event_date =
       strftime(CAST(d.event_date AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d')
),
tagged AS (
  SELECT p.day_a, b.hv, 1 AS in_a, 0 AS in_b
  FROM pairs p JOIN bot b ON b.event_date = p.day_a
  UNION ALL
  SELECT p.day_a, b.hv, 0, 1
  FROM pairs p JOIN bot b ON b.event_date = p.day_b
),
uni AS (
  SELECT day_a, hv, max(in_a) AS in_a, max(in_b) AS in_b
  FROM tagged GROUP BY 1, 2
),
ranked AS (
  SELECT day_a, hv, in_a, in_b,
         row_number() OVER (PARTITION BY day_a ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY day_a) AS ucnt
  FROM uni
),
sk AS (
  SELECT day_a,
         CAST(max(CASE WHEN rn = least({_KMV_K}, ucnt) THEN hv END) AS BIGINT) AS hk,
         CAST(least(max(ucnt), {_KMV_K}) AS BIGINT) AS k_used,
         CAST(max(ucnt) AS BIGINT) AS sketch_union_size,
         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS inter_in_sketch
  FROM ranked WHERE rn <= {_KMV_K}
  GROUP BY 1
),
exd AS (SELECT event_date, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
exi AS (
  SELECT p.day_a, CAST(count(*) AS BIGINT) AS exact_inter
  FROM pairs p
  JOIN u a ON a.event_date = p.day_a
  JOIN u b ON b.event_date = p.day_b AND b.user_id = a.user_id
  GROUP BY 1
)
SELECT s.day_a AS event_date,
       p.day_b AS next_date,
       s.k_used,
       {XM.sql_ratio_round('inter_in_sketch', 'k_used', 6)} AS kmv_jaccard,
       round(CASE WHEN s.sketch_union_size < {_KMV_K}
                  THEN CAST(s.sketch_union_size AS DOUBLE)
                  ELSE ({_KMV_K} - 1) * {float(_KMV_R)} / s.hk END, 4) AS kmv_union,
       {XM.sql_ratio_round('COALESCE(exi.exact_inter, 0)',
                           'da.n + db.n - COALESCE(exi.exact_inter, 0)', 6)}
         AS exact_jaccard,
       CAST(da.n + db.n - COALESCE(exi.exact_inter, 0) AS BIGINT) AS exact_union
FROM sk s
JOIN pairs p ON p.day_a = s.day_a
LEFT JOIN exi ON exi.day_a = s.day_a
JOIN exd da ON da.event_date = s.day_a
JOIN exd db ON db.event_date = p.day_b
""",
)
def events_kmv_day_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set ALGEBRA: day-over-day user overlap estimated purely from the
    per-day bottom-64 sketches — union sketch = bottom-k of the two
    sketches' union (a theorem, so persisting one 64-row sketch per day
    lets any pair's Jaccard/union be answered later without touching
    rows), Jaccard = |both-days hashes in the union sketch| / k,
    union-size via the k-th minimum. Exact lanes (distinct-user
    intersection join) are the audit. Under-k unions are exact by
    construction. Complements `sketch_hll_union_monthly` (HLL merges
    forget membership; bottom-k keeps it, which is what intersection
    needs)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "user_id"
    ).distinct()
    h = u.select("event_date", _kmv_hash_spark().alias("hv"))
    wday = Window.partitionBy("event_date").orderBy("hv")
    bot = (
        h.withColumn("rn", F.row_number().over(wday))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_date", "hv")
    )
    days = u.select("event_date").distinct()
    nxt = F.date_format(F.date_add(F.to_date(F.col("event_date")), 1), "yyyy-MM-dd")
    d1, d2 = days.alias("d"), days.alias("n")
    pairs = d1.select(
        F.col("event_date").alias("day_a"), nxt.alias("day_b")
    ).join(d2, F.col("n.event_date") == F.col("day_b")).select("day_a", "day_b")
    ba, bb = bot.alias("ba"), bot.alias("bb")
    tagged = (
        pairs.join(ba, F.col("ba.event_date") == F.col("day_a"))
        .select("day_a", F.col("ba.hv").alias("hv"), F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionAll(
            pairs.join(bb, F.col("bb.event_date") == F.col("day_b")).select(
                "day_a", F.col("bb.hv").alias("hv"), F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
    )
    uni = tagged.groupBy("day_a", "hv").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    wpair = Window.partitionBy("day_a")
    ranked = uni.select(
        "day_a",
        "hv",
        "in_a",
        "in_b",
        F.row_number().over(wpair.orderBy("hv")).alias("rn"),
        F.count(F.lit(1)).over(wpair).alias("ucnt"),
    ).filter(F.col("rn") <= _KMV_K)
    sk = ranked.groupBy("day_a").agg(
        F.max(
            F.when(F.col("rn") == F.least(F.lit(_KMV_K), F.col("ucnt")), F.col("hv"))
        ).cast("bigint").alias("hk"),
        F.least(F.max("ucnt"), F.lit(_KMV_K)).cast("bigint").alias("k_used"),
        F.max("ucnt").cast("bigint").alias("sketch_union_size"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int"))
        .cast("bigint")
        .alias("inter_in_sketch"),
    )
    exd = u.groupBy("event_date").agg(F.count(F.lit(1)).alias("n"))
    ua, ub = u.alias("ua"), u.alias("ub")
    exi = (
        pairs.join(ua, F.col("ua.event_date") == F.col("day_a"))
        .join(
            ub,
            (F.col("ub.event_date") == F.col("day_b"))
            & (F.col("ub.user_id") == F.col("ua.user_id")),
        )
        .groupBy("day_a")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    da, db = exd.alias("da"), exd.alias("db")
    out = (
        sk.join(pairs, "day_a")
        .join(exi, "day_a", "left")
        .join(da, F.col("da.event_date") == F.col("day_a"))
        .join(db, F.col("db.event_date") == F.col("day_b"))
        .select(
            F.col("day_a").alias("event_date"),
            F.col("day_b").alias("next_date"),
            "k_used",
            XM.ratio_round(F.col("inter_in_sketch"), F.col("k_used"), 6).alias("kmv_jaccard"),
            F.round(
                F.when(
                    F.col("sketch_union_size") < _KMV_K,
                    F.col("sketch_union_size").cast("double"),
                ).otherwise(F.lit(float(_KMV_K - 1)) * float(_KMV_R) / F.col("hk")),
                4,
            ).alias("kmv_union"),
            XM.ratio_round(
                F.coalesce(F.col("exact_inter"), F.lit(0)),
                F.col("da.n") + F.col("db.n") - F.coalesce(F.col("exact_inter"), F.lit(0)),
                6,
            ).alias("exact_jaccard"),
            (F.col("da.n") + F.col("db.n") - F.coalesce(F.col("exact_inter"), F.lit(0)))
            .cast("bigint")
            .alias("exact_union"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Brown double-smoothing (Holt-style level + trend) via two exact EWMA passes
# ---------------------------------------------------------------------------


@register(
    "events_holt_linear_daily",
    f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(count(*) AS BIGINT) AS daily_count
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY event_date) AS t
  FROM daily
),
s1 AS (
  SELECT a.event_type, a.event_date, a.t, a.daily_count,
         CAST( (2000000 * sum(CAST(b.daily_count AS HUGEINT)
                              * CAST(pow(2, {_EWMA_HORIZON} - (a.t - b.t)) AS BIGINT))
                + sum(CAST(pow(2, {_EWMA_HORIZON} - (a.t - b.t)) AS BIGINT)))
               // (2 * sum(CAST(pow(2, {_EWMA_HORIZON} - (a.t - b.t)) AS BIGINT)))
              AS BIGINT) AS s1_micro
  FROM idx a JOIN idx b
    ON b.event_type = a.event_type
   AND b.t BETWEEN a.t - {_EWMA_HORIZON} AND a.t
  GROUP BY 1, 2, 3, 4
),
s2 AS (
  SELECT a.event_type, a.event_date, a.daily_count, a.s1_micro,
         sum(CAST(b.s1_micro AS HUGEINT)
             * CAST(pow(2, {_EWMA_HORIZON} - (a.t - b.t)) AS BIGINT)) AS num2_q,
         sum(CAST(pow(2, {_EWMA_HORIZON} - (a.t - b.t)) AS BIGINT)) AS den2_q
  FROM s1 a JOIN s1 b
    ON b.event_type = a.event_type
   AND b.t BETWEEN a.t - {_EWMA_HORIZON} AND a.t
  GROUP BY 1, 2, 3, 4
),
s3 AS (
  SELECT event_type, event_date, daily_count, s1_micro, num2_q, den2_q,
         CAST((2 * num2_q + den2_q) // (2 * den2_q) AS BIGINT) AS s2_micro
  FROM s2
)
SELECT event_type, event_date, daily_count,
       {XM.sql_ratio_round('s1_micro', '1000000', 4)} AS s_single,
       {XM.sql_ratio_round('num2_q', 'den2_q * 1000000', 4)} AS s_double,
       {XM.sql_ratio_round('2 * s1_micro - s2_micro', '1000000', 4)} AS level,
       {XM.sql_ratio_round('s1_micro - s2_micro', '1000000', 4)} AS trend,
       {XM.sql_ratio_round('3 * s1_micro - 2 * s2_micro', '1000000', 4)} AS forecast_next
FROM s3
""",
)
def events_holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown double exponential smoothing (alpha = 1/2) over daily counts
    per type: S' = EWMA(x), S'' = EWMA(S'), level = 2S' - S'', trend =
    (alpha/(1-alpha))(S' - S'') = S' - S'', one-step forecast = level +
    trend — the linear-trend forecaster the seasonal-naive MASE entry
    lacks. Numerics: pass 1 quantizes S' to integer MICRO units (exact
    half-up ratio) so pass 2's weighted sum is again an order-free
    integer accumulation in decimal(38,0)/HUGEINT — no float addition
    between passes (1e10-count days: s1_micro ~ 1e16, x 2^30 x 31 terms
    ~ 3e26, inside decimal(38,0)). Both band self-joins run AFTER the
    calendar collapse, exactly as `events_ewma_daily`."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    ).agg(F.count(F.lit(1)).alias("daily_count"))
    idx = daily.withColumn(
        "t", F.row_number().over(Window.partitionBy("event_type").orderBy("event_date"))
    )

    def _band_sum(df, val_col: str, out_num: str, out_den: str):
        a, b = df.alias("a"), df.alias("b")
        d = F.col("a.t") - F.col("b.t")
        w = F.pow(F.lit(2.0), _EWMA_HORIZON - d).cast("bigint")
        keep = [F.col(f"a.{c}").alias(c) for c in df.columns]
        return (
            a.join(
                b,
                (F.col("b.event_type") == F.col("a.event_type"))
                & (F.col("b.t") >= F.col("a.t") - _EWMA_HORIZON)
                & (F.col("b.t") <= F.col("a.t")),
            )
            .groupBy(*keep)
            .agg(
                # decimal-first multiply — BIGINT val * 2^30 wraps past int64
                # at the scales the docstring claims (r9 ADVICE; the oracle's
                # HUGEINT multiply never wraps, so parity can't catch it).
                F.sum(F.col(f"b.{val_col}").cast("decimal(38,0)") * w).alias(out_num),
                F.sum(w).alias(out_den),
            )
        )

    s1 = _band_sum(idx, "daily_count", "num1_q", "den1_q").select(
        "event_type",
        "event_date",
        "t",
        "daily_count",
        # exact half-up micro quantization: (2e6*num + den) div (2*den)
        F.expr(
            "CAST((2000000 * num1_q + den1_q) div (2 * CAST(den1_q AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("s1_micro"),
    )
    s2 = _band_sum(s1, "s1_micro", "num2_q", "den2_q")
    # quantize S'' to integer micro FIRST (exact half-up), then every output
    # rides XM.ratio_round — round(int/1e6, 4) via plain double division
    # diverges between engines on exact .5 boundaries (hit at sf0.01).
    s3 = s2.withColumn(
        "s2_micro",
        F.expr("CAST((2 * num2_q + den2_q) div (2 * CAST(den2_q AS DECIMAL(38,0))) AS BIGINT)"),
    )
    mega = F.lit(1000000)
    return s3.select(
        "event_type",
        "event_date",
        "daily_count",
        XM.ratio_round(F.col("s1_micro"), mega, 4).alias("s_single"),
        XM.ratio_round(F.col("num2_q"), F.col("den2_q") * 1000000, 4).alias("s_double"),
        XM.ratio_round(2 * F.col("s1_micro") - F.col("s2_micro"), mega, 4).alias("level"),
        XM.ratio_round(F.col("s1_micro") - F.col("s2_micro"), mega, 4).alias("trend"),
        XM.ratio_round(3 * F.col("s1_micro") - 2 * F.col("s2_micro"), mega, 4).alias(
            "forecast_next"
        ),
    )


# ---------------------------------------------------------------------------
# Bandit posterior allocation over order-priority arms
# ---------------------------------------------------------------------------


@register(
    "orders_bandit_allocation",
    f"""
WITH arms AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_trials,
         CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_success
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM orders),
post AS (
  SELECT a.*, t.n_total,
         {XM.sql_ratio_round('1 + n_success', '2 + n_trials', 6)} AS posterior_mean,
         round(CAST(n_success AS DOUBLE) / n_trials
               + sqrt(2.0 * ln(CAST(n_total AS DOUBLE)) / n_trials), 6) AS ucb1
  FROM arms a CROSS JOIN tot t
),
ppm AS (
  SELECT *, CAST(floor(posterior_mean * 1000000 + 0.5) AS BIGINT) AS pm_ppm
  FROM post
)
SELECT o_orderpriority, n_trials, n_success, posterior_mean, ucb1,
       {XM.sql_ratio_round('pm_ppm', 'sum(pm_ppm) OVER ()', 6)} AS thompson_share
FROM ppm
""",
)
def orders_bandit_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-armed-bandit allocation summary over order-priority arms
    (success = order reached status 'F'): Beta(1+s, 1+f) posterior mean
    (exact half-up integer ratio), UCB1 index (sqrt/ln are IEEE-identical
    across engines on identical integer inputs), and a Thompson-style
    allocation share — posterior means are quantized to integer ppm FIRST
    so the normalizing sum is an order-free integer window sum, never a
    float accumulation. Data-mixture allocation twin of
    `corpus_temperature_mix`. One partial-agg shuffle to 5 arm rows; the
    1-row total broadcasts (bounded scalar). The partition-less
    share-normalizing window runs over the per-ARM aggregate — the
    order-priority alphabet (5 rows at any corpus size), the documented
    bounded-input exception in test_plans' global-window gate."""
    o = load_table(spark, sf_dir, "orders")
    arms = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_trials"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_success"),
    )
    tot = o.agg(F.count(F.lit(1)).alias("n_total"))
    post = arms.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "n_trials",
        "n_success",
        XM.ratio_round(1 + F.col("n_success"), 2 + F.col("n_trials"), 6).alias(
            "posterior_mean"
        ),
        F.round(
            F.col("n_success").cast("double") / F.col("n_trials")
            + F.sqrt(2.0 * F.log(F.col("n_total").cast("double")) / F.col("n_trials")),
            6,
        ).alias("ucb1"),
    )
    ppm = post.withColumn(
        "pm_ppm", F.floor(F.col("posterior_mean") * 1000000 + 0.5).cast("bigint")
    )
    return ppm.select(
        "o_orderpriority",
        "n_trials",
        "n_success",
        "posterior_mean",
        "ucb1",
        XM.ratio_round(F.col("pm_ppm"), F.sum("pm_ppm").over(Window.partitionBy()), 6).alias(
            "thompson_share"
        ),
    )


# ---------------------------------------------------------------------------
# AMS / Tug-of-War second frequency moment (F2) sketch
# ---------------------------------------------------------------------------

_AMS_M = 64       # estimators
_AMS_GROUP = 8    # mean group size; median over _AMS_M/_AMS_GROUP = 8 means

#: +1/-1 sign for (estimator j, user u): first hex digit of an md5 over the
#: salted pair — byte-identical cross-engine (the HLL lane's derivation) and
#: independent of the day, so per-day counters stay mergeable across any
#: partitioning of the SAME stream.
_AMS_SIGN_SPARK = (
    "CASE WHEN substring(md5(concat('ams|', CAST(j AS STRING), '|', "
    "CAST(user_id AS STRING))), 1, 1) IN "
    "('0','1','2','3','4','5','6','7') THEN fu ELSE -fu END"
)
_AMS_SIGN_DUCK = (
    "CASE WHEN substring(md5('ams|' || CAST(j AS VARCHAR) || '|' || "
    "CAST(user_id AS VARCHAR)), 1, 1) IN "
    "('0','1','2','3','4','5','6','7') THEN fu ELSE -fu END"
)


@register(
    "sketch_ams_f2_daily",
    f"""
WITH f AS MATERIALIZED (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date, user_id,
         CAST(count(*) AS BIGINT) AS fu
  FROM events GROUP BY 1, 2
),
fan AS (
  SELECT event_date, user_id, fu, j
  FROM f, (SELECT unnest(range(0, {_AMS_M})) AS j)
),
c AS MATERIALIZED (
  SELECT event_date, j, sum({_AMS_SIGN_DUCK}) AS c
  FROM fan GROUP BY 1, 2
),
g AS (
  SELECT event_date, j // {_AMS_GROUP} AS grp,
         sum(CAST(c AS HUGEINT) * c) // {_AMS_GROUP} AS gm
  FROM c GROUP BY 1, 2
),
med AS (
  SELECT event_date, gm AS est
  FROM (SELECT event_date, gm,
               row_number() OVER (PARTITION BY event_date ORDER BY gm, grp) AS rn
        FROM g)
  WHERE rn = {_AMS_M // _AMS_GROUP // 2}
),
ex AS (
  SELECT event_date, sum(CAST(fu AS HUGEINT) * fu) AS f2
  FROM f GROUP BY 1
)
SELECT m.event_date, CAST(ex.f2 AS BIGINT) AS exact_f2,
       CAST(m.est AS BIGINT) AS ams_estimate,
       CAST((abs(m.est - ex.f2) * 1000000) // ex.f2 AS BIGINT) AS err_ppm,
       (abs(m.est - ex.f2) * 2 <= ex.f2) AS within_50pct
FROM med m JOIN ex ON ex.event_date = m.event_date
""",
)
def sketch_ams_f2_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS / Tug-of-War sketch (Alon-Matias-Szegedy) for the second
    frequency moment F2 = Σ f_u² of daily user activity — the skew/self-join
    -size signal, and the classic sketch family's last missing member here
    (HLL = distinct, KMV = distinct algebra, CMS = point frequency,
    Misra-Gries = top-k, Bloom = membership, histogram = quantiles, AMS =
    moments). Per estimator j, counter c_j = Σ_u sign_j(u)·f_u with
    md5-derived ±1 signs (byte-identical cross-engine, day-independent);
    E[c_j²] = F2 exactly. The estimate is the house discrete LOWER MEDIAN
    of {_AMS_M // _AMS_GROUP} group means of c_j² ({_AMS_GROUP} per group,
    truncating div) — all exact integers end to end, so the whole register
    trajectory is value-hash-checked like the HLL lane, not just a bound.

    Scale shape: the only per-row work is a codegen'd ×{_AMS_M} generator
    fan-out feeding a (day, j) hash aggregate — map-side partials mean the
    shuffle carries ≤ partitions × days × {_AMS_M} counter rows, never the
    fan-out; counters are SUMS, so per-executor partial sketches merge by
    addition (the mergeable state a 1000-executor rollup unions — pinned by
    the merge-≡-bulk unit). c_j² accumulates in decimal(38,0)/HUGEINT with
    the operand widened BEFORE the multiply (r9 ADVICE rule); int64 output
    domain: |c| ≤ day volume, so exact_f2/ams_estimate fit BIGINT to ~3e9
    events/day — past that the output unit must coarsen (documented
    contract, same class as the KMV estimator-range note)."""
    ev = load_table(spark, sf_dir, "events")
    f = (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "user_id")
        .groupBy("event_date", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("fu"))
    )
    fan = f.select(
        "event_date",
        "user_id",
        "fu",
        F.explode(F.sequence(F.lit(0), F.lit(_AMS_M - 1))).alias("j"),
    )
    c = fan.groupBy("event_date", "j").agg(F.expr(f"sum({_AMS_SIGN_SPARK})").alias("c"))
    g = c.groupBy("event_date", F.expr(f"j div {_AMS_GROUP}").alias("grp")).agg(
        F.expr(f"sum(CAST(c AS DECIMAL(38,0)) * c) div {_AMS_GROUP}").alias("gm")
    )
    w = Window.partitionBy("event_date").orderBy("gm", "grp")
    med = (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _AMS_M // _AMS_GROUP // 2)
        .select("event_date", F.col("gm").alias("est"))
    )
    ex = f.groupBy("event_date").agg(
        F.expr("sum(CAST(fu AS DECIMAL(38,0)) * fu)").alias("f2")
    )
    return med.join(ex, "event_date").select(
        "event_date",
        F.col("f2").cast("long").alias("exact_f2"),
        F.col("est").cast("long").alias("ams_estimate"),
        F.expr("CAST((abs(est - f2) * 1000000) div f2 AS BIGINT)").alias("err_ppm"),
        (F.expr("abs(est - f2) * 2") <= F.col("f2")).alias("within_50pct"),
    )
