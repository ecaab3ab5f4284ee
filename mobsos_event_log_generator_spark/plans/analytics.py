"""Relational analytics coverage: the "full engine" operator classes the
reference lacks but a complete engine must expose (SURVEY.md §2.5 — joins,
windows, grouping sets, set ops, distinct aggs, top-k). All built-in DataFrame
API so Catalyst picks physical strategies (broadcast-hash for dims, sort-merge
for fact-fact, partial aggregation map-side).

Scale notes baked into each query:
* dims (region/nation/supplier/customer) are broadcast — verified in tests.
* fact aggregations run map-side partial first (HashAggregate x2 in plan).
* top-k is window + filter (no driver-side sort); deterministic tie-breaks on
  a key column so results are stable under any parallelism.
* double sums are rounded to 2 decimals in BOTH engines (fp addition isn't
  associative across partitionings; cents-rounding makes the hash stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mobsos_event_log_generator_spark.operators import exactmath as XM
from mobsos_event_log_generator_spark.plans.queries import register
from mobsos_event_log_generator_spark.sources.parquet import load_table


@register(
    "tpch_q1_pricing_summary",
    f"""
WITH u AS (
  SELECT l_returnflag, l_linestatus,
         sum({XM.sql_int_units('l_quantity', 0)}) AS qty_u,
         sum({XM.sql_int_units('l_extendedprice', 2)}) AS ep_u,
         sum({XM.sql_int_units('l_discount', 2)}) AS disc_u,
         sum({XM.sql_int_units('l_extendedprice * (1 - l_discount)', 4)}) AS dp_u,
         sum({XM.sql_int_units('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}) AS ch_u,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       {XM.sql_sum_round("qty_u", 2, in_scale=0)} AS sum_qty,
       {XM.sql_sum_round("ep_u", 2, in_scale=2)} AS sum_base_price,
       {XM.sql_sum_round("dp_u", 2, in_scale=4)} AS sum_disc_price,
       {XM.sql_sum_round("ch_u", 2, in_scale=6)} AS sum_charge,
       {XM.sql_mean_round("qty_u", "n", 4, in_scale=0)} AS avg_qty,
       {XM.sql_mean_round("ep_u", "n", 4, in_scale=2)} AS avg_price,
       {XM.sql_mean_round("disc_u", "n", 4, in_scale=2)} AS avg_disc,
       n AS count_order
FROM u
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate; partial agg combines map-side so
    the shuffle carries ~|groups| rows, not |lineitem|. Every output derives
    from exact integer-unit sums (operators/exactmath.py): each input column
    is summed ONCE at its minimal scale and both the rounded sum and the
    4-dp mean reuse that sum, so float-summation order can never flip a
    rounded digit at any SF. Per-column accumulator choice: quantity
    (scale 0) / cents (scale 2) sums provably fit 63 bits at sf100k and use
    the codegen long fast path; the whole-table-group 4-dp disc-price and
    6-dp charge sums cross 2^63 near the design scale, so they ride the
    hi/lo SPLIT SUM (XM.split_hi/split_lo: two long sums per quantity,
    recombined exactly post-agg — the long fast path without the wrap
    hazard; ceilings in the split_hi docstring clear sf100k by 10x).
    Exactness is the point of q1's contract, and a wrapped long would be
    silently wrong; the earlier wide-DECIMAL accumulators were the exact
    but ~2x-slower alternative (r11 A/B in BASELINE.md)."""
    li = load_table(spark, sf_dir, "lineitem")
    dp_u = XM.int_units_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    ch_u = XM.int_units_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
    )
    u = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(XM.int_units_long(F.col("l_quantity"), 0)).alias("qty_u"),
            F.sum(XM.int_units_long(F.col("l_extendedprice"), 2)).alias("ep_u"),
            F.sum(XM.int_units_long(F.col("l_discount"), 2)).alias("disc_u"),
            F.sum(XM.split_hi(dp_u)).alias("dp_hi"),
            F.sum(XM.split_lo(dp_u)).alias("dp_lo"),
            F.sum(XM.split_hi(ch_u)).alias("ch_hi"),
            F.sum(XM.split_lo(ch_u)).alias("ch_lo"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumns(
            {
                "dp_u": XM.recombine_split(F.col("dp_hi"), F.col("dp_lo")),
                "ch_u": XM.recombine_split(F.col("ch_hi"), F.col("ch_lo")),
            }
        )
    )
    return u.select(
        "l_returnflag",
        "l_linestatus",
        XM.sum_round(F.col("qty_u"), 2, in_scale=0).alias("sum_qty"),
        XM.sum_round(F.col("ep_u"), 2, in_scale=2).alias("sum_base_price"),
        XM.sum_round(F.col("dp_u"), 2, in_scale=4).alias("sum_disc_price"),
        XM.sum_round(F.col("ch_u"), 2, in_scale=6).alias("sum_charge"),
        XM.mean_round(F.col("qty_u"), F.col("n"), 4, in_scale=0).alias("avg_qty"),
        XM.mean_round(F.col("ep_u"), F.col("n"), 4, in_scale=2).alias("avg_price"),
        XM.mean_round(F.col("disc_u"), F.col("n"), 4, in_scale=2).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    f"""
WITH rev AS (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         {XM.sql_sum_round(f"sum({XM.sql_int_units('l.l_extendedprice * (1 - l.l_discount)', 4)})", 2, in_scale=4)} AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2, 3
)
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority, revenue
FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS rn FROM rev)
WHERE rn <= 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim (customer segment) broadcast into a
    fact-fact join, then deterministic top-10 via window (no driver sort)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(XM.sum_round(F.sum(XM.int_units_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)), 2, in_scale=4).alias("revenue"))
    )
    # Deterministic global top-10: orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition top-k, then merge of k-sized heaps)
    # — never a single-partition global window sort.
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority", "revenue")
    )


@register(
    "tpch_q5_local_supplier",
    f"""
SELECT n.n_name AS nation,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('l.l_extendedprice * (1 - l.l_discount)')})", 2)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; region/nation/supplier broadcast, the
    customer-orders-lineitem chain shuffles on its join keys once each."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(XM.sum_round(F.sum(XM.int_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2).alias("revenue"))
    )


@register(
    "window_top_orders_per_customer",
    """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, rn
FROM (
  SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
         CAST(row_number() OVER (PARTITION BY c.c_custkey
                                 ORDER BY o.o_totalprice DESC, o.o_orderkey) AS BIGINT) AS rn
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
)
WHERE rn <= 2
""",
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: per-group top-k with deterministic tie-break. The
    window partitioning reuses the join's hash partitioning on c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 2)
    )


@register(
    "rollup_order_priority",
    f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('o_totalprice', 2)})", 2, in_scale=2)} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / rollup: hierarchical totals in one pass (Spark expands
    to a single Expand + aggregate — no N re-scans)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        XM.sum_round(F.sum(XM.int_units_long(F.col("o_totalprice"), 2)), 2, in_scale=2).alias("total_price"),
    )


@register(
    "distinct_agg_customers",
    """
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1
""",
)
def distinct_agg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expands to two-phase agg under AQE)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "setop_urgent_not_low",
    """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
""",
)
def setop_urgent_not_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: INTERSECT / EXCEPT (distinct semantics), compiled to
    left-semi / left-anti hash joins."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(open_).exceptAll(low.distinct())


@register(
    "antijoin_parts_never_shipped",
    """
SELECT p.p_partkey, p.p_name
FROM part p
ANTI JOIN (SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00') l
  ON p.p_partkey = l.l_partkey
""",
)
def antijoin_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS shape): parts with no shipments since 2001."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_name")


@register(
    "events_sessionization",
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
         sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
FROM sess
GROUP BY 1, 2
""",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the batch analogue of the streaming session_window (SURVEY.md §7 step 5).
    One shuffle on user_id shared by both window functions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("is_new_session", is_new).withColumn(
        "session_id",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
    )


@register(
    "events_daily_histogram",
    f"""
SELECT strftime(ts, '%Y-%m-%d') AS event_date,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('value', 2)})", 2, in_scale=2)} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_daily_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 date bucketing + grouped agg: the day-granularity activity histogram
    (date_format is the strftime('%Y-%m-%d') analogue, event_reader.py:27-29)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        XM.sum_round(F.sum(XM.int_units_long(F.col("value"), 2)), 2, in_scale=2).alias("total_value"),
    )


@register(
    "subquery_parts_above_brand_avg",
    """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
""",
)
def subquery_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL front end — Catalyst
    decorrelates it into an aggregate + join (the rewrite class the reference
    could never express). Uses spark.sql to exercise the SQL API surface.
    Comparison against a raw avg is fp-safe here: a value can only sit ON the
    group mean when every group member is identical, in which case it is not
    strictly greater in either engine."""
    from mobsos_event_log_generator_spark.sources.parquet import register_temp_views

    register_temp_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part p
        WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
        """
    )


@register(
    "subquery_exists_multi_supplier_orders",
    """
SELECT o_orderkey, o_orderpriority
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey
  HAVING count(DISTINCT l.l_suppkey) >= 3
)
""",
)
def subquery_exists_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS subquery with aggregation (orders touching >= 3 suppliers) —
    compiles to an aggregate + left-semi join."""
    from mobsos_event_log_generator_spark.sources.parquet import register_temp_views

    register_temp_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
          GROUP BY l.l_orderkey
          HAVING count(DISTINCT l.l_suppkey) >= 3
        )
        """
    )


@register(
    "tpch_q18_large_orders",
    f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('l.l_quantity', 0)})", 2, in_scale=0)} AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN big ON big.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4, 5
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-on-sum semi-filter (the 'big orders' set) fed
    back into a fact join — aggregate-then-semi-join, all one shuffle chain
    on l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 150).select("l_orderkey")
    return (
        li.join(big, "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(XM.sum_round(F.sum(XM.int_units_long(F.col("l_quantity"), 0)), 2, in_scale=0).alias("total_qty"))
    )


@register(
    "window_cumulative_customer_revenue",
    f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('o_totalprice', 2)}) OVER w", 2, in_scale=2)} AS cum_revenue,
       round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER w, 2) AS delta_vs_prev,
       CAST(row_number() OVER w AS BIGINT) AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def window_cumulative_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame breadth: running sum + lag with default + sequence number
    over one shared window spec (single shuffle on the partition key)."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(W.unboundedPreceding, W.currentRow)
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        XM.sum_round(F.sum(XM.int_units_long(F.col("o_totalprice"), 2)).over(w), 2, in_scale=2).alias("cum_revenue"),
        F.round(F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(wo), 2).alias("delta_vs_prev"),
        F.row_number().over(wo).cast("long").alias("order_seq"),
    )


@register(
    "median_price_by_priority",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY 1
""",
)
def median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles — Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition, so the rounded
    values hash-match."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "pivot_user_event_matrix",
    """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
FROM events
GROUP BY 1
""",
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix via groupBy().pivot() with an
    explicit value list (no extra distinct-values job; one aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .fillna(0)
    )


@register(
    "sketch_distinct_users_daily",
    """
SELECT strftime(ts, '%Y-%m-%d') AS event_date,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(count(*) AS BIGINT) AS n_events,
       TRUE AS within_bound
FROM events
GROUP BY 1
""",
)
def sketch_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch surface: HyperLogLog++ approximate distinct users per day
    (rsd 2%). Raw estimates are implementation-specific (DuckDB cannot
    reproduce Spark's HLL registers), so the emitted report is the
    DETERMINISTIC part: the exact count plus a ``within_bound`` flag
    asserting |approx − exact| / exact ≤ 10 %. The oracle recomputes the
    exact counts and expects every flag TRUE — turning the error bound
    itself into the hash-checked contract (the unit test additionally
    bounds the raw estimates)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_date",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(0.10)
            ).alias("within_bound"),
        )
    )


@register(
    "cube_status_priority",
    f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {XM.sql_mean_round(f"sum({XM.sql_int_units('o_totalprice', 2)})", "count(*)", 4, in_scale=2)} AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all 2^k subtotal combinations in one Expand +
    aggregate pass (complements the ROLLUP query)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        XM.mean_round(F.sum(XM.int_units_long(F.col("o_totalprice"), 2)), F.count(F.lit(1)), 4, in_scale=2).alias(
            "avg_price"
        ),
    )


@register(
    "tpch_q6_forecast_revenue",
    f"""
SELECT {XM.sql_sum_round(f"sum({XM.sql_int_units('l_extendedprice * l_discount', 4)})", 2, in_scale=4)} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-aggregate. Every predicate is a parquet
    pushdown (`PushedFilters` on shipdate/discount/quantity), the projection
    prunes to 4 columns, and the agg is a map-side partial + 1-row merge —
    zero shuffle of data rows. The plan-shape canary for scan efficiency."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        XM.sum_round(
            F.sum(XM.int_units(F.col("l_extendedprice") * F.col("l_discount"), 4)), 2, in_scale=4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q4_order_priority",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
""",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join — lineitem is
    never widened into the output, each order contributes once regardless of
    match multiplicity, and the non-equi part (l_shipdate > o_orderdate)
    rides on the semi-join condition."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q10_returned_items",
    f"""
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name AS nation,
         {XM.sql_sum_round(f"sum({XM.sql_int_units('l.l_extendedprice * (1 - l.l_discount)', 4)})", 2, in_scale=4)} AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    AND l.l_returnflag = 'R'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, nation, revenue
FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rn FROM rev)
WHERE rn <= 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-fact join filtered on both sides, broadcast dim
    enrichment, then deterministic top-20 by aggregated revenue via
    TakeOrderedAndProject (ties broken on custkey AFTER cent-rounding so both
    engines rank identically)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(XM.sum_round(F.sum(XM.int_units_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)), 2, in_scale=4).alias("revenue"))
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "nation", "revenue")
    )


@register(
    "tpch_q14_promo_revenue",
    f"""
WITH sums AS (
  SELECT {XM.sql_sum_round("sum(" + XM.sql_int_units("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END") + ")", 2)} AS promo_rev,
         {XM.sql_sum_round(f"sum({XM.sql_int_units('l.l_extendedprice * (1 - l.l_discount)')})", 2)} AS total_rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
)
SELECT promo_rev, total_rev,
       {XM.sql_ratio_round('100 * ' + XM.sql_int_units('promo_rev', 2), XM.sql_int_units('total_rev', 2), 6)} AS promo_pct
FROM sums
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside sum) over a
    broadcast part join — one pass computes both the filtered and total sums;
    the ratio is taken on the cent-rounded sums so it is bit-stable across
    partitionings and engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sums = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            XM.sum_round(F.sum(XM.int_units(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))), 2).alias("promo_rev"),
            XM.sum_round(F.sum(XM.int_units(rev)), 2).alias("total_rev"),
        )
    )
    return sums.select(
        "promo_rev",
        "total_rev",
        XM.ratio_round(
            F.lit(100) * XM.int_units_long(F.col("promo_rev"), 2),
            XM.int_units_long(F.col("total_rev"), 2),
            6,
        ).alias("promo_pct"),
    )


@register(
    "tpch_q19_disjunctive_revenue",
    f"""
SELECT {XM.sql_sum_round(f"sum({XM.sql_int_units('l.l_extendedprice * (1 - l.l_discount)')})", 2)} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 35)
""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate. Catalyst extracts the
    common p_partkey equi-key so the join stays hash-based (broadcast here),
    with the disjunction evaluated as a residual filter; the per-side
    conjuncts (p_brand/p_size on part, l_quantity on lineitem) are pushed
    beneath the join by CNF conversion where derivable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 35))
    )
    return joined.filter(cond).agg(
        XM.sum_round(F.sum(XM.int_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q7_nation_volume",
    f"""
SELECT supp_nation, cust_nation, l_year,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('volume')})", 2)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the same dimension table joined TWICE
    under different roles (supplier nation vs customer nation) with a
    disjunctive cross-role predicate. Both nation sides broadcast; the
    fact-fact joins (lineitem-orders-customer) stay shuffled on their keys;
    year bucketing happens after the joins on the surviving rows only."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(
            XM.sum_round(F.sum(XM.int_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2).alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       {XM.sql_sum_round("sum(" + XM.sql_int_units("CASE WHEN n2.n_name = 'NATION_7' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END") + ")", 2)} AS nation_rev,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('l.l_extendedprice * (1 - l.l_discount)')})", 2)} AS total_rev,
       {XM.sql_ratio_round(XM.sql_int_units("nation_rev", 2), XM.sql_int_units("total_rev", 2), 6)} AS mkt_share
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE p.p_type = 'ECONOMY'
  AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY 1
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): an 8-table join where one
    nation role routes through region for a geographic filter and the other
    provides the share predicate inside a conditional sum — the share is a
    ratio of two aggregates computed in ONE pass (no second scan or
    self-join). Ratio is taken on cent-rounded sums for cross-engine
    stability."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    agged = joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        XM.sum_round(F.sum(XM.int_units(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0.0)))), 2).alias(
            "nation_rev"
        ),
        XM.sum_round(F.sum(XM.int_units(rev)), 2).alias("total_rev"),
    )
    return agged.select(
        "o_year",
        "nation_rev",
        "total_rev",
        XM.ratio_round(
            XM.int_units_long(F.col("nation_rev"), 2),
            XM.int_units_long(F.col("total_rev"), 2),
            6,
        ).alias("mkt_share"),
    )


@register(
    "tpch_q13_customer_distribution",
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): outer join whose
    RIGHT-side filter rides on the join condition (so unmatched customers
    survive with count 0 — pushing it into a WHERE would silently turn the
    join inner), followed by a two-level aggregation: per-customer order
    count, then the histogram of those counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q17_small_quantity_revenue",
    f"""
SELECT {XM.sql_mean_round(f"sum({XM.sql_int_units('l.l_extendedprice', 2)})", "7", 2, in_scale=2)} AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < (SELECT {XM.sql_mean_round('sum(CAST(l2.l_quantity AS BIGINT))',
                                                '5 * count(*)', 6, in_scale=0)}
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): a correlated scalar AVG
    subquery, hand-decorrelated to a per-partkey aggregate joined back to the
    fact — the rewrite Catalyst itself applies to the SQL form (the oracle
    keeps the correlated form, so the gate proves the equivalence). The brand
    filter semi-restricts the fact FIRST, so the avg aggregate runs over the
    surviving parts' lineitems only, never the full table. Threshold rounded
    to 6 dp on both engines before the comparison."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = load_table(spark, sf_dir, "lineitem")
    li_brand = li.join(p, li.l_partkey == p.p_partkey)
    # round(0.2*avg(qty), 6) = round(sum/(5n), 6): exact half-up integer
    # form — the threshold flips row MEMBERSHIP, so a midpoint float flip
    # changes the revenue output, not just a displayed digit.
    thresh = li_brand.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        XM.mean_round(
            F.sum(F.col("l_quantity").cast("long")), F.lit(5) * F.count(F.lit(1)), 6, in_scale=0
        ).alias("qty_thresh")
    )
    return (
        li_brand.join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(XM.mean_round(F.sum(XM.int_units_long(F.col("l_extendedprice"), 2)), F.lit(7), 2, in_scale=2).alias("avg_yearly"))
    )


@register(
    "tpch_q21_waiting_suppliers",
    """
SELECT s_name, numwait FROM (
  SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
  FROM supplier s
  JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey AND l1.l_returnflag = 'R'
  JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
  JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
  GROUP BY s.s_name
)
QUALIFY row_number() OVER (ORDER BY numwait DESC, s_name) <= 5
""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-fault supplier): the same fact referenced three
    times — base scan, EXISTS (left SEMI self-join: some OTHER supplier in
    the order), NOT EXISTS (left ANTI self-join: no other supplier also
    returned) — both correlations carrying a non-equi conjunct. Adapted to
    this schema: 'returned item in a finalized order' replaces the
    receipt-after-commit predicate (reference columns absent). Top-5 with
    s_name tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    base = (
        l1.join(s, F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l1.l_orderkey") == F.col("o_orderkey"))
    )
    got_peer = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    sole_fault = got_peer.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    counts = sole_fault.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
    return counts.orderBy(F.col("numwait").desc(), F.col("s_name")).limit(5)


@register(
    "tpch_q22_dormant_customers",
    f"""
WITH avg_bal AS (
  SELECT {XM.sql_mean_round(f"sum({XM.sql_int_units('c_acctbal', 2)})", "count(*)", 6, in_scale=2)} AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey AS cntrykey,
       CAST(count(*) AS BIGINT) AS numcust,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('c.c_acctbal', 2)})", 2, in_scale=2)} AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND c.c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-07-01 00:00:00')
GROUP BY c.c_nationkey
""",
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): an uncorrelated scalar
    aggregate (global average balance, broadcast as a 1-row cross join)
    gating the base scan, plus a NOT EXISTS against orders expressed as a
    left ANTI join. Adapted to this schema: nation-key IN-list replaces the
    phone-prefix codes and the dormancy window replaces 'no orders ever'
    (every sf0.01 customer has at least one order). Anti-join side is
    pre-filtered to the window, so the join input is a fraction of orders."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6)
    )
    avg_bal = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            XM.mean_round(F.sum(XM.int_units_long(F.col("c_acctbal"), 2)), F.count(F.lit(1)), 6, in_scale=2).alias(
                "ab"
            )
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-07-01 00:00:00").cast("timestamp")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    dormant = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return dormant.groupBy(F.col("c_nationkey").alias("cntrykey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        XM.sum_round(F.sum(XM.int_units_long(F.col("c_acctbal"), 2)), 2, in_scale=2).alias("totacctbal"),
    )


@register(
    "tpch_q2_cheapest_supplier",
    """
SELECT p.p_partkey, l.l_suppkey, l.l_extendedprice AS price
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
)
def tpch_q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): a correlated scalar MIN
    subquery selecting the row(s) that attain a per-group aggregate —
    decorrelated to a per-partkey min joined back on equality (ties keep all
    attaining rows, identically in both engines since the compared doubles
    are raw stored values, never arithmetic). The brand filter semi-restricts
    the fact before the aggregate, as in q17."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    li = load_table(spark, sf_dir, "lineitem")
    li_brand = li.join(p, li.l_partkey == p.p_partkey)
    mins = li_brand.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li_brand.join(
            mins,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("p_partkey", "l_suppkey", F.col("l_extendedprice").alias("price"))
    )


@register(
    "tpch_q15_top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey, {XM.sql_sum_round(f"sum({XM.sql_int_units('l_extendedprice * (1 - l_discount)', 4)})", 2, in_scale=4)} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): an aggregated view consumed twice —
    once as the join input and once reduced to a scalar MAX that gates it
    (the classic view + scalar-subquery-on-same-view pattern). The 1-row max
    is broadcast; ties would all survive, deterministically, because the
    compared revenues are cent-rounded before MAX and equality."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        XM.sum_round(F.sum(XM.int_units_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)), 2, in_scale=4).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "quality_constraints_events",
    """
WITH a AS (
  SELECT CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS r0,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r1,
         CAST(sum(CASE WHEN event_type IS NULL
                       OR event_type NOT IN ('click', 'view', 'purchase') THEN 1 ELSE 0 END) AS BIGINT) AS r2,
         CAST(sum(CASE WHEN ts IS NOT NULL AND NOT (ts BETWEEN TIMESTAMP '2024-01-01 00:00:00'
                                                           AND TIMESTAMP '2024-01-15 23:59:59') THEN 1 ELSE 0 END) AS BIGINT) AS r3,
         CAST(sum(CASE WHEN value IS NOT NULL AND NOT (value BETWEEN 0.0 AND 100.0) THEN 1 ELSE 0 END) AS BIGINT) AS r4
  FROM events
)
SELECT 'unique:event_id' AS rule, r0 AS n_violations FROM a
UNION ALL SELECT 'not_null:user_id', r1 FROM a
UNION ALL SELECT 'domain:event_type', r2 FROM a
UNION ALL SELECT 'range:ts', r3 FROM a
UNION ALL SELECT 'range:value', r4 FROM a
""",
)
def quality_constraints_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report over the events stream: uniqueness,
    nullability, value-domain, and range rules — all compiled into ONE
    aggregation pass (conditional sums + a distinct-count delta), then
    unpivoted to (rule, n_violations). The pre-training pre-flight gate."""
    from mobsos_event_log_generator_spark.operators import validate as V

    ev = load_table(spark, sf_dir, "events")
    return V.check_constraints(
        ev,
        {
            "unique:event_id": V.unique("event_id"),
            "not_null:user_id": V.not_null("user_id"),
            "domain:event_type": V.in_set("event_type", ("click", "view", "purchase")),
            "range:ts": V.in_range(
                "ts",
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-15 23:59:59").cast("timestamp"),
            ),
            "range:value": V.in_range("value", 0.0, 100.0),
        },
    )


@register(
    "window_rank_functions",
    f"""
WITH rev AS (
  SELECT c.c_custkey, c.c_mktsegment AS segment,
         {XM.sql_sum_round(f"sum({XM.sql_int_units('o.o_totalprice', 2)})", 2, in_scale=2)} AS revenue
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_custkey, segment, revenue,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       round(percent_rank() OVER w, 6) AS prank,
       CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
       round(cume_dist()  OVER w, 6) AS cdist
FROM rev
WINDOW w AS (PARTITION BY segment ORDER BY revenue DESC, c_custkey)
""",
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family over one per-segment window: rank,
    dense_rank, percent_rank, ntile quartiles, cume_dist. The ORDER BY
    carries a custkey tie-break because ntile splits ties by row order —
    without the total order its buckets are partition-order dependent."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", F.col("c_mktsegment").alias("segment"))
        .agg(XM.sum_round(F.sum(XM.int_units_long(F.col("o_totalprice"), 2)), 2, in_scale=2).alias("revenue"))
    )
    w = Window.partitionBy("segment").orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return rev.select(
        "c_custkey",
        "segment",
        "revenue",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


def _bloom_pos_sql(key: str, num_bits: int = 4096, num_hashes: int = 4) -> str:
    """DuckDB mirror of bloom._positions (same md5 family, same mod)."""
    return ", ".join(
        f"('0x' || substr(md5('b{i}|' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {num_bits}"
        for i in range(num_hashes)
    )


@register(
    "bloom_semijoin_parts",
    f"""
WITH src AS (
  SELECT DISTINCT l_partkey AS key FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
),
pos AS (SELECT unnest([{_bloom_pos_sql('key')}]) AS pos FROM src),
bloom AS (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
  FROM pos GROUP BY 1
),
cpos AS (SELECT p_partkey, unnest([{_bloom_pos_sql('p_partkey')}]) AS pos FROM part),
probed AS (
  SELECT p_partkey,
         CASE WHEN b.bits IS NOT NULL
               AND ((b.bits >> CAST(c.pos % 32 AS INTEGER)) & 1) = 1 THEN 1 ELSE 0 END AS hit
  FROM cpos c LEFT JOIN bloom b ON b.word = c.pos // 32
),
bh AS (SELECT p_partkey, (sum(hit) = 4) AS bloom_hit FROM probed GROUP BY 1),
ex AS (
  SELECT DISTINCT l_partkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
)
SELECT bh.p_partkey, bh.bloom_hit, (ex.l_partkey IS NOT NULL) AS exact_hit
FROM bh LEFT JOIN ex ON ex.l_partkey = bh.p_partkey
""",
)
def bloom_semijoin_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-screen: build a 4096-bit / 4-hash bitmap
    over the partkeys shipped in Jan-1996, probe every part against it, and
    report the bloom verdict next to exact membership. No false negatives by
    construction; the false positives are a deterministic function of the md5
    positions, so the oracle reproduces the bitmap — and the exact same
    false-positive set — bit for bit. At scale the bitmap replaces shipping
    a giant IN-list: definite misses drop before the real join."""
    from mobsos_event_log_generator_spark.operators.bloom import build_bloom, might_contain

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    bloom = build_bloom(li, "l_partkey")
    parts = load_table(spark, sf_dir, "part").select("p_partkey")
    flags = might_contain(parts, bloom, "p_partkey")
    exact = li.select("l_partkey").distinct()
    return flags.join(exact, flags.p_partkey == exact.l_partkey, "left").select(
        "p_partkey", "bloom_hit", F.col("l_partkey").isNotNull().alias("exact_hit")
    )


@register(
    "cms_user_frequencies",
    """
WITH rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
cells AS (
  SELECT r.row,
         ('0x' || substr(md5('c' || r.row || '|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS col
  FROM events, rows_ r
),
cms AS (SELECT row, col, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2),
keys AS (SELECT DISTINCT user_id FROM events),
probes AS (
  SELECT user_id, r.row,
         ('0x' || substr(md5('c' || r.row || '|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS col
  FROM keys, rows_ r
),
est AS (
  SELECT user_id, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
  FROM probes LEFT JOIN cms USING (row, col) GROUP BY 1
),
exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt FROM events GROUP BY 1)
SELECT e.user_id, est.est, e.exact_cnt
FROM exact e JOIN est USING (user_id)
""",
)
def cms_user_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation per user (4 x 64 grid —
    deliberately undersized for the 150-key domain so collision inflation is
    visible) next to the exact counts. est >= exact always; the oracle
    reproduces every counter and every collision, so the comparison is
    exact, not statistical."""
    from mobsos_event_log_generator_spark.operators.cms import build_cms, estimate_counts

    ev = load_table(spark, sf_dir, "events")
    cms = build_cms(ev, "user_id", depth=4, width=64)
    keys = ev.select("user_id").distinct()
    est = estimate_counts(keys, cms, "user_id", depth=4, width=64)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return exact.join(est, "user_id").select("user_id", "est", "exact_cnt")


@register(
    "tpch_q16_supplier_counts",
    """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT IN ('PROMO', 'ECONOMY')
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
)
def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier-count by part attributes): negated predicates
    (<>, NOT IN) on the dim, a NOT IN subquery excluding a supplier set
    (expressed as a LEFT ANTI join — key is non-null so the semantics
    coincide), and COUNT(DISTINCT) per 3-column group. Adapted: lineitem is
    the part-supplier bridge (no partsupp table in this schema) and
    negative-balance suppliers stand in for the complaints filter."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_excess_suppliers",
    """
SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#2'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > (SELECT 0.5 * sum(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey
                              AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                              AND l2.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00')
)
""",
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-stock suppliers): an IN subquery whose HAVING
    carries a correlated scalar aggregate over a second scan of the same
    fact — decorrelated to per-(supplier, part) sums joined against
    per-part totals, semi-joined back to supplier. Dominance threshold:
    a supplier who shipped > half a part's yearly volume. Quantity sums are
    integral doubles, so the > comparison is exact on both engines."""
    window = (
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(window)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    li_b = li.join(p, li.l_partkey == p.p_partkey)
    per_sp = li_b.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("sp_qty"))
    per_p = li_b.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("l_quantity").alias("p_qty")
    )
    excess = (
        per_sp.join(per_p, per_sp.l_partkey == per_p.t_partkey)
        .filter(F.col("sp_qty") > 0.5 * F.col("p_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "unpivot_part_metrics",
    """
SELECT p_partkey, metric, value FROM (
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
  UNION ALL
  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
)
""",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide numeric columns to long (key, metric, value)
    rows — the inverse of pivot_user_event_matrix, via the native
    ``unpivot`` operator (a zero-shuffle generate, not a UNION of scans:
    one pass reads the table once however many metrics melt)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.col("p_size").cast("double").alias("size"),
                 F.col("p_retailprice").alias("retailprice"))
        .unpivot("p_partkey", ["size", "retailprice"], "metric", "value")
    )


@register(
    "tpch_q9_product_profit",
    """
SELECT supp_nation, o_year,
       CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS supp_nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount)
           - 0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18, 4)) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%gear%'
)
GROUP BY 1, 2
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): a part-name LIKE filter seeding
    a 5-table join (part, lineitem, supplier, orders, nation), a COMPUTED
    profit expression per line, aggregated by (supplier nation, order year).
    The fixture has no partsupp table, so supply cost is proxied by
    0.6 * p_retailprice * l_quantity — the distinguishing plan shape (deep
    multi-join feeding an arithmetic-expression aggregate over two derived
    group keys) is preserved exactly. Dims broadcast; the fact joins carry
    the filtered part semi-reduction first. The per-row amount is computed
    in double (bit-identical on both engines) then summed as DECIMAL —
    exact accumulation, so partition/sum ORDER cannot drift the cents."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_parts",
    f"""
WITH v AS (
  SELECT l.l_partkey, {XM.sql_sum_round(f"sum({XM.sql_int_units('l.l_extendedprice * l.l_quantity')})", 2)} AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY 1
)
SELECT l_partkey, value
FROM v
WHERE value > (SELECT {XM.sql_mean_round("sum(CAST(value * 100 AS BIGINT))", "1000", 2, in_scale=2)} FROM v)
""",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-group value compared against a
    GLOBAL scalar threshold derived from the SAME aggregate (HAVING sum >
    fraction * Σ) — the group-share-vs-scalar-subquery plan. The fixture has
    no partsupp, so value = Σ(extendedprice × quantity) over one nation's
    suppliers' lineitems. The per-part aggregate is computed ONCE and reused
    for both the threshold scalar (a one-row broadcast cross join) and the
    filter — no second scan of the fact. Both engines compare cent-rounded
    values so float ulp drift cannot flip the predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(XM.sum_round(F.sum(XM.int_units(F.col("l_extendedprice") * F.col("l_quantity"))), 2).alias("value"))
    )
    thresh = v.agg(
        XM.mean_round(
            F.sum((F.col("value") * 100).cast("long")), F.lit(1000), 2, in_scale=2
        ).alias("__thresh")
    )
    return (
        v.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("__thresh"))
        .select("l_partkey", "value")
    )


@register(
    "tpch_q12_late_shipment_priority",
    """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag IN ('A', 'R')
  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
""",
)
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): a two-value IN
    filter on the grouping column, a cross-table DATE INEQUALITY in the
    WHERE (ship > order + 30 d — the fixture lacks commit/receipt dates, so
    late-shipment stands in for receipt > commit), a one-year range, and
    the signature dual conditional-count aggregation splitting urgent/high
    priorities from the rest in one pass."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "grouping_sets_status_priority",
    f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {XM.sql_sum_round(f"sum({XM.sql_int_units('o_totalprice', 2)})", 2, in_scale=2)} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    status marginals + priority marginals + grand total in ONE pass — Spark
    expands the sets into a single Expand + hash aggregate, reading the
    fact table once instead of once per set. Completes the grouping-
    analytics trio next to rollup_order_priority and cube_status_priority."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        XM.sum_round(F.sum(XM.int_units_long(F.col("o_totalprice"), 2)), 2, in_scale=2).alias("total_price"),
    )


@register(
    "events_column_profile",
    f"""
WITH s AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
    CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
    CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
    CAST(count(DISTINCT event_id) AS BIGINT) AS nd_event_id,
    CAST(count(DISTINCT ts) AS BIGINT) AS nd_ts,
    CAST(count(DISTINCT user_id) AS BIGINT) AS nd_user_id,
    CAST(count(DISTINCT event_type) AS BIGINT) AS nd_event_type,
    CAST(count(DISTINCT value) AS BIGINT) AS nd_value,
    CAST(count(DISTINCT props) AS BIGINT) AS nd_props
  FROM events
)
SELECT col, n_rows, n_nulls, n_distinct FROM (
  SELECT 'event_id' AS col, n_rows, null_event_id AS n_nulls, nd_event_id AS n_distinct FROM s
  UNION ALL SELECT 'ts', n_rows, null_ts, nd_ts FROM s
  UNION ALL SELECT 'user_id', n_rows, null_user_id, nd_user_id FROM s
  UNION ALL SELECT 'event_type', n_rows, null_event_type, nd_event_type FROM s
  UNION ALL SELECT 'value', n_rows, null_value, nd_value FROM s
  UNION ALL SELECT 'props', n_rows, null_props, nd_props FROM s
)
""",
)
def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling (the first data-quality report on any new
    table): per column, row count, null count, and exact distinct count —
    ONE aggregation over the table (Spark expands the multi-distinct into
    grouped passes itself; at 100 TB swap exact distincts for
    approx_count_distinct and the error-bound gate pattern), then an unpivot
    of the single stats row into per-column rows via stack()."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    s = ev.agg(*aggs)
    stack_args = ", ".join(f"'{c}', null_{c}, nd_{c}" for c in cols)
    return s.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS (col, n_nulls, n_distinct)",
    ).select("col", "n_rows", "n_nulls", "n_distinct")


@register(
    "events_value_anomalies_mad",
    """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad, any_value(med) AS med
  FROM dev GROUP BY 1
)
SELECT e.event_type,
       round(any_value(m.med), 4) AS median_value,
       round(any_value(m.mad), 4) AS mad_value,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies
FROM events e JOIN mad m USING (event_type)
GROUP BY 1
""",
)
def events_value_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counting via median absolute deviation — the outlier
    statistic that, unlike z-scores, is not itself dragged by the outliers
    it hunts. Two exact interpolated medians per group (value, then absolute
    deviation) and a broadcast of the 5-row (median, MAD) dim into the
    flagging pass; the 3·MAD comparison happens on UNROUNDED doubles in both
    engines (identical operand trees), with rounding only on the reported
    medians."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = (
        dev.groupBy("event_type")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
        .join(med, "event_type")
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 4).alias("median_value"),
            F.round(F.first("mad"), 4).alias("mad_value"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")).cast("int")
            ).cast("long").alias("n_anomalies"),
        )
    )


@register(
    "customer_rfm_segments",
    """
WITH ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
rfm AS (
  SELECT o.o_custkey AS custkey,
         date_diff('day', max(o.o_orderdate), any_value(r.ref_date)) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders o CROSS JOIN ref r
  GROUP BY 1
),
scored AS (
  SELECT custkey, recency_days, frequency, monetary,
         CAST(ntile(4) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_q,
         CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_q,
         CAST(ntile(4) OVER (ORDER BY monetary DESC, custkey) AS BIGINT) AS m_q
  FROM rfm
)
SELECT r_q, f_q, m_q,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(monetary) AS DOUBLE), 2) AS total_monetary
FROM scored
GROUP BY 1, 2, 3
""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency/frequency/monetary quartiles) — the classic
    customer-analytics cube. Monetary sums as DECIMAL so partial-aggregation
    regrouping cannot drift from a sequential sum; every ntile ordering
    carries the custkey tie-break because ntile splits ties by row order.

    The per-customer table is compact only relative to the fact table — at
    100 TB it is millions of rows, so the three quartile assignments run as
    ``sweep.distributed_ntile`` (bucketed two-phase row numbers, exact ntile
    quota arithmetic) instead of three single-partition ntile windows. One
    probe pass batches the exact count and all three bucket-boundary
    quantiles; no WindowExec in the final plan is partition-less."""
    from mobsos_event_log_generator_spark.operators.sweep import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("ref_date"))
    rfm = (
        o.crossJoin(F.broadcast(ref))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.first("ref_date"), F.max("o_orderdate")).cast("long").alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
        )
    )
    probs = F.lit([i / 32 for i in range(1, 32)])
    probe = rfm.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(F.col("recency_days").cast("double"), probs, F.lit(10_000)).alias("rb"),
        F.percentile_approx(F.col("frequency").cast("double"), probs, F.lit(10_000)).alias("fb"),
        F.percentile_approx(F.col("monetary").cast("double"), probs, F.lit(10_000)).alias("mb"),
    ).first()
    n = probe["n"]
    scored = distributed_ntile(
        rfm, 4, n, "recency_days", ["custkey"], "r_q", descending=False, bounds=probe["rb"]
    )
    scored = distributed_ntile(
        scored, 4, n, "frequency", ["custkey"], "f_q", descending=True, bounds=probe["fb"]
    )
    scored = distributed_ntile(
        scored, 4, n, "monetary", ["custkey"], "m_q", descending=True, bounds=probe["mb"]
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("monetary").cast("double"), 2).alias("total_monetary"),
    )


@register(
    "part_abc_analysis",
    """
WITH rev AS (
  SELECT l_partkey AS partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT partkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
         sum(revenue) OVER () AS total_rev
  FROM rev
),
classed AS (
  SELECT partkey, revenue,
         CASE WHEN cum_rev * 10 <= total_rev * 7 THEN 'A'
              WHEN cum_rev * 10 <= total_rev * 9 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(revenue) AS DOUBLE), 2) AS class_revenue
FROM classed
GROUP BY 1
""",
)
def part_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory analysis: parts ranked by revenue, classified by
    cumulative share (A ≤ 70 %, B ≤ 90 %, C above). Everything that decides a
    class is EXACT: revenues sum as DECIMAL (associative — partial
    aggregation cannot drift) and the share cut compares cum·10 ≤ total·7 in
    decimal arithmetic instead of dividing into a float near the class
    boundary.

    The per-part table is millions of rows at 100 TB, so the Pareto prefix
    sum runs through ``sweep.value_ordered_running_sum`` (revenue-band
    buckets → parallel in-bucket cumsum → broadcast offsets) and the grand
    total through a broadcast scalar aggregate — no single-partition
    WindowExec anywhere in the plan. Decimal addition is associative, so the
    two-phase sum equals the oracle's sequential one bit-for-bit."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")).alias("revenue")
    )
    ranked = value_ordered_running_sum(
        rev, "revenue", ["partkey"], F.col("revenue"), out_col="cum_rev", descending=True
    )
    total = rev.agg(F.sum("revenue").alias("total_rev"))
    classed = ranked.crossJoin(F.broadcast(total)).withColumn(
        "abc_class",
        F.when(F.col("cum_rev") * 10 <= F.col("total_rev") * 7, "A")
        .when(F.col("cum_rev") * 10 <= F.col("total_rev") * 9, "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("revenue").cast("double"), 2).alias("class_revenue"),
    )


# ---------------------------------------------------------------------------
# Z-order (Morton curve) clustering key — data-skipping layout
# ---------------------------------------------------------------------------

_Z_BITS = 16
_Z_SPAN = 2**_Z_BITS - 1

_SQL_Z_INTERLEAVE = " + ".join(
    f"((zx >> {j}) & 1) * {2 ** (2 * j)} + ((zy >> {j}) & 1) * {2 ** (2 * j + 1)}"
    for j in range(_Z_BITS)
)


@register(
    "events_zorder_curve",
    f"""
WITH b AS (
  SELECT min(user_id) AS u_lo, max(user_id) AS u_hi,
         min(epoch_us(ts)) AS t_lo, max(epoch_us(ts)) AS t_hi
  FROM events
),
n AS (
  SELECT event_id,
         CASE WHEN u_hi = u_lo THEN 0
              ELSE ((user_id - u_lo) * {_Z_SPAN}) // (u_hi - u_lo) END AS zx,
         CASE WHEN t_hi = t_lo THEN 0
              ELSE ((epoch_us(ts) - t_lo) * {_Z_SPAN}) // (t_hi - t_lo) END AS zy
  FROM events, b
)
SELECT event_id, CAST(zx AS BIGINT) AS zx, CAST(zy AS BIGINT) AS zy,
       CAST({_SQL_Z_INTERLEAVE} AS BIGINT) AS zvalue
FROM n
""",
)
def events_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, event time) — the
    multi-dimensional layout key for data-skipping file layouts
    (sources/lake.py::zorder_layout writes files range-partitioned on this
    value; test_scale_layout proves the per-file min/max ranges tighten on
    BOTH dimensions vs. a time-sorted layout). Normalization is exact
    integer arithmetic over broadcast min/max bounds and the interleave is
    pure shift/mask — no floats, bit-identical across engines. At 100 TB
    the bounds aggregate is one map-side-combined pass (or comes free from
    table statistics); the z-value itself is per-row projection."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    b = ev.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min("ts_us").alias("t_lo"),
        F.max("ts_us").alias("t_hi"),
    )
    n = ev.crossJoin(F.broadcast(b)).select(
        "event_id",
        F.expr(
            f"CASE WHEN u_hi = u_lo THEN 0L "
            f"ELSE ((user_id - u_lo) * {_Z_SPAN}) div (u_hi - u_lo) END"
        ).alias("zx"),
        F.expr(
            f"CASE WHEN t_hi = t_lo THEN 0L "
            f"ELSE ((ts_us - t_lo) * {_Z_SPAN}) div (t_hi - t_lo) END"
        ).alias("zy"),
    )
    from mobsos_event_log_generator_spark.sources.lake import interleave_bits

    return n.select(
        "event_id",
        F.col("zx").cast("long").alias("zx"),
        F.col("zy").cast("long").alias("zy"),
        interleave_bits(F.col("zx"), F.col("zy"), _Z_BITS).alias("zvalue"),
    )


# ---------------------------------------------------------------------------
# Snapshot CDC -> retraction-aware incremental view (full-stack gate)
# ---------------------------------------------------------------------------


@register(
    "lake_cdc_incremental_view",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM events
WHERE event_type <> 'error'
GROUP BY 1
""",
)
def lake_cdc_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end gate over the snapshot stack: land the events in two
    appends (v1 even ids, v2 odd ids), materialize a per-type aggregate of
    v2, then OVERWRITE with the error-events-purged table (v3) and refresh
    the view INCREMENTALLY from the file-list CDC diff (deletes retract
    with sign −1, inserts add) — never recomputing from the base table.
    The oracle aggregates the v3 content directly, so a wrong manifest
    diff, a missed retraction, or a double-counted file all break the
    hash. Sums ride a DECIMAL monoid (exact under retraction; float sums
    are not order-stable enough to survive subtract-and-readd)."""
    from mobsos_event_log_generator_spark.operators.incremental import apply_cdc_to_agg
    from mobsos_event_log_generator_spark.sources.parquet import load_table as _lt
    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append,
        snapshot_diff,
        snapshot_overwrite,
    )
    from mobsos_event_log_generator_spark.workdirs import scratch_dir

    root = scratch_dir("cdcview_")
    ev = _lt(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("decimal(18,4)").alias("val")
    )
    snapshot_append(ev.filter(F.col("event_id") % 2 == 0), root)  # v1
    snapshot_append(ev.filter(F.col("event_id") % 2 == 1), root)  # v2
    view2 = (
        read_snapshot(spark, root, 2)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_value"))
    )
    snapshot_overwrite(ev.filter(F.col("event_type") != "error"), root)  # v3
    diff = snapshot_diff(spark, root, 2, 3)
    refreshed = apply_cdc_to_agg(view2, diff, ["event_type"], {"val": "sum_value"})
    return refreshed.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sum_value").cast("double"), 2).alias("sum_value"),
    )


@register(
    "basket_part_pairs",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
norder AS (SELECT count(DISTINCT l_orderkey) AS t FROM b),
psup AS (SELECT l_partkey, count(*) AS np FROM b GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2, count(*) AS n_orders
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
)
SELECT p1, p2, CAST(n_orders AS BIGINT) AS n_orders,
       CAST((n_orders * t * 1000000) // (s1.np * s2.np) AS BIGINT) AS lift_ppm
FROM pairs
JOIN psup s1 ON s1.l_partkey = p1
JOIN psup s2 ON s2.l_partkey = p2
CROSS JOIN norder
WHERE n_orders >= 2
""",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: part pairs bought in the same
    order (support >= 2) with association lift in EXACT integer ppm —
    lift = n_pair·N/(n_p1·n_p2) via integer division, so no float ratio
    ever enters the gate. The pair join keys on the order id: per-order
    work is quadratic only in BASKET SIZE (bounded ~7 by the data model),
    making the total linear in lineitem — the same bounded-blowup argument
    as the LSH bucket join. Part-support and order-count dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    norder = li.agg(F.countDistinct("l_orderkey").alias("t"))
    psup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("np"))
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p1"))
    c = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(c, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
    return (
        pairs.join(psup.select(F.col("l_partkey").alias("p1"), F.col("np").alias("np1")), "p1")
        .join(psup.select(F.col("l_partkey").alias("p2"), F.col("np").alias("np2")), "p2")
        .crossJoin(F.broadcast(norder))
        .select(
            "p1",
            "p2",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.expr("(n_orders * t * 1000000L) div (np1 * np2)").cast("long").alias("lift_ppm"),
        )
    )


@register(
    "parts_skyline_price_size",
    """
SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price, CAST(p_size AS BIGINT) AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
""",
)
def parts_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of parts: minimize retail price, maximize size. The oracle is
    the textbook quadratic NOT-EXISTS; the plan is group-max + two-phase
    exclusive prefix max (operators/skyline.py) — zero quadratic work and no
    single-partition window."""
    from mobsos_event_log_generator_spark.operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part")
    sky = skyline_2d(part, "p_retailprice", "p_size")
    return sky.select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice"), 2).alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )


@register(
    "lineitem_skyline_3d",
    """
WITH s AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-02-01'
)
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 2) AS price,
       round(l_discount, 2) AS discount,
       round(l_quantity, 2) AS qty
FROM s p
WHERE NOT EXISTS (
  SELECT 1 FROM s q
  WHERE q.l_extendedprice <= p.l_extendedprice AND q.l_discount <= p.l_discount
    AND q.l_quantity >= p.l_quantity
    AND (q.l_extendedprice < p.l_extendedprice OR q.l_discount < p.l_discount
         OR q.l_quantity > p.l_quantity)
)
""",
)
def lineitem_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-criteria skyline (minimize price and discount, maximize quantity)
    over one ship-month, via the Arrow local-skyline → merge path: dominated
    rows die inside their own partition, so the final merge sees only local
    survivors — the NOT-EXISTS oracle is the quadratic truth it avoids."""
    from mobsos_event_log_generator_spark.operators.skyline import skyline_arrow

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-02-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity")
    )
    sky = skyline_arrow(li, minimize=["l_extendedprice", "l_discount"], maximize=["l_quantity"])
    return sky.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice"), 2).alias("price"),
        F.round(F.col("l_discount"), 2).alias("discount"),
        F.round(F.col("l_quantity"), 2).alias("qty"),
    )


@register(
    "parts_cooccur_triangles",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS s, c.l_partkey AS d
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
t AS (
  SELECT e1.s AS x, e1.d AS y, e2.d AS z
  FROM e e1
  JOIN e e2 ON e2.s = e1.d
  JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d
),
corner AS (
  SELECT x AS node FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t
),
tri AS (SELECT node, count(*) AS n_triangles FROM corner GROUP BY 1),
deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)
  GROUP BY 1
)
SELECT tri.node AS part, CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(deg AS BIGINT) AS deg,
       CAST((2 * n_triangles * 1000000) // (deg * (deg - 1)) AS BIGINT) AS clustering_ppm
FROM tri JOIN deg USING (node)
""",
)
def parts_cooccur_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient on the part
    co-occurrence graph (edges = part pairs bought together in ≥ 2 orders).

    Spark side uses degree-ordered orientation (Suri & Vassilvitskii,
    WWW'11): every edge points from its lower-(degree,id) endpoint, capping
    wedge fan-out at O(√m) per node so total work is O(m^1.5) regardless of
    hub skew — the oracle's naive triple self-join is the quadratic shape
    this plan exists to avoid. Clustering coefficient is EXACT integer ppm
    (2·tri·10⁶ div deg·(deg−1)) — no float enters the gate."""
    from mobsos_event_log_generator_spark.operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("s"))
    c = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("d"))
    edges = (
        a.join(c, "l_orderkey")
        .filter(F.col("s") < F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("s", "d")
    )
    tri = triangle_counts(edges, "s", "d", broadcast_closing=True)
    # explode-not-union: one copy of the edge-derivation subtree in the plan
    # (see operators/graph.py::triangle_counts for the rationale).
    deg = (
        edges.select(F.explode(F.array(F.col("s"), F.col("d"))).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return tri.join(deg, "node").select(
        F.col("node").alias("part"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.col("deg").cast("long").alias("deg"),
        F.expr("(2 * n_triangles * 1000000L) div (deg * (deg - 1))").cast("long").alias("clustering_ppm"),
    )


@register(
    "parts_hierarchy_rollup",
    """
WITH RECURSIVE f AS (
  SELECT p_partkey AS id,
         CASE WHEN p_partkey <= 3 THEN NULL ELSE p_partkey // 4 END AS parent,
         p_retailprice
  FROM part
),
r AS (
  SELECT id, id AS root, 0 AS depth FROM f WHERE parent IS NULL
  UNION ALL
  SELECT f.id, r.root, r.depth + 1 FROM f JOIN r ON f.parent = r.id
)
SELECT root,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(max(depth) AS BIGINT) AS max_depth,
       round(CAST(sum(CAST(f.p_retailprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_price
FROM r JOIN f USING (id)
GROUP BY 1
""",
)
def parts_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (recursive-CTE-class) query: resolve a parent-pointer
    forest over the parts (deterministic BOM-style containment,
    parent = partkey div 4) to every part's root and depth via POINTER
    DOUBLING — O(log height) shuffles, not height-many self-joins
    (operators/graph.py::resolve_hierarchy) — then roll up subtree size,
    max depth and decimal-exact total price per root. The oracle is the
    textbook RECURSIVE CTE, so the gate proves the doubling rewrite
    equivalent to the sequential recursion."""
    from mobsos_event_log_generator_spark.operators.graph import resolve_hierarchy

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.when(F.col("p_partkey") <= 3, F.lit(None)).otherwise(
            F.expr("p_partkey div 4")
        ).alias("parent"),
        F.col("p_retailprice").cast("decimal(18,4)").alias("price"),
    )
    resolved = resolve_hierarchy(part.select("id", "parent"))
    return (
        resolved.join(part.select("id", "price"), resolved.node == part.id)
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.max("depth").cast("long").alias("max_depth"),
            F.round(F.sum("price").cast("double"), 2).alias("total_price"),
        )
    )


@register(
    "events_props_variant",
    """
WITH v AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         CASE WHEN json_valid(props) THEN 0 ELSE 1 END AS bad
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(bad) AS BIGINT) AS n_malformed,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM v
GROUP BY 1
""",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type: ingest the
    JSON props column once via ``try_parse_json`` (malformed rows become
    NULL variants, counted — schema-on-read never kills the scan), extract
    typed fields with ``variant_get`` path expressions, aggregate. VARIANT
    keeps the parsed binary form through the plan, so repeated path
    extraction never re-parses the JSON text — the Spark-4-native answer
    to the reference's per-request pandas ``json_normalize``
    (/root/reference/event_reader.py remarks flattening)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.try_parse_json(F.col("props")).alias("pv"),
    ).select(
        "event_type",
        F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
        F.when(F.col("pv").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("bad"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("bad").cast("long").alias("n_malformed"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )


@register(
    "orders_weighted_sample",
    """
WITH w AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents FROM orders
),
tot AS (SELECT CAST(sum(w_cents) AS BIGINT) AS total_w FROM w)
SELECT o_orderkey, w_cents
FROM w, tot
WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT::HUGEINT
        * total_w::HUGEINT
      < 200::HUGEINT * w_cents::HUGEINT * 1152921504606846976::HUGEINT
""",
)
def orders_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sample of orders (expected 200,
    inclusion probability ∝ order value) — the Horvitz-Thompson primitive
    for weighted corpus/eval carving. Pure integer inclusion test (60-bit
    md5 uniform vs k·w·2⁶⁰/W in DECIMAL/HUGEINT), no shuffle, no state;
    the oracle replays the identical arithmetic."""
    from mobsos_event_log_generator_spark.operators.sampling import weighted_inclusion_sample

    orders = load_table(spark, sf_dir, "orders")
    out = weighted_inclusion_sample(
        orders,
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long"),
        expected_k=200,
    )
    return out.select("o_orderkey", "w_cents")


@register(
    "customers_k_anonymity",
    """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS group_size,
       CAST(count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) AS BIGINT) AS n_sensitive,
       count(*) < 8 AS under_k,
       count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) < 2 AS under_l
FROM customer
GROUP BY 1, 2
""",
)
def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the (nation, market-segment)
    quasi-identifier with banded account balance as the sensitive attribute:
    groups smaller than k=8 or with fewer than 2 distinct sensitive bands
    are re-identification risks. One map-side-combined aggregation pass —
    the audit costs a groupBy regardless of table size."""
    from mobsos_event_log_generator_spark.operators.privacy import k_anonymity_report

    cust = load_table(spark, sf_dir, "customer")
    return k_anonymity_report(
        cust,
        ["c_nationkey", "c_mktsegment"],
        F.floor(F.col("c_acctbal") / 2000).cast("long"),
        k=8,
        l_div=2,
    )


@register(
    "events_ks_drift",
    """
WITH s1 AS (SELECT value AS v FROM events WHERE event_type = 'click' AND value IS NOT NULL),
s2 AS (SELECT value AS v FROM events WHERE event_type = 'error' AND value IS NOT NULL),
g AS (
  SELECT v,
         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
  FROM (SELECT v, 1 AS s FROM s1 UNION ALL SELECT v, 2 FROM s2)
  GROUP BY 1
),
c AS (
  SELECT v,
         CAST(sum(d1) OVER (ORDER BY v) AS BIGINT) AS c1,
         CAST(sum(d2) OVER (ORDER BY v) AS BIGINT) AS c2
  FROM g
),
n AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2
)
SELECT n1, n2,
       CAST(max(abs(n1 * c2 - n2 * c1)) AS BIGINT) AS ks_num,
       CAST((max(abs(n1 * c2 - n2 * c1)) * 1000000) // (n1 * n2) AS BIGINT) AS ks_ppm
FROM c, n
GROUP BY n1, n2
""",
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift between the click and error value
    distributions, EXACT: D·n1·n2 = max|n1·c2(v) − n2·c1(v)| over observed
    values — no float CDF (the cross-multiplied-rationals trick). The
    cumulative counts run through the two-phase bucket prefix sum
    (operators/sweep.py), never a partition-less window; the oracle's global
    ORDER BY window is the single-node shape this plan replaces."""
    from mobsos_event_log_generator_spark.operators.stats import ks_statistic

    ev = load_table(spark, sf_dir, "events")
    return ks_statistic(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
        "value",
    )


@register(
    "events_psi_drift",
    """
WITH e AS (SELECT epoch_us(ts) AS us, value AS v FROM events WHERE value IS NOT NULL),
b AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
m AS (SELECT e.us, e.v, (b.lo + b.hi) // 2 AS mid FROM e, b),
tot AS (SELECT CAST(sum(CASE WHEN us <= mid THEN 1 ELSE 0 END) AS BIGINT) AS tr,
               CAST(sum(CASE WHEN us > mid THEN 1 ELSE 0 END) AS BIGINT) AS tc FROM m),
pv AS (SELECT v, count(*) AS c FROM m WHERE us <= mid GROUP BY 1),
cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cc FROM pv),
ks AS (SELECT unnest(generate_series(1, 9)) AS k),
cuts AS (SELECT k, min(v) AS cut FROM ks, cum, tot WHERE cc * 10 >= k * tr GROUP BY 1),
qs AS (SELECT list(cut ORDER BY k) AS qs FROM cuts),
sides AS (SELECT CASE WHEN us <= mid THEN 1 ELSE 2 END AS s,
                 len(list_filter(qs.qs, c -> v > c)) AS bin
          FROM m, qs),
counts AS (SELECT bin, CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                  CAST(sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
           FROM sides GROUP BY 1),
bins AS (SELECT unnest(generate_series(0, 9)) AS bin)
SELECT CAST(bins.bin AS BIGINT) AS bin,
       coalesce(n_ref, 0) AS n_ref,
       coalesce(n_cur, 0) AS n_cur,
       round(((coalesce(n_ref, 0) + 1.0) / (tr + 10.0) - (coalesce(n_cur, 0) + 1.0) / (tc + 10.0))
             * ln(((coalesce(n_ref, 0) + 1.0) / (tr + 10.0))
                  / ((coalesce(n_cur, 0) + 1.0) / (tc + 10.0))), 6) AS psi_term
FROM bins LEFT JOIN counts ON bins.bin = counts.bin, tot
""",
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift report (the industry-standard
    companion to the KS monitor): events are split at the midpoint of the
    observed time range, the REFERENCE half defines decile bins, and each
    bin reports its Laplace-smoothed PSI term (p−q)·ln(p/q), rounded 6 dp —
    the per-bin layout avoids any cross-row float summation, so the only
    float op per row is one ln.

    Engine-exactness: the decile cuts are RANK statistics, not interpolated
    percentiles — cut_k = min value whose cumulative reference count
    satisfies cc·10 ≥ k·n_ref, all integer arithmetic over the per-value
    histogram, so both engines pick byte-identical data values as cuts and
    bin membership (count of cuts strictly below the value) cannot drift.

    Scale shape: the cumulative counts run through the two-phase bucket
    prefix sum (operators/sweep.py — never a partition-less window over the
    value domain); the cut selection is a 9-row inequality probe against
    the bounded per-value histogram; bin assignment is a broadcast 9-cut
    array filter in whole-stage codegen; everything else is one
    map-side-combined aggregation pass."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.unix_micros(F.col("ts")).alias("us"), F.col("value").alias("v"))
    )
    b = e.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    m = e.crossJoin(F.broadcast(b)).withColumn("__mid", F.expr("(lo + hi) div 2"))
    tot = m.agg(
        F.sum(F.when(F.col("us") <= F.col("__mid"), 1).otherwise(0)).cast("long").alias("tr"),
        F.sum(F.when(F.col("us") > F.col("__mid"), 1).otherwise(0)).cast("long").alias("tc"),
    )
    pv = (
        m.filter(F.col("us") <= F.col("__mid"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = value_ordered_running_sum(pv, "v", [], F.col("c").cast("long"), out_col="cc")
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    cuts = (
        cum.crossJoin(F.broadcast(tot))
        .join(ks, F.col("cc") * 10 >= F.col("k") * F.col("tr"))
        .groupBy("k")
        .agg(F.min("v").alias("cut"))
    )
    qs = cuts.agg(
        F.sort_array(F.collect_list(F.struct(F.col("k"), F.col("cut")))).alias("s")
    ).select(F.expr("transform(s, x -> x.cut)").alias("qs"))
    sides = (
        m.select(F.when(F.col("us") <= F.col("__mid"), 1).otherwise(2).alias("s"), "v")
        .crossJoin(F.broadcast(qs))
        .select("s", F.size(F.filter(F.col("qs"), lambda c: F.col("v") > c)).alias("bin"))
    )
    counts = sides.groupBy("bin").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("long").alias("n_ref"),
        F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).cast("long").alias("n_cur"),
    )
    bins = spark.range(0, 10).select(F.col("id").alias("bin"))
    nr = F.coalesce(F.col("n_ref"), F.lit(0)).cast("long")
    nc = F.coalesce(F.col("n_cur"), F.lit(0)).cast("long")
    p = (nr + F.lit(1.0)) / (F.col("tr") + F.lit(10.0))
    q = (nc + F.lit(1.0)) / (F.col("tc") + F.lit(10.0))
    return (
        bins.join(counts, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("long").alias("bin"),
            nr.alias("n_ref"),
            nc.alias("n_cur"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


@register(
    "events_type_trends",
    """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(day) AS BIGINT) AS sx,
         CAST(sum(n_events) AS BIGINT) AS sy,
         CAST(sum(day * n_events) AS BIGINT) AS sxy,
         CAST(sum(day * day) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(CASE WHEN n * sxx - sx * sx <> 0
                 THEN ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
            END AS BIGINT) AS slope_ppm
FROM agg
""",
)
def events_type_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type volume trend: exact OLS slope of daily counts against
    the epoch-day index — numerator and denominator are pure integer
    aggregates (n·Σxy − ΣxΣy over n·Σx² − (Σx)²), reported as the rational
    pair plus an integer-ppm quotient. Trend detection with zero float sums;
    two map-side-combined aggregations, no window, no join."""
    from mobsos_event_log_generator_spark.operators.stats import group_trend_slopes

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.expr("unix_micros(ts) div 86400000000"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return group_trend_slopes(daily, ["event_type"], "day", "n_events")


@register(
    "events_spatial_pairs",
    """
WITH pts AS (
  SELECT event_id AS id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'x'), 1, 6))::BIGINT % 10000 AS x,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'y'), 1, 6))::BIGINT % 10000 AS y
  FROM events WHERE event_id % 2 = 0
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2500
""",
)
def events_spatial_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial proximity self-join: all point pairs within Euclidean
    distance 50 on a 10k×10k integer grid (coordinates derived
    deterministically from event ids). The oracle is the quadratic
    distance-filtered cross join; the plan is the grid-bucketed equi-join
    (operators/spatial.py): one side replicates into its 3×3 cell
    neighborhood (9|A| + |B| shuffle rows, never |A|·|B|), then an exact
    integer d² verify — the 2-D analogue of the LSH bucket join, and the
    pattern for geo joins at 100 TB."""
    from mobsos_event_log_generator_spark.operators.spatial import grid_distance_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 0)
    pts = ev.select(
        F.col("event_id").alias("id"),
        (F.conv(F.substring(F.md5(F.concat(F.col("event_id").cast("string"), F.lit("x"))), 1, 6), 16, 10)
         .cast("long") % 10000).alias("x"),
        (F.conv(F.substring(F.md5(F.concat(F.col("event_id").cast("string"), F.lit("y"))), 1, 6), 16, 10)
         .cast("long") % 10000).alias("y"),
    )
    pairs = grid_distance_join(pts, pts, max_dist=50)
    return pairs.filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "dist_sq")


@register(
    "sketch_user_overlap",
    """
SELECT
  CAST((SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'click') AS BIGINT) AS exact_click,
  CAST((SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'purchase') AS BIGINT) AS exact_purchase,
  CAST((SELECT count(DISTINCT user_id) FROM events
        WHERE event_type IN ('click', 'purchase')) AS BIGINT) AS exact_union,
  CAST((SELECT count(*) FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'purchase')) AS BIGINT) AS exact_both,
  TRUE AS within_bound
""",
)
def sketch_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch algebra: audience-overlap estimation via HLL
    inclusion-exclusion — est(A∩B) = approx(A) + approx(B) − approx(A∪B),
    the composable form that lets per-segment sketches answer any pairwise
    overlap without re-scanning the facts. Raw registers are
    engine-specific, so (as with sketch_distinct_users_daily) the emitted
    contract is the exact counts plus a within_bound flag asserting the
    estimate lands within 15% of the true intersection — the error bound
    IS the hash-checked value."""
    ev = load_table(spark, sf_dir, "events")
    clicks = F.when(F.col("event_type") == "click", F.col("user_id"))
    purchases = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    either = F.when(F.col("event_type").isin("click", "purchase"), F.col("user_id"))
    agg = ev.agg(
        F.approx_count_distinct(clicks, rsd=0.02).alias("a_c"),
        F.approx_count_distinct(purchases, rsd=0.02).alias("a_p"),
        F.approx_count_distinct(either, rsd=0.02).alias("a_u"),
        F.countDistinct(clicks).alias("exact_click"),
        F.countDistinct(purchases).alias("exact_purchase"),
        F.countDistinct(either).alias("exact_union"),
    )
    return agg.select(
        F.col("exact_click").cast("long"),
        F.col("exact_purchase").cast("long"),
        F.col("exact_union").cast("long"),
        (F.col("exact_click") + F.col("exact_purchase") - F.col("exact_union"))
        .cast("long")
        .alias("exact_both"),
        (
            F.abs(
                (F.col("a_c") + F.col("a_p") - F.col("a_u"))
                - (F.col("exact_click") + F.col("exact_purchase") - F.col("exact_union"))
            )
            <= F.greatest(
                F.lit(0.15)
                * (F.col("exact_click") + F.col("exact_purchase") - F.col("exact_union")),
                F.lit(3.0),
            )
        ).alias("within_bound"),
    )


@register(
    "events_winsorized_stats",
    f"""
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(any_value(p05), 4) AS p05,
       round(any_value(p95), 4) AS p95,
       {XM.sql_mean_round(f"sum({XM.sql_int_units('value')})", "count(*)", 4)} AS raw_mean,
       {XM.sql_mean_round("sum(CASE WHEN value < p05 THEN " + XM.sql_int_units("p05")
                          + " WHEN value > p95 THEN " + XM.sql_int_units("p95")
                          + " ELSE " + XM.sql_int_units("value") + " END)",
                          "count(*)", 4)} AS winsorized_mean
FROM events e JOIN q USING (event_type)
GROUP BY 1
""",
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust group statistics: per event type, the mean after
    winsorizing values to the exact [p05, p95] interpolated percentiles —
    the robust aggregate feature pipelines use when MAD is too aggressive.
    Two passes over one shuffle key: an exact-percentile aggregate (tiny,
    broadcast back) then the clipped mean; no window, no sort of the
    facts."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05D)").alias("p05"),
        F.expr("percentile(value, 0.95D)").alias("p95"),
    )
    # Clip DECISIONS compare against the raw interpolated percentiles (the
    # engines produce identical doubles there); clip CONTRIBUTIONS are
    # 6-dp-quantized integer units so the 4-dp means are exact integer
    # arithmetic — order-independent (see operators/exactmath.py).
    clipped_units = F.when(F.col("value") < F.col("p05"), XM.int_units(F.col("p05"))).when(
        F.col("value") > F.col("p95"), XM.int_units(F.col("p95"))
    ).otherwise(XM.int_units(F.col("value")))
    n = F.count(F.lit(1))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("p05"), 4).alias("p05"),
            F.round(F.first("p95"), 4).alias("p95"),
            XM.mean_round(F.sum(XM.int_units(F.col("value"))), n, 4).alias("raw_mean"),
            XM.mean_round(F.sum(clipped_units), n, 4).alias("winsorized_mean"),
        )
    )


@register(
    "parts_cooccur_similarity",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
psup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS np FROM b GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2, CAST(count(*) AS BIGINT) AS n_co
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT p1 AS part, p2 AS other, n_co FROM pairs
  UNION ALL
  SELECT p2, p1, n_co FROM pairs
),
scored AS (
  SELECT part, other, n_co,
         CAST((n_co * n_co * 1000000) // (s1.np * s2.np) AS BIGINT) AS cos2_ppm
  FROM sym JOIN psup s1 ON s1.l_partkey = part JOIN psup s2 ON s2.l_partkey = other
)
SELECT part, other, n_co, cos2_ppm, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY part
                                   ORDER BY cos2_ppm DESC, n_co DESC, other) AS rn
      FROM scored)
WHERE rn <= 3
""",
)
def parts_cooccur_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: per part, the top-3 most similar
    parts by co-occurrence cosine over order baskets — scored as EXACT
    integer ppm of cosine² (n_co²·10⁶ div np_i·np_j), so no float ratio
    enters the gate. Pair generation is the bounded basket join (quadratic
    only in basket size); supports broadcast; the top-3 is a per-part
    partitioned window (WindowGroupLimit pushes the rank filter)."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    psup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("np"))
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p1"))
    c = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(c, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    sym = pairs.select(F.col("p1").alias("part"), F.col("p2").alias("other"), "n_co").unionAll(
        pairs.select(F.col("p2").alias("part"), F.col("p1").alias("other"), "n_co")
    )
    scored = (
        sym.join(psup.select(F.col("l_partkey").alias("part"), F.col("np").alias("np1")), "part")
        .join(psup.select(F.col("l_partkey").alias("other"), F.col("np").alias("np2")), "other")
        .select(
            "part",
            "other",
            F.col("n_co").cast("long").alias("n_co"),
            F.expr("(n_co * n_co * 1000000L) div (np1 * np2)").cast("long").alias("cos2_ppm"),
        )
    )
    w = Window.partitionBy("part").orderBy(
        F.col("cos2_ppm").desc(), F.col("n_co").desc(), F.col("other")
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= 3)


@register(
    "events_type_correlation",
    """
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM d),
types AS (SELECT DISTINCT event_type FROM d),
m AS (
  SELECT days.day, types.event_type, COALESCE(d.n, 0) AS n
  FROM days CROSS JOIN types
  LEFT JOIN d ON d.day = days.day AND d.event_type = types.event_type
),
p AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(a.n AS HUGEINT)) AS sx, sum(CAST(b.n AS HUGEINT)) AS sy,
         sum(CAST(a.n AS HUGEINT) * b.n) AS sxy,
         sum(CAST(a.n AS HUGEINT) * a.n) AS sxx, sum(CAST(b.n AS HUGEINT) * b.n) AS syy
  FROM m a JOIN m b ON a.day = b.day AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ta, tb,
       CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
                 WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT) AS corr_sign,
       CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000)
            // ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT) AS corr2_ppm
FROM p
""",
)
def events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event-type daily volumes, EXACT:
    corr² in integer ppm via the rational form (nΣxy−ΣxΣy)²·10⁶ over
    (nΣx²−(Σx)²)(nΣy²−(Σy)²) — DECIMAL on Spark, HUGEINT in DuckDB, zero
    float sums — plus the sign as ±1. The day×type matrix (zeros included —
    a missing day IS signal for correlation) is O(days·types), bounded at
    any corpus size; the pair join keys on the day.

    Numerics (r10, the decimal-first-multiply audit): per-term products and
    every moment widen BEFORE multiplying (decimal(38,0) here, HUGEINT in
    the oracle) — a BIGINT x·y wraps silently at ~3e9 events/day and flips
    corr_sign without any error. Exact-rational DOMAIN: num²·10⁶ must fit
    decimal(38)/HUGEINT, i.e. |nΣxy−ΣxΣy| ≤ ~1e16 — daily volumes to ~1e6
    at 1000-day windows. Beyond it both engines now fail LOUDLY (DuckDB
    raises on HUGEINT overflow, Spark nulls the decimal) instead of
    returning a silently wrapped sign."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.withColumn("day", F.expr("unix_micros(ts) div 86400000000"))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    days = d.select("day").distinct()
    types = d.select("event_type").distinct()
    m = (
        days.crossJoin(F.broadcast(types))
        .join(d, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )
    a = m.select(F.col("day"), F.col("event_type").alias("ta"), F.col("n").alias("x"))
    b = m.select(F.col("day"), F.col("event_type").alias("tb"), F.col("n").alias("y"))
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    p = (
        a.join(b, "day")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(yd).alias("sy"),
            F.sum(xd * F.col("y")).alias("sxy"),
            F.sum(xd * F.col("x")).alias("sxx"),
            F.sum(yd * F.col("y")).alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return p.select(
        "ta",
        "tb",
        F.signum(num).cast("long").alias("corr_sign"),
        F.expr(
            "CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000) "
            "div ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT)"
        ).alias("corr2_ppm"),
    )


@register(
    "parts_subtree_totals",
    """
WITH RECURSIVE f AS (
  SELECT p_partkey AS id,
         CASE WHEN p_partkey <= 3 THEN NULL ELSE p_partkey // 4 END AS parent,
         CAST(p_retailprice AS DECIMAL(18,4)) AS price
  FROM part
),
anc(node, anc) AS (
  SELECT id, parent FROM f WHERE parent IS NOT NULL
  UNION
  SELECT a.node, f2.parent
  FROM anc a JOIN f f2 ON f2.id = a.anc
  WHERE f2.parent IS NOT NULL
),
member AS (
  SELECT node, anc FROM anc
  UNION ALL
  SELECT id, id FROM f
)
SELECT m.anc AS part,
       CAST(count(*) AS BIGINT) AS subtree_size,
       round(CAST(sum(f.price) AS DOUBLE), 2) AS subtree_price
FROM member m JOIN f ON f.id = m.node
GROUP BY 1
HAVING count(*) > 1
""",
)
def parts_subtree_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree aggregates over the synthetic part hierarchy: for every
    internal node, the size and decimal-exact price total of its ENTIRE
    subtree (descendants + self) — the BOM-cost/permission-inheritance
    workload that needs the full ancestor closure, not just roots. The
    closure builds in O(log height) doubling rounds
    (operators/graph.py::ancestor_closure); the oracle recurses the
    textbook way. Closure size is O(n·height) — bounded, since realistic
    hierarchies are log-deep."""
    from mobsos_event_log_generator_spark.operators.graph import ancestor_closure

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.when(F.col("p_partkey") <= 3, F.lit(None)).otherwise(
            F.expr("p_partkey div 4")
        ).alias("parent"),
        F.col("p_retailprice").cast("decimal(18,4)").alias("price"),
    )
    closure = ancestor_closure(part.select("id", "parent"))
    member = closure.select(F.col("node"), F.col("anc")).unionByName(
        part.select(F.col("id").alias("node"), F.col("id").alias("anc"))
    )
    return (
        member.join(part.select(F.col("id").alias("node"), "price"), "node")
        .groupBy(F.col("anc").alias("part"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("subtree_size"),
            F.round(F.sum("price").cast("double"), 2).alias("subtree_price"),
        )
        .filter(F.col("subtree_size") > 1)
    )


#: Benford first-digit probabilities log10(1+1/d), scaled to integer ppm —
#: fixed literals so both engines compare against the identical table.
_BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
                6: 66947, 7: 57992, 8: 51153, 9: 45757}


def _benford_case_sql() -> str:
    return "CASE d " + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()) + " END"


@register(
    "orders_benford_audit",
    f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM digits),
obs AS (SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM digits GROUP BY 1)
SELECT d, cnt,
       CAST((cnt * 1000000) // total AS BIGINT) AS obs_ppm,
       CAST({_benford_case_sql()} AS BIGINT) AS benford_ppm,
       CAST(abs((cnt * 1000000) // total - {_benford_case_sql()}) AS BIGINT) AS dev_ppm
FROM obs, n
""",
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals — the classic
    fabricated-numbers screen. Observed first-digit shares in integer ppm
    against the fixed Benford table (log10(1+1/d) pre-scaled to ppm
    literals, so no engine evaluates a log) with per-digit absolute
    deviation. One aggregation pass + a 1-row total broadcast."""
    ev = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = ev.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("d")
    )
    n = digits.agg(F.count(F.lit(1)).cast("long").alias("total"))
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    bexpr = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )[F.col("d")].cast("long")
    return (
        obs.crossJoin(F.broadcast(n))
        .select(
            "d",
            "cnt",
            F.expr("(cnt * 1000000L) div total").cast("long").alias("obs_ppm"),
            bexpr.alias("benford_ppm"),
            F.abs(F.expr("(cnt * 1000000L) div total") - bexpr).cast("long").alias("dev_ppm"),
        )
    )


@register(
    "events_quantile_normalize",
    """
WITH ref AS (
  SELECT value, row_number() OVER (ORDER BY value, event_id) AS r
  FROM events WHERE event_type = 'click'
),
nref AS (SELECT CAST(count(*) AS BIGINT) AS n_ref FROM ref),
grp AS (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
         count(*) OVER (PARTITION BY event_type) AS n_g
  FROM events WHERE event_type <> 'click'
)
SELECT g.event_id, g.event_type,
       round(g.value, 2) AS value,
       round(ref.value, 2) AS normalized_value
FROM grp g, nref
JOIN ref ON ref.r = ((g.r * nref.n_ref + g.n_g - 1) // g.n_g)
""",
)
def events_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical quantile normalization — map every non-click event's value
    onto the click distribution at the same quantile position (the ML
    feature-alignment transform): target rank = ⌈r·n_ref/n_g⌉ in exact
    integer arithmetic, then an equi-join fetches the reference value, so
    the output is composed of VALUES THAT EXIST in the reference (no
    interpolation float). Per-group ranks ride partitioned windows; the
    single-group reference ranks go through the two-phase prefix count
    (operators/sweep.py) — the oracle's global ORDER BY window is exactly
    the shape avoided."""
    from pyspark.sql.window import Window

    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    ev = load_table(spark, sf_dir, "events")
    ref_rows = ev.filter(F.col("event_type") == "click").select("event_id", "value")
    ref = value_ordered_running_sum(
        ref_rows, "value", ["event_id"], F.lit(1).cast("long"), out_col="r"
    ).select(F.col("r"), F.col("value").alias("ref_value"))
    n_ref_row = ref_rows.agg(F.count(F.lit(1)).cast("long").alias("n_ref"))

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    grp = (
        ev.filter(F.col("event_type") != "click")
        .select("event_id", "event_type", "value")
        .withColumn("r", F.row_number().over(w).cast("long"))
        .withColumn("n_g", F.count(F.lit(1)).over(wc).cast("long"))
    )
    mapped = grp.crossJoin(F.broadcast(n_ref_row)).withColumn(
        "target_r", F.expr("(r * n_ref + n_g - 1) div n_g")
    )
    return (
        mapped.join(ref, mapped["target_r"] == ref["r"])
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round("ref_value", 2).alias("normalized_value"),
        )
    )


@register(
    "events_changepoint_cusum",
    """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM daily),
c AS (
  SELECT day, x,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
         CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS sk
  FROM daily
),
scored AS (
  SELECT day, k, CAST(abs(n * sk - k * s) AS BIGINT) AS dev, n, s
  FROM c, tot
)
SELECT day AS change_day, k, dev,
       CAST(n AS BIGINT) AS n_days,
       CAST((dev * 1000000) // (n * s) AS BIGINT) AS dev_ppm
FROM scored
ORDER BY dev DESC, day
LIMIT 1
""",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily event volume: the day k
    maximizing |n·S_k − k·S_n| — the cross-multiplied integer form of the
    classic max|S_k − (k/n)·S_n| statistic, so no float ratio exists and
    the argmax is deterministic (dev then day tiebreak). The cumulative
    S_k runs through the two-phase bucket prefix sum; the oracle's global
    ORDER BY window is the single-node shape replaced. Day table is
    O(days): bounded forever."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.expr("unix_micros(ts) div 86400000000"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    c = value_ordered_running_sum(daily, "day", [], F.lit(1).cast("long"), out_col="k")
    c = value_ordered_running_sum(c, "day", [], F.col("x"), out_col="sk")
    scored = c.crossJoin(F.broadcast(tot)).select(
        F.col("day").alias("change_day"),
        F.col("k").cast("long").alias("k"),
        F.abs(F.col("n") * F.col("sk") - F.col("k") * F.col("s")).cast("long").alias("dev"),
        F.col("n").cast("long").alias("n_days"),
        F.col("s"),
    )
    return (
        scored.orderBy(F.col("dev").desc(), F.col("change_day"))
        .limit(1)
        .select(
            "change_day",
            "k",
            "dev",
            "n_days",
            F.expr("(dev * 1000000L) div (n_days * s)").cast("long").alias("dev_ppm"),
        )
    )


@register(
    "customers_revenue_gini",
    """
WITH rev AS (
  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS k
  FROM rev
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         sum(CAST(k AS HUGEINT) * cents) AS ks
  FROM ranked
)
SELECT n AS n_customers, s AS total_cents,
       CAST(2 * ks - (n::HUGEINT + 1) * s AS BIGINT) AS gini_num,
       CAST(n * s AS BIGINT) AS gini_den,
       CAST(((2 * ks - (n::HUGEINT + 1) * s) * 1000000) // (n::HUGEINT * s::HUGEINT) AS BIGINT) AS gini_ppm
FROM agg
""",
)
def customers_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient over customers, EXACT: with
    per-customer cents x sorted ascending and rank k, G = (2Σk·x − (n+1)Σx)
    / (n·Σx) — integers end to end (the rational pair plus integer ppm).
    Ranks over the value order come from the two-phase prefix count
    (operators/sweep.py), never a single-partition window; the one
    aggregate row follows. The inequality metric every marketplace/corpus
    diversity report wants, with zero float surface."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = value_ordered_running_sum(
        rev, "cents", ["o_custkey"], F.lit(1).cast("long"), out_col="k"
    )
    # decimal-first multiply (r10 audit): rank k reaches the customer count,
    # so the BIGINT product k*cents wraps silently at ~3e7 customers; the
    # oracle multiplies in HUGEINT. The num/den READOUTS stay BIGINT by
    # contract (the exact-rational domain: n*s must fit int64; out of
    # domain Spark nulls and DuckDB raises — never a silent wrap).
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("cents")).alias("ks"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.col("s").alias("total_cents"),
        (F.lit(2) * F.col("ks") - (F.col("n") + 1) * F.col("s")).cast("long").alias("gini_num"),
        (F.col("n") * F.col("s")).cast("long").alias("gini_den"),
        F.expr(
            "CAST((CAST(2 * ks - (CAST(n AS DECIMAL(38,0)) + 1) * s AS DECIMAL(38,0)) * 1000000) "
            "div (CAST(n AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@register(
    "lineitem_partition_advisor",
    """
WITH k AS (SELECT l_orderkey AS key FROM lineitem),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT key) AS BIGINT) AS n_keys
  FROM k
),
hot AS (
  SELECT CAST(max(c) AS BIGINT) AS max_key_rows
  FROM (SELECT count(*) AS c FROM k GROUP BY key)
)
SELECT n_rows, n_keys, max_key_rows,
       CAST((max_key_rows * 1000000) // n_rows AS BIGINT) AS hot_share_ppm,
       CAST((n_rows + 999999) // 1000000 AS BIGINT) AS advised_partitions,
       CASE WHEN max_key_rows * n_keys > 10 * n_rows THEN 'salt-hot-keys'
            WHEN n_keys < 32 THEN 'broadcast-or-coalesce'
            ELSE 'hash-partition-on-key' END AS advice
FROM stats, hot
""",
)
def lineitem_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning advisor: one aggregation pass computes the facts a
    planner needs before a big shuffle — row/key cardinalities, the hottest
    key's share (integer ppm), a row-budgeted partition count (1M rows per
    task here; bytes-per-task in production), and a categorical
    recommendation: salt when the hottest key dwarfs the mean (max·keys >
    10·rows ⇔ max > 10×mean), broadcast/coalesce for tiny key spaces,
    plain hash partitioning otherwise. The same sampled-stats decision
    operators/skew.py makes adaptively, surfaced as an auditable report."""
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("key"))
    per_key = li.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
    stats = per_key.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_key_rows"),
    )
    return stats.select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.expr("(max_key_rows * 1000000L) div n_rows").cast("long").alias("hot_share_ppm"),
        F.expr("(n_rows + 999999L) div 1000000L").cast("long").alias("advised_partitions"),
        F.when(F.col("max_key_rows") * F.col("n_keys") > 10 * F.col("n_rows"), "salt-hot-keys")
        .when(F.col("n_keys") < 32, "broadcast-or-coalesce")
        .otherwise("hash-partition-on-key")
        .alias("advice"),
    )


_KCORE_K = 3
_KCORE_STAGES = 16  # > max observed peel depth (11 at sf0.01); extra stages are idempotent


def _kcore_oracle_sql(k: int, stages: int) -> str:
    parts = [
        """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.l_partkey AS s, c.l_partkey AS d
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
)"""
    ]
    for i in range(1, stages + 1):
        parts.append(
            f""",
k{i} AS MATERIALIZED (
  SELECT node FROM (SELECT s AS node FROM e{i - 1} UNION ALL SELECT d FROM e{i - 1})
  GROUP BY 1 HAVING count(*) >= {k}
),
e{i} AS MATERIALIZED (
  SELECT s, d FROM e{i - 1}
  WHERE s IN (SELECT node FROM k{i}) AND d IN (SELECT node FROM k{i})
)"""
        )
    parts.append(
        f"""
SELECT node AS part, CAST(count(*) AS BIGINT) AS core_degree
FROM (SELECT s AS node FROM e{stages} UNION ALL SELECT d FROM e{stages})
GROUP BY 1 HAVING count(*) >= {k}"""
    )
    return "".join(parts)


@register("parts_cooccur_kcore", _kcore_oracle_sql(_KCORE_K, _KCORE_STAGES))
def parts_cooccur_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-core of the part co-occurrence graph — the dense backbone that
    survives after peeling leaves and tendrils (the pre-filter community
    and centrality analyses run on). The operator peels to the TRUE
    fixpoint with a per-round convergence check (operators/graph.py::
    k_core — peeling depth, not node count, bounds the rounds: 11 at
    sf0.01); the oracle unrolls 16 peel stages, safely past the fixpoint
    since further stages are idempotent — the same unrolled-CTE replay
    pattern as the PageRank gate."""
    from mobsos_event_log_generator_spark.operators.graph import k_core

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("s"))
    c = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("d"))
    edges = (
        a.join(c, "l_orderkey")
        .filter(F.col("s") < F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("s", "d")
    )
    return k_core(edges, _KCORE_K, "s", "d").select(
        F.col("node").alias("part"), "core_degree"
    )


_LP_ROUNDS = 2


def _lp_oracle_sql(rounds: int) -> str:
    parts = [
        """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
eu AS MATERIALIZED (
  SELECT a.l_partkey AS s, c.l_partkey AS d
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
e AS MATERIALIZED (SELECT s, d FROM eu UNION ALL SELECT d, s FROM eu),
l0 AS MATERIALIZED (
  SELECT p_partkey AS node,
         CASE WHEN p_partkey % 5 = 0 THEN p_brand END AS label
  FROM part
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
v{i} AS MATERIALIZED (
  SELECT e.s AS node, l.label, count(*) AS cnt
  FROM e JOIN l{i - 1} l ON l.node = e.d
  WHERE l.label IS NOT NULL
  GROUP BY 1, 2
),
w{i} AS MATERIALIZED (
  SELECT node, label,
         row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
  FROM v{i}
),
l{i} AS MATERIALIZED (
  SELECT l0.node, COALESCE(l0.label, w{i}.label) AS label
  FROM l0 LEFT JOIN w{i} ON w{i}.node = l0.node AND w{i}.rn = 1
)"""
        )
    parts.append(
        f"""
SELECT node AS part, label FROM l{rounds} WHERE label IS NOT NULL"""
    )
    return "".join(parts)


@register("parts_label_propagation", _lp_oracle_sql(_LP_ROUNDS))
def parts_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation: 20% of parts keep their brand as
    seed labels; two synchronous rounds spread labels over the
    co-occurrence graph — each unlabeled node adopts the MAJORITY label of
    its labeled neighbors, ties to the alphabetically smaller brand
    (deterministic). Per round: one edge-label join + one
    map-side-combined count + one min-struct argmax — never a collect. The
    oracle unrolls both rounds (MATERIALIZED stages, pitfall 13); seeds
    are immutable by construction in both engines."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("s"))
    c = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("d"))
    eu = (
        a.join(c, "l_orderkey")
        .filter(F.col("s") < F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("s", "d")
    )
    e = eu.unionAll(eu.select(F.col("d").alias("s"), F.col("s").alias("d")))
    seeds = part.select(
        F.col("p_partkey").alias("node"),
        F.when(F.col("p_partkey") % 5 == 0, F.col("p_brand")).alias("seed_label"),
    )
    labels = seeds.select("node", F.col("seed_label").alias("label"))
    for _ in range(_LP_ROUNDS):
        votes = (
            e.join(labels.filter(F.col("label").isNotNull()).select(F.col("node").alias("d"), "label"), "d")
            .groupBy(F.col("s").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = votes.groupBy("node").agg(
            F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("label"))).alias("__w")
        ).select("node", F.col("__w.label").alias("prop_label"))
        labels = (
            seeds.join(winner, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("seed_label"), F.col("prop_label")).alias("label"),
            )
        )
    return labels.filter(F.col("label").isNotNull()).select(F.col("node").alias("part"), "label")


@register(
    "users_decayed_engagement",
    """
WITH mx AS (SELECT max(epoch_us(ts)) // 86400000000 AS max_day FROM events),
d AS (
  SELECT user_id,
         CAST(max_day - epoch_us(ts) // 86400000000 AS BIGINT) AS age
  FROM events, mx
),
w AS (
  SELECT user_id, age FROM d WHERE age <= 30
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_recent,
       CAST(sum(1::BIGINT << CAST(30 - age AS INTEGER)) AS BIGINT) AS decayed_score_q30,
       CAST(max(30 - age) AS BIGINT) AS freshest_weight_log2
FROM w GROUP BY 1
""",
)
def users_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement: each event in the trailing 30 days
    contributes weight 2^(30−age_days) — an EXACT half-life decay in fixed
    point (the score is the Q30 integer; divide by 2³⁰ for the unit-decay
    reading, but no engine ever does — integer sums only). The
    feature-engineering primitive behind churn/activity models, with zero
    float surface; one aggregate over a 1-row max-day broadcast."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.expr("max(unix_micros(ts)) div 86400000000").alias("max_day"))
    d = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        (F.col("max_day") - F.expr("unix_micros(ts) div 86400000000")).cast("long").alias("age"),
    )
    w = d.filter(F.col("age") <= 30)
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_recent"),
        F.sum(F.expr("CAST(1L AS BIGINT) << CAST(30 - age AS INT)")).cast("long").alias("decayed_score_q30"),
        F.max(F.lit(30) - F.col("age")).cast("long").alias("freshest_weight_log2"),
    )


@register(
    "parts_sorted_neighborhood_pairs",
    """
WITH r AS (
  SELECT p_partkey, p_name,
         CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS rk
  FROM part
)
SELECT a.p_partkey AS id1, b.p_partkey AS id2,
       CAST(b.rk - a.rk AS BIGINT) AS rank_gap,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
)
def parts_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernández & Stolfo's
    merge/purge): records sort by a blocking key and only a sliding window
    of neighbors (here 3) is ever compared — the complement to token
    blocking when typos break token equality but preserve sort locality.
    The global sort rank comes from the two-phase prefix count, never a
    single-partition window; the window join is a 1-D banded self-join on
    the rank (each row replicates into its rank bucket ±1 — the spatial
    grid join's little sibling); Levenshtein ≤ 4 verifies. The oracle's
    global ORDER BY window is the single-node shape replaced."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    # rank over (p_name, p_partkey): bucket by name ordering — use a numeric
    # proxy of the name prefix for quantile bucketing (first 4 bytes), which
    # is monotone in the name order; ties all land in one bucket, preserving
    # the in-bucket total order.
    proxied = part.withColumn(
        "__proxy",
        F.conv(F.substring(F.hex(F.encode(F.rpad(F.col("p_name"), 4, " "), "UTF-8")), 1, 8), 16, 10)
        .cast("long"),
    )
    ranked = value_ordered_running_sum(
        proxied.withColumn("__name", F.col("p_name")),
        "__proxy",
        ["__name", "p_partkey"],
        F.lit(1).cast("long"),
        out_col="rk",
    ).select("p_partkey", "p_name", F.col("rk").cast("long"))
    W = 3
    a = ranked.select(
        F.col("p_partkey").alias("id1"), F.col("p_name").alias("n1"), F.col("rk").alias("rk1"),
        F.explode(F.array(*[F.expr(f"(rk div {W}) + {o}") for o in (0, 1)])).alias("bucket"),
    )
    b = ranked.select(
        F.col("p_partkey").alias("id2"), F.col("p_name").alias("n2"), F.col("rk").alias("rk2"),
        F.expr(f"rk div {W}").alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter((F.col("rk2") > F.col("rk1")) & (F.col("rk2") <= F.col("rk1") + W))
        .withColumn("lev", F.levenshtein(F.col("n1"), F.col("n2")).cast("long"))
        .filter(F.col("lev") <= 4)
        .select(
            "id1",
            "id2",
            (F.col("rk2") - F.col("rk1")).cast("long").alias("rank_gap"),
            "lev",
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap (uncertainty at scale)
# ---------------------------------------------------------------------------

#: Number of bootstrap replicates.
BOOTSTRAP_REPLICATES = 32

#: floor(CDF_Poisson(1)(k) * 2^48) for k = 0..8, computed once with 60-digit
#: decimal arithmetic. A 48-bit md5 uniform u gives the replicate weight
#: w = #{k : u >= T_k} — an exact-integer inverse-CDF table lookup, identical
#: in any engine that speaks md5. P(w > 9) ~ 1.1e-10 rolls into w = 9.
_POISSON1_CDF_48 = (
    103548857136060,
    207097714272121,
    258872142840152,
    276130285696162,
    280444821410164,
    281307728552965,
    281451546410098,
    281472091818260,
    281474659994280,
)


@register(
    "orders_poisson_bootstrap",
    f"""
WITH x AS (
  SELECT o_orderkey, {XM.sql_int_units('o_totalprice', 2)} AS cents, b
  FROM orders, unnest(range(1, {BOOTSTRAP_REPLICATES + 1})) AS t(b)
),
un AS (
  SELECT b, cents,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 12))::BIGINT AS u
  FROM x
),
wgt AS (
  SELECT b, cents,
         {' + '.join(f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _POISSON1_CDF_48)}
           AS w
  FROM un
)
SELECT CAST(b AS INTEGER) AS replicate,
       CAST(sum(w) AS BIGINT) AS n_sampled,
       {XM.sql_sum_round('sum(w * cents)', 2, in_scale=2)} AS boot_total
FROM wgt
GROUP BY b
""",
)
def orders_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al. 2012, public — the bootstrap that
    works on data too large to resample): instead of drawing n rows with
    replacement per replicate (a global shuffle per replicate), each row
    independently contributes a Poisson(1)-distributed weight to each of the
    B replicates. The weight is deterministic — a 48-bit md5 uniform per
    (row, replicate) pushed through an exact-integer inverse-CDF threshold
    table (_POISSON1_CDF_48) — so both engines materialize the identical
    resample and the replicate totals hash-match exactly. One corpus scan;
    the B-way explode collapses map-side (partial aggregation emits <= B
    rows per partition), so the shuffle carries B rows per partition
    regardless of data size — at 100 TB the cost is one pass + 32 counters
    per partition, where a classical bootstrap would be 32 global samples.
    The spread of boot_total across replicates IS the sampling distribution
    of total order value; downstream CI = order statistics over 32 rows."""
    from mobsos_event_log_generator_spark.sources.parquet import ensure_min_partitions

    # per-row-heavy (x32 explode + md5 per replicate): spread the scan even
    # when the fixture arrives as a single parquet split
    orders = ensure_min_partitions(load_table(spark, sf_dir, "orders"))
    b = F.explode(F.sequence(F.lit(1), F.lit(BOOTSTRAP_REPLICATES))).alias("b")
    x = orders.select(
        F.col("o_orderkey"), XM.int_units_long(F.col("o_totalprice"), 2).alias("cents"), b
    )
    # Materialize the 48-bit uniform through its own projection so the nine
    # threshold comparisons reference a column, not nine inlined md5 chains
    # (pitfall 1/2: CollapseProject keeps the boundary because the md5+conv
    # expression is non-cheap and referenced > 1 time).
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("o_orderkey").cast("string"), F.col("b").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    ux = x.select("cents", "b", u.alias("u"))
    w = None
    for t in _POISSON1_CDF_48:
        term = F.when(F.col("u") >= F.lit(t), 1).otherwise(0)
        w = term if w is None else w + term
    return (
        ux.withColumn("w", w)
        .groupBy(F.col("b").cast("int").alias("replicate"))
        .agg(
            F.sum("w").cast("long").alias("n_sampled"),
            # decimal-first multiply (r10 audit): the per-replicate group
            # spans the WHOLE orders table, so the long accumulation of
            # w*cents (w <= 8) exits int_units_long's bounded-key domain at
            # ~$9.2e16 total — widen BEFORE the sum; DuckDB's sum already
            # promotes to HUGEINT.
            XM.sum_round(
                F.sum(F.col("w").cast("decimal(38,0)") * F.col("cents")), 2, in_scale=2
            ).alias("boot_total"),
        )
    )


@register(
    "events_type_entropy_daily",
    """
WITH c AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT event_date, sum(n) AS nn FROM c GROUP BY 1)
SELECT c.event_date,
       CAST(t.nn AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       round(ln(CAST(t.nn AS DOUBLE))
             - sum(n * ln(CAST(n AS DOUBLE))) / CAST(t.nn AS DOUBLE), 6) AS entropy
FROM c JOIN t USING (event_date)
GROUP BY c.event_date, t.nn
""",
)
def events_type_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Shannon entropy of the event-type mix — the distribution-shape
    drift lens next to the KS/PSI/CUSUM monitors: a day whose traffic
    collapses onto one event type (incident, bot flood) drops toward 0
    bits even when total volume looks normal. Same exact form as
    text_unigram_entropy (H = ln N − Σ n·ln n / N, 6 dp): the inner sum
    runs over the bounded event-type alphabet per day, so the whole query
    is two map-side-combined aggregates over (day, type) counts — no
    per-event float math and nothing scales past the (days × types)
    grid."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_date").agg(F.sum("n").alias("nn"))
    return (
        c.join(t, "event_date")
        .groupBy("event_date", "nn")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.round(
                F.log(F.col("nn").cast("double"))
                - F.sum(F.col("n") * F.log(F.col("n").cast("double"))) / F.col("nn").cast("double"),
                6,
            ).alias("entropy"),
        )
        .select(
            "event_date",
            F.col("nn").cast("long").alias("n_events"),
            "n_types",
            "entropy",
        )
    )


@register(
    "events_mannwhitney_drift",
    """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, value AS v
  FROM events WHERE value IS NOT NULL
),
bnd AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
m AS (
  SELECT event_type, v,
         CASE WHEN us <= (lo + hi) // 2 THEN 1 ELSE 2 END AS s
  FROM e, bnd
),
g AS (
  SELECT event_type, v,
         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM m GROUP BY 1, 2
),
c AS (
  SELECT event_type, a, b, a + b AS t,
         sum(a + b) OVER (PARTITION BY event_type ORDER BY v) AS ct
  FROM g
),
agg AS (
  SELECT event_type,
         CAST(sum(a) AS BIGINT) AS n1,
         CAST(sum(b) AS BIGINT) AS n2,
         CAST(sum(a * (2 * ct - t + 1)) AS BIGINT) AS r1x2,
         CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
  FROM c GROUP BY 1
),
u AS (
  SELECT event_type, n1, n2,
         CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u2_before,
         tie_term
  FROM agg
)
SELECT event_type, n1, n2, u2_before, tie_term,
       CASE WHEN n1 > 0 AND n2 > 0 AND
                 CAST(n1 + n2 + 1 AS DOUBLE) - CAST(tie_term AS DOUBLE) /
                 (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)) > 0
         THEN round((CAST(u2_before - n1 * n2 AS DOUBLE) / 2.0) /
              sqrt(CAST(n1 * n2 AS DOUBLE) * (CAST(n1 + n2 + 1 AS DOUBLE) -
              CAST(tie_term AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) *
              CAST(n1 + n2 - 1 AS DOUBLE))) / 12.0), 6)
       END AS z_approx
FROM u
""",
)
def events_mannwhitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U drift per event type: the rank-based two-sample test
    next to the KS/PSI monitors — sensitive to median/stochastic-dominance
    shifts where KS's max-gap can stay flat, and immune to the outliers
    that wreck a t-test on heavy-tailed telemetry values. Events split at
    the global midpoint timestamp (the PSI convention); each type compares
    its before/after value distributions. The doubled-rank trick keeps
    U, rank sums, and the tie correction exact-integer cross-engine
    (operators/stats.py::mannwhitney_u); the oracle's per-type global
    ORDER BY window is the single-node shape the grouped two-phase prefix
    sum replaces."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.select("event_type", F.unix_micros("ts").alias("us"), "value")
    bnd = e.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    m = (
        e.crossJoin(F.broadcast(bnd))
        .select(
            "event_type",
            "value",
            F.when(F.col("us") <= F.expr("(lo + hi) div 2"), 1).otherwise(2).alias("side"),
        )
    )
    from mobsos_event_log_generator_spark.operators.stats import mannwhitney_u

    return mannwhitney_u(m, "value", "side", group_cols=["event_type"])


@register(
    "events_autocorrelation",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
bnd AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events),
spine AS (
  SELECT CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bnd b
),
series AS (
  SELECT s.d, CAST(COALESCE(dl.x, 0) AS HUGEINT) AS x
  FROM spine s LEFT JOIN daily dl USING (d)
),
g AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS s,
         CAST(sum(x * x) AS HUGEINT) AS q
  FROM series
),
p AS (
  SELECT l.lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(t.x * u.x) AS HUGEINT) AS sxy,
         CAST(sum(t.x) AS HUGEINT) AS sa,
         CAST(sum(u.x) AS HUGEINT) AS sb
  FROM (SELECT unnest([1, 2, 3, 7]) AS lag) l
  JOIN series t ON TRUE
  JOIN series u ON u.d = t.d + l.lag
  GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       floor((CAST(n * n * sxy - n * s * (sa + sb) + n_pairs * s * s AS DOUBLE)
              / CAST(n * n * q - n * s * s AS DOUBLE)) * 1000000 + 0.5) / 1000000
         AS acf
FROM p, g
ORDER BY lag
""",
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1/2/3/7 --
    the periodicity lens next to the KS/PSI/CUSUM/MWU drift monitors (a
    healthy weekly-seasonal service shows acf(7) >> acf(3); a flatlined
    or bursty one does not). Days are zero-filled over the observed
    calendar spine so lags mean calendar days, not observation gaps.
    Pearson r_L = sum_t (x_t-mean)(x_{t+L}-mean) / sum_t (x_t-mean)^2 is
    computed from N^2-scaled integer sums (num = N^2*Sxy - N*S*(Sa+Sb) +
    n_pairs*S^2, den = N^2*Q - N*S^2, decimal(38,0) -- doubled-rank-style
    exactness, good to ~1e9 events/day), so the only float is ONE
    structurally-identical double division, rounded via floor(x*1e6+0.5)
    (the gapfill midpoint-safe form). Scale shape: one map-side-combined
    scan to daily counts; everything after runs on the calendar-bounded
    day grid (spine, lag self-join, 1-row stats broadcast)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    bnd = ev.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = bnd.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    series = spine.join(daily, "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0)).cast("decimal(38,0)").alias("x")
    )
    g = series.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("q"),
    )
    lags = spine.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in (1, 2, 3, 7)])).alias("lag")
    )
    t = series.select(F.col("d").alias("td"), F.col("x").alias("tx"))
    u = series.select(F.col("d").alias("ud"), F.col("x").alias("ux"))
    p = (
        t.crossJoin(F.broadcast(lags))
        .join(u, F.col("ud") == F.date_add(F.col("td"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("tx") * F.col("ux")).cast("decimal(38,0)").alias("sxy"),
            F.sum("tx").cast("decimal(38,0)").alias("sa"),
            F.sum("ux").cast("decimal(38,0)").alias("sb"),
        )
    )
    num = (
        F.col("n") * F.col("n") * F.col("sxy")
        - F.col("n") * F.col("s") * (F.col("sa") + F.col("sb"))
        + F.col("n_pairs").cast("decimal(38,0)") * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("q") - F.col("n") * F.col("s") * F.col("s")
    return (
        p.crossJoin(F.broadcast(g))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_pairs",
            (
                F.floor(
                    (num.cast("double") / den.cast("double")) * F.lit(1000000.0)
                    + F.lit(0.5)
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "parts_link_prediction",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS s, c.l_partkey AS d
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (SELECT s AS src, d AS dst FROM e UNION ALL SELECT d, s FROM e),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
w AS (
  SELECT w1.src AS p1, w2.dst AS p2, w1.dst AS mid
  FROM sym w1 JOIN sym w2 ON w2.src = w1.dst
  WHERE w1.src < w2.dst
),
cand AS (
  SELECT w.p1, w.p2,
         CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(sum(1000000 // dm.deg) AS BIGINT) AS ra_micro
  FROM w JOIN deg dm ON dm.node = w.mid
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.s = w.p1 AND e.d = w.p2)
  GROUP BY 1, 2
)
SELECT p1, p2, common_neighbors,
       CAST((common_neighbors * 1000000)
            // (d1.deg + d2.deg - common_neighbors) AS BIGINT) AS jaccard_ppm,
       ra_micro
FROM cand JOIN deg d1 ON d1.node = p1 JOIN deg d2 ON d2.node = p2
ORDER BY common_neighbors DESC, ra_micro DESC, p1, p2
LIMIT 100
""",
)
def parts_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction candidate generation on the part co-purchase graph
    (edges = pairs bought together in >= 2 orders): the top-100 2-hop
    NON-edges ranked by common-neighbor count, with exact-integer Jaccard
    (cn*1e6 div (deg1+deg2-cn)) and a resource-allocation index (Zhou et
    al. 2009) quantized per term as sum(1e6 div deg(mid)) so the score is
    an exact integer on any engine (documented floor-per-term variant of
    sum 1/deg). This is the positive/negative candidate miner behind
    graph-ML training sets -- the graph-edge analogue of
    corpus_hard_negatives. Scale shape: one distinct scan + the same
    thresholded edge build as the triangle/k-core family; the wedge join
    is keyed on the middle vertex and the candidate table is
    wedge-bounded -- at 100 TB, hub middles dominate, so raise the
    co-purchase threshold or cap middle degree before the wedge join
    (same mitigation documented on parts_cooccur_triangles); the final
    ORDER BY .. LIMIT compiles to TakeOrderedAndProject (per-partition
    top-k, no global sort), with a total ordering key so the cut is
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("s"))
    c = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("d"))
    edges = (
        a.join(c, "l_orderkey")
        .filter(F.col("s") < F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("s", "d")
    )
    sym = edges.select(F.col("s").alias("src"), F.col("d").alias("dst")).unionAll(
        edges.select(F.col("d").alias("src"), F.col("s").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    w1 = sym.select(F.col("src").alias("p1"), F.col("dst").alias("mid"))
    w2 = sym.select(F.col("src").alias("mid"), F.col("dst").alias("p2"))
    wedges = w1.join(w2, "mid").filter(F.col("p1") < F.col("p2"))
    cand = (
        wedges.join(edges, (F.col("p1") == F.col("s")) & (F.col("p2") == F.col("d")), "left_anti")
        .join(deg.select(F.col("node").alias("mid"), F.col("deg").alias("dm")), "mid")
        .groupBy("p1", "p2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum(F.expr("1000000L div dm")).cast("long").alias("ra_micro"),
        )
    )
    return (
        cand.join(deg.select(F.col("node").alias("p1"), F.col("deg").alias("deg1")), "p1")
        .join(deg.select(F.col("node").alias("p2"), F.col("deg").alias("deg2")), "p2")
        .select(
            "p1",
            "p2",
            "common_neighbors",
            F.expr("(common_neighbors * 1000000L) div (deg1 + deg2 - common_neighbors)")
            .cast("long")
            .alias("jaccard_ppm"),
            "ra_micro",
        )
        .orderBy(
            F.col("common_neighbors").desc(), F.col("ra_micro").desc(), "p1", "p2"
        )
        .limit(100)
    )


@register(
    "events_theilsen_trend",
    """
WITH bnd AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events),
spine AS (
  SELECT CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS d, b.lo
  FROM bnd b
),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT t.event_type,
         CAST(date_diff('day', s.lo, s.d) AS HUGEINT) AS ti,
         CAST(COALESCE(dl.x, 0) AS HUGEINT) AS x
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN spine s
  LEFT JOIN daily dl ON dl.event_type = t.event_type AND dl.d = s.d
),
p AS (
  SELECT a.event_type,
         CAST(((b.x - a.x) * 1000000) // (b.ti - a.ti) AS BIGINT) AS slope
  FROM series a JOIN series b
    ON b.event_type = a.event_type AND b.ti > a.ti
),
r AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rk,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM p
),
med AS (
  SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
         CAST(slope AS BIGINT) AS theilsen_slope_micro
  FROM r WHERE rk = (np + 1) // 2
),
o AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(ti) AS HUGEINT) AS st,
         CAST(sum(x) AS HUGEINT) AS sy,
         CAST(sum(ti * x) AS HUGEINT) AS sty,
         CAST(sum(ti * ti) AS HUGEINT) AS stt
  FROM series GROUP BY 1
),
ols AS (
  SELECT event_type, CAST(n AS BIGINT) AS n_days,
         CAST(((n * sty - st * sy) * 1000000) // (n * stt - st * st) AS BIGINT)
           AS ols_slope_micro
  FROM o
)
SELECT event_type, n_days, n_pairs, theilsen_slope_micro, ols_slope_micro
FROM ols JOIN med USING (event_type)
""",
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type volume trend, robust and classical side by side:
    Theil-Sen slope (lower median of all pairwise day slopes -- immune to
    the outlier days that bend OLS) and the OLS slope, both in exact
    integer micro-events/day. Daily counts zero-fill over the global
    calendar spine so slopes mean calendar time. Every division is
    truncating integer division, which Spark's `div` and DuckDB's `//`
    both implement (verified incl. negatives and decimals), so no float
    enters the gate; OLS sums ride decimal(38,0) (y up to ~1e9/day safe).
    Scale shape: one map-side scan to (type, day) counts, then everything
    runs on the calendar-bounded grid -- the pairwise table is
    O(types x days^2) rows (66k/type at a 1-year spine), never touching
    raw events; the median window partitions by type over that bounded
    table."""
    ev = load_table(spark, sf_dir, "events")
    bnd = ev.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = bnd.select(
        F.explode(F.sequence("lo", "hi")).alias("d"), "lo"
    )
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    series = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.datediff("d", "lo").cast("decimal(38,0)").alias("ti"),
            F.coalesce(F.col("x"), F.lit(0)).cast("decimal(38,0)").alias("x"),
        )
    )
    a = series.select("event_type", F.col("ti").alias("ai"), F.col("x").alias("ax"))
    b = series.select("event_type", F.col("ti").alias("bi"), F.col("x").alias("bx"))
    p = (
        a.join(b, "event_type")
        .filter(F.col("bi") > F.col("ai"))
        .select(
            "event_type",
            F.expr("((bx - ax) * 1000000) div (bi - ai)").cast("long").alias("slope"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("slope")
    wc = Window.partitionBy("event_type")
    med = (
        p.withColumn("rk", F.row_number().over(wr))
        .withColumn("np", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") == F.expr("(np + 1) div 2"))
        .select(
            "event_type",
            F.col("np").cast("long").alias("n_pairs"),
            F.col("slope").cast("long").alias("theilsen_slope_micro"),
        )
    )
    o = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("ti").cast("decimal(38,0)").alias("st"),
        F.sum("x").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("ti") * F.col("x")).cast("decimal(38,0)").alias("sty"),
        F.sum(F.col("ti") * F.col("ti")).cast("decimal(38,0)").alias("stt"),
    )
    ols = o.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.expr("((n * sty - st * sy) * 1000000) div (n * stt - st * st)")
        .cast("long")
        .alias("ols_slope_micro"),
    )
    return ols.join(med, "event_type").select(
        "event_type", "n_days", "n_pairs", "theilsen_slope_micro", "ols_slope_micro"
    )


@register(
    "customers_t_closeness",
    """
WITH s AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 2000) AS BIGINT) AS sv
  FROM customer
),
gs AS (
  SELECT c_nationkey, c_mktsegment, sv, CAST(count(*) AS HUGEINT) AS n_gs
  FROM s GROUP BY 1, 2, 3
),
gt AS (
  SELECT c_nationkey, c_mktsegment, CAST(sum(n_gs) AS HUGEINT) AS n_g
  FROM gs GROUP BY 1, 2
),
alpha AS (SELECT sv, CAST(sum(n_gs) AS HUGEINT) AS n_s FROM gs GROUP BY 1),
nn_tot AS (SELECT CAST(sum(n_gs) AS HUGEINT) AS nn FROM gs),
j AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.n_g, a.sv, a.n_s,
         COALESCE(gs.n_gs, 0) AS n_gs
  FROM gt g CROSS JOIN alpha a
  LEFT JOIN gs ON gs.c_nationkey = g.c_nationkey
              AND gs.c_mktsegment = g.c_mktsegment AND gs.sv = a.sv
)
SELECT c_nationkey, c_mktsegment,
       CAST(n_g AS BIGINT) AS group_size,
       CAST(sum(CASE WHEN n_gs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sensitive,
       round(ln(CAST(n_g AS DOUBLE))
             - sum(CASE WHEN n_gs > 0
                        THEN CAST(n_gs AS DOUBLE) * ln(CAST(n_gs AS DOUBLE)) END)
               / CAST(n_g AS DOUBLE), 6) AS sensitive_entropy,
       CAST(sum(abs(n_gs * nn - n_s * n_g)) * 1000000
            // (2 * n_g * nn) AS BIGINT) AS tvd_ppm,
       CAST(sum(abs(n_gs * nn - n_s * n_g)) * 1000000
            // (2 * n_g * nn) AS BIGINT) > 250000 AS t_fail
FROM j, nn_tot
GROUP BY c_nationkey, c_mktsegment, n_g, nn
""",
)
def customers_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007) over the k-anonymity quasi-grid
    (nation x market segment, sensitive = acctbal bucket): per group, the
    total-variation distance between the group's sensitive distribution
    and the global one, as an EXACT integer ppm -- TVD = sum_s |n_gs*N -
    n_s*N_g| / (2*N_g*N), cross-multiplied so no division happens before
    the final quantization -- plus entropy l-diversity (the 6-dp entropy
    form shared with events_type_entropy_daily) and the distinct-value
    count. Absent sensitive values still contribute |0 - n_s*N_g| to TVD,
    so the group rows expand over the FULL sensitive alphabet (quasi-grid
    x alphabet -- both bounded dims; the alphabet side broadcasts). One
    scan to (group, sv) counts; everything downstream is bounded-grid
    algebra in decimal(38,0) (safe past 1e10 rows where n_gs*N passes
    int64). Flags t > 0.25 (tvd_ppm > 250000)."""
    cust = load_table(spark, sf_dir, "customer")
    s = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("sv"),
    )
    gs = s.groupBy("c_nationkey", "c_mktsegment", "sv").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_gs")
    )
    gt = gs.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_gs").cast("decimal(38,0)").alias("n_g")
    )
    alpha = gs.groupBy("sv").agg(F.sum("n_gs").cast("decimal(38,0)").alias("n_s"))
    nn_tot = gs.agg(F.sum("n_gs").cast("decimal(38,0)").alias("nn"))
    j = (
        gt.crossJoin(F.broadcast(alpha))
        .join(gs, ["c_nationkey", "c_mktsegment", "sv"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            "n_s",
            F.coalesce(F.col("n_gs"), F.lit(0).cast("decimal(38,0)")).alias("n_gs"),
        )
        .crossJoin(F.broadcast(nn_tot))
    )
    tvd_num = F.sum(F.abs(F.col("n_gs") * F.col("nn") - F.col("n_s") * F.col("n_g")))
    out = j.groupBy("c_nationkey", "c_mktsegment", "n_g", "nn").agg(
        F.sum(F.when(F.col("n_gs") > 0, 1).otherwise(0)).cast("long").alias("n_sensitive"),
        F.round(
            F.log(F.col("n_g").cast("double"))
            - F.sum(
                F.when(
                    F.col("n_gs") > 0,
                    F.col("n_gs").cast("double") * F.log(F.col("n_gs").cast("double")),
                )
            )
            / F.col("n_g").cast("double"),
            6,
        ).alias("sensitive_entropy"),
        tvd_num.alias("tvd_num"),
    )
    tvd = F.expr("(tvd_num * 1000000) div (2 * n_g * nn)").cast("long")
    return out.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_g").cast("long").alias("group_size"),
        "n_sensitive",
        "sensitive_entropy",
        tvd.alias("tvd_ppm"),
        (tvd > 250000).alias("t_fail"),
    )


@register(
    "events_chisq_independence",
    """
WITH c AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(count(*) AS HUGEINT) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, CAST(sum(o) AS HUGEINT) AS r FROM c GROUP BY 1),
ct AS (SELECT dow, CAST(sum(o) AS HUGEINT) AS cc FROM c GROUP BY 1),
nn_tot AS (SELECT CAST(sum(o) AS HUGEINT) AS nn FROM c),
grid AS (
  SELECT rt.event_type, ct.dow, rt.r, ct.cc, COALESCE(c.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN c ON c.event_type = rt.event_type AND c.dow = ct.dow
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT)
         AS dof,
       CAST(sum(((o * nn - r * cc) * (o * nn - r * cc) * 1000000)
                // (nn * r * cc)) AS BIGINT) AS chisq_micro
FROM grid, nn_tot
""",
)
def events_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event type vs day-of-week -- the
    weekly-mix drift lens next to KS/PSI/MWU (a type whose traffic
    migrates across weekdays shifts chi2 even when daily totals stay
    flat). Each cell's (O-E)^2/E rides the cross-multiplied integer form
    ((O*N - r*c)^2 * 1e6) div (N*r*c), quantized per term so the statistic
    is an exact integer on any engine (the ra_micro convention); absent
    (type, dow) cells still contribute, so the grid expands over
    types x 7. One map-side scan to the bounded contingency table;
    everything downstream is grid algebra in decimal(38,0) -- exact while
    N^4 < 1e38, i.e. to ~3e9 events; past that, pre-aggregate per day.
    Spark dayofweek == DuckDB dayofweek + 1 (Sun=1 vs Sun=0) -- the
    oracle uses DuckDB's dayofweek; Spark shifts by -1 to match."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("o"))
    rt = c.groupBy("event_type").agg(F.sum("o").cast("decimal(38,0)").alias("r"))
    ct = c.groupBy("dow").agg(F.sum("o").cast("decimal(38,0)").alias("cc"))
    nn_tot = c.agg(F.sum("o").cast("decimal(38,0)").alias("nn"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(c, ["event_type", "dow"], "left")
        .select(
            "event_type",
            "dow",
            "r",
            "cc",
            F.coalesce(F.col("o"), F.lit(0).cast("decimal(38,0)")).alias("o"),
        )
        .crossJoin(F.broadcast(nn_tot))
    )
    return grid.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.sum(
            F.expr(
                "((o * nn - r * cc) * (o * nn - r * cc) * 1000000) div (nn * r * cc)"
            )
        )
        .cast("long")
        .alias("chisq_micro"),
    )


_KTRUSS_K = 3
_KTRUSS_STAGES = 5  # fixpoint depth is 2 at every fixture SF; extras are idempotent


def _ktruss_oracle_sql(k: int, stages: int) -> str:
    """Unrolled support-peeling replay (the k-core/pagerank MATERIALIZED-CTE
    technique): each stage recounts per-edge triangle support via the
    two-hop wedge join and drops edges below k-2."""
    parts = [
        """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
t0 AS MATERIALIZED (
  SELECT a.l_partkey AS s, c.l_partkey AS d
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
)"""
    ]
    for i in range(1, stages + 1):
        parts.append(
            f""",
sym{i} AS MATERIALIZED (
  SELECT s AS s1, d AS w FROM t{i - 1} UNION ALL SELECT d, s FROM t{i - 1}
),
sup{i} AS MATERIALIZED (
  SELECT e.s, e.d, count(*) AS support
  FROM t{i - 1} e
  JOIN sym{i} x ON x.s1 = e.s
  JOIN sym{i} y ON y.s1 = e.d AND y.w = x.w
  GROUP BY 1, 2
),
t{i} AS MATERIALIZED (
  SELECT s, d FROM sup{i} WHERE support >= {k - 2}
)"""
        )
    parts.append(
        f"""
SELECT s AS part_a, d AS part_b, CAST(support AS BIGINT) AS support
FROM sup{stages} WHERE support >= {k - 2}"""
    )
    return "".join(parts)


@register("parts_cooccur_ktruss", _ktruss_oracle_sql(_KTRUSS_K, _KTRUSS_STAGES))
def parts_cooccur_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-truss of the part co-occurrence graph: edges closing >= 1
    triangle after iterated support peeling -- a strictly denser backbone
    than the k-core (every k-truss sits inside the (k-1)-core), the
    standard community-core extractor next to the triangle/k-core/LP
    family. The operator peels to the TRUE fixpoint with a per-round
    convergence check (operators/graph.py::k_truss -- peel depth 2 at
    every fixture SF, each round one wedge join bounded by sum(deg^2));
    the oracle unrolls 5 peel stages, safely past the fixpoint since
    further stages are idempotent (the k-core 16-stage technique).
    Returns each surviving edge with its in-truss triangle support."""
    from mobsos_event_log_generator_spark.operators.graph import k_truss

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("s"))
    c = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("d"))
    edges = (
        a.join(c, "l_orderkey")
        .filter(F.col("s") < F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("s", "d")
    )
    return k_truss(edges, _KTRUSS_K, "s", "d").select(
        F.col("s").alias("part_a"), F.col("d").alias("part_b"), "support"
    )


@register(
    "events_spearman_type_pairs",
    """
WITH bnd AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events),
spine AS (
  SELECT CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bnd b
),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT t.event_type, s.d, COALESCE(dl.x, 0) AS x
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN spine s
  LEFT JOIN daily dl ON dl.event_type = t.event_type AND dl.d = s.d
),
h AS (
  SELECT event_type, x, count(*) AS c FROM series GROUP BY 1, 2
),
rk AS (
  SELECT event_type, x,
         2 * (sum(c) OVER (PARTITION BY event_type ORDER BY x) - c) + c + 1 AS dr
  FROM h
),
r AS (
  SELECT s.event_type, s.d, CAST(rk.dr AS HUGEINT) AS dr
  FROM series s JOIN rk ON rk.event_type = s.event_type AND rk.x = s.x
),
g AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(dr) AS HUGEINT) AS sd,
         CAST(sum(dr * dr) AS HUGEINT) AS sdd
  FROM r GROUP BY 1
),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(sum(a.dr * b.dr) AS HUGEINT) AS sab
  FROM r a JOIN r b ON b.d = a.d AND b.event_type > a.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(ga.n AS BIGINT) AS n_days,
       CAST(((ga.n * sab - ga.sd * gb.sd) * 1000 // (ga.n * ga.sdd - ga.sd * ga.sd))
            * ((ga.n * sab - ga.sd * gb.sd) * 1000 // (gb.n * gb.sdd - gb.sd * gb.sd))
         AS BIGINT) AS rho2_ppm,
       CAST(CASE WHEN ga.n * sab - ga.sd * gb.sd > 0 THEN 1
                 WHEN ga.n * sab - ga.sd * gb.sd < 0 THEN -1 ELSE 0 END AS BIGINT)
         AS rho_sign
FROM p
JOIN g ga ON ga.event_type = type_a
JOIN g gb ON gb.event_type = type_b
""",
)
def events_spearman_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Spearman rank correlation between the zero-filled daily
    volume series of every event-type pair -- the monotone-association
    complement to the Pearson-based type correlation (robust to the
    heavy-tailed day counts that bend a linear fit). Ties get average
    ranks via the DOUBLED-rank trick (2*cum_smaller + t + 1, the
    mannwhitney_u machinery), so rank sums stay exact integers; rho is
    Pearson on doubled ranks with num/den as N-scaled decimal(38,0)
    integers, reported as the deterministic two-step truncating-div
    rho2_ppm + sign (the dim-correlation convention). Scale shape: one
    map-side scan to (type, day) counts; ranks come from the per-type
    value histogram (bounded) + one partitioned running sum -- never a
    per-day global sort; the pair join runs on the types x days grid."""
    ev = load_table(spark, sf_dir, "events")
    bnd = ev.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = bnd.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    series = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "d"], "left")
        .select("event_type", "d", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
    )
    h = series.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rk = h.select(
        "event_type",
        "x",
        (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1).alias("dr"),
    )
    r = series.join(rk, ["event_type", "x"]).select(
        "event_type", "d", F.col("dr").cast("decimal(38,0)").alias("dr")
    )
    g = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("dr").cast("decimal(38,0)").alias("sd"),
        F.sum(F.col("dr") * F.col("dr")).cast("decimal(38,0)").alias("sdd"),
    )
    a = r.select(F.col("event_type").alias("type_a"), "d", F.col("dr").alias("dra"))
    b = r.select(F.col("event_type").alias("type_b"), "d", F.col("dr").alias("drb"))
    p = (
        a.join(b, "d")
        .filter(F.col("type_b") > F.col("type_a"))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.col("dra") * F.col("drb")).cast("decimal(38,0)").alias("sab"))
    )
    ga = g.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na"),
        F.col("sd").alias("sda"), F.col("sdd").alias("sdda"),
    )
    gb = g.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb"),
        F.col("sd").alias("sdb"), F.col("sdd").alias("sddb"),
    )
    out = (
        p.join(F.broadcast(ga), "type_a")
        .join(F.broadcast(gb), "type_b")
        .withColumn("num", F.col("na") * F.col("sab") - F.col("sda") * F.col("sdb"))
        .withColumn("dena", F.col("na") * F.col("sdda") - F.col("sda") * F.col("sda"))
        .withColumn("denb", F.col("nb") * F.col("sddb") - F.col("sdb") * F.col("sdb"))
    )
    return out.select(
        "type_a",
        "type_b",
        F.col("na").cast("long").alias("n_days"),
        (F.expr("(num * 1000) div dena") * F.expr("(num * 1000) div denb"))
        .cast("long")
        .alias("rho2_ppm"),
        F.when(F.col("num") > 0, 1)
        .when(F.col("num") < 0, -1)
        .otherwise(0)
        .cast("long")
        .alias("rho_sign"),
    )


@register(
    "lake_merge_timetravel_view",
    """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
v1 AS (SELECT st, price FROM base WHERE k % 4 IN (0, 1, 2)),
v3 AS (
  SELECT st,
         CASE WHEN k % 4 IN (2, 3) THEN price + 10.00 ELSE price END AS price
  FROM base
  WHERE k % 4 IN (0, 1, 2, 3) AND k % 100 <> 7
)
SELECT CAST(1 AS BIGINT) AS version, st AS status,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(price) AS DOUBLE), 2) AS total_price
FROM v1 GROUP BY 2
UNION ALL
SELECT CAST(3 AS BIGINT) AS version, st, CAST(count(*) AS BIGINT),
       round(CAST(sum(price) AS DOUBLE), 2)
FROM v3 GROUP BY 2
""",
)
def lake_merge_timetravel_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end gate over the snapshot table format's WRITE path: land a
    base version (keys k%4 in 0-2), copy-on-write MERGE an upsert batch
    (k%4==2 rows repriced +10.00, k%4==3 rows inserted), row-level DELETE
    k%100==7 (the GDPR primitive), then read BOTH the live table (v3) and
    the time-travel view (v1) and aggregate each per status. The oracle
    recomputes both versions' content as pure SQL over orders, so a merge
    that drops a carried-over file, a delete that misses a footer-pruned
    file, or a time-travel read that leaks post-v1 rows all break the
    hash. Prices ride DECIMAL(18,2) (exact under rewrite); file pruning
    and conflict protection themselves are unit-gated in
    tests/test_snapshots.py -- this query gates the semantics the stack
    composes to."""
    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append,
        snapshot_delete_keys,
        snapshot_merge,
    )
    from mobsos_event_log_generator_spark.workdirs import scratch_dir

    root = scratch_dir("mergetv_")
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    snapshot_append(base.filter(F.col("k") % 4 <= 2), root)  # v1
    upserts = base.filter(F.col("k") % 4 >= 2).withColumn(
        "price", F.col("price") + F.lit(10.00).cast("decimal(18,2)")
    )
    snapshot_merge(spark, upserts, root, "k")  # v2
    doomed = base.filter(F.col("k") % 100 == 7).select("k")
    snapshot_delete_keys(spark, doomed, root, "k")  # v3

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy(F.col("st").alias("status")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("price").cast("double"), 2).alias("total_price"),
        ).select(F.lit(version).cast("long").alias("version"), "*")

    live = agg(read_snapshot(spark, root), 3)
    travel = agg(read_snapshot(spark, root, 1), 1)
    return travel.unionByName(live)


@register(
    "referential_integrity_audit",
    """
SELECT 'orders.o_custkey -> customer' AS relationship,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child,
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS n_orphans
UNION ALL
SELECT 'lineitem.l_orderkey -> orders',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
UNION ALL
SELECT 'lineitem.l_partkey -> part',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
UNION ALL
SELECT 'lineitem.l_suppkey -> supplier',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
UNION ALL
SELECT 'customer.c_nationkey -> nation',
       CAST((SELECT count(*) FROM customer) AS BIGINT),
       CAST((SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
""",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit (the dbt-test / constraint-
    validation class): per declared FK relationship, the child row count
    and the number of orphaned children (left ANTI join -- the broadcast-
    able probe side is the PARENT key set, so each check is one scan of
    the child plus a key-only join; AQE picks broadcast when the parent's
    distinct keys fit). Zero orphans is the expected healthy answer on
    the TPC-H fixtures; the child counts keep the row value-bearing. At
    100 TB run the checks off the snapshot manifests' newest files only
    (incremental audit) -- the full-scan form here is the baseline."""
    checks = [
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for label, child, ck, parent, pk in checks:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias(ck)).distinct()
        row = c.select(F.lit(1).alias("one"), ck).agg(
            F.count(F.lit(1)).cast("long").alias("n_child")
        ).crossJoin(
            c.select(ck).join(p, ck, "left_anti").agg(
                F.count(F.lit(1)).cast("long").alias("n_orphans")
            )
        ).select(F.lit(label).alias("relationship"), "n_child", "n_orphans")
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "basket_association_rules",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
norder AS (SELECT count(DISTINCT l_orderkey) AS t FROM b),
psup AS (SELECT l_partkey, count(*) AS np FROM b GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS ante, c.l_partkey AS cons, count(*) AS n_both
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey <> c.l_partkey
  GROUP BY 1, 2
)
SELECT ante, cons, CAST(n_both AS BIGINT) AS n_both,
       CAST((n_both * 1000000) // s1.np AS BIGINT) AS confidence_ppm,
       CAST((n_both * t * 1000000) // (s1.np * s2.np) AS BIGINT) AS lift_ppm
FROM pairs
JOIN psup s1 ON s1.l_partkey = ante
JOIN psup s2 ON s2.l_partkey = cons
CROSS JOIN norder
WHERE n_both >= 2 AND (n_both * 1000000) // s1.np >= 500000
""",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED association rules over order baskets (the Apriori / FP-
    growth output surface at the pair level): for each ordered part pair
    (antecedent -> consequent) with joint support >= 2 and confidence
    >= 50%, emit support, confidence and lift in EXACT integer ppm
    (truncating div, the lift_ppm convention from basket_part_pairs) so
    no float ratio enters the gate. The pair generation keys the self-
    join on the order id, so per-order work is quadratic only in basket
    size (bounded ~7 by the data model) and the total stays linear in
    lineitem; the per-part support dim and the 1-row order count join
    AFTER the >=2 support filter has shrunk the pair set. The confidence
    threshold is applied on the exact integer form, mirroring classic
    min-confidence pruning. Reference analog: none (beyond-reference
    training-data/analytics op; SURVEY.md LLM-pipeline family)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    norder = li.agg(F.countDistinct("l_orderkey").alias("t"))
    psup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("np"))
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("ante"))
    c = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("cons"))
    pairs = (
        a.join(c, "l_orderkey")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    return (
        pairs.join(psup.select(F.col("l_partkey").alias("ante"), F.col("np").alias("np1")), "ante")
        .join(psup.select(F.col("l_partkey").alias("cons"), F.col("np").alias("np2")), "cons")
        .crossJoin(F.broadcast(norder))
        .filter(F.expr("(n_both * 1000000L) div np1") >= 500000)
        .select(
            "ante",
            "cons",
            F.col("n_both").cast("long").alias("n_both"),
            F.expr("(n_both * 1000000L) div np1").cast("long").alias("confidence_ppm"),
            F.expr("(n_both * t * 1000000L) div (np1 * np2)").cast("long").alias("lift_ppm"),
        )
    )


_MARKOV_SCALE = 10**12
_MARKOV_ITERS = 3


def _markov_iter_cte(k: int) -> str:
    prev = f"mk{k - 1}" if k > 1 else "mk0"
    return f"""
mk{k} AS MATERIALIZED (
  SELECT v.state,
         COALESCE(s.s, 0)
         + (SELECT COALESCE(sum(p.pi_fp), 0) FROM {prev} p
            WHERE p.state NOT IN (SELECT t_src FROM rowtot))
           // (SELECT n FROM nn) AS pi_fp
  FROM nodes v LEFT JOIN (
    SELECT t.dst AS state, sum((p.pi_fp * t.n) // r.tot) AS s
    FROM trans t
    JOIN {prev} p ON p.state = t.src
    JOIN rowtot r ON r.t_src = t.src
    GROUP BY t.dst
  ) s ON v.state = s.state
)"""


_SQL_MARKOV_STATIONARY = (
    f"""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
trans AS MATERIALIZED (SELECT src, dst, count(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
rowtot AS (SELECT src AS t_src, sum(n) AS tot FROM trans GROUP BY 1),
nodes AS (SELECT src AS state FROM trans UNION SELECT dst FROM trans),
nn AS (SELECT count(*) AS n FROM nodes),
mk0 AS (
  SELECT state, {_MARKOV_SCALE} // (SELECT n FROM nn) AS pi_fp FROM nodes
),"""
    + ",".join(_markov_iter_cte(k) for k in range(1, _MARKOV_ITERS + 1))
    + f"""
SELECT state AS event_type, CAST(pi_fp AS BIGINT) AS pi_fp
FROM mk{_MARKOV_ITERS}
"""
)


@register("events_markov_stationary", _SQL_MARKOV_STATIONARY)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run occupancy of the user behavioral Markov chain: transition
    counts between consecutive event types per user (the events-table
    sibling of the directly-follows graph) feed the generic
    ``markov_stationary_fixed_point`` operator — 3 power iterations of
    pi' = pi.P in fixed-point BIGINT (scale 10^12), weighted by the exact
    transition counts and with dangling mass redistributed uniformly, so
    every intermediate distribution is bit-identical across engines. The
    oracle unrolls the identical iterations as CTEs (the pagerank/k-core
    technique), proving the whole trajectory. Per iteration the shuffle
    shape is one src equi-join + one groupBy(dst); the chain's state space
    is the event-type alphabet (bounded), but the operator never assumes
    that. Reference analog: none (beyond-reference analytics op)."""
    from mobsos_event_log_generator_spark.operators.graph import markov_stationary_fixed_point

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pi = markov_stationary_fixed_point(
        trans, iterations=_MARKOV_ITERS, scale=_MARKOV_SCALE
    )
    return pi.select(F.col("state").alias("event_type"), "pi_fp")


@register(
    "parts_fuzzy_name_pairs",
    """
WITH names AS (SELECT p_name, count(*) AS n FROM part GROUP BY 1)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
""",
)
def parts_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-class fuzzy matching over the part-name vocabulary: all name
    pairs within edit distance 2, found by the FastSS deletion-
    neighborhood join (``operators/setjoin.py::edit_distance_join``) —
    every name emits its <= 1+L+L(L-1)/2 radius-2 deletion variants and
    candidates come from a variant equi-join, so the plan is LINEAR in
    the vocabulary with a length-bounded blowup, never the quadratic
    name x name cross product the ORACLE runs (the oracle is allowed to
    be quadratic at test SF; the engine is not at 100 TB). Verification
    is the built-in JVM levenshtein, semantics identical to DuckDB's.
    Per-name part counts join back AFTER the pair set is formed (tiny).
    Reference analog: none (beyond-reference ER/dedup family op)."""
    from mobsos_event_log_generator_spark.operators.setjoin import edit_distance_join

    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n"))
    pairs = edit_distance_join(p, key_col="p_name", max_dist=2)
    return (
        pairs.join(counts.select(F.col("p_name").alias("name_a"), F.col("n").alias("n_a")), "name_a")
        .join(counts.select(F.col("p_name").alias("name_b"), F.col("n").alias("n_b")), "name_b")
        .select(
            "name_a",
            "name_b",
            "dist",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
    )


@register(
    "orders_nelson_aalen",
    """
WITH f AS (SELECT l_orderkey, min(l_shipdate) AS first_ship FROM lineitem GROUP BY 1),
cut AS (SELECT max(l_shipdate) AS mx FROM lineitem),
pts AS (
  SELECT CASE WHEN f.first_ship IS NOT NULL
              THEN date_diff('day', o.o_orderdate, f.first_ship)
              ELSE greatest(0, date_diff('day', o.o_orderdate, (SELECT mx FROM cut))) END
           AS duration_days,
         (f.first_ship IS NOT NULL) AS is_event
  FROM orders o LEFT JOIN f ON f.l_orderkey = o.o_orderkey
),
hist AS (
  SELECT duration_days,
         sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS d,
         sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS c
  FROM pts WHERE duration_days >= 0 GROUP BY 1
),
tot AS (SELECT sum(d + c) AS t FROM hist),
risk AS (
  SELECT duration_days, d, c,
         (SELECT t FROM tot)
           - sum(d + c) OVER (ORDER BY duration_days ROWS UNBOUNDED PRECEDING)
           + d + c AS n_risk
  FROM hist
),
haz AS (
  SELECT duration_days, d, c, n_risk, (d * 1000000) // n_risk AS hazard_ppm FROM risk
),
cum AS (
  SELECT duration_days, d, c, n_risk, hazard_ppm,
         sum(hazard_ppm) OVER (ORDER BY duration_days ROWS UNBOUNDED PRECEDING)
           AS cum_hazard_ppm
  FROM haz
)
SELECT CAST(duration_days AS BIGINT) AS duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(c AS BIGINT) AS n_censored,
       CAST(hazard_ppm AS BIGINT) AS hazard_ppm,
       CAST(cum_hazard_ppm AS BIGINT) AS cum_hazard_ppm
FROM cum WHERE d > 0
""",
)
def orders_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis of order->first-shipment latency with RIGHT
    CENSORING: orders that never shipped are censored at the study cutoff
    (global max shipdate). The estimator is Nelson-Aalen cumulative hazard
    H(t) = sum_{t_i <= t} d_i/n_i — chosen over Kaplan-Meier because it is
    a SUM of per-step hazards, so the whole trajectory stays in exact
    integer ppm (truncating div per step, associative integer running sum;
    a KM product would force float products that drift across engines).
    At-risk counts come from total − exclusive-prefix over the duration
    HISTOGRAM (calendar-bounded rows), via the two-phase distributed
    prefix sum (``operators/sweep.py``) — no global single-partition sort
    ever touches row-scaled data. Negative synthetic durations are
    excluded as data errors; censored durations clamp at 0. Rows = event
    times only (d > 0). Reference analog: none (beyond-reference
    reliability-analytics op)."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    f = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    cut = li.agg(F.max("l_shipdate").alias("mx"))
    pts = (
        o.join(f, o["o_orderkey"] == f["l_orderkey"], "left")
        .crossJoin(F.broadcast(cut))
        .select(
            F.when(
                F.col("first_ship").isNotNull(),
                F.datediff("first_ship", "o_orderdate"),
            )
            .otherwise(F.greatest(F.lit(0), F.datediff("mx", "o_orderdate")))
            .cast("long")
            .alias("duration_days"),
            F.col("first_ship").isNotNull().alias("is_event"),
        )
        .filter(F.col("duration_days") >= 0)
    )
    hist = pts.groupBy("duration_days").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("is_event"), 0).otherwise(1)).alias("c"),
    )
    tot = hist.agg(F.sum(F.col("d") + F.col("c")).alias("t"))
    risk = (
        value_ordered_running_sum(
            hist,
            order_col="duration_days",
            tie_cols=[],
            value_col=F.col("d") + F.col("c"),
            out_col="cum_le",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("n_risk", F.col("t") - F.col("cum_le") + F.col("d") + F.col("c"))
        .withColumn("hazard_ppm", F.expr("(d * 1000000L) div n_risk"))
    )
    cum = value_ordered_running_sum(
        risk,
        order_col="duration_days",
        tie_cols=[],
        value_col=F.col("hazard_ppm"),
        out_col="cum_hazard_ppm",
    )
    return cum.filter(F.col("d") > 0).select(
        F.col("duration_days").cast("long").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        F.col("hazard_ppm").cast("long").alias("hazard_ppm"),
        F.col("cum_hazard_ppm").cast("long").alias("cum_hazard_ppm"),
    )


@register(
    "lineitem_ols_multifeature",
    """
WITH q AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS z
  FROM lineitem
),
s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(z) AS HUGEINT) AS sz,
         CAST(sum(x*x) AS HUGEINT) AS sxx, CAST(sum(y*y) AS HUGEINT) AS syy,
         CAST(sum(x*y) AS HUGEINT) AS sxy, CAST(sum(x*z) AS HUGEINT) AS sxz,
         CAST(sum(y*z) AS HUGEINT) AS syz
  FROM q GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, l_linestatus, n, sx, sy, sz,
         (n*sxx - sx*sx) // n AS cxx, (n*syy - sy*sy) // n AS cyy,
         (n*sxy - sx*sy) // n AS cxy,
         (n*sxz - sx*sz) // n AS cxz, (n*syz - sy*sz) // n AS cyz
  FROM s
),
b AS (
  SELECT l_returnflag, l_linestatus, n, sx, sy, sz,
         ((cxz*cyy - cyz*cxy) * 1000000)
           // greatest(cxx*cyy - cxy*cxy, 1) AS b1,
         ((cyz*cxx - cxz*cxy) * 1000000)
           // greatest(cxx*cyy - cxy*cxy, 1) AS b2
  FROM c
)
SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n_rows,
       CAST(b1 AS BIGINT) AS beta_qty_micro,
       CAST(b2 AS BIGINT) AS beta_disc_micro,
       CAST((sz * 1000000 - b1 * sx - b2 * sy) // n AS BIGINT) AS alpha_micro
FROM b
""",
)
def lineitem_ols_multifeature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped MULTIPLE linear regression by closed-form normal equations
    (the MLlib-style one-pass co-moment aggregation): per (returnflag,
    linestatus) group, fit extendedprice ~ quantity + discount by
    Cramer's rule on the 2x2 centered co-moment matrix. EVERYTHING is
    exact integers: features quantize via floor(v*100 + 0.5) (half-up,
    no engine tie divergence), the nine sufficient statistics are one
    map-side-combined groupBy pass (the only shuffle — this is the shape
    that turns regression into a single distributed aggregate), the
    n-scaled centering C = n*S2 - S*S avoids any mean division, and the
    slopes/intercept land as truncating-div micro units.

    Accumulator growth order (r8 audit): raw co-moments are n²·v²; the
    Cramer products of two of them grew n⁴·v⁴ — at this op's value grain
    that saturated decimal(38,0)/HUGEINT around only ~7·10⁵ rows per
    group (the r7 PCA find-#5 class, one decade past the fixtures). The
    RENORMALIZATION step divides every co-moment by n (truncating
    //-div, identical in both engines) before Cramer — slopes are
    invariant to common scaling, the per-co-moment truncation error is
    O(1) absolute on an n·v²-magnitude quantity, and products drop to
    n²·v⁴ (headroom ~4·10¹⁰ rows per group). The Cramer determinant is
    guarded with greatest(det, 1) in both engines: exact CS guarantees
    det ≥ 0 pre-truncation, but a collinear/degenerate group could reach
    0 (or −1 after truncation) and an unguarded div diverges NULL-vs-
    raise across engines (the r8 PCA-guard rule). Reference analog: none
    (beyond-reference ML-adjacent analytics op)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("y"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("z"),
    )
    d38 = lambda c: F.sum(c).cast("decimal(38,0)")  # noqa: E731
    s = q.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        d38(F.col("x")).alias("sx"),
        d38(F.col("y")).alias("sy"),
        d38(F.col("z")).alias("sz"),
        d38(F.col("x") * F.col("x")).alias("sxx"),
        d38(F.col("y") * F.col("y")).alias("syy"),
        d38(F.col("x") * F.col("y")).alias("sxy"),
        d38(F.col("x") * F.col("z")).alias("sxz"),
        d38(F.col("y") * F.col("z")).alias("syz"),
    )
    # Spark's `div` narrows to BIGINT, so each renormalized co-moment (an
    # n·v²-magnitude quantity — inside int64 to ~1.8e10 rows/group at this
    # value grain) is cast straight back to decimal(38,0): the Cramer
    # products must NOT run in long arithmetic.
    dd = "decimal(38,0)"
    c = s.select(
        "l_returnflag", "l_linestatus", "n", "sx", "sy", "sz",
        F.expr(f"CAST((n*sxx - sx*sx) div n AS {dd})").alias("cxx"),
        F.expr(f"CAST((n*syy - sy*sy) div n AS {dd})").alias("cyy"),
        F.expr(f"CAST((n*sxy - sx*sy) div n AS {dd})").alias("cxy"),
        F.expr(f"CAST((n*sxz - sx*sz) div n AS {dd})").alias("cxz"),
        F.expr(f"CAST((n*syz - sy*sz) div n AS {dd})").alias("cyz"),
    )
    b = c.select(
        "l_returnflag", "l_linestatus", "n", "sx", "sy", "sz",
        F.expr(
            "((cxz*cyy - cyz*cxy) * 1000000) div greatest(cxx*cyy - cxy*cxy, 1)"
        ).alias("b1"),
        F.expr(
            "((cyz*cxx - cxz*cxy) * 1000000) div greatest(cxx*cyy - cxy*cxy, 1)"
        ).alias("b2"),
    )
    return b.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n").cast("long").alias("n_rows"),
        F.col("b1").cast("long").alias("beta_qty_micro"),
        F.col("b2").cast("long").alias("beta_disc_micro"),
        F.expr("(sz * 1000000 - b1 * sx - b2 * sy) div n").cast("long").alias("alpha_micro"),
    )


_HITS_SCALE = 10**6
_HITS_ITERS = 2


def _hits_iter_ctes(k: int) -> str:
    prev_h = f"h{k - 1}"
    return f"""
ar{k} AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.h) AS a_raw
  FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY 1
),
am{k} AS (SELECT max(a_raw) AS m FROM ar{k}),
a{k} AS (
  SELECT node, (a_raw * {_HITS_SCALE}) // (SELECT m FROM am{k}) AS a FROM ar{k}
),
hr{k} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.a) AS h_raw
  FROM edges e JOIN a{k} a ON a.node = e.dst GROUP BY 1
),
hm{k} AS (SELECT max(h_raw) AS m FROM hr{k}),
h{k} AS (
  SELECT node, (h_raw * {_HITS_SCALE}) // (SELECT m FROM hm{k}) AS h FROM hr{k}
)"""


_SQL_HITS = (
    f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
h0 AS (SELECT DISTINCT src AS node, {_HITS_SCALE} AS h FROM edges),"""
    + ",".join(_hits_iter_ctes(k) for k in range(1, _HITS_ITERS + 1))
    + f"""
, nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
SELECT n.node AS node,
       CAST(COALESCE(h.h, 0) AS BIGINT) AS hub_fp,
       CAST(COALESCE(a.a, 0) AS BIGINT) AS auth_fp
FROM nodes n
LEFT JOIN h{_HITS_ITERS} h ON h.node = n.node
LEFT JOIN a{_HITS_ITERS} a ON a.node = n.node
"""
)


@register("customer_supplier_hits", _SQL_HITS)
def customer_supplier_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubs & authorities over the bipartite customer -> supplier purchase
    graph (which customers aggregate demand across the most central
    suppliers, and which suppliers that demand concentrates on): the
    generic ``hits_fixed_point`` operator — 2 HITS iterations, every
    half-step max-normalized to the 1e6 grid by truncating div so the
    whole trajectory is bit-identical across engines; the oracle unrolls
    the identical half-steps as CTEs. Edge extraction is one orders x
    lineitem equi-join + distinct; per half-step one equi-join + one
    groupBy (the PageRank shuffle shape) and a 1-row max broadcast.
    Reference analog: none (beyond-reference graph-analytics op)."""
    from mobsos_event_log_generator_spark.operators.graph import hits_fixed_point

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
    )
    return hits_fixed_point(edges, iterations=_HITS_ITERS, scale=_HITS_SCALE)


@register(
    "lake_schema_evolution_view",
    """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderpriority AS pr
  FROM orders
),
v1 AS (SELECT st, price FROM base WHERE k % 3 = 0),
live AS (
  SELECT st, price, NULL AS pr FROM base WHERE k % 3 = 0
  UNION ALL
  SELECT st, price, pr FROM base WHERE k % 3 = 1
)
SELECT CAST(1 AS BIGINT) AS version, 'ALL' AS priority,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(price) AS DOUBLE), 2) AS total_price
FROM v1
UNION ALL
SELECT CAST(2 AS BIGINT), coalesce(pr, 'NONE'), CAST(count(*) AS BIGINT),
       round(CAST(sum(price) AS DOUBLE), 2)
FROM live GROUP BY 2
""",
)
def lake_schema_evolution_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end gate over ADDITIVE SCHEMA EVOLUTION in the snapshot
    format: v1 lands (k, st, price); v2 appends a batch carrying a NEW
    `priority` column. The live read must impose the evolution-merged
    manifest schema — old files surface NULL for the added column (a
    plain parquet read would take one file's schema and silently drop or
    crash on the other; sources/snapshots.py:186-193 is the code under
    test) — while the v1 time-travel read keeps the ORIGINAL 3-column
    schema. The oracle recomputes both views as pure SQL, so a reader
    that loses the old files' rows, widens v1's schema, or misaligns the
    evolved column breaks the hash. Type-conflicting evolution is
    rejected (SchemaEvolutionError) and unit-gated in
    tests/test_snapshots.py."""
    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append,
    )
    from mobsos_event_log_generator_spark.workdirs import scratch_dir

    root = scratch_dir("schevo_")
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.col("o_orderpriority").alias("pr"),
    )
    snapshot_append(base.filter(F.col("k") % 3 == 0).select("st", "price"), root)  # v1
    snapshot_append(base.filter(F.col("k") % 3 == 1).select("st", "price", "pr"), root)  # v2

    travel = (
        read_snapshot(spark, root, 1)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("price").cast("double"), 2).alias("total_price"),
        )
        .select(
            F.lit(1).cast("long").alias("version"),
            F.lit("ALL").alias("priority"),
            "n",
            "total_price",
        )
    )
    live = (
        read_snapshot(spark, root)
        .groupBy(F.coalesce(F.col("pr"), F.lit("NONE")).alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("price").cast("double"), 2).alias("total_price"),
        )
        .select(F.lit(2).cast("long").alias("version"), "priority", "n", "total_price")
    )
    return travel.unionByName(live)


_ZL_BITS = 10
_ZL_FILES = 64


def _morton_sql(a: str, b: str, duck: bool) -> str:
    """Bit-interleaved Morton code of two _ZL_BITS-masked keys, as +-summed
    disjoint-bit terms (identical integer arithmetic in both engines)."""
    terms = []
    for i in range(_ZL_BITS):
        if duck:
            terms.append(f"(((({a}) % 1024) >> {i}) & 1) << {2 * i}")
            terms.append(f"(((({b}) % 1024) >> {i}) & 1) << {2 * i + 1}")
        else:
            terms.append(f"shiftleft(shiftright(({a}) % 1024, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright(({b}) % 1024, {i}) & 1, {2 * i + 1})")
    return " + ".join(f"({t})" for t in terms)


@register(
    "lineitem_zorder_layout",
    f"""
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         {_morton_sql('l_partkey', 'l_suppkey', duck=True)} AS morton
  FROM lineitem
),
z AS (
  SELECT *, ntile({_ZL_FILES}) OVER (ORDER BY morton, l_orderkey, l_linenumber) AS f
  FROM base
),
nv AS (
  SELECT *, ntile({_ZL_FILES}) OVER (ORDER BY l_orderkey, l_linenumber) AS f
  FROM base
),
zs AS (
  SELECT f, max(l_partkey) - min(l_partkey) + max(l_suppkey) - min(l_suppkey) AS span
  FROM z GROUP BY 1
),
ns AS (
  SELECT f, max(l_partkey) - min(l_partkey) + max(l_suppkey) - min(l_suppkey) AS span
  FROM nv GROUP BY 1
)
SELECT 'zorder' AS layout, CAST({_ZL_FILES} AS BIGINT) AS n_files,
       CAST(sum(span) AS BIGINT) AS total_span
FROM zs
UNION ALL
SELECT 'orderkey', CAST({_ZL_FILES} AS BIGINT), CAST(sum(span) AS BIGINT)
FROM ns
""",
)
def lineitem_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER data-layout audit — the data-skipping story made measurable:
    interleave the low 10 bits of (partkey, suppkey) into a Morton code
    (disjoint-bit shift/mask terms, exact integers), assign rows to
    64 equal files once by Morton order and once by the naive
    orderkey order, and report the summed per-file (partkey + suppkey)
    min-max span under each layout (sf0.01: 73,715 vs 134,068 — z-order
    halves the zone-map surface). Z-order's locality means BOTH key
    columns' zone maps stay narrow per file, so point/range predicates on
    either key prune most files — the span sum is exactly the pruning
    surface a lakehouse OPTIMIZE ZORDER BY buys. File assignment is the
    exact distributed ntile (two-phase row numbers, no single-partition
    sort); SQL ntile's tie quota is reproduced bit-for-bit. At 100 TB this
    query IS the before/after check for snapshot_optimize file clustering.
    Reference analog: none (beyond-reference lakehouse-layout op)."""
    from mobsos_event_log_generator_spark.operators.sweep import distributed_ntile

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    base = li.withColumn(
        "morton", F.expr(_morton_sql("l_partkey", "l_suppkey", duck=False))
    )
    # Equal-width bucket bounds from a plain min/max aggregate instead of
    # two percentile_approx sketches: ANY bounds are exact for the
    # two-phase ntile (value_ordered_running_sum's monotonicity argument —
    # bounds only shift bucket balance, never the global row number), and
    # the KLL sketch update was ~1.3 s of the ~2.5 s warm wall where the
    # codegen min/max agg is ~0.3 s. Morton codes over near-uniform
    # part/supp keys and the dense orderkey domain keep equal-width
    # buckets balanced.
    probe = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("morton").cast("double")).alias("zlo"),
        F.max(F.col("morton").cast("double")).alias("zhi"),
        F.min(F.col("l_orderkey").cast("double")).alias("olo"),
        F.max(F.col("l_orderkey").cast("double")).alias("ohi"),
    ).first()

    def _lin_bounds(lo: float | None, hi: float | None) -> list[float]:
        if lo is None or hi is None or not hi > lo:
            return []
        return [lo + (hi - lo) * i / 32 for i in range(1, 32)]

    def spans(df: DataFrame, label: str) -> DataFrame:
        per_file = df.groupBy("f").agg(
            (
                F.max("l_partkey") - F.min("l_partkey")
                + F.max("l_suppkey") - F.min("l_suppkey")
            ).alias("span")
        )
        return per_file.agg(F.sum("span").cast("long").alias("total_span")).select(
            F.lit(label).alias("layout"),
            F.lit(_ZL_FILES).cast("long").alias("n_files"),
            "total_span",
        )

    z = distributed_ntile(
        base, _ZL_FILES, probe["n"], "morton",
        ["l_orderkey", "l_linenumber"], "f",
        bounds=_lin_bounds(probe["zlo"], probe["zhi"]),
    )
    nv = distributed_ntile(
        base, _ZL_FILES, probe["n"], "l_orderkey",
        ["l_linenumber"], "f",
        bounds=_lin_bounds(probe["olo"], probe["ohi"]),
    )
    return spans(z, "zorder").unionByName(spans(nv, "orderkey"))


@register(
    "lineitem_weighted_median_price",
    """
WITH h AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, pc, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY pc
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM h
)
SELECT l_returnflag,
       CAST(min(pc) AS BIGINT) AS median_cents,
       CAST(min(tot) AS BIGINT) AS w_total
FROM c WHERE 2 * cumw >= tot GROUP BY 1
""",
)
def lineitem_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped WEIGHTED median (the weighted-quantile operator): per
    returnflag, the smallest price whose quantity-weighted cumulative mass
    reaches half the group total — the lower weighted median, exact by
    definition (prices ride half-up cents, weights exact integer
    quantities). The cumulative mass comes from the grouped two-phase
    prefix sum over the (flag, price)-aggregated HISTOGRAM
    (``operators/sweep.py::value_ordered_running_sum`` with group_cols —
    shared bucket bounds, offsets = groups x buckets rows), so no global
    or per-group single-partition sort ever touches row-scaled data;
    the selection is one alphabet-bounded filter + min. This is the
    exact-median machinery generalized to arbitrary non-negative weights
    (median_price_by_priority is the w=1 special case).
    Reference analog: none (beyond-reference stats op)."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    h = (
        li.select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("pc"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("l_returnflag", "pc")
        .agg(F.sum("q").cast("long").alias("w"))
    )
    c = value_ordered_running_sum(
        h,
        order_col="pc",
        tie_cols=[],
        value_col=F.col("w"),
        out_col="cumw",
        group_cols=["l_returnflag"],
    )
    tot = h.groupBy("l_returnflag").agg(F.sum("w").cast("long").alias("tot"))
    return (
        c.join(F.broadcast(tot), "l_returnflag")
        .filter(2 * F.col("cumw") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("pc").cast("long").alias("median_cents"),
            F.min("tot").cast("long").alias("w_total"),
        )
    )


@register(
    "customer_cohort_ltv_curve",
    """
WITH first_o AS (SELECT o_custkey, min(o_orderdate) AS fd FROM orders GROUP BY 1),
base AS (
  SELECT date_trunc('month', f.fd) AS cm,
         (date_part('year', o.o_orderdate) - date_part('year', f.fd)) * 12
         + (date_part('month', o.o_orderdate) - date_part('month', f.fd)) AS age_months,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders o JOIN first_o f ON f.o_custkey = o.o_custkey
),
agg AS (
  SELECT cm, age_months, CAST(count(*) AS BIGINT) AS n_orders, sum(price) AS rev
  FROM base GROUP BY 1, 2
)
SELECT strftime(cm, '%Y-%m') AS cohort_month,
       CAST(age_months AS BIGINT) AS age_months,
       n_orders,
       round(CAST(rev AS DOUBLE), 2) AS revenue,
       round(CAST(sum(rev) OVER (PARTITION BY cm ORDER BY age_months
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
         AS cum_revenue
FROM agg
""",
)
def customer_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the revenue sibling of the retention
    matrix: customers cohort by first-order month; every order lands at
    integer month age (year*12+month arithmetic, exact — months_between's
    fractional days never enter); revenue aggregates per (cohort, age) in
    DECIMAL(18,2) and accumulates over age per cohort. The cumulative
    window runs over the (cohort x age) AGGREGATE (calendar-bounded rows),
    partitioned by cohort — row-scaled data only ever sees the one
    groupBy. Output rounds to 2dp after the exact decimal algebra.
    Reference analog: none (beyond-reference business-analytics op)."""
    o = load_table(spark, sf_dir, "orders")
    first_o = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("fd"))
    base = o.join(first_o, "o_custkey").select(
        F.date_trunc("month", "fd").alias("cm"),
        (
            (F.year("o_orderdate") - F.year("fd")) * 12
            + (F.month("o_orderdate") - F.month("fd"))
        ).alias("age_months"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    agg = base.groupBy("cm", "age_months").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("price").alias("rev"),
    )
    w = (
        Window.partitionBy("cm")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return agg.select(
        F.date_format("cm", "yyyy-MM").alias("cohort_month"),
        F.col("age_months").cast("long").alias("age_months"),
        "n_orders",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(F.sum("rev").over(w).cast("double"), 2).alias("cum_revenue"),
    )


@register(
    "parts_recommendations_itemknn",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
psup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS np FROM b GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2, CAST(count(*) AS BIGINT) AS n_co
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT p1 AS part, p2 AS other, n_co FROM pairs
  UNION ALL
  SELECT p2, p1, n_co FROM pairs
),
scored AS (
  SELECT part, other, n_co,
         CAST((n_co * n_co * 1000000) // (s1.np * s2.np) AS BIGINT) AS cos2_ppm
  FROM sym JOIN psup s1 ON s1.l_partkey = part JOIN psup s2 ON s2.l_partkey = other
),
nbr AS (
  SELECT part, other, cos2_ppm
  FROM (SELECT *, row_number() OVER (PARTITION BY part
                                     ORDER BY cos2_ppm DESC, n_co DESC, other) AS rn
        FROM scored)
  WHERE rn <= 3
),
up AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
cand AS (
  SELECT u.custkey, n.other AS rec,
         CAST(sum(n.cos2_ppm) AS BIGINT) AS score_ppm,
         CAST(count(*) AS BIGINT) AS n_paths
  FROM up u JOIN nbr n ON n.part = u.partkey
  WHERE NOT EXISTS (
    SELECT 1 FROM up o WHERE o.custkey = u.custkey AND o.partkey = n.other
  )
  GROUP BY 1, 2
)
SELECT custkey, rec AS rec_partkey, score_ppm, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY custkey
                                   ORDER BY score_ppm DESC, n_paths DESC, rec) AS rn
      FROM cand)
WHERE rn <= 3
""",
)
def parts_recommendations_itemknn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-kNN collaborative-filtering RECOMMENDER — the scoring stage on
    top of `parts_cooccur_similarity`'s neighbor lists (called directly, so
    both queries provably share one similarity definition): a customer's
    candidate set is the union of the top-3 cosine neighbors of every part
    they bought, already-bought parts are removed by an anti-join, and each
    candidate scores the EXACT integer sum of cos^2 ppm over all paths that
    reach it; top-3 per customer under the total (score, n_paths, part)
    order. Scale shape: candidate fan-out is |P(u)| x 3 (neighbor lists are
    rank-pruned BEFORE the user join), the anti-join is key-only, and the
    per-customer window sits on the pruned candidates — the standard
    item-based top-N serving precompute (Sarwar et al. WWW'01, public
    algorithm). Reference analog: none (beyond-reference recommender op)."""
    from pyspark.sql.window import Window

    from mobsos_event_log_generator_spark.plans.queries import QUERIES

    nbr = (
        QUERIES["parts_cooccur_similarity"](spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("part", F.col("other"), "cos2_ppm")
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    up = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey"))
        .distinct()
    )
    cand = (
        up.join(nbr, up["partkey"] == nbr["part"])
        .join(
            up.select(F.col("custkey"), F.col("partkey").alias("other")),
            ["custkey", "other"],
            "left_anti",
        )
        .groupBy("custkey", F.col("other").alias("rec"))
        .agg(
            F.sum("cos2_ppm").cast("long").alias("score_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_paths"),
        )
    )
    w = Window.partitionBy("custkey").orderBy(
        F.col("score_ppm").desc(), F.col("n_paths").desc(), F.col("rec")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "custkey",
            F.col("rec").alias("rec_partkey"),
            "score_ppm",
            F.col("rank").cast("long").alias("rank"),
        )
    )


_GINI_SQL_FEATURES = """
  SELECT 'qty_band' AS feature,
         CASE WHEN l_quantity <= 10 THEN 'low'
              WHEN l_quantity <= 25 THEN 'mid' ELSE 'high' END AS bucket,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
  UNION ALL
  SELECT 'disc_band',
         CASE WHEN l_discount = 0 THEN 'none'
              WHEN l_discount < 0.05 THEN 'small' ELSE 'large' END,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
  FROM lineitem
  UNION ALL
  SELECT 'linestatus', l_linestatus,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
  FROM lineitem
"""


@register(
    "lineitem_gini_feature_ranking",
    f"""
WITH f AS ({_GINI_SQL_FEATURES}),
cell AS (
  SELECT feature, bucket, y, CAST(count(*) AS BIGINT) AS n
  FROM f GROUP BY 1, 2, 3
),
branch AS (
  SELECT feature, bucket,
         CAST(sum(n) AS BIGINT) AS nb,
         CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sb
  FROM cell GROUP BY 1, 2
),
cls AS (
  SELECT feature, y, CAST(sum(n) AS BIGINT) AS nc FROM cell GROUP BY 1, 2
),
parent AS (
  SELECT feature, CAST(sum(nc) AS BIGINT) AS n,
         CAST(sum(CAST(nc AS HUGEINT) * nc) AS HUGEINT) AS s
  FROM cls GROUP BY 1
),
purity AS (
  SELECT b.feature, b.bucket, b.nb,
         (b.sb * 1000000) // (CAST(b.nb AS HUGEINT) * b.nb) AS purity_ppm
  FROM branch b
),
agg AS (
  SELECT p.feature,
         CAST(count(*) AS BIGINT) AS n_branches,
         CAST(sum(CAST(u.nb AS HUGEINT) * u.purity_ppm) // min(p.n) AS BIGINT)
           AS child_purity_ppm,
         CAST(min((p.s * 1000000) // (CAST(p.n AS HUGEINT) * p.n)) AS BIGINT)
           AS parent_purity_ppm
  FROM purity u JOIN parent p ON p.feature = u.feature
  GROUP BY 1
)
SELECT feature, n_branches, parent_purity_ppm, child_purity_ppm,
       CAST(child_purity_ppm - parent_purity_ppm AS BIGINT) AS gini_gain_ppm
FROM agg
""",
)
def lineitem_gini_feature_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-tree split statistics — Gini-gain feature ranking for the
    label "was the line returned" over three candidate splits (quantity
    band, discount band, linestatus), in EXACT integers end to end: Gini
    purity 1 - impurity is Σ n_c²/n² per node, so per-branch purity is the
    truncating-div ppm (S_b·10⁶) div n_b², the weighted child purity is
    Σ(n_b · purity_b) div n, and the gain is their difference against the
    parent's (S·10⁶) div n² — the deterministic two-step quantization used
    across the stats family (no float probability ever enters). One scan
    builds all features' cells via a stacked explode (feature alphabet x
    bucket alphabet x 2 labels rows — alphabet-bounded aggregates all the
    way up). This is the statistic a distributed decision-tree trainer
    (e.g. PLANET-style) computes per candidate split per node.
    Reference analog: none (beyond-reference ML-statistics op)."""
    li = load_table(spark, sf_dir, "lineitem")
    y = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    f = li.select(
        F.explode(
            F.create_map(
                F.lit("qty_band"),
                F.when(F.col("l_quantity") <= 10, "low")
                .when(F.col("l_quantity") <= 25, "mid")
                .otherwise("high"),
                F.lit("disc_band"),
                F.when(F.col("l_discount") == 0, "none")
                .when(F.col("l_discount") < 0.05, "small")
                .otherwise("large"),
                F.lit("linestatus"),
                F.col("l_linestatus"),
            )
        ).alias("feature", "bucket"),
        y.alias("y"),
    )
    cell = f.groupBy("feature", "bucket", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # n²-order accumulators (r8 audit second pass): bucket/label alphabets
    # are bounded, so cell counts are corpus-scaled and Σn² overflowed
    # int64 at ~3e9 rows — ride decimal(38,0)/HUGEINT (headroom ~1e19).
    branch = cell.groupBy("feature", "bucket").agg(
        F.sum("n").cast("long").alias("nb"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n"))
        .cast("decimal(38,0)")
        .alias("sb"),
    )
    cls = cell.groupBy("feature", "y").agg(F.sum("n").cast("long").alias("nc"))
    parent = cls.groupBy("feature").agg(
        F.sum("nc").cast("long").alias("n"),
        F.sum(F.col("nc").cast("decimal(38,0)") * F.col("nc"))
        .cast("decimal(38,0)")
        .alias("s"),
    )
    purity = branch.select(
        "feature",
        "nb",
        F.expr(
            "(sb * 1000000) div (CAST(nb AS DECIMAL(38,0)) * nb)"
        ).alias("purity_ppm"),
    )
    agg = (
        purity.join(parent, "feature")
        .groupBy("feature")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_branches"),
            F.expr("sum(CAST(nb AS DECIMAL(38,0)) * purity_ppm) div min(n)")
            .cast("long")
            .alias("child_purity_ppm"),
            F.expr("min((s * 1000000) div (CAST(n AS DECIMAL(38,0)) * n))")
            .cast("long")
            .alias("parent_purity_ppm"),
        )
    )
    return agg.select(
        "feature",
        "n_branches",
        "parent_purity_ppm",
        "child_purity_ppm",
        (F.col("child_purity_ppm") - F.col("parent_purity_ppm"))
        .cast("long")
        .alias("gini_gain_ppm"),
    )


@register(
    "functional_dependency_audit",
    """
WITH checks AS (
  SELECT 'part.p_partkey -> p_brand' AS fd, p_partkey AS lhs, p_brand AS rhs FROM part
  UNION ALL
  SELECT 'part.p_brand -> p_type', p_brand, p_type FROM part
  UNION ALL
  SELECT 'part.p_name -> p_brand', p_name, p_brand FROM part
  UNION ALL
  SELECT 'orders.o_custkey -> o_orderpriority', CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
  UNION ALL
  SELECT 'customer.c_custkey -> c_nationkey', CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR) FROM customer
),
g AS (
  SELECT fd, lhs, count(DISTINCT rhs) AS n_rhs
  FROM checks GROUP BY 1, 2
)
SELECT fd,
       CAST(count(*) AS BIGINT) AS n_lhs_groups,
       CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT) AS n_violating_groups,
       CAST((count(*) FILTER (WHERE n_rhs > 1)) * 1000000 // count(*) AS BIGINT)
         AS violation_ppm
FROM g GROUP BY 1
""",
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — the data-profiling sibling of the
    referential-integrity audit (the TANE/dbt-expectations check class):
    for each candidate FD X -> Y, the number of X-groups whose Y takes
    more than one value, plus the violation rate in exact ppm. Key FDs
    (p_partkey -> p_brand, c_custkey -> c_nationkey) must hold; the
    attribute-level candidates (brand -> type, name -> brand,
    custkey -> priority) quantify HOW functional a relationship is —
    the signal schema-inference and normalization advisors run on. One
    stacked scan per table, then a groupBy(fd, lhs) countDistinct — the
    only shuffle, map-side combined; keys are cast to a common string
    type so the stacked form stays one schema. Reference analog: none
    (beyond-reference data-quality op)."""
    parts = []
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    checks = [
        (p, "part.p_partkey -> p_brand", F.col("p_partkey").cast("string"), F.col("p_brand")),
        (p, "part.p_brand -> p_type", F.col("p_brand"), F.col("p_type")),
        (p, "part.p_name -> p_brand", F.col("p_name"), F.col("p_brand")),
        (o, "orders.o_custkey -> o_orderpriority", F.col("o_custkey").cast("string"), F.col("o_orderpriority")),
        (c, "customer.c_custkey -> c_nationkey", F.col("c_custkey").cast("string"), F.col("c_nationkey").cast("string")),
    ]
    for df, label, lhs, rhs in checks:
        parts.append(df.select(F.lit(label).alias("fd"), lhs.alias("lhs"), rhs.alias("rhs")))
    stacked = parts[0]
    for more in parts[1:]:
        stacked = stacked.unionByName(more)
    g = stacked.groupBy("fd", "lhs").agg(F.countDistinct("rhs").alias("n_rhs"))
    return g.groupBy("fd").agg(
        F.count(F.lit(1)).cast("long").alias("n_lhs_groups"),
        F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).cast("long").alias("n_violating_groups"),
        F.expr(
            "(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) * 1000000) div count(1)"
        ).cast("long").alias("violation_ppm"),
    )


@register(
    "lineitem_diff_in_diff",
    """
WITH bnd AS (
  SELECT epoch_us(min(l_shipdate)) AS lo, epoch_us(max(l_shipdate)) AS hi
  FROM lineitem
),
cells AS (
  SELECT CASE WHEN p.p_size >= 25 THEN 1 ELSE 0 END AS treated,
         CASE WHEN epoch_us(l.l_shipdate) * 2 >= (SELECT lo + hi FROM bnd)
              THEN 1 ELSE 0 END AS post,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
m AS (
  SELECT treated, post, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS HUGEINT) AS s
  FROM cells GROUP BY 1, 2
),
v AS (SELECT treated, post, n, (s * 10000) // n AS mean_micro FROM m),
w AS (
  SELECT max(CASE WHEN treated = 1 AND post = 0 THEN mean_micro END) AS tp0,
         max(CASE WHEN treated = 1 AND post = 1 THEN mean_micro END) AS tp1,
         max(CASE WHEN treated = 0 AND post = 0 THEN mean_micro END) AS cp0,
         max(CASE WHEN treated = 0 AND post = 1 THEN mean_micro END) AS cp1,
         CAST(sum(n) AS BIGINT) AS n_total
  FROM v
)
SELECT CAST(tp0 AS BIGINT) AS mean_treated_pre_micro,
       CAST(tp1 AS BIGINT) AS mean_treated_post_micro,
       CAST(cp0 AS BIGINT) AS mean_control_pre_micro,
       CAST(cp1 AS BIGINT) AS mean_control_post_micro,
       CAST((tp1 - tp0) - (cp1 - cp0) AS BIGINT) AS did_micro,
       n_total
FROM w
""",
)
def lineitem_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator — the causal-inference panel
    workhorse, on exact-integer rails: treatment = large parts
    (p_size >= 25), period split at the integer-micros shipdate midpoint,
    outcome = mean line revenue per 2x2 cell in truncating-div
    MICRO-dollars ((sum_cents * 1e4) div n — deterministic, never a float
    mean), and DiD = (treated post - pre) - (control post - pre) as pure
    integer differences. The whole estimator is one join + one 4-row
    aggregate + a 4-way pivot; the timestamp bounds ride a 1-row
    broadcast. Parallel-trends diagnostics would reuse the same cell
    algebra per finer period. Reference analog: none (beyond-reference
    causal-analytics op)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bnd = li.agg(
        F.min(F.unix_micros("l_shipdate")).alias("lo"),
        F.max(F.unix_micros("l_shipdate")).alias("hi"),
    )
    cells = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .crossJoin(F.broadcast(bnd))
        .select(
            F.when(F.col("p_size") >= 25, 1).otherwise(0).alias("treated"),
            F.when(
                F.unix_micros("l_shipdate") * 2 >= F.col("lo") + F.col("hi"), 1
            ).otherwise(0).alias("post"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
    )
    m = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
    )
    v = m.select("treated", "post", "n", F.expr("(s * 10000) div n").alias("mean_micro"))
    pick = lambda t, q: F.max(  # noqa: E731
        F.when((F.col("treated") == t) & (F.col("post") == q), F.col("mean_micro"))
    )
    return v.agg(
        pick(1, 0).cast("long").alias("mean_treated_pre_micro"),
        pick(1, 1).cast("long").alias("mean_treated_post_micro"),
        pick(0, 0).cast("long").alias("mean_control_pre_micro"),
        pick(0, 1).cast("long").alias("mean_control_post_micro"),
        (
            (pick(1, 1) - pick(1, 0)) - (pick(0, 1) - pick(0, 0))
        ).cast("long").alias("did_micro"),
        F.sum("n").cast("long").alias("n_total"),
    )


@register(
    "events_haar_daily",
    """
WITH d0 AS (SELECT min(date_trunc('day', ts)) AS d0 FROM events),
daily AS (
  SELECT date_diff('day', (SELECT d0 FROM d0), date_trunc('day', ts)) AS i,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
lv AS (
  SELECT l.level, i // (1 << l.level) AS pos,
         CAST(sum(c * (1 - 2 * ((i // (1 << (l.level - 1))) % 2))) AS BIGINT) AS detail
  FROM daily CROSS JOIN (SELECT unnest([1, 2, 3]) AS level) l
  GROUP BY 1, 2
)
SELECT CAST(level AS BIGINT) AS level, CAST(pos AS BIGINT) AS pos, detail
FROM lv
ORDER BY abs(detail) DESC, level, pos
LIMIT 10
""",
)
def events_haar_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized integer Haar wavelet pyramid over the daily event
    series — the multi-resolution change detector next to the CUSUM/ACF
    drift lenses: level-k detail at block p is the first-half-minus-
    second-half sum of daily counts in the 2^k-day block, computed in
    CLOSED FORM straight from the daily histogram (sign = 1 - 2*((i div
    2^(k-1)) mod 2)), so all three levels are one stacked groupBy over
    calendar-bounded rows — no iterative pairwise passes, no power-of-two
    padding (absent days are implicit zeros). Coefficients are exact
    integers (the sqrt(2) normalization is a constant per level and is
    deliberately dropped); top-10 by |detail| under a total tiebreak.
    Large |detail| at level k = a step change at that dyadic scale.
    Reference analog: none (beyond-reference signal-analytics op)."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.date_trunc("day", "ts")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(d0))
        .select(F.datediff(F.date_trunc("day", "ts"), "d0").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    levels = spark.range(1, 4).select(F.col("id").cast("int").alias("level"))
    lv = (
        daily.crossJoin(F.broadcast(levels))
        .select(
            "level",
            F.expr("i div (1 << level)").alias("pos"),
            (
                F.col("c")
                * (1 - 2 * F.expr("(i div (1 << (level - 1))) % 2"))
            ).alias("term"),
        )
        .groupBy("level", "pos")
        .agg(F.sum("term").cast("long").alias("detail"))
    )
    return (
        lv.select(
            F.col("level").cast("long").alias("level"),
            F.col("pos").cast("long").alias("pos"),
            "detail",
        )
        .orderBy(F.abs(F.col("detail")).desc(), "level", "pos")
        .limit(10)
    )


@register(
    "column_joinability_profile",
    """
WITH pairs AS (
  SELECT 'orders.o_custkey ~ customer.c_custkey' AS candidate,
         (SELECT count(DISTINCT o_custkey) FROM orders) AS n_a,
         (SELECT count(DISTINCT c_custkey) FROM customer) AS n_b,
         (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS v FROM orders
                                INTERSECT SELECT DISTINCT c_custkey FROM customer)) AS n_i
  UNION ALL
  SELECT 'lineitem.l_partkey ~ part.p_partkey',
         (SELECT count(DISTINCT l_partkey) FROM lineitem),
         (SELECT count(DISTINCT p_partkey) FROM part),
         (SELECT count(*) FROM (SELECT DISTINCT l_partkey AS v FROM lineitem
                                INTERSECT SELECT DISTINCT p_partkey FROM part))
  UNION ALL
  SELECT 'lineitem.l_suppkey ~ supplier.s_suppkey',
         (SELECT count(DISTINCT l_suppkey) FROM lineitem),
         (SELECT count(DISTINCT s_suppkey) FROM supplier),
         (SELECT count(*) FROM (SELECT DISTINCT l_suppkey AS v FROM lineitem
                                INTERSECT SELECT DISTINCT s_suppkey FROM supplier))
  UNION ALL
  SELECT 'part.p_size ~ nation.n_nationkey',
         (SELECT count(DISTINCT p_size) FROM part),
         (SELECT count(DISTINCT n_nationkey) FROM nation),
         (SELECT count(*) FROM (SELECT DISTINCT p_size AS v FROM part
                                INTERSECT SELECT DISTINCT n_nationkey FROM nation))
)
SELECT candidate,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_i AS BIGINT) AS n_overlap,
       CAST(n_i * 1000000 // n_a AS BIGINT) AS inclusion_a_in_b_ppm,
       CAST(n_i * 1000000 // (n_a + n_b - n_i) AS BIGINT) AS jaccard_ppm
FROM pairs
""",
)
def column_joinability_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-path discovery profiling (the Aurum / data-catalog
    "which columns are joinable" primitive): for candidate column pairs,
    the distinct-value INCLUSION coefficient |A∩B|/|A| and value-set
    Jaccard in exact ppm. High inclusion + containment asymmetry is the
    FK-direction signal (lineitem keys sit fully inside their dims);
    the p_size ~ nationkey pair is the deliberate low-Jaccard negative
    control a catalog must not rank as joinable. Each pair costs two
    distinct-sets and a key-only semi-join count (here via INTERSECT);
    at catalog scale the same statistic runs over per-column minhash
    value sketches — this is the exact baseline those estimate.
    Reference analog: none (beyond-reference data-discovery op)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    checks = [
        ("orders.o_custkey ~ customer.c_custkey", o.select(F.col("o_custkey").alias("v")), c.select(F.col("c_custkey").alias("v"))),
        ("lineitem.l_partkey ~ part.p_partkey", li.select(F.col("l_partkey").alias("v")), p.select(F.col("p_partkey").alias("v"))),
        ("lineitem.l_suppkey ~ supplier.s_suppkey", li.select(F.col("l_suppkey").alias("v")), s.select(F.col("s_suppkey").alias("v"))),
        ("part.p_size ~ nation.n_nationkey", p.select(F.col("p_size").cast("long").alias("v")), n.select(F.col("n_nationkey").alias("v"))),
    ]
    out = None
    for label, a, b in checks:
        da, db = a.distinct(), b.distinct()
        row = (
            da.agg(F.count(F.lit(1)).alias("n_a"))
            .crossJoin(db.agg(F.count(F.lit(1)).alias("n_b")))
            .crossJoin(
                da.join(db, "v", "left_semi").agg(F.count(F.lit(1)).alias("n_i"))
            )
            .select(
                F.lit(label).alias("candidate"),
                F.col("n_a").cast("long").alias("n_a"),
                F.col("n_b").cast("long").alias("n_b"),
                F.col("n_i").cast("long").alias("n_overlap"),
                F.expr("(n_i * 1000000L) div n_a").cast("long").alias("inclusion_a_in_b_ppm"),
                F.expr("(n_i * 1000000L) div (n_a + n_b - n_i)").cast("long").alias("jaccard_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "lake_join_view_ivm",
    """
WITH a1 AS (
  SELECT o_orderkey AS k, o_custkey AS ck, CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderkey % 3 = 0
),
da AS (
  SELECT o_orderkey AS k, o_custkey AS ck, CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderkey % 3 = 1
),
b1 AS (SELECT c_custkey AS ck, c_nationkey AS nk FROM customer WHERE c_custkey % 2 = 0),
db AS (SELECT c_custkey AS ck, c_nationkey AS nk FROM customer WHERE c_custkey % 2 = 1),
afull AS (SELECT * FROM a1 UNION ALL SELECT * FROM da),
bfull AS (SELECT * FROM b1 UNION ALL SELECT * FROM db)
SELECT CAST(b.nk AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(a.price) AS DOUBLE), 2) AS total_price
FROM afull a JOIN bfull b ON b.ck = a.ck
GROUP BY 1
""",
)
def lake_join_view_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE for a JOIN view over two snapshot
    tables — the delta-rule algebra d(A⋈B) = dA⋈B_new ∪ A_old⋈dB made
    executable and gated: the per-nation aggregate view is first built
    from (A1 ⋈ B1), then both tables take an append (new orders dA, new
    customers dB — A1 rows referencing dB customers dangle in V1 and
    must surface via the A_old⋈dB term, the one naive IVM forgets), the
    deltas are read back through `snapshot_diff` (file-list CDC — cost
    proportional to the CHANGE, not the table), and the view is refreshed
    by summing partial aggregates keyed by nation. The oracle recomputes
    the full join on the final state: a missing delta term, a
    double-counted dA⋈dB, or a diff that rereads old files all break the
    hash. At 100 TB this is the pattern that turns a nightly full join
    into a delta-sized job. Reference analog: none (beyond-reference
    lakehouse-IVM op)."""
    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append,
        snapshot_diff,
    )
    from mobsos_event_log_generator_spark.workdirs import scratch_dir

    roota = scratch_dir("ivma_")
    rootb = scratch_dir("ivmb_")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
    )
    snapshot_append(o.filter(F.col("k") % 3 == 0), roota)  # A1
    snapshot_append(c.filter(F.col("ck") % 2 == 0), rootb)  # B1

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("nk").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price").alias("total_price"),
        )

    a1 = read_snapshot(spark, roota)
    b1 = read_snapshot(spark, rootb)
    v1 = agg(a1.join(b1, "ck"))

    snapshot_append(o.filter(F.col("k") % 3 == 1), roota)  # dA -> v2
    snapshot_append(c.filter(F.col("ck") % 2 == 1), rootb)  # dB -> v2
    da = snapshot_diff(spark, roota, 1, 2).filter(
        F.col("_change_type") == "insert"
    ).drop("_change_type")
    db = snapshot_diff(spark, rootb, 1, 2).filter(
        F.col("_change_type") == "insert"
    ).drop("_change_type")
    b_new = read_snapshot(spark, rootb)  # B1 ∪ dB
    # delta rule: dV = dA ⋈ B_new  ∪  A_old ⋈ dB   (disjoint by construction)
    dv = agg(da.join(b_new, "ck").select("nk", "price").unionByName(
        a1.join(db, "ck").select("nk", "price")
    ))
    refreshed = (
        v1.unionByName(dv)
        .groupBy("nk")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("total_price").alias("total_price"),
        )
    )
    return refreshed.select(
        F.col("nk").cast("long").alias("nationkey"),
        "n_orders",
        F.round(F.col("total_price").cast("double"), 2).alias("total_price"),
    )


@register(
    "orders_cuped_experiment",
    """
WITH bnd2 AS (
  SELECT epoch_us(min(o_orderdate)) AS lo, epoch_us(max(o_orderdate)) AS hi FROM orders
),
per_cust AS (
  SELECT o_custkey AS ck, o_custkey % 2 AS variant,
         CAST(sum(CASE WHEN epoch_us(o_orderdate) * 2 < (SELECT lo + hi FROM bnd2)
                       THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN epoch_us(o_orderdate) * 2 >= (SELECT lo + hi FROM bnd2)
                       THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
g AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * x) AS HUGEINT) AS sxx, CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM per_cust
),
theta AS (
  SELECT n, (sx * 1000000) // n AS mx_micro,
         n * sxy - sx * sy AS cxy, n * sxx - sx * sx AS cxx
  FROM g
),
v AS (
  SELECT variant, CAST(count(*) AS HUGEINT) AS nv,
         CAST(sum(x) AS HUGEINT) AS sxv, CAST(sum(y) AS HUGEINT) AS syv
  FROM per_cust GROUP BY 1
)
SELECT CAST(variant AS BIGINT) AS variant,
       CAST(nv AS BIGINT) AS n_customers,
       CAST((syv * 1000000) // nv AS BIGINT) AS mean_y_micro,
       CAST((sxv * 1000000) // nv AS BIGINT) AS mean_x_micro,
       CAST((syv * 1000000) // nv
            - (t.cxy * ((sxv * 1000000) // nv - t.mx_micro)) // t.cxx AS BIGINT)
         AS adj_mean_y_micro
FROM v CROSS JOIN theta t
""",
)
def orders_cuped_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. WSDM'13,
    public method) — the A/B-testing sibling of the DiD estimator: the
    pre-period spend x (orders before the date midpoint) is the
    covariate, the post-period spend y the metric, custkey parity the
    variant split; each variant reports its raw mean and the CUPED-
    adjusted mean ȳ_v − θ(x̄_v − x̄) with θ = Cov(x,y)/Var(x) folded in
    as ONE truncating division of exact integer co-moments ((cxy·dx) div
    cxx — never a float θ). Whole-dollar grain keeps the n³-scaled
    products inside decimal(38,0)/HUGEINT (documented headroom rule).
    Shapes: one groupBy(customer), one 1-row global co-moment aggregate
    (broadcast), one per-variant aggregate. Reference analog: none
    (beyond-reference experimentation op)."""
    o = load_table(spark, sf_dir, "orders")
    bnd2 = o.agg(
        F.min(F.unix_micros("o_orderdate")).alias("lo"),
        F.max(F.unix_micros("o_orderdate")).alias("hi"),
    )
    d38 = lambda c: F.sum(c).cast("decimal(38,0)")  # noqa: E731
    per_cust = (
        o.crossJoin(F.broadcast(bnd2))
        .select(
            F.col("o_custkey").alias("ck"),
            (F.col("o_custkey") % 2).alias("variant"),
            F.when(
                F.unix_micros("o_orderdate") * 2 < F.col("lo") + F.col("hi"),
                F.floor("o_totalprice").cast("long"),
            ).otherwise(0).alias("xr"),
            F.when(
                F.unix_micros("o_orderdate") * 2 >= F.col("lo") + F.col("hi"),
                F.floor("o_totalprice").cast("long"),
            ).otherwise(0).alias("yr"),
        )
        .groupBy("ck", "variant")
        .agg(
            F.sum("xr").cast("long").alias("x"),
            F.sum("yr").cast("long").alias("y"),
        )
    )
    g = per_cust.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        d38(F.col("x")).alias("sx"),
        d38(F.col("y")).alias("sy"),
        d38(F.col("x") * F.col("x")).alias("sxx"),
        d38(F.col("x") * F.col("y")).alias("sxy"),
    )
    theta = g.select(
        F.expr("(sx * 1000000) div n").alias("mx_micro"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cxy"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("cxx"),
    )
    v = per_cust.groupBy("variant").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nv"),
        d38(F.col("x")).alias("sxv"),
        d38(F.col("y")).alias("syv"),
    )
    return v.crossJoin(F.broadcast(theta)).select(
        F.col("variant").cast("long").alias("variant"),
        F.col("nv").cast("long").alias("n_customers"),
        F.expr("(syv * 1000000) div nv").cast("long").alias("mean_y_micro"),
        F.expr("(sxv * 1000000) div nv").cast("long").alias("mean_x_micro"),
        F.expr(
            "(syv * 1000000) div nv"
            " - (cxy * ((sxv * 1000000) div nv - mx_micro)) div cxx"
        ).cast("long").alias("adj_mean_y_micro"),
    )


@register(
    "join_cardinality_estimates",
    """
WITH pairs AS (
  SELECT 'orders x lineitem ON orderkey' AS join_pair,
         (SELECT count(*) FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey) AS exact_rows,
         (SELECT sum(est) FROM (
            SELECT (ca * cb) // (CASE WHEN da > db THEN da ELSE db END) AS est
            FROM (SELECT o_orderkey % 64 AS b, count(*) AS ca,
                         count(DISTINCT o_orderkey) AS da FROM orders GROUP BY 1) a
            JOIN (SELECT l_orderkey % 64 AS b, count(*) AS cb,
                          count(DISTINCT l_orderkey) AS db FROM lineitem GROUP BY 1) c
              USING (b))) AS est_rows
  UNION ALL
  SELECT 'orders x customer ON custkey',
         (SELECT count(*) FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
         (SELECT sum(est) FROM (
            SELECT (ca * cb) // (CASE WHEN da > db THEN da ELSE db END) AS est
            FROM (SELECT o_custkey % 64 AS b, count(*) AS ca,
                         count(DISTINCT o_custkey) AS da FROM orders GROUP BY 1) a
            JOIN (SELECT c_custkey % 64 AS b, count(*) AS cb,
                          count(DISTINCT c_custkey) AS db FROM customer GROUP BY 1) c
              USING (b)))
)
SELECT join_pair,
       CAST(exact_rows AS BIGINT) AS exact_rows,
       CAST(est_rows AS BIGINT) AS est_rows,
       CAST(abs(est_rows - exact_rows) * 1000000 // exact_rows AS BIGINT) AS abs_err_ppm
FROM pairs
""",
)
def join_cardinality_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based-optimizer statistics made auditable: the classic
    equi-width-histogram JOIN CARDINALITY ESTIMATE — per key-hash bucket,
    est_b = (|A_b|·|B_b|) div max(ndv_A_b, ndv_B_b) (containment-of-keys
    assumption, the System R / CBO formula) — against the exact join
    count, with absolute error in exact ppm. The estimate costs two
    64-bucket aggregates per side (what ANALYZE collects) instead of the
    join itself; the report quantifies what that buys: near-zero error on
    the FK joins (where containment holds). All arithmetic is integer
    truncating-div, deterministic in both engines. Reference analog:
    none (beyond-reference optimizer-statistics op)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    def estimate(a: DataFrame, ka: str, b: DataFrame, kb: str) -> DataFrame:
        ha = a.groupBy((F.col(ka) % 64).alias("b")).agg(
            F.count(F.lit(1)).alias("ca"), F.countDistinct(ka).alias("da")
        )
        hb = b.groupBy((F.col(kb) % 64).alias("b")).agg(
            F.count(F.lit(1)).alias("cb"), F.countDistinct(kb).alias("db")
        )
        return ha.join(hb, "b").agg(
            F.sum(F.expr("(ca * cb) div (CASE WHEN da > db THEN da ELSE db END)"))
            .cast("long")
            .alias("est_rows")
        )

    def row(label: str, a: DataFrame, ka: str, b: DataFrame, kb: str) -> DataFrame:
        exact = a.join(b, a[ka] == b[kb]).agg(
            F.count(F.lit(1)).cast("long").alias("exact_rows")
        )
        return (
            exact.crossJoin(estimate(a, ka, b, kb))
            .select(
                F.lit(label).alias("join_pair"),
                "exact_rows",
                "est_rows",
                F.expr("(abs(est_rows - exact_rows) * 1000000L) div exact_rows")
                .cast("long")
                .alias("abs_err_ppm"),
            )
        )

    return row("orders x lineitem ON orderkey", o, "o_orderkey", li, "l_orderkey").unionByName(
        row("orders x customer ON custkey", o, "o_custkey", c, "c_custkey")
    )


_BF_ROUNDS = 3
_BF_INF = 10**15


def _bf_iter_cte(k: int) -> str:
    prev = f"bf{k - 1}"
    return f"""
bf{k} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN r.rd IS NULL OR p.d <= r.rd THEN p.d ELSE r.rd END AS d
  FROM nodes n
  JOIN {prev} p ON p.node = n.node
  LEFT JOIN (
    SELECT e.dst AS node, min(p.d + e.w) AS rd
    FROM edges e JOIN {prev} p ON p.node = e.src
    WHERE p.d < {_BF_INF}
    GROUP BY 1
  ) r ON r.node = n.node
)"""


_SQL_NATION_SSSP = (
    f"""
WITH latency AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         greatest(0, date_diff('day', o.o_orderdate, l.l_shipdate)) AS days
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(min(days) AS BIGINT) AS w
  FROM latency WHERE src <> dst GROUP BY 1, 2
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
bf0 AS (
  SELECT node, CAST(CASE WHEN node = 0 THEN 0 ELSE {_BF_INF} END AS BIGINT) AS d
  FROM nodes
),"""
    + ",".join(_bf_iter_cte(k) for k in range(1, _BF_ROUNDS + 1))
    + f"""
SELECT CAST(node AS BIGINT) AS nation, CAST(d AS BIGINT) AS dist_days
FROM bf{_BF_ROUNDS} WHERE d < {_BF_INF}
"""
)


@register("nations_shortest_latency_paths", _SQL_NATION_SSSP)
def nations_shortest_latency_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths over the nation-level supply latency
    graph: edge (customer nation -> supplier nation) weighted by the
    MINIMUM observed order->ship days between that pair, relaxed for 3
    Bellman-Ford rounds from nation 0 — the MIN-PLUS semiring member of
    the fixed-point family (``operators/graph.py::bellman_ford_rounds``),
    all-integer so every round is bit-identical; the oracle unrolls the
    identical relaxations. After k rounds distances are exact for <= k-hop
    paths (textbook invariant, fixed-round semantics). Edge extraction is
    the 4-way FK join aggregated to the bounded nation x nation grid; the
    relax loop joins only the 25-node distance table against <= 625
    edges. Reference analog: none (beyond-reference graph op)."""
    from mobsos_event_log_generator_spark.operators.graph import bellman_ford_rounds

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
            F.greatest(F.lit(0), F.datediff("l_shipdate", "o_orderdate")).alias("days"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("days").cast("long").alias("w"))
    )
    dist = bellman_ford_rounds(edges, source=0, rounds=_BF_ROUNDS, inf=_BF_INF)
    return dist.select(
        F.col("node").cast("long").alias("nation"),
        F.col("dist").cast("long").alias("dist_days"),
    )


_LT_ROUNDS = 3
_LT_SEEDS = 5


def _lt_round_cte(k: int) -> str:
    prev = f"act{k - 1}"
    return f"""
act{k} AS MATERIALIZED (
  SELECT node FROM {prev}
  UNION
  SELECT g.node FROM (
    SELECT e.dst AS node, count(*) AS n_act
    FROM sym e JOIN {prev} a ON a.node = e.src
    GROUP BY 1
  ) g JOIN deg d ON d.node = g.node
  WHERE g.n_act * 2 >= d.deg
)"""


_SQL_LT_CASCADE = (
    f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS MATERIALIZED (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst FROM pairs
  UNION ALL SELECT p2, p1 FROM pairs
),
deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM sym GROUP BY 1),
act0 AS MATERIALIZED (
  SELECT node FROM (
    SELECT node, row_number() OVER (ORDER BY deg DESC, node) AS rk FROM deg
  ) WHERE rk <= {_LT_SEEDS}
),"""
    + ",".join(_lt_round_cte(k) for k in range(1, _LT_ROUNDS + 1))
    + """
SELECT CAST(0 AS BIGINT) AS round, CAST(count(*) AS BIGINT) AS n_active FROM act0
"""
    + "".join(
        f"UNION ALL SELECT {k}, CAST(count(*) AS BIGINT) FROM act{k}\n"
        for k in range(1, _LT_ROUNDS + 1)
    )
)


@register("parts_influence_cascade", _SQL_LT_CASCADE)
def parts_influence_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-threshold influence cascade (Kempe-Kleinberg-Tardos class,
    deterministic majority variant) over the part co-purchase graph: seed
    the 5 highest-degree parts, then for 3 rounds activate any part
    whose ACTIVE neighbor count reaches half its degree (2·n_act >= deg —
    pure integer threshold, no random edge weights, so the cascade is
    bit-identical everywhere). Per round one edge⋈active equi-join + one
    groupBy + a degree join — the fixed-point family shuffle shape with
    UNION-monotone state; the oracle unrolls the rounds as MATERIALIZED
    CTEs (the BF lesson: monotone stages referenced twice re-evaluate
    exponentially if inlined). Output: cumulative active count per round
    — the adoption curve. Reference analog: none (beyond-reference
    network-diffusion op)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    c = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(c, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("p1", "p2")
    )
    sym = pairs.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionByName(
        pairs.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    deg = deg.localCheckpoint(eager=True)
    # distributed top-k (TakeOrderedAndProject) — never a partition-less
    # row_number sort over the data-scaled part dim
    active = (
        deg.orderBy(F.col("deg").desc(), "node")
        .limit(_LT_SEEDS)
        .select("node")
        .localCheckpoint(eager=True)
    )
    out = active.agg(F.count(F.lit(1)).cast("long").alias("n_active")).select(
        F.lit(0).cast("long").alias("round"), "n_active"
    )
    for k in range(1, _LT_ROUNDS + 1):
        fired = (
            sym.join(active.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("n_act"))
            .join(deg, "node")
            .filter(F.col("n_act") * 2 >= F.col("deg"))
            .select("node")
        )
        active = active.unionByName(fired).distinct().localCheckpoint(eager=True)
        out = out.unionByName(
            active.agg(F.count(F.lit(1)).cast("long").alias("n_active")).select(
                F.lit(k).cast("long").alias("round"), "n_active"
            )
        )
    return out


@register(
    "orders_revenue_drawdown",
    """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
c AS (
  SELECT d, rev,
         sum(rev) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
  FROM daily
),
dd AS (
  SELECT d, cum,
         max(cum) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak
  FROM c
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(max(peak) AS BIGINT) AS final_peak_cents,
       CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents,
       CAST(min(CASE WHEN peak - cum = (SELECT max(peak - cum) FROM dd)
                     THEN strftime(d, '%Y-%m-%d') END) AS VARCHAR) AS trough_date
FROM dd
""",
)
def orders_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative daily revenue — the quant risk
    metric (peak-to-trough drop of the running total), exact in integer
    cents: daily revenue aggregates once (the only row-scaled shuffle),
    then cumulative sum and running max ride windows over the
    CALENDAR-BOUNDED daily series, and the drawdown row reports the
    deepest gap plus its earliest trough date. Window use here is the
    documented bounded-series exception (thousands of day rows at any
    corpus size). Reference analog: none (beyond-reference financial-
    analytics op)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev")
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd = daily.withColumn("cum", F.sum("rev").over(wc)).withColumn(
        "peak", F.max(F.sum("rev").over(wc)).over(wc)
    )
    mx = dd.agg(F.max(F.col("peak") - F.col("cum")).alias("mdd"))
    return (
        dd.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("peak").cast("long").alias("final_peak_cents"),
            F.max(F.col("peak") - F.col("cum")).cast("long").alias("max_drawdown_cents"),
            F.min(
                F.when(
                    F.col("peak") - F.col("cum") == F.col("mdd"),
                    F.date_format("d", "yyyy-MM-dd"),
                )
            ).alias("trough_date"),
        )
    )


@register(
    "events_seasonal_naive_mase",
    """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT cur.event_type,
         abs(cur.c - w.c) AS ae7,
         abs(cur.c - y.c) AS ae1
  FROM daily cur
  JOIN daily w ON w.event_type = cur.event_type AND w.d = cur.d - INTERVAL 7 DAY
  JOIN daily y ON y.event_type = cur.event_type AND y.d = cur.d - INTERVAL 1 DAY
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days_scored,
       CAST(sum(ae7) AS BIGINT) AS sum_ae_seasonal,
       CAST(sum(ae1) AS BIGINT) AS sum_ae_naive,
       CAST(sum(ae7) * 1000000 // sum(ae1) AS BIGINT) AS mase_ppm
FROM scored GROUP BY 1
""",
)
def events_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-skill evaluation without a model: per event type, the
    seasonal-naive forecast (value 7 days ago) scored against the plain
    naive (yesterday) by MASE in exact ppm — Σ|err_seasonal| div
    Σ|err_naive| over the days where both references exist. Under 1e6
    means weekly seasonality is real and a forecaster should use it;
    this is the Hyndman MASE denominator discipline with the integer
    rails. One daily aggregate, then two self-equi-joins on (type,
    day±k) over the calendar-bounded series — no window needed at all.
    Reference analog: none (beyond-reference forecast-eval op)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cur = daily.select("event_type", "d", F.col("c").alias("cc"))
    wk = daily.select(
        "event_type", (F.col("d") + F.expr("INTERVAL 7 DAY")).alias("d"), F.col("c").alias("cw")
    )
    yd = daily.select(
        "event_type", (F.col("d") + F.expr("INTERVAL 1 DAY")).alias("d"), F.col("c").alias("cy")
    )
    scored = cur.join(wk, ["event_type", "d"]).join(yd, ["event_type", "d"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        F.sum(F.abs(F.col("cc") - F.col("cw"))).cast("long").alias("sum_ae_seasonal"),
        F.sum(F.abs(F.col("cc") - F.col("cy"))).cast("long").alias("sum_ae_naive"),
        F.expr(
            "(sum(abs(cc - cw)) * 1000000) div sum(abs(cc - cy))"
        ).cast("long").alias("mase_ppm"),
    )


@register(
    "parts_brand_assortativity",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS MATERIALIZED (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
lab AS (
  SELECT p.p1, p.p2, pa.p_brand AS b1, pb.p_brand AS b2
  FROM pairs p JOIN part pa ON pa.p_partkey = p.p1
               JOIN part pb ON pb.p_partkey = p.p2
),
m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM lab),
intra AS (
  SELECT b1 AS brand, CAST(count(*) AS HUGEINT) AS e_c
  FROM lab WHERE b1 = b2 GROUP BY 1
),
degsum AS (
  SELECT brand, CAST(sum(cnt) AS HUGEINT) AS d_c FROM (
    SELECT b1 AS brand, count(*) AS cnt FROM lab GROUP BY 1
    UNION ALL
    SELECT b2, count(*) FROM lab GROUP BY 1
  ) GROUP BY 1
),
q AS (
  SELECT (SELECT m FROM m) AS m,
         (SELECT COALESCE(sum(e_c), 0) FROM intra) AS se,
         (SELECT sum(d_c * d_c) FROM degsum) AS sd2,
         (SELECT count(*) FROM degsum) AS n_brands
)
SELECT CAST(m AS BIGINT) AS n_edges,
       CAST(n_brands AS BIGINT) AS n_brands,
       CAST(se AS BIGINT) AS intra_brand_edges,
       CAST((4 * m * se - sd2) * 1000000 // (4 * m * m) AS BIGINT)
         AS modularity_micro
FROM q
""",
)
def parts_brand_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute assortativity (Newman modularity of the BRAND partition)
    over the part co-purchase graph: do baskets concentrate within
    brands? Q = Σ_c [e_c/m − (d_c/2m)²] folded into ONE exact integer
    expression, (4m·Σe_c − Σd_c²)·10⁶ div 4m² — no float ratio, no
    per-community division. The graph is the bounded basket join; brand
    labels arrive by two part-dim joins; everything above is
    brand-alphabet-bounded aggregation. Positive micro-modularity =
    within-brand clustering beyond degree chance — the attribute-mixing
    diagnostic community detectors are benchmarked against.
    Reference analog: none (beyond-reference network-metric op)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    c = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(c, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("p1", "p2")
    )
    lab = (
        pairs.join(p.select(F.col("p_partkey").alias("p1"), F.col("p_brand").alias("b1")), "p1")
        .join(p.select(F.col("p_partkey").alias("p2"), F.col("p_brand").alias("b2")), "p2")
    )
    m = lab.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("m"))
    se = lab.filter(F.col("b1") == F.col("b2")).agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("decimal(38,0)").alias("se")
    )
    degsum = (
        lab.select(F.col("b1").alias("brand"))
        .unionByName(lab.select(F.col("b2").alias("brand")))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("d_c"))
    )
    dstats = degsum.agg(
        F.sum(F.col("d_c") * F.col("d_c")).cast("decimal(38,0)").alias("sd2"),
        F.count(F.lit(1)).cast("long").alias("n_brands"),
    )
    return (
        m.crossJoin(se)
        .crossJoin(dstats)
        .select(
            F.col("m").cast("long").alias("n_edges"),
            F.col("n_brands"),
            F.col("se").cast("long").alias("intra_brand_edges"),
            F.expr("((4 * m * se - sd2) * 1000000) div (4 * m * m)")
            .cast("long")
            .alias("modularity_micro"),
        )
    )


@register(
    "orders_trimmed_mean_price",
    """
WITH h AS (
  SELECT o_orderpriority AS pri,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT pri, pc, cnt,
         sum(cnt) OVER (PARTITION BY pri ORDER BY pc ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY pri) AS n
  FROM h
),
w AS (
  SELECT pri, pc, n,
         greatest(0, least(cum, n - (n * 5) // 100)
                     - greatest(cum - cnt, (n * 5) // 100)) AS w
  FROM c
)
SELECT pri AS priority,
       CAST(min(n) AS BIGINT) AS n_orders,
       CAST(sum(w) AS BIGINT) AS n_kept,
       CAST(sum(pc * w) * 10000 // sum(w) AS BIGINT) AS trimmed_mean_micro
FROM w WHERE w > 0 GROUP BY 1
""",
)
def orders_trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimate: the 5%-each-side TRIMMED mean of order
    price per priority, exact to the micro-dollar: per-(priority, cents)
    histogram, grouped two-phase prefix sum for cumulative ranks, and
    per-value CLIPPED weights w = overlap of the value's rank interval
    [cum−cnt+1, cum] with the kept band (lo, hi] — so boundary values
    that straddle the trim line contribute exactly their surviving
    copies (the subtlety a filter-by-value trim gets wrong when ties
    cross the cut). mean = Σ pc·w·10⁴ div Σw, truncating. The histogram
    is the only row-scaled aggregate; the prefix runs through
    ``value_ordered_running_sum``'s grouped bucketed form — no per-group
    single-partition sort. Reference analog: none (beyond-reference
    robust-stats op)."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    o = load_table(spark, sf_dir, "orders")
    h = (
        o.select(
            F.col("o_orderpriority").alias("pri"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("pc"),
        )
        .groupBy("pri", "pc")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    c = value_ordered_running_sum(
        h, order_col="pc", tie_cols=[], value_col=F.col("cnt"),
        out_col="cum", group_cols=["pri"],
    )
    n = h.groupBy("pri").agg(F.sum("cnt").cast("long").alias("n"))
    w = (
        c.join(F.broadcast(n), "pri")
        .select(
            "pri", "pc", "n",
            F.greatest(
                F.lit(0),
                F.least(F.col("cum"), F.col("n") - F.expr("(n * 5) div 100"))
                - F.greatest(F.col("cum") - F.col("cnt"), F.expr("(n * 5) div 100")),
            ).alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    return w.groupBy(F.col("pri").alias("priority")).agg(
        F.min("n").cast("long").alias("n_orders"),
        F.sum("w").cast("long").alias("n_kept"),
        F.expr("(sum(pc * w) * 10000) div sum(w)").cast("long").alias("trimmed_mean_micro"),
    )


@register(
    "parts_name_canonicalization",
    """
WITH RECURSIVE
names AS MATERIALIZED (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts FROM part GROUP BY 1
),
pairs AS MATERIALIZED (
  SELECT a.p_name AS n1, b.p_name AS n2
  FROM names a JOIN names b
    ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 2
),
edges AS MATERIALIZED (
  SELECT n1 AS a, n2 AS b FROM pairs UNION SELECT n2, n1 FROM pairs
),
reach(src, dst) AS (
  SELECT p_name, p_name FROM names
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (SELECT src AS p_name, min(dst) AS canonical FROM reach GROUP BY 1)
SELECT c.canonical,
       CAST(count(*) AS BIGINT) AS n_names,
       CAST(sum(n.n_parts) AS BIGINT) AS n_parts
FROM comp c JOIN names n ON n.p_name = c.p_name
GROUP BY 1
HAVING count(*) > 1
""",
)
def parts_name_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end TYPO CANONICALIZATION — the composition the ER stack
    exists for: FastSS edit-distance join (radius 2) finds the variant
    pairs, star-contraction connected components clusters them
    transitively (A~B, B~C groups {A,B,C} even when lev(A,C) > 2), and
    each cluster's canonical form is its lexicographic minimum — the
    keep-min survivorship rule. Output: multi-name clusters with member
    and part counts (the dedup work-list). Both composed operators are
    independently gated (brute-force unit, known-graph units); this
    query gates their COMPOSITION against a brute-force + recursive-
    closure oracle. Scale: linear deletion-neighborhood join + O(log n)
    contraction rounds — never the quadratic name cross product.
    Reference analog: none (beyond-reference ER-pipeline op)."""
    from mobsos_event_log_generator_spark.operators.graph import connected_components_star
    from mobsos_event_log_generator_spark.operators.setjoin import edit_distance_join

    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    pairs = edit_distance_join(p, key_col="p_name", max_dist=2).select(
        F.col("name_a").alias("id1"), F.col("name_b").alias("id2")
    )
    comp = connected_components_star(pairs)
    labeled = names.join(
        comp.withColumnRenamed("node", "p_name"), "p_name", "left"
    ).select(
        "p_name",
        "n_parts",
        F.coalesce(F.col("component"), F.col("p_name")).alias("canonical"),
    )
    return (
        labeled.groupBy("canonical")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_names"),
            F.sum("n_parts").cast("long").alias("n_parts"),
        )
        .filter(F.col("n_names") > 1)
    )


@register(
    "orders_nested_lines_roundtrip",
    """
WITH nested AS (
  SELECT l_orderkey AS k,
         list(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
              ORDER BY l_linenumber, floor(l_extendedprice * 100 + 0.5)) AS cents,
         list(l_linenumber
              ORDER BY l_linenumber, floor(l_extendedprice * 100 + 0.5)) AS lns
  FROM lineitem GROUP BY 1
)
SELECT k AS orderkey,
       CAST(len(cents) AS BIGINT) AS n_lines,
       CAST(list_sum(cents) AS BIGINT) AS total_cents,
       CAST(cents[1] AS BIGINT) AS first_line_cents,
       CAST(cents[len(cents)] AS BIGINT) AS last_line_cents,
       CAST(list_aggregate(lns, 'string_agg', '-') AS VARCHAR) AS line_signature
FROM nested
""",
)
def orders_nested_lines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED-TYPE surface gate: assemble each order's lines into a
    linenumber-SORTED array of structs (the document/denormalized shape a
    lakehouse serves to applications), then derive every output through
    the ARRAY — size, an `aggregate` fold for the total, element_at for
    first/last, and a transform+array_join signature — so the gate proves
    collect_list -> array_sort determinism and the higher-order-function
    path, not just flat SQL. Output is scalar-only (cross-engine struct
    FORMATTING differs; values derived from the array compare exactly).
    The fold is bounded by basket size (<= 7 elements) per the
    interpreted-HOF rule in ENGINEERING_NOTES — fine here, never on a
    corpus-length array. Reference analog: none (beyond-reference
    nested-data op)."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.select(
            F.col("l_orderkey").alias("orderkey"),
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                .cast("long")
                .alias("cents"),
            ).alias("line"),
        )
        .groupBy("orderkey")
        .agg(F.array_sort(F.collect_list("line")).alias("lines"))
    )
    return nested.select(
        "orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        F.expr("aggregate(lines, 0L, (acc, x) -> acc + x.cents)")
        .cast("long")
        .alias("total_cents"),
        F.element_at("lines", 1)["cents"].cast("long").alias("first_line_cents"),
        F.element_at("lines", -1)["cents"].cast("long").alias("last_line_cents"),
        F.array_join(F.expr("transform(lines, x -> cast(x.ln as string))"), "-").alias(
            "line_signature"
        ),
    )


@register(
    "orders_business_days_to_ship",
    """
WITH f AS (SELECT l_orderkey, min(l_shipdate) AS first_ship FROM lineitem GROUP BY 1),
pts AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', DATE '1996-01-01', o.o_orderdate) AS a,
         date_diff('day', DATE '1996-01-01', f.first_ship) AS b
  FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey
  WHERE f.first_ship >= o.o_orderdate
),
biz AS (
  SELECT priority,
         (5 * (b // 7) + least(b % 7, 5))
         - (5 * (a // 7) + least(a % 7, 5)) AS bizdays
  FROM pts WHERE a >= 0 AND b >= 0
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(bizdays) AS BIGINT) AS min_bizdays,
       CAST(max(bizdays) AS BIGINT) AS max_bizdays,
       CAST(sum(bizdays) * 1000000 // count(*) AS BIGINT) AS mean_bizdays_micro
FROM biz GROUP BY 1
""",
)
def orders_business_days_to_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (NETWORKDAYS-style) order->first-shipment latency per
    priority — the BI utility every warehouse reimplements, here as a
    PURE CLOSED FORM with zero weekday-function hazards: weekdays in
    [a, b) = W(b) − W(a) with W(d) = 5·(d div 7) + min(d mod 7, 5) over
    days since a known MONDAY epoch (1996-01-01) — both engines compute
    the identical integer arithmetic, sidestepping the Spark-Sunday=1 /
    DuckDB-Sunday=0 dayofweek discrepancy entirely (the dow-offset bug
    class recorded in ENGINEERING_NOTES becomes unrepresentable). One
    groupBy(orderkey) min + one FK join + one alphabet-bounded
    aggregate; mean in truncating-div micro. Negative synthetic
    latencies and pre-epoch dates are excluded, documented. Reference
    analog: none (beyond-reference calendar-utility op)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    f = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    epoch = F.lit("1996-01-01").cast("date")
    pts = (
        o.join(f, o["o_orderkey"] == f["l_orderkey"])
        .filter(F.col("first_ship") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("o_orderdate"), epoch).cast("long").alias("a"),
            F.datediff(F.col("first_ship"), epoch).cast("long").alias("b"),
        )
        .filter((F.col("a") >= 0) & (F.col("b") >= 0))
    )
    wd = lambda col: F.expr(f"5 * ({col} div 7) + least({col} % 7, 5)")  # noqa: E731
    biz = pts.select("priority", (wd("b") - wd("a")).alias("bizdays"))
    return biz.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("bizdays").cast("long").alias("min_bizdays"),
        F.max("bizdays").cast("long").alias("max_bizdays"),
        F.expr("(sum(bizdays) * 1000000) div count(1)").cast("long").alias("mean_bizdays_micro"),
    )


_SQL_MATCHING = """
WITH cost AS MATERIALIZED (
  SELECT l_partkey AS p, l_suppkey AS s,
         CAST(min(floor(l_extendedprice * 100 + 0.5)) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
pref AS MATERIALIZED (
  SELECT p, s, c,
         row_number() OVER (PARTITION BY p ORDER BY c, s) AS rk
  FROM cost
),
prop1 AS (SELECT p, s, c FROM pref WHERE rk = 1),
acc1 AS MATERIALIZED (
  SELECT p, s, c FROM (
    SELECT p, s, c, row_number() OVER (PARTITION BY s ORDER BY c, p) AS a
    FROM prop1
  ) WHERE a = 1
),
rej1 AS (
  SELECT p FROM prop1 WHERE p NOT IN (SELECT p FROM acc1)
),
prop2 AS (
  SELECT f.p, f.s, f.c FROM pref f JOIN rej1 r ON r.p = f.p WHERE f.rk = 2
),
pool2 AS (
  SELECT p, s, c FROM acc1 UNION ALL SELECT p, s, c FROM prop2
),
acc2 AS MATERIALIZED (
  SELECT p, s, c FROM (
    SELECT p, s, c, row_number() OVER (PARTITION BY s ORDER BY c, p) AS a
    FROM pool2
  ) WHERE a = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_matched,
       CAST(sum(c) AS BIGINT) AS total_cost_cents,
       CAST(count(DISTINCT s) AS BIGINT) AS n_suppliers_used
FROM acc2
"""


@register("parts_supplier_matching", _SQL_MATCHING)
def parts_supplier_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deferred-acceptance (Gale-Shapley-style) bipartite matching, two
    proposal rounds unrolled: every part proposes to its cheapest
    observed supplier (preference = (min line cost, suppkey) — a total
    order); each supplier tentatively keeps the (cost, part)-minimal
    proposal; round-2 rejects propose to their SECOND choice and
    suppliers re-evaluate holder + newcomers together. Fixed-round
    semantics (a full stable matching runs rounds to quiescence — same
    recurrence). Everything is integer/total-ordered so both engines
    replay the identical tentative-match trajectory; the output is the
    match summary (count, total cost, suppliers used). Shapes: one
    (part, supplier) cost aggregate, preference ranks windowed PER PART
    (bounded by a part's supplier count), accepts windowed PER SUPPLIER
    (bounded by proposals/round — at most one per part). The
    assignment-problem class (matching markets, task allocation) joins
    the fixed-point family. Reference analog: none (beyond-reference
    matching op)."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).agg(
        F.min(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("c")
    )
    wp = Window.partitionBy("p").orderBy("c", "s")
    pref = cost.withColumn("rk", F.row_number().over(wp))
    ws = Window.partitionBy("s").orderBy("c", "p")
    prop1 = pref.filter(F.col("rk") == 1).select("p", "s", "c")
    acc1 = (
        prop1.withColumn("a", F.row_number().over(ws))
        .filter(F.col("a") == 1)
        .select("p", "s", "c")
    )
    rej1 = prop1.select("p").join(acc1.select("p"), "p", "left_anti")
    prop2 = pref.filter(F.col("rk") == 2).join(rej1, "p").select("p", "s", "c")
    pool2 = acc1.unionByName(prop2)
    acc2 = (
        pool2.withColumn("a", F.row_number().over(ws))
        .filter(F.col("a") == 1)
        .select("p", "s", "c")
    )
    return acc2.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("c").cast("long").alias("total_cost_cents"),
        F.countDistinct("s").cast("long").alias("n_suppliers_used"),
    )


@register(
    "lineitem_revenue_bridge",
    """
WITH bnd3 AS (
  SELECT epoch_us(min(l_shipdate)) AS lo, epoch_us(max(l_shipdate)) AS hi FROM lineitem
),
cells AS (
  SELECT p.p_brand AS brand,
         CASE WHEN epoch_us(l.l_shipdate) * 2 >= (SELECT lo + hi FROM bnd3)
              THEN 2 ELSE 1 END AS period,
         CAST(l.l_quantity AS BIGINT) AS q,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
agg AS (
  SELECT brand, period, CAST(sum(q) AS BIGINT) AS q, CAST(sum(cents) AS BIGINT) AS r
  FROM cells GROUP BY 1, 2
),
wide AS (
  SELECT brand,
         max(CASE WHEN period = 1 THEN q END) AS q1,
         max(CASE WHEN period = 1 THEN r END) AS r1,
         max(CASE WHEN period = 2 THEN q END) AS q2,
         max(CASE WHEN period = 2 THEN r END) AS r2
  FROM agg GROUP BY 1
  HAVING max(CASE WHEN period = 1 THEN q END) IS NOT NULL
     AND max(CASE WHEN period = 2 THEN q END) IS NOT NULL
),
fx AS (
  SELECT brand, q1, q2,
         (r2 - r1) * 10000 AS d_rev_micro,
         (q2 - q1) * ((r1 * 10000) // q1) AS volume_effect_micro,
         q2 * ((r2 * 10000) // q2 - (r1 * 10000) // q1) AS price_effect_micro
  FROM wide
)
SELECT brand,
       CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
       CAST(d_rev_micro AS BIGINT) AS d_rev_micro,
       CAST(volume_effect_micro AS BIGINT) AS volume_effect_micro,
       CAST(price_effect_micro AS BIGINT) AS price_effect_micro,
       CAST(d_rev_micro - volume_effect_micro - price_effect_micro AS BIGINT)
         AS residual_micro
FROM fx
""",
)
def lineitem_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume revenue bridge (the FP&A variance decomposition):
    between shipdate halves, each brand's revenue delta splits into a
    VOLUME effect (Δq at the old average price) and a PRICE effect (new
    volume times the average-price delta), average prices carried as
    truncating-div micro-dollars — and because truncation makes the
    textbook identity inexact, the RESIDUAL is an explicit output column
    (sums to the rounding loss, auditable) rather than silently forced
    to zero. One FK join + one (brand, period) aggregate + a 2-way
    pivot; the period split rides the 1-row bounds broadcast. Brands in
    only one period are excluded (no base to bridge). Reference analog:
    none (beyond-reference financial-analytics op)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bnd3 = li.agg(
        F.min(F.unix_micros("l_shipdate")).alias("lo"),
        F.max(F.unix_micros("l_shipdate")).alias("hi"),
    )
    cells = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .crossJoin(F.broadcast(bnd3))
        .select(
            F.col("p_brand").alias("brand"),
            F.when(
                F.unix_micros("l_shipdate") * 2 >= F.col("lo") + F.col("hi"), 2
            ).otherwise(1).alias("period"),
            F.col("l_quantity").cast("long").alias("q"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
    )
    agg = cells.groupBy("brand", "period").agg(
        F.sum("q").cast("long").alias("q"), F.sum("cents").cast("long").alias("r")
    )
    wide = (
        agg.groupBy("brand")
        .agg(
            F.max(F.when(F.col("period") == 1, F.col("q"))).alias("q1"),
            F.max(F.when(F.col("period") == 1, F.col("r"))).alias("r1"),
            F.max(F.when(F.col("period") == 2, F.col("q"))).alias("q2"),
            F.max(F.when(F.col("period") == 2, F.col("r"))).alias("r2"),
        )
        .filter(F.col("q1").isNotNull() & F.col("q2").isNotNull())
    )
    fx = wide.select(
        "brand",
        "q1",
        "q2",
        ((F.col("r2") - F.col("r1")) * 10000).alias("d_rev_micro"),
        ((F.col("q2") - F.col("q1")) * F.expr("(r1 * 10000) div q1")).alias(
            "volume_effect_micro"
        ),
        (
            F.col("q2")
            * (F.expr("(r2 * 10000) div q2") - F.expr("(r1 * 10000) div q1"))
        ).alias("price_effect_micro"),
    )
    return fx.select(
        "brand",
        F.col("q1").cast("long").alias("q1"),
        F.col("q2").cast("long").alias("q2"),
        F.col("d_rev_micro").cast("long").alias("d_rev_micro"),
        F.col("volume_effect_micro").cast("long").alias("volume_effect_micro"),
        F.col("price_effect_micro").cast("long").alias("price_effect_micro"),
        (
            F.col("d_rev_micro") - F.col("volume_effect_micro") - F.col("price_effect_micro")
        ).cast("long").alias("residual_micro"),
    )


@register(
    "nations_supplier_hhi",
    """
WITH rev AS (
  SELECT l_suppkey AS sk,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
per AS (
  SELECT n.n_name AS nation, r.sk, r.rev,
         CAST(sum(r.rev) OVER (PARTITION BY n.n_name) AS BIGINT) AS tot
  FROM rev r
  JOIN supplier s ON s.s_suppkey = r.sk
  JOIN nation n ON n.n_nationkey = s.s_nationkey
),
sh AS (
  SELECT nation, sk, tot,
         rev * 1000000 // tot AS share_ppm,
         row_number() OVER (PARTITION BY nation ORDER BY rev DESC, sk) AS rk
  FROM per
),
agg AS (
  SELECT nation,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(max(tot) AS BIGINT) AS total_rev_cents,
         CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
         CAST(max(CASE WHEN rk = 1 THEN share_ppm END) AS BIGINT) AS cr1_ppm,
         CAST(sum(CASE WHEN rk <= 4 THEN share_ppm ELSE 0 END) AS BIGINT) AS cr4_ppm
  FROM sh GROUP BY 1
)
SELECT nation, n_suppliers, total_rev_cents, hhi_ppm, cr1_ppm, cr4_ppm,
       CAST(CASE WHEN hhi_ppm > 0 THEN 1000000000000 // hhi_ppm END AS BIGINT)
         AS eff_competitors_micro
FROM agg
""",
)
def nations_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration report per supplier nation: Herfindahl-
    Hirschman index, CR1/CR4 concentration ratios, and the effective
    number of competitors (inverse HHI) over each nation's supplier
    revenue shares — the antitrust/marketplace-health lens next to the
    Gini and assortativity lenses. Everything is exact integer: shares
    are truncating-div ppm (rev*1e6 div tot fits int64 while national
    revenue stays under ~9e12 cents; widen the product to decimal at
    extreme scale), HHI is sum(share^2) div 1e6 so it lands back on the
    0..1e6 ppm scale, and 1/HHI is 1e12 div hhi. Shapes that survive
    100 TB: revenue is aggregated to supplier grain BEFORE any join
    (the join input is |suppliers|, not |lineitem|), nation is a
    bounded dim AQE broadcasts, and the per-nation window is bounded by
    suppliers-per-nation. CR4 uses a deterministic (rev DESC, suppkey)
    rank so ties can't flap the hash. Reference analog: none
    (beyond-reference market-analytics op)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev")
    )
    per = (
        rev.join(s, rev["sk"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "sk", "rev")
        .withColumn(
            "tot", F.sum("rev").over(Window.partitionBy("nation")).cast("long")
        )
    )
    sh = per.select(
        "nation",
        "sk",
        "tot",
        F.expr("rev * 1000000 div tot").alias("share_ppm"),
        F.row_number()
        .over(Window.partitionBy("nation").orderBy(F.col("rev").desc(), "sk"))
        .alias("rk"),
    )
    agg = sh.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.max("tot").cast("long").alias("total_rev_cents"),
        F.expr("CAST(sum(share_ppm * share_ppm) div 1000000 AS BIGINT)").alias(
            "hhi_ppm"
        ),
        F.max(F.when(F.col("rk") == 1, F.col("share_ppm"))).cast("long").alias(
            "cr1_ppm"
        ),
        F.sum(F.when(F.col("rk") <= 4, F.col("share_ppm")).otherwise(F.lit(0)))
        .cast("long")
        .alias("cr4_ppm"),
    )
    return agg.select(
        "nation",
        "n_suppliers",
        "total_rev_cents",
        "hhi_ppm",
        "cr1_ppm",
        "cr4_ppm",
        F.expr(
            "CAST(CASE WHEN hhi_ppm > 0 THEN 1000000000000 div hhi_ppm END AS BIGINT)"
        ).alias("eff_competitors_micro"),
    )


@register(
    "orders_conformal_shipping",
    """
WITH d AS MATERIALIZED (
  -- MATERIALIZED: referenced by med/scores (via cal) AND test — without it
  -- DuckDB re-inlines the fact join + per-row md5 once per reference
  -- (the nations_structural_holes sweep-hog class, r9 ENGINEERING_NOTES).
  SELECT o.o_orderpriority AS priority,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 AS delay,
         CASE WHEN ('0x' || substr(md5(CAST(l.l_orderkey * 10 + l.l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
              THEN 1 ELSE 0 END AS is_cal
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
med AS (
  SELECT priority, delay AS pred_delay_days FROM (
    SELECT priority, delay,
           row_number() OVER (PARTITION BY priority ORDER BY delay) AS rn,
           count(*) OVER (PARTITION BY priority) AS n
    FROM d WHERE is_cal = 1
  ) WHERE rn = (n + 1) // 2
),
scores AS (
  SELECT d.priority, abs(d.delay - m.pred_delay_days) AS s
  FROM d JOIN med m ON m.priority = d.priority
  WHERE d.is_cal = 1
),
qhat AS (
  SELECT priority, s AS qhat_days, n AS n_cal FROM (
    SELECT priority, s,
           row_number() OVER (PARTITION BY priority ORDER BY s) AS rn,
           count(*) OVER (PARTITION BY priority) AS n
    FROM scores
  ) WHERE rn = (9 * (n + 1) + 9) // 10
),
test AS (
  SELECT d.priority,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(d.delay - m.pred_delay_days) <= q.qhat_days
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM d
  JOIN med m ON m.priority = d.priority
  JOIN qhat q ON q.priority = d.priority
  WHERE d.is_cal = 0
  GROUP BY 1
)
SELECT t.priority,
       CAST(q.n_cal AS BIGINT) AS n_cal,
       t.n_test,
       CAST(m.pred_delay_days AS BIGINT) AS pred_delay_days,
       CAST(q.qhat_days AS BIGINT) AS qhat_days,
       CAST(t.n_covered * 1000000 // t.n_test AS BIGINT) AS coverage_ppm
FROM test t
JOIN med m ON m.priority = t.priority
JOIN qhat q ON q.priority = t.priority
""",
)
def orders_conformal_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals for shipping delay — the
    distribution-free ML-calibration op: a deterministic md5 half-split
    makes a calibration set, the point model is the per-priority lower
    median of order-to-ship days, the conformal quantile qhat is the
    ceil(0.9*(n+1))-th smallest absolute residual on calibration, and
    the report audits empirical coverage of pred +/- qhat on the held
    out half (target 900000 ppm, guaranteed >= that in expectation by
    exchangeability). Exact integer end-to-end: day deltas by
    truncating epoch-us division, rank-selected median/quantile (a
    value at a rank, never an interpolation), coverage in truncating
    ppm. Scale shapes: the fact join is a plain FK equi-join; medians
    and quantiles are per-priority windows (5 groups — for unbounded
    group alphabets swap in the two-phase prefix-sum rank selector of
    value_ordered_running_sum); membership is a pure hash of the row
    key, so the split is stable under appends and repartitioning.
    Reference analog: none (beyond-reference ML-eval op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            "(unix_micros(l_shipdate) - unix_micros(o_orderdate)) div 86400000000"
        ).alias("delay"),
        F.expr(
            "CASE WHEN conv(substr(md5(CAST(l_orderkey * 10 + l_linenumber AS STRING)), 1, 8), 16, 10) % 2 = 0 "
            "THEN 1 ELSE 0 END"
        ).alias("is_cal"),
    )
    cal = d.filter(F.col("is_cal") == 1)
    wp = Window.partitionBy("priority")
    med = (
        cal.withColumn("rn", F.row_number().over(wp.orderBy("delay")))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("priority", F.col("delay").alias("pred_delay_days"))
    )
    scores = cal.join(med, "priority").select(
        "priority", F.abs(F.col("delay") - F.col("pred_delay_days")).alias("s")
    )
    qhat = (
        scores.withColumn("rn", F.row_number().over(wp.orderBy("s")))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .filter(F.expr("rn = (9 * (n + 1) + 9) div 10"))
        .select("priority", F.col("s").alias("qhat_days"), F.col("n").alias("n_cal"))
    )
    test = (
        d.filter(F.col("is_cal") == 0)
        .join(med, "priority")
        .join(qhat, "priority")
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("delay") - F.col("pred_delay_days"))
                    <= F.col("qhat_days"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        test.join(med, "priority")
        .join(qhat, "priority")
        .select(
            "priority",
            F.col("n_cal").cast("long").alias("n_cal"),
            "n_test",
            F.col("pred_delay_days").cast("long").alias("pred_delay_days"),
            F.col("qhat_days").cast("long").alias("qhat_days"),
            F.expr("CAST(n_covered * 1000000 div n_test AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
    )


_BC_ROUNDS = 4


def _bc_round_cte(k: int) -> str:
    prev = f"ap{k - 1}"
    return f"""
ap{k} AS MATERIALIZED (
  SELECT s, v, d, sig FROM {prev}
  UNION ALL
  SELECT g.s, g.v, CAST({k} AS BIGINT) AS d, g.sig FROM (
    SELECT p.s, e.dst AS v, CAST(sum(p.sig) AS BIGINT) AS sig
    FROM {prev} p JOIN bedges e ON e.src = p.v
    WHERE p.d = {k - 1}
    GROUP BY 1, 2
  ) g
  LEFT JOIN {prev} o ON o.s = g.s AND o.v = g.v
  WHERE o.v IS NULL
)"""


_SQL_NATION_BETWEENNESS = (
    f"""
WITH latency AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
bedges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk
    FROM latency
  ) WHERE rk <= 3
),
nodes AS (SELECT src AS node FROM bedges UNION SELECT dst FROM bedges),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
ap0 AS MATERIALIZED (
  SELECT node AS s, node AS v, CAST(0 AS BIGINT) AS d, CAST(1 AS BIGINT) AS sig
  FROM nodes
),"""
    + ",".join(_bc_round_cte(k) for k in range(1, _BC_ROUNDS + 1))
    + f"""
,
terms AS (
  SELECT a.v AS nation,
         CAST(CAST(a.sig AS HUGEINT) * b.sig * 1000000 // c.sig AS BIGINT) AS t
  FROM ap{_BC_ROUNDS} a
  JOIN ap{_BC_ROUNDS} b ON b.s = a.v
  JOIN ap{_BC_ROUNDS} c ON c.s = a.s AND c.v = b.v
  WHERE a.d + b.d = c.d AND a.s <> a.v AND b.v <> a.v AND a.s <> b.v
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(t) AS BIGINT) AS betweenness_micro,
       CAST(sum(t) // ((SELECT n FROM cnt) - 1) // ((SELECT n FROM cnt) - 2)
            AS BIGINT) AS normalized_micro
FROM terms GROUP BY 1
"""
)


@register("nations_betweenness_centrality", _SQL_NATION_BETWEENNESS)
def nations_betweenness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Betweenness centrality over the nation trade graph (hop metric,
    <= 4-hop shortest paths): which nations sit on the most shortest
    paths between other nations — the brokerage lens completing the
    centrality family (pagerank = influence, HITS = hub/authority,
    betweenness = control of flow). Instead of Brandes' recursive
    dependency accumulation (whose nested rational divisions don't
    replay exactly cross-engine), betweenness is computed from the
    pair-dependency identity: sigma_st(v) = sigma_sv * sigma_vt whenever
    d_sv + d_vt = d_st, so bc(v) = sum over (s,t) of
    sigma_sv * sigma_vt * 1e6 div sigma_st — each term quantized to
    integer ppm BEFORE summation (order-independent exact integers; the
    oracle replays identical arithmetic). The sigma table comes from
    ``operators/graph.py::bfs_all_pairs_counts`` (simultaneous BFS from
    all sources, path counts summed over predecessors) and the triple
    join is O(n^3) over the BOUNDED nation alphabet — this op targets
    bounded graphs; sample landmarks for open-domain graphs. Path-count
    products ride a HUGEINT/decimal(38,0) cast so dense sigma can't
    overflow int64. Edges are the TRADE BACKBONE: each nation keeps its
    top-3 partners by pair count ((n DESC, dst) rank — deterministic and
    scale-invariant); on the raw grid every nation trades with every
    other, the graph is complete, and betweenness is identically zero.
    Reference analog: none (beyond-reference graph-centrality op)."""
    from mobsos_event_log_generator_spark.operators.graph import bfs_all_pairs_counts

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair_counts = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    edges = (
        pair_counts.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("n").desc(), "dst")
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("src", "dst")
    )
    ap = bfs_all_pairs_counts(edges, rounds=_BC_ROUNDS)
    a = ap.select(
        F.col("s").alias("as_"), F.col("v").alias("av"),
        F.col("d").alias("ad"), F.col("sig").alias("asig"),
    )
    b = ap.select(
        F.col("s").alias("bs"), F.col("v").alias("bv"),
        F.col("d").alias("bd"), F.col("sig").alias("bsig"),
    )
    cc = ap.select(
        F.col("s").alias("cs"), F.col("v").alias("cv"),
        F.col("d").alias("cd"), F.col("sig").alias("csig"),
    )
    n_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    terms = (
        a.join(b, a["av"] == b["bs"])
        .join(cc, (F.col("cs") == F.col("as_")) & (F.col("cv") == F.col("bv")))
        .filter(
            (F.col("ad") + F.col("bd") == F.col("cd"))
            & (F.col("as_") != F.col("av"))
            & (F.col("bv") != F.col("av"))
            & (F.col("as_") != F.col("bv"))
        )
        .select(
            F.col("av").alias("nation"),
            F.expr(
                "CAST(CAST(asig AS DECIMAL(38,0)) * bsig * 1000000 div csig AS BIGINT)"
            ).alias("t"),
        )
    )
    return (
        terms.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("t").cast("long").alias("betweenness_micro"),
        )
        .crossJoin(n_nodes)
        .select(
            F.col("nation").cast("long").alias("nation"),
            "n_pairs",
            "betweenness_micro",
            F.expr(
                "CAST(betweenness_micro div (n - 1) div (n - 2) AS BIGINT)"
            ).alias("normalized_micro"),
        )
    )


_SQL_NATION_ECCENTRICITY = (
    f"""
WITH latency AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
bedges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk
    FROM latency
  ) WHERE rk <= 3
),
nodes AS (SELECT src AS node FROM bedges UNION SELECT dst FROM bedges),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
ap0 AS MATERIALIZED (
  SELECT node AS s, node AS v, CAST(0 AS BIGINT) AS d, CAST(1 AS BIGINT) AS sig
  FROM nodes
),"""
    + ",".join(_bc_round_cte(k) for k in range(1, _BC_ROUNDS + 1))
    + f"""
,
ecc AS (
  SELECT s AS nation,
         CAST(max(d) AS BIGINT) AS eccentricity,
         CAST(count(*) - 1 AS BIGINT) AS n_reached
  FROM ap{_BC_ROUNDS} GROUP BY 1
),
gstats AS (
  SELECT CAST(max(eccentricity) AS BIGINT) AS diameter,
         CAST(min(eccentricity) AS BIGINT) AS radius
  FROM ecc WHERE n_reached + 1 = (SELECT n FROM cnt)
)
SELECT e.nation, e.eccentricity, e.n_reached,
       g.diameter, g.radius,
       CASE WHEN e.n_reached + 1 < (SELECT n FROM cnt) THEN 'partial'
            WHEN e.eccentricity = g.diameter THEN 'periphery'
            WHEN e.eccentricity = g.radius THEN 'center'
            ELSE 'interior' END AS role
FROM ecc e CROSS JOIN gstats g
"""
)


@register("nations_graph_eccentricity", _SQL_NATION_ECCENTRICITY)
def nations_graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eccentricity / diameter / radius report over the nation trade
    backbone (same top-3-partner edges and <=4-hop BFS closure as
    nations_betweenness_centrality, so the two reports audit one graph):
    a node's eccentricity is its farthest hop distance, the diameter and
    radius are the max/min eccentricity among nodes that reach the WHOLE
    graph within the hop bound, and each nation is labeled center /
    periphery / interior / partial (didn't reach everyone — excluded
    from the global stats so the hop bound can't masquerade as a small
    diameter). Reuses bfs_all_pairs_counts — distances are exact
    integers, no new shuffle shapes. Reference analog: none
    (beyond-reference graph-topology op)."""
    from mobsos_event_log_generator_spark.operators.graph import bfs_all_pairs_counts

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair_counts = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    edges = (
        pair_counts.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("n").desc(), "dst")
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("src", "dst")
    )
    ap = bfs_all_pairs_counts(edges, rounds=_BC_ROUNDS)
    n_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ecc = (
        ap.groupBy(F.col("s").alias("nation"))
        .agg(
            F.max("d").cast("long").alias("eccentricity"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        )
        .crossJoin(n_nodes)
    )
    glob = ecc.filter(F.expr("n_reached + 1 = n")).agg(
        F.max("eccentricity").cast("long").alias("diameter"),
        F.min("eccentricity").cast("long").alias("radius"),
    )
    return ecc.crossJoin(glob).select(
        "nation",
        "eccentricity",
        "n_reached",
        "diameter",
        "radius",
        F.expr(
            "CASE WHEN n_reached + 1 < n THEN 'partial' "
            "WHEN eccentricity = diameter THEN 'periphery' "
            "WHEN eccentricity = radius THEN 'center' "
            "ELSE 'interior' END"
        ).alias("role"),
    )


@register(
    "parts_abc_xyz_matrix",
    """
WITH rev AS (
  SELECT l_partkey AS partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT partkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
         sum(revenue) OVER () AS total_rev
  FROM rev
),
classed AS (
  SELECT partkey, revenue,
         CASE WHEN cum_rev * 10 <= total_rev * 7 THEN 'A'
              WHEN cum_rev * 10 <= total_rev * 9 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
),
mon AS (
  SELECT l_partkey AS partkey, date_trunc('month', l_shipdate) AS m,
         CAST(sum(l_quantity) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
nm AS (
  SELECT CAST(count(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT) AS n_months
  FROM lineitem
),
cv AS (
  SELECT partkey,
         CAST((CAST((SELECT n_months FROM nm) AS HUGEINT) * sum(CAST(q AS HUGEINT) * q)
               - CAST(sum(q) AS HUGEINT) * sum(q)) * 1000000
              // (CAST(sum(q) AS HUGEINT) * sum(q)) AS BIGINT) AS cv2_ppm
  FROM mon GROUP BY 1
),
xyz AS (
  SELECT partkey, cv2_ppm,
         CASE WHEN cv2_ppm < 250000 THEN 'X'
              WHEN cv2_ppm < 1000000 THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM cv
)
SELECT c.abc_class, x.xyz_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(c.revenue) AS DOUBLE), 2) AS class_revenue,
       CAST(sum(x.cv2_ppm) // count(*) AS BIGINT) AS mean_cv2_ppm
FROM classed c JOIN xyz x USING (partkey)
GROUP BY 1, 2
""",
)
def parts_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix — the supply-chain planning grid crossing
    Pareto revenue class (A <= 70 % cumulative share, B <= 90 %, C rest;
    decimal-exact cuts, same machinery as part_abc_analysis) with demand
    VARIABILITY class from the squared coefficient of variation of the
    monthly demand series: cv^2 = (n*sum(q^2) - S^2)/S^2 over the global
    month alphabet (absent part-months contribute zero to both sums, so
    no grid expansion is needed), quantized to truncating-div ppm with
    HUGEINT/decimal(38,0) operand casts (S^2 * 1e6 passes int64 near
    S ~ 3e6). X/Y/Z cut at CV 0.5 / 1.0 (250000 / 1000000 ppm). The
    Pareto prefix sum rides value_ordered_running_sum (two-phase — no
    single-partition window); the demand stats are two hash aggregates.
    Output: 9-cell matrix with part counts, exact class revenue, and
    mean cv^2. Reference analog: none (beyond-reference supply-chain
    op)."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        ).alias("revenue")
    )
    ranked = value_ordered_running_sum(
        rev, "revenue", ["partkey"], F.col("revenue"), out_col="cum_rev", descending=True
    )
    total = rev.agg(F.sum("revenue").alias("total_rev"))
    classed = ranked.crossJoin(F.broadcast(total)).withColumn(
        "abc_class",
        F.when(F.col("cum_rev") * 10 <= F.col("total_rev") * 7, "A")
        .when(F.col("cum_rev") * 10 <= F.col("total_rev") * 9, "B")
        .otherwise("C"),
    )
    mon = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(F.sum("l_quantity").cast("long").alias("q"))
    nm = li.agg(
        F.countDistinct(F.date_trunc("month", "l_shipdate"))
        .cast("long")
        .alias("n_months")
    )
    cv = (
        mon.groupBy("partkey")
        .agg(
            F.sum("q").cast("long").alias("s"),
            # per-part monthly demand grows with the corpus (TPC-H adds
            # orders per part, not just parts), so q² overflowed int64 at
            # ~3e9 units/part-month — decimal(38,0)/HUGEINT (r8 audit
            # second pass)
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q"))
            .cast("decimal(38,0)")
            .alias("q2"),
        )
        .crossJoin(nm)
        .selectExpr(
            "partkey",
            "CAST((CAST(n_months AS DECIMAL(38,0)) * q2 - CAST(s AS DECIMAL(38,0)) * s)"
            " * 1000000 div (CAST(s AS DECIMAL(38,0)) * s) AS BIGINT) AS cv2_ppm",
        )
    )
    xyz = cv.selectExpr(
        "partkey",
        "cv2_ppm",
        "CASE WHEN cv2_ppm < 250000 THEN 'X' WHEN cv2_ppm < 1000000 THEN 'Y' "
        "ELSE 'Z' END AS xyz_class",
    )
    return (
        classed.join(xyz, "partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("revenue").cast("double"), 2).alias("class_revenue"),
            F.expr("CAST(sum(cv2_ppm) div count(*) AS BIGINT)").alias("mean_cv2_ppm"),
        )
    )


@register(
    "lineitem_late_rate_wilson",
    """
WITH d AS (
  SELECT o.o_orderpriority AS priority,
         CASE WHEN (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 > 90
              THEN 1 ELSE 0 END AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
agg AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n, CAST(sum(late) AS BIGINT) AS k
  FROM d GROUP BY 1
)
SELECT priority, n, k,
       round(CAST(k AS DOUBLE) / n, 6) AS late_rate,
       round(((CAST(k AS DOUBLE) / n) + (CAST(196 AS DOUBLE) / 100) * (CAST(196 AS DOUBLE) / 100) / (2 * n)
              - (CAST(196 AS DOUBLE) / 100)
                * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                       + (CAST(196 AS DOUBLE) / 100) * (CAST(196 AS DOUBLE) / 100) / (4 * CAST(n AS DOUBLE) * n)))
             / (1 + (CAST(196 AS DOUBLE) / 100) * (CAST(196 AS DOUBLE) / 100) / n), 6) AS wilson_lo,
       round(((CAST(k AS DOUBLE) / n) + (CAST(196 AS DOUBLE) / 100) * (CAST(196 AS DOUBLE) / 100) / (2 * n)
              + (CAST(196 AS DOUBLE) / 100)
                * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                       + (CAST(196 AS DOUBLE) / 100) * (CAST(196 AS DOUBLE) / 100) / (4 * CAST(n AS DOUBLE) * n)))
             / (1 + (CAST(196 AS DOUBLE) / 100) * (CAST(196 AS DOUBLE) / 100) / n), 6) AS wilson_hi
FROM agg
""",
)
def lineitem_late_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95 % confidence interval for the late-shipment rate
    (> 90 days order-to-ship) per order priority — the binomial-proportion
    interval that behaves at extreme rates where the normal approximation
    fails. Cross-engine exactness leans on two IEEE guarantees: sqrt is
    CORRECTLY ROUNDED by the standard (bit-identical everywhere, unlike
    ln whose quantization rides the floor-1e6 rule), and every other term
    is +-*/ on identical doubles; z = 1.96 is spelled CAST(196 AS
    DOUBLE)/100 in BOTH engines because a bare 1.96 literal parses as
    DECIMAL with engine-specific division scales (the er_fellegi_sunter
    lesson). Outputs round to 6 dp. One FK join + one 5-group aggregate;
    the interval math is per-group scalar arithmetic. Reference analog:
    none (beyond-reference statistical-QC op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.expr(
                "CASE WHEN (unix_micros(l_shipdate) - unix_micros(o_orderdate)) div 86400000000 > 90 "
                "THEN 1 ELSE 0 END"
            ).alias("late"),
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("late").cast("long").alias("k"),
        )
    )
    z2 = "(CAST(196 AS DOUBLE) / 100) * (CAST(196 AS DOUBLE) / 100)"
    ph = "(CAST(k AS DOUBLE) / n)"
    half = (
        f"(CAST(196 AS DOUBLE) / 100) * sqrt({ph} * (1 - {ph}) / n "
        f"+ {z2} / (4 * CAST(n AS DOUBLE) * n))"
    )
    return agg.selectExpr(
        "priority",
        "n",
        "k",
        f"round({ph}, 6) AS late_rate",
        f"round(({ph} + {z2} / (2 * n) - {half}) / (1 + {z2} / n), 6) AS wilson_lo",
        f"round(({ph} + {z2} / (2 * n) + {half}) / (1 + {z2} / n), 6) AS wilson_hi",
    )


@register(
    "events_burstiness",
    """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
nd AS (SELECT CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n FROM events),
s AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS tot,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q2,
         CAST(count(*) AS BIGINT) AS n_active_days
  FROM daily GROUP BY 1
)
SELECT event_type, tot, n_active_days,
       round(CAST(tot AS DOUBLE) / nd.n, 6) AS mean_per_day,
       round((CAST(nd.n * q2 - CAST(tot AS HUGEINT) * tot AS DOUBLE) / (CAST(nd.n AS DOUBLE) * nd.n))
             / (CAST(tot AS DOUBLE) / nd.n), 6) AS fano,
       round((sqrt(CAST(nd.n * q2 - CAST(tot AS HUGEINT) * tot AS DOUBLE) / (CAST(nd.n AS DOUBLE) * nd.n))
              - CAST(tot AS DOUBLE) / nd.n)
             / (sqrt(CAST(nd.n * q2 - CAST(tot AS HUGEINT) * tot AS DOUBLE) / (CAST(nd.n AS DOUBLE) * nd.n))
                + CAST(tot AS DOUBLE) / nd.n), 6) AS burstiness
FROM s, nd
""",
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness / Fano-factor profile of the daily event-count series per
    type — the overdispersion lens next to ACF/Theil-Sen/chi-square in the
    drift family: Fano = var/mean flags non-Poisson clumping (Poisson = 1),
    Goh-Barabasi burstiness B = (sigma-mean)/(sigma+mean) normalizes it to
    [-1, 1). Days absent for a type count as zero via the global day
    alphabet n (they add nothing to sum or sum-of-squares, so no grid
    expansion), variance uses the exact integer form (n*Q - S^2)/n^2
    converted to double only at the final division — Q, n·Q and S² are
    n²-order in the daily-count grain and ride decimal(38,0)/HUGEINT
    (r8 audit second pass; int64 died at ~3e9 events/day), sigma is IEEE-exact
    sqrt, outputs round to 6 dp. One hash aggregate over (type, day),
    one 1-row day count. Reference analog: none (beyond-reference
    temporal-statistics op)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    nd = ev.agg(
        F.countDistinct(F.date_trunc("day", "ts")).cast("long").alias("n")
    )
    # n²-order accumulators (r8 audit second pass): daily counts are
    # corpus-scaled, so Σc², n·Q and tot² overflowed int64 at ~3e9
    # events/day — ride decimal(38,0)/HUGEINT before the double division.
    s = daily.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("tot"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("q2"),
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
    )
    var = (
        "(CAST(n * q2 - CAST(tot AS DECIMAL(38,0)) * tot AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * n))"
    )
    mean = "(CAST(tot AS DOUBLE) / n)"
    return s.crossJoin(nd).selectExpr(
        "event_type",
        "tot",
        "n_active_days",
        f"round({mean}, 6) AS mean_per_day",
        f"round({var} / {mean}, 6) AS fano",
        f"round((sqrt({var}) - {mean}) / (sqrt({var}) + {mean}), 6) AS burstiness",
    )


@register(
    "events_wasserstein_drift",
    """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, CAST(floor(value) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
b AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
h AS (
  SELECT event_type, v,
         CAST(sum(CASE WHEN us <= mid THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN us > mid THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM e, b GROUP BY 1, 2
),
t AS (
  SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
  FROM h GROUP BY 1
),
cum AS (
  SELECT event_type, v,
         CAST(sum(c1) OVER w AS BIGINT) AS cc1,
         CAST(sum(c2) OVER w AS BIGINT) AS cc2,
         lead(v) OVER w AS vnext
  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY v)
),
terms AS (
  SELECT c.event_type,
         abs(CAST(c.cc1 AS HUGEINT) * t.n2 - CAST(c.cc2 AS HUGEINT) * t.n1)
           * (c.vnext - c.v) AS m
  FROM cum c JOIN t USING (event_type)
  WHERE c.vnext IS NOT NULL
),
agg AS (SELECT event_type, CAST(sum(m) AS HUGEINT) AS num FROM terms GROUP BY 1)
SELECT t.event_type, t.n1, t.n2,
       CAST(COALESCE(a.num, 0) AS BIGINT) AS w1_num,
       CAST(COALESCE(a.num, 0) * 1000000 // NULLIF(CAST(t.n1 AS HUGEINT) * t.n2, 0)
            AS BIGINT) AS w1_micro
FROM t LEFT JOIN agg a USING (event_type)
""",
)
def events_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) drift per event type between the two
    halves of the time range (the PSI/KS/MWU midpoint-split convention) —
    the optimal-transport member of the drift family: unlike KS's max CDF
    gap it weighs HOW FAR mass moved, unlike PSI it needs no bin-count
    tuning beyond the integer value bands. W1 = sum over the banded
    support of |F1 - F2| * gap, computed exactly as
    |cc1*N2 - cc2*N1| * (v_next - v) summed in integers and quantized
    once to truncating-div micro. The cc·N per-term products are
    n²-order and ride decimal(38,0)/HUGEINT (r8 audit second pass —
    int64 died at ~3e9 rows per side per type); the RAW w1_num
    diagnostic output stays BIGINT and is itself n²-order (overflows
    its column near ~1e9 rows/side — at that scale read the bounded
    w1_micro ratio, which is what the drift monitor consumes). CDFs ride
    windows PARTITIONED by type over the banded support (bounded by the
    value range, ~300 bands here — for unbounded supports use the
    two-phase sweep). Types alive on only one side surface NULL via
    NULLIF rather than a crash. Reference analog: none
    (beyond-reference optimal-transport drift op)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.floor("value").cast("long").alias("v"),
    )
    b = e.agg(F.expr("(min(us) + max(us)) div 2").alias("mid"))
    h = (
        e.crossJoin(b)
        .groupBy("event_type", "v")
        .agg(
            F.sum(F.when(F.col("us") <= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("us") > F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
    )
    t = h.groupBy("event_type").agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    w = Window.partitionBy("event_type").orderBy("v")
    cum = h.select(
        "event_type",
        "v",
        F.sum("c1").over(w).cast("long").alias("cc1"),
        F.sum("c2").over(w).cast("long").alias("cc2"),
        F.lead("v").over(w).alias("vnext"),
    )
    terms = (
        cum.join(t, "event_type")
        .filter(F.col("vnext").isNotNull())
        .select(
            "event_type",
            # n²-order per-term products (r8 audit second pass): cc·N
            # overflowed int64 at ~3e9 rows per side per type — ride
            # decimal(38,0)/HUGEINT
            (
                F.abs(
                    F.col("cc1").cast("decimal(38,0)") * F.col("n2")
                    - F.col("cc2").cast("decimal(38,0)") * F.col("n1")
                )
                * (F.col("vnext") - F.col("v"))
            ).alias("m"),
        )
    )
    agg = terms.groupBy("event_type").agg(
        F.sum("m").cast("decimal(38,0)").alias("num")
    )
    return (
        t.join(agg, "event_type", "left")
        .selectExpr(
            "event_type",
            "n1",
            "n2",
            "CAST(COALESCE(num, 0) AS BIGINT) AS w1_num",
            "CAST(COALESCE(num, 0) * 1000000 div NULLIF(CAST(n1 AS DECIMAL(38,0)) * n2, 0) AS BIGINT) AS w1_micro",
        )
    )


_DS_ROUNDS = 6


def _ds_round_ctes(k: int) -> str:
    prev = f"g{k - 1}"
    return f"""
d{k} AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM {prev} GROUP BY 1),
t{k} AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS m2, CAST(count(DISTINCT src) AS BIGINT) AS n
  FROM {prev}
),
g{k} AS MATERIALIZED (
  SELECT e.src, e.dst
  FROM {prev} e
  JOIN d{k} ds ON ds.node = e.src
  JOIN d{k} dd ON dd.node = e.dst, t{k}
  WHERE ds.deg * t{k}.n > t{k}.m2 AND dd.deg * t{k}.n > t{k}.m2
)"""


_SQL_DENSEST = (
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS MATERIALIZED (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2
  FROM b a JOIN b c USING (l_orderkey)
  WHERE a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
g0 AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst FROM pairs
  UNION ALL SELECT p2, p1 FROM pairs
),"""
    + ",".join(_ds_round_ctes(k) for k in range(1, _DS_ROUNDS + 1))
    + """,
stats AS (
"""
    + "\n  UNION ALL\n".join(
        f"""  SELECT CAST({k} AS BIGINT) AS round,
         CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
         CAST(count(*) // 2 AS BIGINT) AS m_edges,
         CAST((count(*) // 2) * 1000000 // NULLIF(count(DISTINCT src), 0) AS BIGINT)
           AS density_ppm
  FROM g{k}"""
        for k in range(0, _DS_ROUNDS + 1)
    )
    + """
),
bd AS (SELECT max(density_ppm) AS best_d FROM stats),
br AS (SELECT min(round) AS best_r FROM stats, bd WHERE density_ppm = bd.best_d)
SELECT s.round, s.n_nodes, s.m_edges, s.density_ppm,
       CAST(CASE WHEN s.density_ppm = bd.best_d AND s.round = br.best_r
                 THEN 1 ELSE 0 END AS BIGINT) AS is_best
FROM stats s, bd, br
"""
)


@register("parts_densest_subgraph", _SQL_DENSEST)
def parts_densest_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest-subgraph extraction by parallel peeling (Charikar's greedy,
    the batch variant that drops every node whose degree is at or below
    the current average in one round — the classic 2-approximation
    shape) over the part co-purchase graph: 6 fixed rounds, per-round
    report of surviving nodes/edges and density m/n in truncating-div
    ppm, with the best (max-density, earliest-tie) round flagged — the
    community-core miner next to k-core/k-truss (which cut by LOCAL
    degree; density peeling optimizes the GLOBAL ratio). All decisions
    are integer: peel keeps deg*n > 2m (no rational division), density
    quantizes once per round. Per round: one degree aggregate + one
    1-row (m, n) aggregate + two semi-join-shaped filters — the
    fixed-point family shuffle shape, lineage truncated per round; the
    oracle unrolls the identical rounds as MATERIALIZED CTEs (the BF
    multi-reference lesson). The best-round flags ride 1-row cross
    joins, never a global window. Reference analog: none
    (beyond-reference graph-mining op)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    c = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(c, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("p1", "p2")
    )
    # Canonical u<v edges, NOT the symmetric double: the old union evaluated
    # the whole lineitem-self-join subtree TWICE inside the base checkpoint
    # job, and every round then shuffled 2m rows where m suffice. Degrees
    # and node counts come off one explode of both endpoints instead.
    g = pairs.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).localCheckpoint(
        eager=False  # materialized by round 0's stats job (see below)
    )
    # Round fusion (r11): the former shape computed the SAME 1-row (m2, n)
    # aggregate TWICE per round (once for the stats union, once crossJoined
    # under the peel filter) and assembled best-round flags through two more
    # crossJoins — ~3 extra jobs per round on the checkpointed edge list.
    # The per-round stats are a bounded 1-row aggregate (the same class of
    # driver-side round control every fixed-point operator here uses), so
    # collect it once per round and inline (m2, n) as literals in the peel
    # predicate; the 7-row report plus the exact-integer best-round flags
    # are then pure Python over those collected ints — identical values,
    # `div` and `//` agree on the non-negative counts involved.
    rows: list[tuple[int, int, int, int | None]] = []
    for k in range(0, _DS_ROUNDS + 1):
        # ONE pass over g per round: the degree aggregate subsumes the old
        # separate (count, countDistinct) stats job — m2 = Σdeg and
        # n = |deg| come off the node-sized degree table for free, and the
        # peel filter reuses the same checkpointed degrees instead of
        # re-aggregating the edge list.
        deg = (
            g.select(F.explode(F.array(F.col("src"), F.col("dst"))).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        if k < _DS_ROUNDS:
            # LAZY checkpoint (r12, verdict #5): the 1-row stats action
            # below materializes deg AND the lazily-checkpointed g of this
            # round in the same job — one job per round instead of three
            # (deg checkpoint, stats, g checkpoint). The full aggregate
            # scans every partition, so both checkpoints complete here.
            deg = deg.localCheckpoint(eager=False)
        m2, n = deg.agg(
            F.sum("deg").cast("long").alias("m2"),
            F.count(F.lit(1)).cast("long").alias("n"),
        ).first()
        m2, n = (int(m2) if m2 is not None else 0), int(n)
        rows.append((k, n, m2 // 2, (m2 // 2) * 1_000_000 // n if n else None))
        if k == _DS_ROUNDS:
            break
        keep = deg.filter(F.col("deg") * F.lit(n) > F.lit(m2)).select("node")
        g = (
            g.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    densities = [r[3] for r in rows if r[3] is not None]
    best_d = max(densities) if densities else None
    best_r = (
        min(r[0] for r in rows if r[3] == best_d) if best_d is not None else None
    )
    data = [
        (
            r[0],
            r[1],
            r[2],
            r[3],
            1 if best_d is not None and r[3] == best_d and r[0] == best_r else 0,
        )
        for r in rows
    ]
    from mobsos_event_log_generator_spark.driver_rows import driver_rows_df

    return driver_rows_df(
        spark, data, "round long, n_nodes long, m_edges long, density_ppm long, is_best long"
    )


@register(
    "lineitem_revenue_recognition",
    """
WITH li AS (
  SELECT o.o_orderdate AS d0, l.l_shipdate AS d1,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
           AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
),
spans AS (
  SELECT d0, d1, cents,
         date_diff('day', d0, d1) + 1 AS total_days,
         unnest(generate_series(date_trunc('month', d0), date_trunc('month', d1),
                                INTERVAL 1 MONTH)) AS m
  FROM li
),
alloc AS (
  SELECT strftime(m, '%Y-%m') AS month, cents,
         date_diff('day', d0, least(d1, m + INTERVAL 1 MONTH - INTERVAL 1 DAY)) + 1
           AS cum_days,
         date_diff('day', d0,
                   least(d1, m + INTERVAL 1 MONTH - INTERVAL 1 DAY)) + 1
           - (date_diff('day', greatest(d0, m),
                        least(d1, m + INTERVAL 1 MONTH - INTERVAL 1 DAY)) + 1)
           AS prev_days,
         total_days
  FROM spans
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_line_months,
       CAST(sum(cents * cum_days // total_days
                - cents * prev_days // total_days) AS BIGINT) AS recognized_cents
FROM alloc
GROUP BY 1
""",
)
def lineitem_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-recognition schedule (the deferred-revenue finance op):
    each line's discounted revenue is recognized day-weighted across the
    months its order-to-ship span touches, with EXACT CONSERVATION by the
    telescoping form — month m books floor(cents*cumdays_m/T) -
    floor(cents*cumdays_{m-1}/T), so a line's allocations sum to exactly
    its cents (the floors cancel pairwise; no remainder bookkeeping, no
    per-line window). The month fan-out is a per-row calendar explode
    (sequence/generate_series over the span's months — bounded by span
    length, ~tens of rows), every quantity is integer (day diffs,
    truncating div; cents*days passes int64 by ~6 orders of magnitude),
    and the only shuffle is the final per-month aggregate. Lines shipped
    before their order date (fixture noise) are excluded in both
    engines. Reference analog: none (beyond-reference financial op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderdate").alias("d0"),
            F.col("l_shipdate").alias("d1"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
            )
            .cast("long")
            .alias("cents"),
        )
    )
    spans = base.select(
        "d0",
        "d1",
        "cents",
        (F.datediff("d1", "d0") + 1).alias("total_days"),
        F.explode(
            F.sequence(
                F.date_trunc("month", "d0"),
                F.date_trunc("month", "d1"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("m"),
    )
    alloc = spans.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "cents",
        "total_days",
        (
            F.datediff(
                F.least(F.col("d1"), F.expr("m + INTERVAL 1 MONTH - INTERVAL 1 DAY")),
                F.col("d0"),
            )
            + 1
        ).alias("cum_days"),
        (
            F.datediff(
                F.least(F.col("d1"), F.expr("m + INTERVAL 1 MONTH - INTERVAL 1 DAY")),
                F.col("d0"),
            )
            + 1
            - (
                F.datediff(
                    F.least(
                        F.col("d1"), F.expr("m + INTERVAL 1 MONTH - INTERVAL 1 DAY")
                    ),
                    F.greatest(F.col("d0"), F.col("m")),
                )
                + 1
            )
        ).alias("prev_days"),
    )
    return alloc.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_line_months"),
        F.sum(
            F.expr("cents * cum_days div total_days - cents * prev_days div total_days")
        )
        .cast("long")
        .alias("recognized_cents"),
    )


@register(
    "events_seasonal_decompose",
    """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
cal AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
dowdays AS (
  SELECT dayofweek(d) AS dow, CAST(count(*) AS BIGINT) AS nd FROM cal GROUP BY 1
),
agg AS (
  SELECT event_type, dayofweek(d) AS dow,
         CAST(sum(c) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS npresent
  FROM daily GROUP BY 1, 2
),
sea AS (
  SELECT a.event_type, a.dow, a.npresent, dd.nd,
         a.tot * 1000000 // dd.nd AS seasonal_micro
  FROM agg a JOIN dowdays dd USING (dow)
),
pres AS (
  SELECT d.event_type, dayofweek(d.d) AS dow,
         CAST(sum(abs(d.c * 1000000 - s.seasonal_micro)) AS BIGINT) AS pres_abs
  FROM daily d
  JOIN sea s ON s.event_type = d.event_type AND s.dow = dayofweek(d.d)
  GROUP BY 1, 2
)
SELECT s.event_type, CAST(s.dow AS BIGINT) AS dow, s.nd AS n_days,
       CAST(s.seasonal_micro AS BIGINT) AS seasonal_micro,
       CAST((COALESCE(p.pres_abs, 0) + (s.nd - s.npresent) * s.seasonal_micro)
            // s.nd AS BIGINT) AS mean_abs_residual_micro
FROM sea s LEFT JOIN pres p ON p.event_type = s.event_type AND p.dow = s.dow
""",
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal decomposition of the per-type daily series: the
    seasonal component is the truncating-div mean count per (type,
    day-of-week) over the GLOBAL calendar for that weekday (days the
    type is silent count as zero — handled arithmetically: absent days
    contribute |0 - seasonal| = seasonal to the residual sum, so no
    calendar grid expansion materializes), and the report carries the
    mean absolute residual per cell — the seasonality-strength /
    anomaly-baseline lens next to ACF and the seasonal-naive MASE.
    All integer micro; day-of-week uses DuckDB's 0=Sunday convention
    (Spark's dayofweek is 1-based — shifted on the Spark side, the
    settled offset note). Shapes: two hash aggregates and a bounded
    (type x 7) join — nothing row-scaled past the daily rollup.
    Reference analog: none (beyond-reference time-series op)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cal = ev.select(F.date_trunc("day", "ts").alias("d")).distinct()
    dowdays = cal.groupBy((F.dayofweek("d") - 1).alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    agg = daily.groupBy("event_type", (F.dayofweek("d") - 1).alias("dow")).agg(
        F.sum("c").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("npresent"),
    )
    sea = agg.join(dowdays, "dow").select(
        "event_type",
        "dow",
        "npresent",
        "nd",
        F.expr("tot * 1000000 div nd").alias("seasonal_micro"),
    )
    pres = (
        daily.withColumn("dow", F.dayofweek("d") - 1)
        .join(sea.select("event_type", "dow", "seasonal_micro"), ["event_type", "dow"])
        .groupBy("event_type", "dow")
        .agg(
            F.sum(F.abs(F.col("c") * 1000000 - F.col("seasonal_micro")))
            .cast("long")
            .alias("pres_abs")
        )
    )
    return sea.join(pres, ["event_type", "dow"], "left").selectExpr(
        "event_type",
        "CAST(dow AS BIGINT) AS dow",
        "nd AS n_days",
        "CAST(seasonal_micro AS BIGINT) AS seasonal_micro",
        "CAST((COALESCE(pres_abs, 0) + (nd - npresent) * seasonal_micro) div nd"
        " AS BIGINT) AS mean_abs_residual_micro",
    )


@register(
    "nations_dyad_census",
    """
WITH od AS MATERIALIZED (
  -- dst comes off the fact side BEFORE customer enters scope: when the
  -- <> predicate can see raw customer x supplier, DuckDB's optimizer
  -- builds a 15k x 1k NESTED_LOOP (14.4M rows, re-run per CTE reference
  -- without MATERIALIZED -> 380-1790 s at sf0.1); this shape yields
  -- identical (src, dst, n) in seconds.
  SELECT l.l_orderkey AS ok, s.s_nationkey AS dst, count(*) AS cnt
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
latency AS MATERIALIZED (
  SELECT c.c_nationkey AS src, od.dst, CAST(sum(od.cnt) AS BIGINT) AS n
  FROM od
  JOIN orders o ON o.o_orderkey = od.ok
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_nationkey <> od.dst
  GROUP BY 1, 2
),
bedges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk
    FROM latency
  ) WHERE rk <= 3
),
nodes AS (SELECT src AS node FROM bedges UNION SELECT dst FROM bedges),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
dyads AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, CAST(count(*) AS BIGINT) AS c
  FROM bedges GROUP BY 1, 2
),
census AS (
  SELECT CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS mutual_pairs,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS asym_pairs,
         CAST(sum(c) AS BIGINT) AS n_edges
  FROM dyads
)
SELECT cnt.n AS n_nodes, census.n_edges, census.mutual_pairs, census.asym_pairs,
       CAST(cnt.n * (cnt.n - 1) / 2 - census.mutual_pairs - census.asym_pairs
            AS BIGINT) AS null_pairs,
       CAST(2 * census.mutual_pairs * 1000000
            // NULLIF(2 * census.mutual_pairs + census.asym_pairs, 0) AS BIGINT)
         AS reciprocity_ppm
FROM cnt, census
""",
)
def nations_dyad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyad census + reciprocity of the directed trade backbone (same
    top-3-partner edges as the betweenness/eccentricity reports, so the
    three audits describe one graph): mutual / asymmetric / null dyad
    counts and Garlaschelli-style reciprocity 2M/(2M+A) in truncating
    ppm — the directed-structure lens the undirected centrality family
    can't see. One grouped count over <= n^2 bounded dyads after the
    same FK-join edge extraction. Reference analog: none
    (beyond-reference social-network-analysis op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair_counts = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    edges = (
        pair_counts.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("n").desc(), "dst")
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("src", "dst")
    )
    cnt = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    dyads = edges.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    census = dyads.agg(
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("mutual_pairs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("asym_pairs"),
        F.sum("c").cast("long").alias("n_edges"),
    )
    return cnt.crossJoin(census).selectExpr(
        "n AS n_nodes",
        "n_edges",
        "mutual_pairs",
        "asym_pairs",
        "CAST(n * (n - 1) / 2 - mutual_pairs - asym_pairs AS BIGINT) AS null_pairs",
        "CAST(2 * mutual_pairs * 1000000"
        " div NULLIF(2 * mutual_pairs + asym_pairs, 0) AS BIGINT) AS reciprocity_ppm",
    )


def _logit_iter_sql(k: int) -> str:
    """One quantized IRLS/Newton step: per-row sigmoid quantized to ppm,
    integer sufficient statistics normalized by n, 3x3 Cramer solve."""
    prev = f"lpar{k - 1}"
    return f"""
lsc{k} AS (
  SELECT y, f1, f2,
         CAST(floor(CAST(1000000 AS DOUBLE)
                    / (1 + exp(-(CAST(p.b0 + (p.b1 * f1 + p.b2 * f2) // 1000000
                                      AS DOUBLE) / 1000000)))) AS BIGINT) AS mu
  FROM lrows, {prev} p
),
lsum{k} AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(mu * (1000000 - mu) // 1000000) AS BIGINT) AS s00,
         CAST(sum((mu * (1000000 - mu) // 1000000) * f1 // 1000000) AS BIGINT) AS s01,
         CAST(sum((mu * (1000000 - mu) // 1000000) * f2 // 1000000) AS BIGINT) AS s02,
         CAST(sum(((mu * (1000000 - mu) // 1000000) * f1 // 1000000) * f1 // 1000000) AS BIGINT) AS s11,
         CAST(sum(((mu * (1000000 - mu) // 1000000) * f1 // 1000000) * f2 // 1000000) AS BIGINT) AS s12,
         CAST(sum(((mu * (1000000 - mu) // 1000000) * f2 // 1000000) * f2 // 1000000) AS BIGINT) AS s22,
         CAST(sum(y * 1000000 - mu) AS BIGINT) AS g0,
         CAST(sum((y * 1000000 - mu) * f1 // 1000000) AS BIGINT) AS g1,
         CAST(sum((y * 1000000 - mu) * f2 // 1000000) AS BIGINT) AS g2
  FROM lsc{k}
),
lnorm{k} AS (
  SELECT CAST(s00 // n AS HUGEINT) AS a00, CAST(s01 // n AS HUGEINT) AS a01,
         CAST(s02 // n AS HUGEINT) AS a02, CAST(s11 // n AS HUGEINT) AS a11,
         CAST(s12 // n AS HUGEINT) AS a12, CAST(s22 // n AS HUGEINT) AS a22,
         CAST(g0 // n AS HUGEINT) AS g0, CAST(g1 // n AS HUGEINT) AS g1,
         CAST(g2 // n AS HUGEINT) AS g2
  FROM lsum{k}
),
lpar{k} AS (
  SELECT
    CAST(p.b0 + (g0 * (a11 * a22 - a12 * a12) - a01 * (g1 * a22 - a12 * g2)
                 + a02 * (g1 * a12 - a11 * g2)) * 1000000
               // NULLIF(a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02)
                         + a02 * (a01 * a12 - a11 * a02), 0) AS BIGINT) AS b0,
    CAST(p.b1 + (a00 * (g1 * a22 - g2 * a12) - g0 * (a01 * a22 - a12 * a02)
                 + a02 * (a01 * g2 - g1 * a02)) * 1000000
               // NULLIF(a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02)
                         + a02 * (a01 * a12 - a11 * a02), 0) AS BIGINT) AS b1,
    CAST(p.b2 + (a00 * (a11 * g2 - a12 * g1) - a01 * (a01 * g2 - g1 * a02)
                 + g0 * (a01 * a12 - a11 * a02)) * 1000000
               // NULLIF(a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02)
                         + a02 * (a01 * a12 - a11 * a02), 0) AS BIGINT) AS b2
  FROM lnorm{k}, {prev} p
)"""


_SQL_LOGISTIC_PREFIX = (
    """
WITH lrows AS (
  SELECT CASE WHEN (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 > 90
              THEN 1 ELSE 0 END AS y,
         CAST(floor(l.l_discount * 1000000) AS BIGINT) AS f1,
         CAST(l.l_quantity * 20000 AS BIGINT) AS f2
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
lpar0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1, CAST(0 AS BIGINT) AS b2),"""
    + ",".join(_logit_iter_sql(k) for k in (1, 2))
)

_SQL_LOGISTIC = (
    _SQL_LOGISTIC_PREFIX
    + """,
cal AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(CAST(floor(CAST(1000000 AS DOUBLE)
                    / (1 + exp(-(CAST(p.b0 + (p.b1 * f1 + p.b2 * f2) // 1000000
                                      AS DOUBLE) / 1000000)))) AS BIGINT)) AS BIGINT) AS mu_sum
  FROM lrows, lpar2 p
)
SELECT p.b0 AS b0_micro, p.b1 AS b1_micro, p.b2 AS b2_micro,
       cal.n AS n_rows,
       CAST(cal.n_pos * 1000000 // cal.n AS BIGINT) AS actual_pos_ppm,
       CAST(cal.mu_sum // cal.n AS BIGINT) AS pred_pos_ppm
FROM lpar2 p, cal
"""
)


@register("lineitem_logistic_late", _SQL_LOGISTIC)
def lineitem_logistic_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of the late-shipment flag on (discount,
    quantity/50) TRAINED CROSS-ENGINE EXACTLY: two unrolled Newton/IRLS
    steps from beta = 0, where each step quantizes the per-row sigmoid
    to ppm (floor of an exp on identical doubles — the ln/exp floor
    rule), accumulates Hessian/gradient as INTEGER sufficient statistics
    (per-row products stay <= 2.5e5 via interleaved div-1e6 rescaling),
    normalizes by n (bounding the 3x3 Cramer determinants to ~1e17 at
    ANY corpus size — the overflow-proofing step), and solves in closed
    form over HUGEINT/decimal(38,0). Both engines replay the identical
    integer parameter trajectory — no float-GD convergence ambiguity.
    Output: trained micro-coefficients + a calibration row (predicted vs
    actual positive rate; IRLS matches them at convergence). Per step:
    one 1-row parameter cross join + one hash aggregate — nothing
    row-quadratic. Reference analog: none (beyond-reference ML-training
    op)."""
    lrows, par = _logistic_fit(spark, sf_dir)
    cal = lrows.crossJoin(par).selectExpr("y", f"{_LOGIT_MU_EXPR} AS mu").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("mu").cast("long").alias("mu_sum"),
    )
    return par.crossJoin(cal).selectExpr(
        "b0 AS b0_micro",
        "b1 AS b1_micro",
        "b2 AS b2_micro",
        "n AS n_rows",
        "CAST(n_pos * 1000000 div n AS BIGINT) AS actual_pos_ppm",
        "CAST(mu_sum div n AS BIGINT) AS pred_pos_ppm",
    )


_LOGIT_MU_EXPR = (
    "CAST(floor(CAST(1000000 AS DOUBLE)"
    " / (1 + exp(-(CAST(b0 + (b1 * f1 + b2 * f2) div 1000000"
    " AS DOUBLE) / 1000000)))) AS BIGINT)"
)


def _logistic_fit(spark: SparkSession, sf_dir: str):
    """Shared two-step quantized-IRLS trainer: returns (lrows, 1-row params).
    Kept in lockstep with the lrows/lpar CTE chain of _SQL_LOGISTIC_PREFIX."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lrows = li.join(o, li["l_orderkey"] == o["o_orderkey"]).selectExpr(
        "CASE WHEN (unix_micros(l_shipdate) - unix_micros(o_orderdate))"
        " div 86400000000 > 90 THEN 1 ELSE 0 END AS y",
        "CAST(floor(l_discount * 1000000) AS BIGINT) AS f1",
        "CAST(l_quantity * 20000 AS BIGINT) AS f2",
    )
    par = lrows.sparkSession.range(1).selectExpr(
        "CAST(0 AS BIGINT) AS b0", "CAST(0 AS BIGINT) AS b1", "CAST(0 AS BIGINT) AS b2"
    )
    mu_expr = _LOGIT_MU_EXPR
    w = "(mu * (1000000 - mu) div 1000000)"
    for _ in (1, 2):
        sc = lrows.crossJoin(par).selectExpr("y", "f1", "f2", f"{mu_expr} AS mu")
        sums = sc.selectExpr(
            "y",
            "f1",
            "f2",
            "mu",
            f"{w} AS w",
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("CAST(sum(w) AS BIGINT)").alias("s00"),
            F.expr("CAST(sum(w * f1 div 1000000) AS BIGINT)").alias("s01"),
            F.expr("CAST(sum(w * f2 div 1000000) AS BIGINT)").alias("s02"),
            F.expr("CAST(sum((w * f1 div 1000000) * f1 div 1000000) AS BIGINT)").alias("s11"),
            F.expr("CAST(sum((w * f1 div 1000000) * f2 div 1000000) AS BIGINT)").alias("s12"),
            F.expr("CAST(sum((w * f2 div 1000000) * f2 div 1000000) AS BIGINT)").alias("s22"),
            F.expr("CAST(sum(y * 1000000 - mu) AS BIGINT)").alias("g0"),
            F.expr("CAST(sum((y * 1000000 - mu) * f1 div 1000000) AS BIGINT)").alias("g1"),
            F.expr("CAST(sum((y * 1000000 - mu) * f2 div 1000000) AS BIGINT)").alias("g2"),
        )
        norm = sums.selectExpr(
            *[
                f"CAST({c} div n AS DECIMAL(38,0)) AS {a}"
                for c, a in (
                    ("s00", "a00"), ("s01", "a01"), ("s02", "a02"),
                    ("s11", "a11"), ("s12", "a12"), ("s22", "a22"),
                    ("g0", "g0"), ("g1", "g1"), ("g2", "g2"),
                )
            ]
        )
        det = (
            "(a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02)"
            " + a02 * (a01 * a12 - a11 * a02))"
        )
        par = norm.crossJoin(par).selectExpr(
            f"CAST(b0 + (g0 * (a11 * a22 - a12 * a12) - a01 * (g1 * a22 - a12 * g2)"
            f" + a02 * (g1 * a12 - a11 * g2)) * 1000000 div NULLIF({det}, 0) AS BIGINT) AS b0",
            f"CAST(b1 + (a00 * (g1 * a22 - g2 * a12) - g0 * (a01 * a22 - a12 * a02)"
            f" + a02 * (a01 * g2 - g1 * a02)) * 1000000 div NULLIF({det}, 0) AS BIGINT) AS b1",
            f"CAST(b2 + (a00 * (a11 * g2 - a12 * g1) - a01 * (a01 * g2 - g1 * a02)"
            f" + g0 * (a01 * a12 - a11 * a02)) * 1000000 div NULLIF({det}, 0) AS BIGINT) AS b2",
        )
    return lrows, par


@register(
    "orders_logrank_priority",
    """
WITH f AS (SELECT l_orderkey, min(l_shipdate) AS first_ship FROM lineitem GROUP BY 1),
cut AS (SELECT max(l_shipdate) AS mx FROM lineitem),
pts AS (
  SELECT CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g,
         CASE WHEN f.first_ship IS NOT NULL
              THEN date_diff('day', o.o_orderdate, f.first_ship)
              ELSE greatest(0, date_diff('day', o.o_orderdate, (SELECT mx FROM cut))) END
           AS duration_days,
         (f.first_ship IS NOT NULL) AS is_event
  FROM orders o LEFT JOIN f ON f.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
),
hist AS (
  SELECT duration_days, g,
         CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT) AS c
  FROM pts WHERE duration_days >= 0 GROUP BY 1, 2
),
grid AS (
  SELECT t.duration_days, gg.g, COALESCE(h.d, 0) AS d, COALESCE(h.c, 0) AS c
  FROM (SELECT DISTINCT duration_days FROM hist) t
  CROSS JOIN (SELECT unnest([0, 1]) AS g) gg
  LEFT JOIN hist h ON h.duration_days = t.duration_days AND h.g = gg.g
),
tot AS (SELECT g, CAST(sum(d + c) AS BIGINT) AS t FROM grid GROUP BY 1),
risk AS (
  SELECT gr.duration_days, gr.g, gr.d,
         tot.t - sum(gr.d + gr.c) OVER (PARTITION BY gr.g ORDER BY gr.duration_days
                                        ROWS UNBOUNDED PRECEDING)
               + gr.d + gr.c AS n_risk
  FROM grid gr JOIN tot ON tot.g = gr.g
),
wide AS (
  SELECT duration_days,
         CAST(max(CASE WHEN g = 1 THEN d END) AS BIGINT) AS d1,
         CAST(max(CASE WHEN g = 0 THEN d END) AS BIGINT) AS d0,
         CAST(max(CASE WHEN g = 1 THEN n_risk END) AS BIGINT) AS n1,
         CAST(max(CASE WHEN g = 0 THEN n_risk END) AS BIGINT) AS n0
  FROM risk GROUP BY 1
),
terms AS (
  SELECT d1, d0, n1, n0, d1 + d0 AS dt, n1 + n0 AS n
  FROM wide WHERE d1 + d0 > 0 AND n1 + n0 > 0
),
agg AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         CAST(sum(dt * n1 * 1000000 // n) AS BIGINT) AS e1_micro,
         CAST(sum(CASE WHEN n > 1
                       THEN CAST(dt AS HUGEINT) * n1 * n0 * (n - dt) * 1000000
                            // (CAST(n AS HUGEINT) * n * (n - 1))
                       ELSE 0 END) AS BIGINT) AS v_micro
  FROM terms
),
tot2 AS (
  SELECT CAST(max(CASE WHEN g = 1 THEN t END) AS BIGINT) AS n_urgent,
         CAST(max(CASE WHEN g = 0 THEN t END) AS BIGINT) AS n_low
  FROM tot
)
SELECT tot2.n_urgent, tot2.n_low, agg.o1 AS observed_urgent,
       agg.e1_micro AS expected_urgent_micro,
       agg.v_micro AS variance_micro,
       round(CAST(agg.o1 * 1000000 - agg.e1_micro AS DOUBLE)
             / (sqrt(CAST(agg.v_micro AS DOUBLE)) * 1000), 6) AS z_logrank,
       CAST(CAST(agg.o1 * 1000000 - agg.e1_micro AS HUGEINT)
            * (agg.o1 * 1000000 - agg.e1_micro) // NULLIF(agg.v_micro, 0) AS BIGINT)
         AS chi2_micro
FROM agg, tot2
""",
)
def orders_logrank_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing order->first-shipment survival between
    URGENT and LOW priority orders (right-censored at the study cutoff,
    same event/censor construction as orders_nelson_aalen) — the
    hypothesis-testing member of the survival family: O-E accumulated
    over the pooled event-time axis with hypergeometric expectations
    E1_t = d_t*n1_t/n_t and variances d*n1*n0*(n-d)/(n^2 (n-1)), each
    quantized to integer micro BEFORE summation (order-independent;
    the 4-way count product rides HUGEINT/decimal). The final z is one
    IEEE-exact sqrt + division rounded to 6 dp; chi2 stays integer
    micro. At-risk counts per group come from group-partitioned prefix
    sums over the calendar-bounded duration histogram grid (2 x days
    rows — bounded; the global-axis sibling uses the two-phase sweep).
    Reference analog: none (beyond-reference survival-testing op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    f = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    cut = li.agg(F.max("l_shipdate").alias("mx"))
    pts = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .join(f, o["o_orderkey"] == f["l_orderkey"], "left")
        .crossJoin(cut)
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("g"),
            F.when(
                F.col("first_ship").isNotNull(),
                F.datediff("first_ship", "o_orderdate"),
            )
            .otherwise(F.greatest(F.lit(0), F.datediff("mx", "o_orderdate")))
            .alias("duration_days"),
            F.col("first_ship").isNotNull().alias("is_event"),
        )
        .filter(F.col("duration_days") >= 0)
    )
    hist = pts.groupBy("duration_days", "g").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("is_event"), 0).otherwise(1)).cast("long").alias("c"),
    )
    times = hist.select("duration_days").distinct()
    groups = spark.range(2).select(F.col("id").cast("int").alias("g"))
    grid = (
        times.crossJoin(groups)
        .join(hist, ["duration_days", "g"], "left")
        .select(
            "duration_days",
            "g",
            F.coalesce(F.col("d"), F.lit(0)).alias("d"),
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    tot = grid.groupBy("g").agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("t"))
    w = Window.partitionBy("g").orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.join(tot, "g").select(
        "duration_days",
        "g",
        "d",
        (
            F.col("t")
            - F.sum(F.col("d") + F.col("c")).over(w)
            + F.col("d")
            + F.col("c")
        ).alias("n_risk"),
    )
    wide = risk.groupBy("duration_days").agg(
        F.max(F.when(F.col("g") == 1, F.col("d"))).cast("long").alias("d1"),
        F.max(F.when(F.col("g") == 0, F.col("d"))).cast("long").alias("d0"),
        F.max(F.when(F.col("g") == 1, F.col("n_risk"))).cast("long").alias("n1"),
        F.max(F.when(F.col("g") == 0, F.col("n_risk"))).cast("long").alias("n0"),
    )
    terms = wide.selectExpr(
        "d1", "d0", "n1", "n0", "d1 + d0 AS dt", "n1 + n0 AS n"
    ).filter("dt > 0 AND n > 0")
    agg = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.expr("CAST(sum(dt * n1 * 1000000 div n) AS BIGINT)").alias("e1_micro"),
        F.expr(
            "CAST(sum(CASE WHEN n > 1 THEN CAST(dt AS DECIMAL(38,0)) * n1 * n0"
            " * (n - dt) * 1000000 div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"
            " ELSE 0 END) AS BIGINT)"
        ).alias("v_micro"),
    )
    tot2 = tot.agg(
        F.max(F.when(F.col("g") == 1, F.col("t"))).cast("long").alias("n_urgent"),
        F.max(F.when(F.col("g") == 0, F.col("t"))).cast("long").alias("n_low"),
    )
    return agg.crossJoin(tot2).selectExpr(
        "n_urgent",
        "n_low",
        "o1 AS observed_urgent",
        "e1_micro AS expected_urgent_micro",
        "v_micro AS variance_micro",
        "round(CAST(o1 * 1000000 - e1_micro AS DOUBLE)"
        " / (sqrt(CAST(v_micro AS DOUBLE)) * 1000), 6) AS z_logrank",
        "CAST(CAST(o1 * 1000000 - e1_micro AS DECIMAL(38,0))"
        " * (o1 * 1000000 - e1_micro) div NULLIF(v_micro, 0) AS BIGINT) AS chi2_micro",
    )


_GBM_CANDS = (
    (1, "q", 10_000_000),
    (2, "q", 20_000_000),
    (3, "q", 30_000_000),
    (4, "q", 40_000_000),
    (5, "d", 20_000),
    (6, "d", 40_000),
    (7, "d", 60_000),
    (8, "d", 80_000),
)

_SQL_GBM_CANDS = ", ".join(f"({c}, '{f}', {t})" for c, f, t in _GBM_CANDS)


def _gbm_round_sql(k: int, resid: str) -> str:
    """One boosting round: per-candidate integer split statistics over the
    residual column ``resid``, best split by quantized SSE-gain, leaf means."""
    return f"""
sums{k} AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum({resid}) AS BIGINT) AS s
  FROM rows{k}
),
cstat{k} AS (
  SELECT c.cid, c.feat, c.thr,
         CAST(count(CASE WHEN (CASE WHEN c.feat = 'q' THEN r.q_micro ELSE r.d_micro END)
                          <= c.thr THEN 1 END) AS BIGINT) AS n_l,
         CAST(COALESCE(sum(CASE WHEN (CASE WHEN c.feat = 'q' THEN r.q_micro ELSE r.d_micro END)
                          <= c.thr THEN {resid} END), 0) AS BIGINT) AS s_l
  FROM rows{k} r, (SELECT * FROM (VALUES {_SQL_GBM_CANDS}) v(cid, feat, thr)) c
  GROUP BY 1, 2, 3
),
scored{k} AS (
  SELECT c.cid, c.feat, c.thr, c.n_l, c.s_l,
         t.n - c.n_l AS n_r, t.s - c.s_l AS s_r,
         CAST(CAST(c.s_l // NULLIF(c.n_l, 0) AS HUGEINT) * c.s_l
              + CAST((t.s - c.s_l) // NULLIF(t.n - c.n_l, 0) AS HUGEINT)
                * (t.s - c.s_l) AS HUGEINT) AS gain_q
  FROM cstat{k} c, sums{k} t
  WHERE c.n_l > 0 AND t.n - c.n_l > 0
),
best{k} AS (
  SELECT cid, feat, thr, n_l, n_r,
         CAST(s_l // n_l AS BIGINT) AS mean_l,
         CAST(s_r // n_r AS BIGINT) AS mean_r,
         CAST(gain_q AS BIGINT) AS gain_q
  FROM scored{k}
  ORDER BY gain_q DESC, cid LIMIT 1
)"""


_SQL_GBM = (
    """
WITH base AS (
  SELECT greatest(0, (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000)
           AS y,
         CAST(l.l_quantity * 1000000 AS BIGINT) AS q_micro,
         CAST(floor(l.l_discount * 1000000) AS BIGINT) AS d_micro
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
f0 AS (SELECT CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS f0 FROM base),
rows1 AS (
  SELECT q_micro, d_micro, y * 1000000 - (SELECT f0 FROM f0) AS r
  FROM base
),"""
    + _gbm_round_sql(1, "r")
    + """,
rows2 AS (
  SELECT r.q_micro, r.d_micro,
         r.r - (CASE WHEN (CASE WHEN b.feat = 'q' THEN r.q_micro ELSE r.d_micro END)
                      <= b.thr THEN b.mean_l ELSE b.mean_r END) AS r
  FROM rows1 r, best1 b
),"""
    + _gbm_round_sql(2, "r")
    + """
SELECT CAST(1 AS BIGINT) AS round, feat AS feature,
       CAST(thr AS BIGINT) AS threshold_micro,
       CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
       mean_l AS left_value_micro, mean_r AS right_value_micro, gain_q
FROM best1
UNION ALL
SELECT CAST(2 AS BIGINT), feat, CAST(thr AS BIGINT),
       CAST(n_l AS BIGINT), CAST(n_r AS BIGINT), mean_l, mean_r, gain_q
FROM best2
"""
)


@register("lineitem_gbm_stumps", _SQL_GBM)
def lineitem_gbm_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-boosted decision stumps on shipping delay (two
    least-squares boosting rounds over quantity/discount splits) with a
    BIT-IDENTICAL cross-engine training trajectory: the base score is the
    truncating-div global mean, each round scores a FIXED candidate grid
    of 8 splits by the division-free SSE gain (S_L div n_L)*S_L +
    (S_R div n_R)*S_R (mean quantized to the integer grid BEFORE the
    product, keeping the comparison key inside int128/decimal at any
    corpus size; the shared S^2/n term cancels in comparisons), picks the
    (gain DESC, cid) winner deterministically, fits truncating-div leaf
    means, and residualizes through a 1-row best-split cross join.
    Residual sums stay int64 (micro-days x rows); gain products ride
    HUGEINT/decimal(38,0). Per round: one candidate x rows
    conditional aggregate (8-way bounded fan-out via the VALUES dim) —
    the same shuffle shape as a grouped count; the argmax is a LIMIT 1
    over 8 rows. Output: the two fitted stumps. Reference analog: none
    (beyond-reference ML-training op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    base = li.join(o, li["l_orderkey"] == o["o_orderkey"]).selectExpr(
        "greatest(0, (unix_micros(l_shipdate) - unix_micros(o_orderdate))"
        " div 86400000000) AS y",
        "CAST(l_quantity * 1000000 AS BIGINT) AS q_micro",
        "CAST(floor(l_discount * 1000000) AS BIGINT) AS d_micro",
    )
    f0 = base.agg(
        F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias("f0")
    )
    rows_k = base.crossJoin(f0).selectExpr(
        "q_micro", "d_micro", "y * 1000000 - f0 AS r"
    )
    cands = spark.range(1).selectExpr(
        "explode(array("
        + ", ".join(
            f"struct(CAST({c} AS BIGINT) AS cid, '{f}' AS feat, CAST({t} AS BIGINT) AS thr)"
            for c, f, t in _GBM_CANDS
        )
        + ")) AS c"
    ).select("c.*")
    out = None
    for k in (1, 2):
        sums = rows_k.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r").cast("long").alias("s"),
        )
        side = (
            "(CASE WHEN feat = 'q' THEN q_micro ELSE d_micro END) <= thr"
        )
        cstat = (
            rows_k.crossJoin(cands)
            .groupBy("cid", "feat", "thr")
            .agg(
                F.count(F.when(F.expr(side), 1)).cast("long").alias("n_l"),
                F.coalesce(F.sum(F.when(F.expr(side), F.col("r"))), F.lit(0))
                .cast("long")
                .alias("s_l"),
            )
        )
        scored = (
            cstat.crossJoin(sums)
            .filter("n_l > 0 AND n - n_l > 0")
            .selectExpr(
                "cid",
                "feat",
                "thr",
                "n_l",
                "n - n_l AS n_r",
                "s_l",
                "s - s_l AS s_r",
                "CAST(CAST(s_l div NULLIF(n_l, 0) AS DECIMAL(38,0)) * s_l"
                " + CAST((s - s_l) div NULLIF(n - n_l, 0) AS DECIMAL(38,0))"
                " * (s - s_l) AS DECIMAL(38,0)) AS gain_q",
            )
        )
        best = (
            scored.orderBy(F.col("gain_q").desc(), "cid")
            .limit(1)
            .selectExpr(
                "cid",
                "feat",
                "thr",
                "n_l",
                "n_r",
                "CAST(s_l div n_l AS BIGINT) AS mean_l",
                "CAST(s_r div n_r AS BIGINT) AS mean_r",
                "CAST(gain_q AS BIGINT) AS gain_q",
            )
        )
        row = best.selectExpr(
            f"CAST({k} AS BIGINT) AS round",
            "feat AS feature",
            "CAST(thr AS BIGINT) AS threshold_micro",
            "CAST(n_l AS BIGINT) AS n_left",
            "CAST(n_r AS BIGINT) AS n_right",
            "mean_l AS left_value_micro",
            "mean_r AS right_value_micro",
            "gain_q",
        )
        out = row if out is None else out.unionByName(row)
        if k == 1:
            rows_k = rows_k.crossJoin(best).selectExpr(
                "q_micro",
                "d_micro",
                "r - (CASE WHEN (CASE WHEN feat = 'q' THEN q_micro ELSE d_micro END)"
                " <= thr THEN mean_l ELSE mean_r END) AS r",
            )
    return out


_SQL_LOGIT_MU_DUCK = (
    "CAST(floor(CAST(1000000 AS DOUBLE)"
    " / (1 + exp(-(CAST(p.b0 + (p.b1 * f1 + p.b2 * f2) // 1000000"
    " AS DOUBLE) / 1000000)))) AS BIGINT)"
)

_SQL_LOGISTIC_AUC = (
    _SQL_LOGISTIC_PREFIX
    + f""",
lscored AS (SELECT y, {_SQL_LOGIT_MU_DUCK} AS mu FROM lrows, lpar2 p),
h AS (
  SELECT mu, CAST(sum(y) AS BIGINT) AS p, CAST(sum(1 - y) AS BIGINT) AS q
  FROM lscored GROUP BY 1
),
t AS (
  SELECT CAST(sum(p) AS BIGINT) AS n1, CAST(sum(q) AS BIGINT) AS n0,
         CAST(sum(p + q) AS BIGINT) AS n
  FROM h
),
u AS (
  SELECT CAST(COALESCE((SELECT sum(CAST(a.p AS HUGEINT) * b.q * 2)
                        FROM h a JOIN h b ON b.mu < a.mu), 0)
              + COALESCE((SELECT sum(CAST(p AS HUGEINT) * q) FROM h), 0)
              AS HUGEINT) AS u2
),
br AS (
  SELECT CAST(sum(CAST(p AS HUGEINT) * (mu - 1000000) * (mu - 1000000)
               + CAST(q AS HUGEINT) * mu * mu) AS HUGEINT) AS sq
  FROM h
)
SELECT t.n1 AS n_pos, t.n0 AS n_neg,
       CAST(u.u2 * 1000000 // NULLIF(CAST(2 AS HUGEINT) * t.n1 * t.n0, 0) AS BIGINT)
         AS auc_ppm,
       CAST(br.sq // (CAST(t.n AS HUGEINT) * 1000000) AS BIGINT) AS brier_micro
FROM t, u, br
"""
)


@register("lineitem_logistic_auc", _SQL_LOGISTIC_AUC)
def lineitem_logistic_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC and Brier score of the quantized-IRLS logistic model
    (same trainer CTE chain as lineitem_logistic_late — shared-prefix
    oracle, shared Spark helper, so the eval can't drift from the
    model it grades). AUC uses the rank-sum identity over the SCORE
    HISTOGRAM: doubled concordance 2U = 2*sum_{mu_a > mu_b} p_a*q_b +
    sum_m p_m*q_m stays integer (ties get the standard half credit via
    the doubling trick), computed by a self-join over the score support
    — BOUNDED by the discount x quantity alphabet (~500 values), never
    a row-scaled pairing or a global rank window. Brier is the exact
    integer sum p*(mu-1e6)^2 + q*mu^2 over the same histogram,
    micro-normalized once. HUGEINT/decimal rails on every product.
    Reference analog: none (beyond-reference model-evaluation op)."""
    lrows, par = _logistic_fit(spark, sf_dir)
    scored = lrows.crossJoin(par).selectExpr("y", f"{_LOGIT_MU_EXPR} AS mu")
    h = scored.groupBy("mu").agg(
        F.sum("y").cast("long").alias("p"),
        F.sum(F.expr("1 - y")).cast("long").alias("q"),
    )
    t = h.agg(
        F.sum("p").cast("long").alias("n1"),
        F.sum("q").cast("long").alias("n0"),
        F.sum(F.col("p") + F.col("q")).cast("long").alias("n"),
    )
    a = h.select(F.col("mu").alias("mu_a"), F.col("p").alias("p_a"))
    b = h.select(F.col("mu").alias("mu_b"), F.col("q").alias("q_b"))
    conc = (
        a.join(b, F.col("mu_b") < F.col("mu_a"))
        .agg(
            F.coalesce(
                F.sum(F.expr("CAST(p_a AS DECIMAL(38,0)) * q_b * 2")), F.lit(0)
            ).alias("c2")
        )
    )
    ties = h.agg(
        F.coalesce(F.sum(F.expr("CAST(p AS DECIMAL(38,0)) * q")), F.lit(0)).alias("t2")
    )
    br = h.agg(
        F.sum(
            F.expr(
                "CAST(p AS DECIMAL(38,0)) * (mu - 1000000) * (mu - 1000000)"
                " + CAST(q AS DECIMAL(38,0)) * mu * mu"
            )
        ).alias("sq")
    )
    return (
        t.crossJoin(conc)
        .crossJoin(ties)
        .crossJoin(br)
        .selectExpr(
            "n1 AS n_pos",
            "n0 AS n_neg",
            "CAST((c2 + t2) * 1000000 div NULLIF(CAST(2 AS DECIMAL(38,0)) * n1 * n0, 0)"
            " AS BIGINT) AS auc_ppm",
            "CAST(sq div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT) AS brier_micro",
        )
    )


_SQL_LOGISTIC_RELIABILITY = (
    _SQL_LOGISTIC_PREFIX
    + f""",
lscored AS (SELECT y, {_SQL_LOGIT_MU_DUCK} AS mu FROM lrows, lpar2 p)
SELECT CAST(mu // 100000 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(mu) // count(*) AS BIGINT) AS mean_pred_ppm,
       CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS actual_rate_ppm,
       CAST(sum(mu) // count(*) - sum(y) * 1000000 // count(*) AS BIGINT)
         AS gap_ppm
FROM lscored
GROUP BY 1
"""
)


@register("lineitem_logistic_reliability", _SQL_LOGISTIC_RELIABILITY)
def lineitem_logistic_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration curve) of the quantized-IRLS
    logistic model: predicted probabilities bucketed into score deciles
    (mu div 100000), each reporting exact mean prediction, actual
    positive rate, and the calibration gap — all truncating-div ppm over
    integer sums (the third member of the model-eval family next to
    AUC/Brier, same shared trainer prefix). One hash aggregate over the
    scored rows; bucket alphabet is fixed at 10. Reference analog: none
    (beyond-reference model-evaluation op)."""
    lrows, par = _logistic_fit(spark, sf_dir)
    scored = lrows.crossJoin(par).selectExpr("y", f"{_LOGIT_MU_EXPR} AS mu")
    return scored.groupBy(F.expr("CAST(mu div 100000 AS BIGINT)").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("CAST(sum(mu) div count(*) AS BIGINT)").alias("mean_pred_ppm"),
        F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias(
            "actual_rate_ppm"
        ),
        F.expr(
            "CAST(sum(mu) div count(*) - sum(y) * 1000000 div count(*) AS BIGINT)"
        ).alias("gap_ppm"),
    )


@register(
    "events_audience_overlap",
    """
WITH m AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM m a JOIN m b ON b.user_id = a.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
       CAST(i.n_both * 1000000 // (sa.n + sb.n - i.n_both) AS BIGINT) AS jaccard_ppm,
       CAST(i.n_both * 1000000 // least(sa.n, sb.n) AS BIGINT) AS containment_ppm
FROM inter i
JOIN sz sa ON sa.event_type = i.type_a
JOIN sz sb ON sb.event_type = i.type_b
""",
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: exact Jaccard and
    containment (overlap coefficient) of the user sets of every type
    pair — the audience-segmentation lens (which behaviors share users)
    next to the per-part co-occurrence graph. The pair intersection is
    an equi-join on user_id over the DEDUPLICATED (type, user)
    membership table — fan-out per user is bounded by the type alphabet
    (5 here), so the join output is |users| x C(types,2) at worst,
    never |events|^2; set sizes ride a bounded dim join and the ratios
    are truncating-div ppm. Reference analog: none (beyond-reference
    audience-analytics op)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select("event_type", "user_id").distinct()
    sz = m.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = m.select(F.col("event_type").alias("type_a"), "user_id")
    b = m.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    return (
        inter.join(sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")), "type_a")
        .join(sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")), "type_b")
        .selectExpr(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            "CAST(n_both * 1000000 div (n_a + n_b - n_both) AS BIGINT) AS jaccard_ppm",
            "CAST(n_both * 1000000 div least(n_a, n_b) AS BIGINT) AS containment_ppm",
        )
    )


@register(
    "orders_hill_tail_index",
    """
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
  FROM orders
),
top501 AS (SELECT c FROM cents ORDER BY c DESC, o_orderkey LIMIT 501),
top500 AS (SELECT c FROM cents ORDER BY c DESC, o_orderkey LIMIT 500),
ref AS (SELECT CAST(min(c) AS BIGINT) AS c_ref, CAST(count(*) AS BIGINT) AS n_top
        FROM top501),
terms AS (
  SELECT CAST(floor(ln(CAST(t.c AS DOUBLE) / r.c_ref) * 1000000) AS BIGINT) AS lnr
  FROM top500 t, ref r
)
SELECT CAST(count(*) AS BIGINT) AS k,
       (SELECT c_ref FROM ref) AS threshold_cents,
       CAST(sum(lnr) AS BIGINT) AS sum_ln_micro,
       CAST(count(*) * 1000000000000 // NULLIF(sum(lnr), 0) AS BIGINT) AS alpha_micro
FROM terms
""",
)
def orders_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail index of order values —
    the heavy-tail diagnostic (alpha ~ how extreme the whale orders run;
    finite variance needs alpha > 2) next to Benford/Gini/Zipf in the
    distribution-forensics family. alpha = k / sum ln(x_i / x_(k+1))
    over the top k = 500 order statistics: the top set comes from a
    DISTRIBUTED top-k (TakeOrderedAndProject with a deterministic
    (value, key) tie-break — never a global sort or rank window), each
    log-ratio is floor-quantized to integer micro-nats against the
    (k+1)-th value broadcast from a 1-row aggregate, and alpha is one
    truncating division (k*1e12 div sum). Exact integer cents domain.
    Reference analog: none (beyond-reference statistics op)."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("c"),
        "o_orderkey",
    )
    top501 = cents.orderBy(F.col("c").desc(), "o_orderkey").limit(501).select("c")
    top500 = cents.orderBy(F.col("c").desc(), "o_orderkey").limit(500).select("c")
    ref = top501.agg(
        F.min("c").cast("long").alias("c_ref"),
        F.count(F.lit(1)).cast("long").alias("n_top"),
    )
    terms = top500.crossJoin(ref).select(
        F.floor(F.log(F.expr("CAST(c AS DOUBLE) / c_ref")) * 1000000)
        .cast("long")
        .alias("lnr"),
        "c_ref",
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("c_ref").cast("long").alias("threshold_cents"),
        F.sum("lnr").cast("long").alias("sum_ln_micro"),
        F.expr(
            "CAST(count(*) * 1000000000000 div NULLIF(sum(lnr), 0) AS BIGINT)"
        ).alias("alpha_micro"),
    )


@register(
    "lineitem_regression_discontinuity",
    """
WITH pts AS (
  SELECT CAST(l.l_quantity AS BIGINT) - 25 AS x,
         greatest(0, (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000)
           AS y,
         CASE WHEN l.l_quantity >= 25 THEN 1 ELSE 0 END AS side
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_quantity BETWEEN 10 AND 40
),
s AS (
  SELECT side,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pts GROUP BY 1
),
fit AS (
  SELECT side, n,
         CAST((CAST(sxx AS HUGEINT) * sy - CAST(sx AS HUGEINT) * sxy) * 1000000
              // NULLIF(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx, 0)
              AS BIGINT) AS a_micro,
         CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
              // NULLIF(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx, 0)
              AS BIGINT) AS b_micro
  FROM s
)
SELECT CAST(max(CASE WHEN side = 0 THEN n END) AS BIGINT) AS n_left,
       CAST(max(CASE WHEN side = 1 THEN n END) AS BIGINT) AS n_right,
       CAST(max(CASE WHEN side = 0 THEN a_micro END) AS BIGINT) AS a_left_micro,
       CAST(max(CASE WHEN side = 1 THEN a_micro END) AS BIGINT) AS a_right_micro,
       CAST(max(CASE WHEN side = 0 THEN b_micro END) AS BIGINT) AS b_left_micro,
       CAST(max(CASE WHEN side = 1 THEN b_micro END) AS BIGINT) AS b_right_micro,
       CAST(max(CASE WHEN side = 1 THEN a_micro END)
            - max(CASE WHEN side = 0 THEN a_micro END) AS BIGINT) AS jump_micro
FROM fit
""",
)
def lineitem_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate of the shipping-delay jump
    at the quantity-25 cutoff (bandwidth +-15): local linear fits on each
    side of the running variable via exact 2x2 normal equations —
    intercepts a = (Sxx*Sy - Sx*Sxy)/(n*Sxx - Sx^2) and slopes from the
    same determinant, each quantized ONCE to truncating-div micro over
    HUGEINT/decimal rails — and the causal-jump readout is the intercept
    difference at the cutoff. Completes the quasi-experimental family
    (DiD = parallel trends, CUPED = variance reduction, RDD = local
    randomization at a threshold). One filtered FK join + one 2-group
    aggregate; everything downstream is 2-row algebra. With centered x,
    a fixture with no true discontinuity reads jump ~ 0 — the null is
    informative. Reference analog: none (beyond-reference
    causal-inference op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pts = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter("l_quantity BETWEEN 10 AND 40")
        .selectExpr(
            "CAST(l_quantity AS BIGINT) - 25 AS x",
            "greatest(0, (unix_micros(l_shipdate) - unix_micros(o_orderdate))"
            " div 86400000000) AS y",
            "CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END AS side",
        )
    )
    s = pts.groupBy("side").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    fit = s.selectExpr(
        "side",
        "n",
        "CAST((CAST(sxx AS DECIMAL(38,0)) * sy - CAST(sx AS DECIMAL(38,0)) * sxy)"
        " * 1000000 div NULLIF(CAST(n AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx, 0) AS BIGINT) AS a_micro",
        "CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
        " * 1000000 div NULLIF(CAST(n AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx, 0) AS BIGINT) AS b_micro",
    )
    return fit.agg(
        F.max(F.when(F.col("side") == 0, F.col("n"))).cast("long").alias("n_left"),
        F.max(F.when(F.col("side") == 1, F.col("n"))).cast("long").alias("n_right"),
        F.max(F.when(F.col("side") == 0, F.col("a_micro"))).cast("long").alias("a_left_micro"),
        F.max(F.when(F.col("side") == 1, F.col("a_micro"))).cast("long").alias("a_right_micro"),
        F.max(F.when(F.col("side") == 0, F.col("b_micro"))).cast("long").alias("b_left_micro"),
        F.max(F.when(F.col("side") == 1, F.col("b_micro"))).cast("long").alias("b_right_micro"),
        (
            F.max(F.when(F.col("side") == 1, F.col("a_micro")))
            - F.max(F.when(F.col("side") == 0, F.col("a_micro")))
        ).cast("long").alias("jump_micro"),
    )


@register(
    "customers_inequality_indices",
    """
WITH rev AS (
  SELECT o_custkey AS ck,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(x) AS BIGINT) AS xt, CAST(count(*) AS BIGINT) AS n FROM rev),
terms AS (
  SELECT r.x,
         CAST(floor(ln(CAST(r.x AS DOUBLE) * t.n / t.xt) * 1000000) AS BIGINT) AS lt,
         CAST(floor(ln(CAST(t.xt AS DOUBLE) / (CAST(r.x AS DOUBLE) * t.n)) * 1000000)
              AS BIGINT) AS lm
  FROM rev r, tot t
),
idx AS (
  SELECT CAST(sum(CAST(x AS HUGEINT) * lt) // (SELECT xt FROM tot) AS BIGINT)
           AS theil_t_micro,
         CAST(sum(lm) // (SELECT n FROM tot) AS BIGINT) AS mld_micro
  FROM terms
),
top100 AS (
  SELECT CAST(sum(x) AS BIGINT) AS xtop
  FROM (SELECT x FROM rev ORDER BY x DESC, ck LIMIT 100)
)
SELECT t.n AS n_customers, t.xt AS total_cents,
       i.theil_t_micro, i.mld_micro,
       CAST(tp.xtop * 1000000 // t.xt AS BIGINT) AS top100_share_ppm
FROM tot t, idx i, top100 tp
""",
)
def customers_inequality_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-inequality indices over per-customer order totals — the
    decomposable-entropy companions to the Gini report: Theil T =
    sum x*ln(x*n/X)/X and the mean log deviation (Theil L), each
    per-customer log term floor-quantized to integer micro-nats BEFORE
    the weighted sums (order-independent; ln arguments are exact-integer
    ratios kept inside double's 2^53 window to ~1e15 cents-x-customers),
    plus the top-100-customer revenue share via a distributed top-k
    (TakeOrderedAndProject, deterministic tie-break — never a global
    rank window). One per-customer aggregate + one 1-row total.
    Reference analog: none (beyond-reference economic-statistics op)."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("x")
    )
    tot = rev.agg(
        F.sum("x").cast("long").alias("xt"), F.count(F.lit(1)).cast("long").alias("n")
    )
    terms = rev.crossJoin(tot).selectExpr(
        "x",
        "xt",
        "n",
        "CAST(floor(ln(CAST(x AS DOUBLE) * n / xt) * 1000000) AS BIGINT) AS lt",
        "CAST(floor(ln(CAST(xt AS DOUBLE) / (CAST(x AS DOUBLE) * n)) * 1000000)"
        " AS BIGINT) AS lm",
    )
    idx = terms.agg(
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0)) * lt) div max(xt) AS BIGINT)"
        ).alias("theil_t_micro"),
        F.expr("CAST(sum(lm) div max(n) AS BIGINT)").alias("mld_micro"),
    )
    top100 = (
        rev.orderBy(F.col("x").desc(), "ck")
        .limit(100)
        .agg(F.sum("x").cast("long").alias("xtop"))
    )
    return (
        tot.crossJoin(idx)
        .crossJoin(top100)
        .selectExpr(
            "n AS n_customers",
            "xt AS total_cents",
            "theil_t_micro",
            "mld_micro",
            "CAST(xtop * 1000000 div xt AS BIGINT) AS top100_share_ppm",
        )
    )


@register(
    "events_runs_test",
    """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
moves AS (
  SELECT a.event_type, a.d,
         CASE WHEN b.c > a.c THEN 1 ELSE 0 END AS s
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + INTERVAL 1 DAY
  WHERE b.c <> a.c
),
runs AS (
  SELECT event_type, s,
         CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY d) IS NULL
              OR lag(s) OVER (PARTITION BY event_type ORDER BY d) <> s
              THEN 1 ELSE 0 END AS new_run
  FROM moves
),
agg AS (
  SELECT event_type,
         CAST(sum(s) AS BIGINT) AS n1,
         CAST(sum(1 - s) AS BIGINT) AS n0,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(new_run) AS BIGINT) AS r
  FROM runs GROUP BY 1
)
SELECT event_type, n1 AS n_up, n0 AS n_down, r AS n_runs,
       CAST(2 * n1 * n0 * 1000000 // n + 1000000 AS BIGINT) AS e_runs_micro,
       CAST(2 * n1 * n0 * (2 * n1 * n0 - n) * 1000000 // (n * n * (n - 1)) AS BIGINT)
         AS var_runs_micro,
       round((CAST(r AS DOUBLE) - (CAST(2 AS DOUBLE) * n1 * n0 / n + 1))
             / sqrt(CAST(2 AS DOUBLE) * n1 * n0 * (2 * n1 * n0 - n)
                    / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS z_runs
FROM agg
WHERE n > 1 AND n1 > 0 AND n0 > 0
""",
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of each type's daily
    up/down movement sequence — the serial-dependence lens next to the
    autocorrelation report (too few runs = momentum/trending, too many
    = mean-reverting oscillation). Consecutive-day moves come from a
    calendar equi-join (d+1 day — no global window), ties drop per the
    standard treatment, run boundaries from a TYPE-partitioned lag over
    the calendar-bounded series, and the moments are exact integer
    micro: E[R] = 2n1n0/n + 1, Var[R] = 2n1n0(2n1n0-n)/(n^2(n-1));
    z is pure double arithmetic over identical integers with an
    IEEE-exact sqrt, 6 dp. Counts stay int64 while n1*n0*(2n1n0) <
    9e18 (calendar-bounded, so always). Reference analog: none
    (beyond-reference statistical-testing op)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = daily.select("event_type", "d", F.col("c").alias("c_a"))
    b = daily.select(
        "event_type",
        (F.col("d") - F.expr("INTERVAL 1 DAY")).alias("d"),
        F.col("c").alias("c_b"),
    )
    moves = (
        a.join(b, ["event_type", "d"])
        .filter(F.col("c_b") != F.col("c_a"))
        .select(
            "event_type",
            "d",
            F.when(F.col("c_b") > F.col("c_a"), 1).otherwise(0).alias("s"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("d")
    runs = moves.withColumn(
        "new_run",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")), 1
        ).otherwise(0),
    )
    agg = runs.groupBy("event_type").agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(F.expr("1 - s")).cast("long").alias("n0"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("new_run").cast("long").alias("r"),
    )
    return agg.filter("n > 1 AND n1 > 0 AND n0 > 0").selectExpr(
        "event_type",
        "n1 AS n_up",
        "n0 AS n_down",
        "r AS n_runs",
        "CAST(2 * n1 * n0 * 1000000 div n + 1000000 AS BIGINT) AS e_runs_micro",
        "CAST(2 * n1 * n0 * (2 * n1 * n0 - n) * 1000000 div (n * n * (n - 1))"
        " AS BIGINT) AS var_runs_micro",
        "round((CAST(r AS DOUBLE) - (CAST(2 AS DOUBLE) * n1 * n0 / n + 1))"
        " / sqrt(CAST(2 AS DOUBLE) * n1 * n0 * (2 * n1 * n0 - n)"
        " / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS z_runs",
    )


_SQL_NATION_BOWTIE = (
    f"""
WITH latency AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
bedges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk
    FROM latency
  ) WHERE rk <= 3
),
nodes AS (SELECT src AS node FROM bedges UNION SELECT dst FROM bedges),
seed AS (
  SELECT node FROM (
    SELECT n.node, count(*) AS deg
    FROM nodes n
    JOIN (SELECT src AS node FROM bedges UNION ALL SELECT dst FROM bedges) t
      ON t.node = n.node
    GROUP BY 1
  ) ORDER BY deg DESC, node LIMIT 1
),
ap0 AS MATERIALIZED (
  SELECT node AS s, node AS v, CAST(0 AS BIGINT) AS d, CAST(1 AS BIGINT) AS sig
  FROM nodes
),"""
    + ",".join(_bc_round_cte(k) for k in range(1, _BC_ROUNDS + 1))
    + f"""
,
fwd AS (SELECT v FROM ap{_BC_ROUNDS} WHERE s = (SELECT node FROM seed)),
bwd AS (SELECT s AS v FROM ap{_BC_ROUNDS} WHERE v = (SELECT node FROM seed)),
classed AS (
  SELECT n.node,
         CASE WHEN f.v IS NOT NULL AND b.v IS NOT NULL THEN 'core'
              WHEN b.v IS NOT NULL THEN 'in'
              WHEN f.v IS NOT NULL THEN 'out'
              ELSE 'other' END AS component
  FROM nodes n
  LEFT JOIN fwd f ON f.v = n.node
  LEFT JOIN bwd b ON b.v = n.node
),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)
SELECT component, CAST(count(*) AS BIGINT) AS n_nations,
       CAST(count(*) * 1000000 // (SELECT n FROM cnt) AS BIGINT) AS share_ppm
FROM classed GROUP BY 1
"""
)


@register("nations_bowtie_structure", _SQL_NATION_BOWTIE)
def nations_bowtie_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie decomposition of the directed trade backbone (the
    Broder et al. web-graph taxonomy): from a deterministic seed (max
    degree, min key), CORE = nations that both reach and are reached by
    the seed within the 4-hop closure, IN = reach it only, OUT = reached
    only, OTHER = neither — the macro-structure lens over the same
    all-pairs BFS table the betweenness/eccentricity reports use (no new
    shuffle shapes: forward reach is the seed's row-slice, backward
    reach its column-slice of one ap table). Counts and truncating-ppm
    shares only. Reference analog: none (beyond-reference
    graph-topology op)."""
    from mobsos_event_log_generator_spark.operators.graph import bfs_all_pairs_counts

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair_counts = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    edges = (
        pair_counts.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("n").desc(), "dst")
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("src", "dst")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed = (
        nodes.join(
            edges.select(F.col("src").alias("node"))
            .unionAll(edges.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg")),
            "node",
        )
        .orderBy(F.col("deg").desc(), "node")
        .limit(1)
        .select("node")
    )
    ap = bfs_all_pairs_counts(edges, rounds=_BC_ROUNDS)
    fwd = ap.join(seed.withColumnRenamed("node", "s"), "s").select(
        F.col("v").alias("f_node")
    )
    bwd = ap.join(seed.withColumnRenamed("node", "v"), "v").select(
        F.col("s").alias("b_node")
    )
    cnt = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    classed = (
        nodes.join(fwd, nodes["node"] == fwd["f_node"], "left")
        .join(bwd, nodes["node"] == bwd["b_node"], "left")
        .selectExpr(
            "CASE WHEN f_node IS NOT NULL AND b_node IS NOT NULL THEN 'core'"
            " WHEN b_node IS NOT NULL THEN 'in'"
            " WHEN f_node IS NOT NULL THEN 'out'"
            " ELSE 'other' END AS component"
        )
    )
    return (
        classed.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nations"))
        .crossJoin(cnt)
        .selectExpr(
            "component",
            "n_nations",
            "CAST(n_nations * 1000000 div n AS BIGINT) AS share_ppm",
        )
    )


@register(
    "events_periodogram",
    """
WITH d0 AS (SELECT min(date_trunc('day', ts)) AS t0 FROM events),
daily AS (
  SELECT event_type,
         date_diff('day', (SELECT t0 FROM d0), date_trunc('day', ts)) AS t,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
terms AS (
  SELECT daily.event_type, p.p, daily.c,
         CAST(floor(cos(2 * pi() * (daily.t % p.p) / p.p) * 1000000) AS BIGINT) AS cq,
         CAST(floor(sin(2 * pi() * (daily.t % p.p) / p.p) * 1000000) AS BIGINT) AS sq
  FROM daily CROSS JOIN (SELECT unnest([7, 14, 30]) AS p) p
),
spec AS (
  SELECT event_type, CAST(p AS BIGINT) AS period_days,
         CAST(sum(c * cq) AS HUGEINT) AS a,
         CAST(sum(c * sq) AS HUGEINT) AS b,
         CAST(sum(c) AS HUGEINT) * 1000000 AS dc
  FROM terms GROUP BY 1, 2
)
SELECT event_type, period_days,
       CAST(a AS BIGINT) AS cos_sum_micro,
       CAST(b AS BIGINT) AS sin_sum_micro,
       CAST((a * a + b * b) * 1000000 // (dc * dc) AS BIGINT) AS power_rel_ppm
FROM spec
""",
)
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-frequency periodogram of the per-type daily series — DFT
    power at the calendar-plausible periods (7/14/30 days), the
    frequency-domain member of the seasonality family (ACF = lag domain,
    Haar = scale domain, seasonal-decompose = weekday means). Basis
    values cos/sin(2*pi*(t mod p)/p) are computed on IDENTICAL doubles
    (integer day index mod the period) and floor-quantized to micro
    BEFORE the weighted sums, so spectral coefficients are exact
    integers; relative power normalizes by the squared DC component via
    one HUGEINT division. One daily rollup + a 3-row period dim
    fan-out + a (type x 3) aggregate. Reference analog: none
    (beyond-reference spectral-analysis op)."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.date_trunc("day", "ts")).alias("t0"))
    daily = (
        ev.crossJoin(d0)
        .groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", "ts"), "t0").alias("t"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    periods = spark.range(1).selectExpr(
        "explode(array(7, 14, 30)) AS p"
    )
    terms = daily.crossJoin(periods).selectExpr(
        "event_type",
        "p",
        "c",
        "CAST(floor(cos(2 * pi() * (t % p) / p) * 1000000) AS BIGINT) AS cq",
        "CAST(floor(sin(2 * pi() * (t % p) / p) * 1000000) AS BIGINT) AS sq",
    )
    spec = terms.groupBy("event_type", F.col("p").cast("long").alias("period_days")).agg(
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * cq")).alias("a"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * sq")).alias("b"),
        F.expr("CAST(sum(c) AS DECIMAL(38,0)) * 1000000").alias("dc"),
    )
    return spec.selectExpr(
        "event_type",
        "period_days",
        "CAST(a AS BIGINT) AS cos_sum_micro",
        "CAST(b AS BIGINT) AS sin_sum_micro",
        "CAST((a * a + b * b) * 1000000 div (dc * dc) AS BIGINT) AS power_rel_ppm",
    )


@register(
    "customers_segment_migration",
    """
WITH b AS (
  SELECT (epoch_us(min(o_orderdate)) + epoch_us(max(o_orderdate))) // 2 AS mid
  FROM orders
),
rev AS (
  SELECT o_custkey AS ck,
         CASE WHEN epoch_us(o_orderdate) <= (SELECT mid FROM b) THEN 1 ELSE 2 END AS half,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1, 2
),
t1 AS (
  SELECT ck, ntile(3) OVER (ORDER BY x DESC, ck) AS tier
  FROM rev WHERE half = 1
),
t2 AS (
  SELECT ck, ntile(3) OVER (ORDER BY x DESC, ck) AS tier
  FROM rev WHERE half = 2
),
m AS (
  SELECT COALESCE(t1.tier, 0) AS tier_h1, COALESCE(t2.tier, 0) AS tier_h2
  FROM t1 FULL OUTER JOIN t2 ON t2.ck = t1.ck
),
n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM m)
SELECT CAST(tier_h1 AS BIGINT) AS tier_h1, CAST(tier_h2 AS BIGINT) AS tier_h2,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(*) * 1000000 // (SELECT nn FROM n) AS BIGINT) AS share_ppm
FROM m GROUP BY 1, 2
""",
)
def customers_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue-tercile migration matrix between the two halves of
    the order history (tier 1 = top third; tier 0 = absent that half) —
    the lifecycle lens (upgrades, downgrades, churn-to-absent,
    new-customer inflow) next to cohort retention and LTV curves. Each
    half's terciles are EXACT ntile semantics over (revenue DESC,
    custkey) computed by sweep.distributed_ntile — two-phase bucketed
    row numbers + ntile quota arithmetic, never a single-partition
    global window (the oracle's plain ntile is the semantics being
    reproduced); the matrix is a full-outer join of the two tier maps
    with truncating-ppm shares. Reference analog: none
    (beyond-reference customer-analytics op)."""
    from mobsos_event_log_generator_spark.operators.sweep import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.expr(
            "(unix_micros(min(o_orderdate)) + unix_micros(max(o_orderdate))) div 2"
        ).alias("mid")
    )
    rev = (
        o.crossJoin(b)
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.when(F.expr("unix_micros(o_orderdate) <= mid"), 1).otherwise(2).alias("half"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    probs = F.lit([i / 32 for i in range(1, 32)])
    tiers = {}
    for half in (1, 2):
        part = rev.filter(F.col("half") == half).select("ck", "x")
        probe = part.agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile_approx(F.col("x").cast("double"), probs, F.lit(10_000)).alias(
                "xb"
            ),
        ).first()
        tiers[half] = distributed_ntile(
            part, 3, probe["n"], "x", ["ck"], "tier", descending=True,
            bounds=probe["xb"],
        ).select("ck", "tier")
    t1 = tiers[1].select(F.col("ck"), F.col("tier").alias("tier_1"))
    t2 = tiers[2].select(F.col("ck").alias("ck2"), F.col("tier").alias("tier_2"))
    m = (
        t1.join(t2, t1["ck"] == t2["ck2"], "full_outer")
        .select(
            F.coalesce(F.col("tier_1"), F.lit(0)).alias("tier_h1"),
            F.coalesce(F.col("tier_2"), F.lit(0)).alias("tier_h2"),
        )
    )
    n = m.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    return (
        m.groupBy("tier_h1", "tier_h2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .crossJoin(n)
        .selectExpr(
            "CAST(tier_h1 AS BIGINT) AS tier_h1",
            "CAST(tier_h2 AS BIGINT) AS tier_h2",
            "n_customers",
            "CAST(n_customers * 1000000 div nn AS BIGINT) AS share_ppm",
        )
    )


def _register_markov_entropy() -> None:
    from mobsos_event_log_generator_spark.plans.queries import ORACLES

    @register(
        "events_markov_entropy_rate",
        f"""
WITH pi AS ({ORACLES["events_markov_stationary"]}),
seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
trans AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
),
rowt AS (SELECT src, CAST(sum(n) AS BIGINT) AS nt FROM trans GROUP BY 1),
terms AS (
  SELECT t.src,
         CAST(sum(t.n * CAST(floor(ln(CAST(t.n AS DOUBLE) / r.nt) * 1000000) AS BIGINT))
              AS BIGINT) AS rsum,
         CAST(max(r.nt) AS BIGINT) AS nt
  FROM trans t JOIN rowt r ON r.src = t.src
  GROUP BY 1
),
hstate AS (
  SELECT src AS event_type, CAST(-(rsum // nt) AS BIGINT) AS h_state_micro
  FROM terms
),
joined AS (
  SELECT p.event_type, p.pi_fp, h.h_state_micro
  FROM pi p JOIN hstate h ON h.event_type = p.event_type
),
rate AS (
  SELECT CAST(sum(CAST(pi_fp AS HUGEINT) * h_state_micro) // 1000000000000 AS BIGINT)
           AS rate_micro
  FROM joined
)
SELECT j.event_type, j.pi_fp, j.h_state_micro, r.rate_micro
FROM joined j, rate r
""",
    )
    def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Entropy rate of the user behavioral Markov chain — how
        predictable the next event type is, the information-theoretic
        lens over the SAME transition counts and stationary distribution
        as events_markov_stationary (its oracle is spliced as a CTE, so
        the weights cannot drift from the gated fixed point): per-state
        conditional entropy H_i = -sum_j n_ij*ln(n_ij/n_i)/n_i with each
        log floor-quantized to micro-nats BEFORE the sums, and the rate
        sum_i pi_i*H_i via the 1e12 fixed-point weights over a HUGEINT
        product. Bounded everywhere past the transition aggregate
        (alphabet x alphabet cells). Reference analog: none
        (beyond-reference information-theory op)."""
        from mobsos_event_log_generator_spark.operators.graph import (
            markov_stationary_fixed_point,
        )

        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        trans = (
            ev.select(
                F.col("event_type").alias("src"),
                F.lead("event_type").over(w).alias("dst"),
            )
            .filter(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        pi = markov_stationary_fixed_point(
            trans, iterations=_MARKOV_ITERS, scale=_MARKOV_SCALE
        ).select(F.col("state").alias("event_type"), "pi_fp")
        rowt = trans.groupBy("src").agg(F.sum("n").cast("long").alias("nt"))
        terms = (
            trans.join(rowt, "src")
            .groupBy("src")
            .agg(
                F.sum(
                    F.col("n")
                    * F.floor(
                        F.log(F.expr("CAST(n AS DOUBLE) / nt")) * 1000000
                    ).cast("long")
                )
                .cast("long")
                .alias("rsum"),
                F.max("nt").cast("long").alias("nt"),
            )
        )
        hstate = terms.selectExpr(
            "src AS event_type", "CAST(-(rsum div nt) AS BIGINT) AS h_state_micro"
        )
        joined = pi.join(hstate, "event_type")
        rate = joined.agg(
            F.expr(
                "CAST(sum(CAST(pi_fp AS DECIMAL(38,0)) * h_state_micro)"
                " div 1000000000000 AS BIGINT)"
            ).alias("rate_micro")
        )
        return joined.crossJoin(rate).select(
            "event_type", "pi_fp", "h_state_micro", "rate_micro"
        )


_register_markov_entropy()


@register(
    "orders_priority_jsd",
    """
WITH b AS (
  SELECT (epoch_us(min(o_orderdate)) + epoch_us(max(o_orderdate))) // 2 AS mid
  FROM orders
),
h AS (
  SELECT o_orderpriority AS pr,
         CAST(sum(CASE WHEN epoch_us(o_orderdate) <= (SELECT mid FROM b)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN epoch_us(o_orderdate) > (SELECT mid FROM b)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM orders GROUP BY 1
),
t AS (SELECT CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2 FROM h),
terms AS (
  SELECT h.n1, h.n2,
         CASE WHEN h.n1 > 0 THEN
           h.n1 * CAST(floor(ln(CAST(2 AS DOUBLE) * h.n1 * t.t2
                                / (h.n1 * t.t2 + h.n2 * t.t1)) * 1000000) AS BIGINT)
           ELSE 0 END AS wp,
         CASE WHEN h.n2 > 0 THEN
           h.n2 * CAST(floor(ln(CAST(2 AS DOUBLE) * h.n2 * t.t1
                                / (h.n1 * t.t2 + h.n2 * t.t1)) * 1000000) AS BIGINT)
           ELSE 0 END AS wq
  FROM h, t
)
SELECT t.t1 AS n_first_half, t.t2 AS n_second_half,
       CAST(((SELECT CAST(sum(wp) AS BIGINT) FROM terms) // t.t1
             + (SELECT CAST(sum(wq) AS BIGINT) FROM terms) // t.t2) // 2 AS BIGINT)
         AS jsd_micro
FROM t
""",
)
def orders_priority_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of the order-priority mix between the
    two halves of the order history — the symmetric, bounded (<= ln 2)
    member of the drift family (PSI is asymmetric-unstable at empty
    bins; KS/W1 need an ordered domain; JSD works on any categorical
    mix). The log arguments reduce to EXACT integer ratios:
    p_i/m_i = 2*n1_i*N2 / (n1_i*N2 + n2_i*N1), floor-quantized to
    micro-nats per cell, weighted by integer counts, normalized by the
    half totals and averaged — one categorical aggregate over the
    bounded priority alphabet plus scalar algebra; absent-in-a-half
    cells contribute zero by the 0*ln(0) convention in both engines.
    Reference analog: none (beyond-reference drift op)."""
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.expr(
            "(unix_micros(min(o_orderdate)) + unix_micros(max(o_orderdate))) div 2"
        ).alias("mid")
    )
    h = (
        o.crossJoin(b)
        .groupBy(F.col("o_orderpriority").alias("pr"))
        .agg(
            F.sum(F.expr("CASE WHEN unix_micros(o_orderdate) <= mid THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n1"),
            F.sum(F.expr("CASE WHEN unix_micros(o_orderdate) > mid THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n2"),
        )
    )
    t = h.agg(
        F.sum("n1").cast("long").alias("t1"), F.sum("n2").cast("long").alias("t2")
    )
    terms = h.crossJoin(t).selectExpr(
        "n1",
        "n2",
        "CASE WHEN n1 > 0 THEN n1 * CAST(floor(ln(CAST(2 AS DOUBLE) * n1 * t2"
        " / (n1 * t2 + n2 * t1)) * 1000000) AS BIGINT) ELSE 0 END AS wp",
        "CASE WHEN n2 > 0 THEN n2 * CAST(floor(ln(CAST(2 AS DOUBLE) * n2 * t1"
        " / (n1 * t2 + n2 * t1)) * 1000000) AS BIGINT) ELSE 0 END AS wq",
        "t1",
        "t2",
    )
    agg = terms.agg(
        F.sum("wp").cast("long").alias("sp"),
        F.sum("wq").cast("long").alias("sq"),
        F.max("t1").cast("long").alias("t1"),
        F.max("t2").cast("long").alias("t2"),
    )
    return agg.selectExpr(
        "t1 AS n_first_half",
        "t2 AS n_second_half",
        "CAST((sp div t1 + sq div t2) div 2 AS BIGINT) AS jsd_micro",
    )


@register(
    "orders_duplicate_invoice_audit",
    """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderdate
  FROM orders
),
pairs AS (
  SELECT a.o_custkey AS custkey, a.cents,
         a.o_orderkey AS orderkey_1, b.o_orderkey AS orderkey_2,
         CAST(abs(date_diff('day', a.o_orderdate, b.o_orderdate)) AS BIGINT)
           AS gap_days
  FROM o a
  JOIN o b ON b.o_custkey = a.o_custkey AND b.cents = a.cents
          AND b.o_orderkey > a.o_orderkey
  WHERE abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 30
)
SELECT custkey, cents, orderkey_1, orderkey_2, gap_days
FROM pairs
""",
)
def orders_duplicate_invoice_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice detection (the accounts-payable fraud/error
    audit): order pairs from the SAME customer with the IDENTICAL exact
    cent amount within 30 days — the classic double-payment signature.
    The pairing is an equi-join on (custkey, cents) — the natural
    blocking key, so candidates are bounded by per-(customer, amount)
    multiplicity, never a cross product — with the date-window predicate
    as a residual filter and id-ordered pairs for a stable output. All
    integer cents/days. Reference analog: none (beyond-reference
    audit op)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "o_orderdate",
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        "cents",
        F.col("o_orderkey").alias("orderkey_1"),
        F.col("o_orderdate").alias("d1"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        "cents",
        F.col("o_orderkey").alias("orderkey_2"),
        F.col("o_orderdate").alias("d2"),
    )
    return (
        a.join(b, ["custkey", "cents"])
        .filter(
            (F.col("orderkey_2") > F.col("orderkey_1"))
            & (F.abs(F.datediff("d2", "d1")) <= 30)
        )
        .select(
            "custkey",
            "cents",
            "orderkey_1",
            "orderkey_2",
            F.abs(F.datediff("d2", "d1")).cast("long").alias("gap_days"),
        )
    )


@register(
    "nations_structural_holes",
    """
WITH od AS MATERIALIZED (
  -- dst comes off the fact side BEFORE customer enters scope: when the
  -- <> predicate can see raw customer x supplier, DuckDB's optimizer
  -- builds a 15k x 1k NESTED_LOOP (14.4M rows, re-run per CTE reference
  -- without MATERIALIZED -> 380-1790 s at sf0.1); this shape yields
  -- identical (src, dst, n) in seconds.
  SELECT l.l_orderkey AS ok, s.s_nationkey AS dst, count(*) AS cnt
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
latency AS MATERIALIZED (
  SELECT c.c_nationkey AS src, od.dst, CAST(sum(od.cnt) AS BIGINT) AS n
  FROM od
  JOIN orders o ON o.o_orderkey = od.ok
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_nationkey <> od.dst
  GROUP BY 1, 2
),
bedges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk
    FROM latency
  ) WHERE rk <= 3
),
sym AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM bedges
),
und AS (SELECT a AS i, b AS j FROM sym UNION ALL SELECT b, a FROM sym),
deg AS (SELECT i, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY 1),
p AS (
  SELECT u.i, u.j, CAST(1000000 // dg.d AS BIGINT) AS pm
  FROM und u JOIN deg dg ON dg.i = u.i
),
ind AS (
  SELECT p1.i, p2.j, CAST(sum(p1.pm * p2.pm) AS BIGINT) AS ind_m2
  FROM p p1 JOIN p p2 ON p2.i = p1.j
  WHERE p1.i <> p2.j
  GROUP BY 1, 2
),
cterm AS (
  SELECT p.i, p.j,
         CAST(p.pm AS HUGEINT) * 1000000 + COALESCE(ind.ind_m2, 0) AS tot_m2
  FROM p LEFT JOIN ind ON ind.i = p.i AND ind.j = p.j
)
SELECT CAST(c.i AS BIGINT) AS nation, dg.d AS degree,
       CAST(sum(c.tot_m2 * c.tot_m2 // 1000000000000) // 1000000 AS BIGINT)
         AS constraint_micro
FROM cterm c JOIN deg dg ON dg.i = c.i
GROUP BY 1, 2
""",
)
def nations_structural_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burt's structural-holes CONSTRAINT over the undirected trade
    backbone: c_ij = (p_ij + sum_q p_iq p_qj)^2 summed over neighbors —
    low constraint marks brokers whose contacts are mutually
    disconnected (the social-capital lens complementing betweenness'
    flow view). Uniform tie weights p_ij = 1/deg_i live on the 1e6 grid
    (truncating div), the indirect term is the wedge join P x P on the
    shared middle (bounded graph; degree-ordered orientation applies at
    open-domain scale), squares ride HUGEINT with one div back per
    quantization step — both engines replay identical integers.
    Reference analog: none (beyond-reference social-network op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair_counts = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bedges = (
        pair_counts.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("n").desc(), "dst")
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("src", "dst")
    )
    sym = bedges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    und = sym.select(F.col("a").alias("i"), F.col("b").alias("j")).unionAll(
        sym.select(F.col("b").alias("i"), F.col("a").alias("j"))
    )
    deg = und.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("d"))
    p = und.join(deg, "i").selectExpr("i", "j", "CAST(1000000 div d AS BIGINT) AS pm")
    p1 = p.select(F.col("i"), F.col("j").alias("q"), F.col("pm").alias("pm1"))
    p2 = p.select(F.col("i").alias("q"), F.col("j"), F.col("pm").alias("pm2"))
    ind = (
        p1.join(p2, "q")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("pm1") * F.col("pm2")).cast("long").alias("ind_m2"))
    )
    cterm = p.join(ind, ["i", "j"], "left").selectExpr(
        "i",
        "j",
        "CAST(pm AS DECIMAL(38,0)) * 1000000 + COALESCE(ind_m2, 0) AS tot_m2",
    )
    return (
        cterm.join(deg, "i")
        .groupBy(F.col("i").cast("long").alias("nation"), F.col("d").alias("degree"))
        .agg(
            F.expr(
                "CAST(sum(tot_m2 * tot_m2 div 1000000000000) div 1000000 AS BIGINT)"
            ).alias("constraint_micro")
        )
    )


@register(
    "lineitem_twoway_anova",
    """
WITH pts AS (
  SELECT o.o_orderpriority AS fa,
         CAST(floor(l.l_discount * 1000000) AS BIGINT) // 20000 AS fb,
         greatest(0, (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000)
           AS y
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS q
  FROM pts
),
ga AS (SELECT fa, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s FROM pts GROUP BY 1),
gb AS (SELECT fb, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s FROM pts GROUP BY 1),
gc AS (SELECT fa, fb, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s FROM pts GROUP BY 1, 2),
parts AS (
  SELECT
    (SELECT CAST(sum(CAST(s AS HUGEINT) * s * 1000000 // n) AS HUGEINT) FROM ga) AS ra,
    (SELECT CAST(sum(CAST(s AS HUGEINT) * s * 1000000 // n) AS HUGEINT) FROM gb) AS rb,
    (SELECT CAST(sum(CAST(s AS HUGEINT) * s * 1000000 // n) AS HUGEINT) FROM gc) AS rc,
    (SELECT CAST(count(*) AS BIGINT) FROM ga) AS la,
    (SELECT CAST(count(*) AS BIGINT) FROM gb) AS lb,
    (SELECT CAST(count(*) AS BIGINT) FROM gc) AS lc,
    CAST(CAST(t.s AS HUGEINT) * t.s * 1000000 // t.n AS HUGEINT) AS cm,
    CAST(CAST(t.q AS HUGEINT) * 1000000 AS HUGEINT) AS qt,
    t.n
  FROM tot t
),
ss AS (
  SELECT n, la, lb, lc,
         CAST(ra - cm AS BIGINT) AS ss_a,
         CAST(rb - cm AS BIGINT) AS ss_b,
         CAST(rc - ra - rb + cm AS BIGINT) AS ss_ab,
         CAST(qt - rc AS BIGINT) AS ss_err
  FROM parts
)
SELECT n AS n_rows, ss_a AS ss_a_micro, ss_b AS ss_b_micro,
       ss_ab AS ss_ab_micro, ss_err AS ss_err_micro,
       round((CAST(ss_a AS DOUBLE) / (la - 1))
             / (CAST(ss_err AS DOUBLE) / (n - lc)), 6) AS f_a,
       round((CAST(ss_b AS DOUBLE) / (lb - 1))
             / (CAST(ss_err AS DOUBLE) / (n - lc)), 6) AS f_b,
       round((CAST(ss_ab AS DOUBLE) / ((la - 1) * (lb - 1)))
             / (CAST(ss_err AS DOUBLE) / (n - lc)), 6) AS f_ab
FROM ss
""",
)
def lineitem_twoway_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA of shipping delay on priority x discount band: the
    sum-of-squares decomposition SS_A + SS_B + SS_AB + SS_err via the
    classic raw-moment identities (each group's S^2*1e6 div n quantized
    once, correction term from the grand totals — exact integer micro
    day^2 over HUGEINT rails; the decomposition identity holds up to
    the per-group quantization, which both engines replay identically),
    and F statistics as pure double ratios of identical integers with
    runtime degrees of freedom from the observed level counts, 6 dp.
    Accumulator growth (r8 audit second pass): all S²·1e6 paths already
    ride decimal(38,0)/HUGEINT; Σy and Σy² are n¹·v-order in int64
    (day-grain delays, safe to ~9e14 rows), and the raw ss_*_micro
    DIAGNOSTIC outputs are n¹·v²·1e6 BIGINTs that saturate near ~1e12
    rows — at that scale consume the bounded F ratios, which is what
    the test reports anyway.
    Shapes: three hash aggregates over bounded factor alphabets plus a
    1-row algebra block — the factorial-experiment lens completing the
    stats family (t-ish drift tests are two-sample; this is k x m).
    Reference analog: none (beyond-reference statistics op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pts = li.join(o, li["l_orderkey"] == o["o_orderkey"]).selectExpr(
        "o_orderpriority AS fa",
        "CAST(floor(l_discount * 1000000) AS BIGINT) div 20000 AS fb",
        "greatest(0, (unix_micros(l_shipdate) - unix_micros(o_orderdate))"
        " div 86400000000) AS y",
    )
    tot = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("q"),
    )

    def gsum(cols):
        g = pts.groupBy(*cols).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("s"),
        )
        return g.agg(
            F.expr(
                "CAST(sum(CAST(s AS DECIMAL(38,0)) * s * 1000000 div n)"
                " AS DECIMAL(38,0))"
            ).alias("r"),
            F.count(F.lit(1)).cast("long").alias("l"),
        )

    ra = gsum(["fa"]).selectExpr("r AS ra", "l AS la")
    rb = gsum(["fb"]).selectExpr("r AS rb", "l AS lb")
    rc = gsum(["fa", "fb"]).selectExpr("r AS rc", "l AS lc")
    parts = (
        tot.crossJoin(ra)
        .crossJoin(rb)
        .crossJoin(rc)
        .selectExpr(
            "n",
            "la",
            "lb",
            "lc",
            "CAST(CAST(s AS DECIMAL(38,0)) * s * 1000000 div n AS DECIMAL(38,0)) AS cm",
            "CAST(CAST(q AS DECIMAL(38,0)) * 1000000 AS DECIMAL(38,0)) AS qt",
            "ra",
            "rb",
            "rc",
        )
    )
    ss = parts.selectExpr(
        "n",
        "la",
        "lb",
        "lc",
        "CAST(ra - cm AS BIGINT) AS ss_a",
        "CAST(rb - cm AS BIGINT) AS ss_b",
        "CAST(rc - ra - rb + cm AS BIGINT) AS ss_ab",
        "CAST(qt - rc AS BIGINT) AS ss_err",
    )
    return ss.selectExpr(
        "n AS n_rows",
        "ss_a AS ss_a_micro",
        "ss_b AS ss_b_micro",
        "ss_ab AS ss_ab_micro",
        "ss_err AS ss_err_micro",
        "round((CAST(ss_a AS DOUBLE) / (la - 1))"
        " / (CAST(ss_err AS DOUBLE) / (n - lc)), 6) AS f_a",
        "round((CAST(ss_b AS DOUBLE) / (lb - 1))"
        " / (CAST(ss_err AS DOUBLE) / (n - lc)), 6) AS f_b",
        "round((CAST(ss_ab AS DOUBLE) / ((la - 1) * (lb - 1)))"
        " / (CAST(ss_err AS DOUBLE) / (n - lc)), 6) AS f_ab",
    )


@register(
    "parts_single_source_risk",
    """
WITH ps AS (
  SELECT l_partkey AS pk,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_parts, CAST(sum(rev) AS BIGINT) AS rev_all
  FROM ps
)
SELECT tot.n_parts,
       CAST(sum(CASE WHEN ps.n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_sourced,
       CAST(sum(CASE WHEN ps.n_suppliers = 1 THEN 1 ELSE 0 END) * 1000000
            // tot.n_parts AS BIGINT) AS single_sourced_ppm,
       CAST(sum(CASE WHEN ps.n_suppliers = 1 THEN ps.rev ELSE 0 END) AS BIGINT)
         AS revenue_at_risk_cents,
       CAST(sum(CASE WHEN ps.n_suppliers = 1 THEN ps.rev ELSE 0 END) * 1000000
            // tot.rev_all AS BIGINT) AS revenue_at_risk_ppm
FROM ps, tot
GROUP BY tot.n_parts, tot.rev_all
""",
)
def parts_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply risk audit: how many parts have exactly one
    observed supplier, and how much revenue rides on them — the
    procurement-resilience lens next to the HHI concentration report
    (HHI says markets are concentrated; this says WHICH spend has no
    fallback). One (part, supplier)-grain aggregate + a 1-row total;
    shares in truncating ppm, exact cents. Reference analog: none
    (beyond-reference supply-chain op)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev"),
    )
    tot = ps.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev").cast("long").alias("rev_all"),
    )
    agg = ps.agg(
        F.sum(F.when(F.col("n_suppliers") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_single"),
        F.sum(F.when(F.col("n_suppliers") == 1, F.col("rev")).otherwise(0))
        .cast("long")
        .alias("rev_single"),
    )
    return tot.crossJoin(agg).selectExpr(
        "n_parts",
        "n_single AS n_single_sourced",
        "CAST(n_single * 1000000 div n_parts AS BIGINT) AS single_sourced_ppm",
        "rev_single AS revenue_at_risk_cents",
        "CAST(rev_single * 1000000 div rev_all AS BIGINT) AS revenue_at_risk_ppm",
    )


@register(
    "events_stickiness_weekly",
    """
WITH d AS (
  SELECT date_trunc('week', ts) AS wk, date_trunc('day', ts) AS day, user_id
  FROM events
),
dau AS (
  SELECT wk, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM d GROUP BY 1, 2
),
wau AS (
  SELECT wk, CAST(count(DISTINCT user_id) AS BIGINT) AS wau FROM d GROUP BY 1
),
per AS (
  SELECT dau.wk,
         CAST(sum(dau.dau) AS BIGINT) AS dau_sum,
         CAST(count(*) AS BIGINT) AS n_days
  FROM dau GROUP BY 1
)
SELECT strftime(p.wk, '%Y-%m-%d') AS week_start,
       p.n_days, w.wau,
       CAST(p.dau_sum // p.n_days AS BIGINT) AS avg_dau,
       CAST(p.dau_sum * 1000000 // (p.n_days * w.wau) AS BIGINT) AS stickiness_ppm
FROM per p JOIN wau w ON w.wk = p.wk
""",
)
def events_stickiness_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly product stickiness (avg DAU / WAU — the classic engagement
    ratio): distinct daily actives averaged over each ISO week's active
    days against the week's distinct actives, in truncating ppm — the
    engagement lens next to cohort retention and rolling-active-users.
    Two distinct-count aggregates on (week[, day]) grain; everything
    after is bounded by the calendar. Reference analog: none
    (beyond-reference product-analytics op)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.date_trunc("week", "ts").alias("wk"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    )
    dau = d.groupBy("wk", "day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    wau = d.groupBy("wk").agg(F.countDistinct("user_id").cast("long").alias("wau"))
    per = dau.groupBy("wk").agg(
        F.sum("dau").cast("long").alias("dau_sum"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return per.join(wau, "wk").selectExpr(
        "date_format(wk, 'yyyy-MM-dd') AS week_start",
        "n_days",
        "wau",
        "CAST(dau_sum div n_days AS BIGINT) AS avg_dau",
        "CAST(dau_sum * 1000000 div (n_days * wau) AS BIGINT) AS stickiness_ppm",
    )


@register(
    "parts_price_dispersion",
    """
WITH sp AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS unit_cents
  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
),
per AS (
  SELECT pk,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(min(unit_cents) AS BIGINT) AS lo,
         CAST(max(unit_cents) AS BIGINT) AS hi
  FROM sp GROUP BY 1
),
multi AS (
  SELECT pk, n_suppliers, lo, hi,
         CAST((hi - lo) * 1000000 // lo AS BIGINT) AS spread_ppm
  FROM per WHERE n_suppliers >= 2 AND lo > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_parts_multi_supplier,
       CAST(sum(spread_ppm) // count(*) AS BIGINT) AS avg_spread_ppm,
       CAST(max(spread_ppm) AS BIGINT) AS max_spread_ppm,
       CAST(sum(CASE WHEN spread_ppm > 50000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_5pct,
       CAST(sum(CASE WHEN spread_ppm > 100000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_10pct
FROM multi
""",
)
def parts_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Law-of-one-price dispersion audit: per part, the spread between
    the cheapest and dearest supplier's unit price ((max-min)/min in
    truncating ppm over exact unit cents) summarized as average/max
    spread and counts past the 5 %/10 % arbitrage thresholds — the
    procurement price-benchmarking lens next to the single-source risk
    and HHI reports. One (part, supplier) aggregate then a part-grain
    rollup; unit price is floor(extprice/qty*100+0.5) on identical
    doubles. Reference analog: none (beyond-reference procurement op)."""
    li = load_table(spark, sf_dir, "lineitem")
    sp = (
        li.filter("l_quantity > 0")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.min(
                F.floor(
                    F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("unit_cents")
        )
    )
    per = sp.groupBy("pk").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.min("unit_cents").cast("long").alias("lo"),
        F.max("unit_cents").cast("long").alias("hi"),
    )
    multi = per.filter("n_suppliers >= 2 AND lo > 0").selectExpr(
        "CAST((hi - lo) * 1000000 div lo AS BIGINT) AS spread_ppm"
    )
    return multi.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts_multi_supplier"),
        F.expr("CAST(sum(spread_ppm) div count(*) AS BIGINT)").alias("avg_spread_ppm"),
        F.max("spread_ppm").cast("long").alias("max_spread_ppm"),
        F.sum(F.when(F.col("spread_ppm") > 50000, 1).otherwise(0))
        .cast("long")
        .alias("n_over_5pct"),
        F.sum(F.when(F.col("spread_ppm") > 100000, 1).otherwise(0))
        .cast("long")
        .alias("n_over_10pct"),
    )


@register(
    "events_mann_kendall_daily",
    """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.event_date > a.event_date
  GROUP BY 1
),
nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
ties AS (
  SELECT event_type,
         CAST(COALESCE(sum(tc * (tc - 1) * (2 * tc + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS tc
        FROM daily GROUP BY 1, 2)
  WHERE tc > 1
  GROUP BY 1
)
SELECT s.event_type, nn.n AS n_days, s.s_stat,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
            - COALESCE(t.tie_term, 0) AS BIGINT) AS var18,
       round(CASE
         WHEN s.s_stat > 0 THEN (s.s_stat - 1)
              / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                      - COALESCE(t.tie_term, 0)) / 18.0)
         WHEN s.s_stat < 0 THEN (s.s_stat + 1)
              / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                      - COALESCE(t.tie_term, 0)) / 18.0)
         ELSE 0.0 END, 6) AS z_stat,
       CASE
         WHEN s.s_stat > 0 AND (s.s_stat - 1)
              / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                      - COALESCE(t.tie_term, 0)) / 18.0) > 1.959964
           THEN 'increasing'
         WHEN s.s_stat < 0 AND (s.s_stat + 1)
              / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                      - COALESCE(t.tie_term, 0)) / 18.0) < -1.959964
           THEN 'decreasing'
         ELSE 'no_trend' END AS trend
FROM s JOIN nn ON nn.event_type = s.event_type
LEFT JOIN ties t ON t.event_type = s.event_type
""",
)
def events_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type over the daily-count
    series — the nonparametric significance twin of `events_theilsen_trend`
    (same series, same pair space; Theil-Sen gives the slope, MK gives the
    trend verdict). S = sum of pairwise count-comparison signs (exact
    integer, tie-corrected normal approximation with the standard
    continuity correction); z from identical integers in both engines.
    Scale shape: the O(days^2) pair join runs AFTER the calendar collapse
    (bounded series, the documented bounded-series exception), never on
    raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    ).agg(F.count(F.lit(1)).alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.event_date") > F.col("a.event_date")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .filter(F.col("tc") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = (
        s.join(nn, "event_type")
        .join(ties, "event_type", "left")
        .withColumn(
            "var18",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            ).cast("long"),
        )
    )
    sd = F.sqrt(F.col("var18") / 18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s_stat",
        "var18",
        F.round(z, 6).alias("z_stat"),
        F.when((F.col("s_stat") > 0) & (z > 1.959964), F.lit("increasing"))
        .when((F.col("s_stat") < 0) & (z < -1.959964), F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


@register(
    "lineitem_welch_ttest",
    f"""
WITH pts AS (
  SELECT CASE WHEN l_discount >= 0.05 THEN 'high_discount' ELSE 'low_discount' END AS grp,
         {XM.sql_int_units('l_extendedprice', 2)} AS cents
  FROM lineitem
),
g AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS HUGEINT) AS s,
         CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
  FROM pts GROUP BY 1
),
wide AS (
  SELECT
    max(CASE WHEN grp = 'high_discount' THEN n END) AS n1,
    max(CASE WHEN grp = 'high_discount' THEN s END) AS s1,
    max(CASE WHEN grp = 'high_discount' THEN q END) AS q1,
    max(CASE WHEN grp = 'low_discount' THEN n END) AS n2,
    max(CASE WHEN grp = 'low_discount' THEN s END) AS s2,
    max(CASE WHEN grp = 'low_discount' THEN q END) AS q2
  FROM g
),
v AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / n1 / 100.0 AS m1,
         CAST(s2 AS DOUBLE) / n2 / 100.0 AS m2,
         (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
           / n1 / (n1 - 1) / 10000.0 AS v1,
         (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
           / n2 / (n2 - 1) / 10000.0 AS v2
  FROM wide
)
SELECT n1, n2,
       round(m1, 4) AS mean_high, round(m2, 4) AS mean_low,
       round(m1 - m2, 4) AS mean_diff,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
       round(pow(v1 / n1 + v2 / n2, 2)
             / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)), 4) AS df_welch,
       abs((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) > 1.959964 AS significant_5pct
FROM v
""",
)
def lineitem_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test: does line price differ
    between high-discount (>= 5%) and low-discount lines? Sufficient
    statistics (n, sum-cents, sum-cents^2) accumulate as EXACT integers in
    one map-side-combined pass (decimal(38,0)/HUGEINT; cents^2 ~ 1e14 per
    row keeps ~1e24 headroom), then means/variances/t/Welch-Satterthwaite
    df are identical double arithmetic on identical integers in both
    engines. Complements the ANOVA/Mann-Whitney entries with the classic
    unequal-variance mean test. One aggregation, zero row shuffles of the
    fact table beyond the 2-group partial agg."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.when(F.col("l_discount") >= 0.05, "high_discount")
        .otherwise("low_discount")
        .alias("grp"),
        XM.int_units_long(F.col("l_extendedprice"), 2).alias("cents"),
    )
    g = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("q"),
    )
    wide = g.agg(
        F.max(F.when(F.col("grp") == "high_discount", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == "high_discount", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("grp") == "high_discount", F.col("q"))).alias("q1"),
        F.max(F.when(F.col("grp") == "low_discount", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == "low_discount", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("grp") == "low_discount", F.col("q"))).alias("q2"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1") / 100.0
    m2 = F.col("s2").cast("double") / F.col("n2") / 100.0
    v1 = (
        (
            F.col("n1").cast("double") * F.col("q1").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / F.col("n1")
        / (F.col("n1") - 1)
        / 10000.0
    )
    v2 = (
        (
            F.col("n2").cast("double") * F.col("q2").cast("double")
            - F.col("s2").cast("double") * F.col("s2").cast("double")
        )
        / F.col("n2")
        / (F.col("n2") - 1)
        / 10000.0
    )
    se2 = v1 / F.col("n1") + v2 / F.col("n2")
    t = (m1 - m2) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(v1 / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(v2 / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return wide.select(
        "n1",
        "n2",
        F.round(m1, 4).alias("mean_high"),
        F.round(m2, 4).alias("mean_low"),
        F.round(m1 - m2, 4).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 4).alias("df_welch"),
        (F.abs(t) > 1.959964).alias("significant_5pct"),
    )


@register(
    "events_cusum_changepoint",
    """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type ORDER BY event_date) AS t,
         sum(c) OVER (PARTITION BY event_type ORDER BY event_date) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS total,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
dev AS (
  -- centered cumulative sum scaled by n to stay integer:
  -- S'_t = n*cum_t - t*total = n^2 * (classic CUSUM / 1)
  SELECT event_type, event_date, t, n, total,
         CAST(n AS HUGEINT) * cum - CAST(t AS HUGEINT) * total AS s_scaled
  FROM idx
),
peak AS (
  SELECT event_type, event_date, t, n, total, s_scaled,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY abs(s_scaled) DESC, event_date) AS pk
  FROM dev
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       event_date AS changepoint_date,
       CAST(t AS BIGINT) AS changepoint_t,
       CAST(abs(s_scaled) AS BIGINT) AS cusum_peak_scaled,
       CASE WHEN total > 0
            THEN round(CAST(abs(s_scaled) AS DOUBLE) / (CAST(n AS DOUBLE) * total), 6)
            ELSE 0.0 END AS peak_ratio
FROM peak WHERE pk = 1
""",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint locator per event type over the daily-count
    series: the t maximizing |n*cum_t - t*total| — the integer-scaled
    centered cumulative sum (classic CUSUM x n, so no fractional mean
    ever materializes; HUGEINT/decimal at 1e10-count days: n*cum ~
    365 x 3.6e12 ~ 1e15 x n ~ 1e18, decades of headroom). peak_ratio =
    peak / (n*total) in [0, 1) is the scale-free magnitude readout.
    Deterministic tiebreak: earliest date at equal peaks. Pair with
    `events_mann_kendall_daily` (is there a trend?) — CUSUM answers
    WHERE the level shifted. Calendar-bounded windows after the daily
    collapse; the raw scan is the only xN cost."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    ).agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("event_date")
    idx = daily.select(
        "event_type",
        "event_date",
        F.row_number().over(wo).alias("t"),
        F.sum("c").over(wo).alias("cum"),
        F.sum("c").over(wt).alias("total"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    dev = idx.withColumn(
        "s_scaled",
        F.col("n").cast("decimal(38,0)") * F.col("cum")
        - F.col("t").cast("decimal(38,0)") * F.col("total"),
    )
    peak = dev.withColumn(
        "pk",
        F.row_number().over(wt.orderBy(F.abs(F.col("s_scaled")).desc(), "event_date")),
    ).filter(F.col("pk") == 1)
    return peak.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("event_date").alias("changepoint_date"),
        F.col("t").cast("long").alias("changepoint_t"),
        F.abs(F.col("s_scaled")).cast("long").alias("cusum_peak_scaled"),
        F.when(
            F.col("total") > 0,
            F.round(
                F.abs(F.col("s_scaled")).cast("double")
                / (F.col("n").cast("double") * F.col("total")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("peak_ratio"),
    )


@register(
    "events_mad_anomaly_days",
    """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
med AS (
  -- lower median (discrete): element at rank ceil(n/2) -- stays integer
  SELECT event_type, c AS median_count FROM (
    SELECT event_type, c,
           row_number() OVER (PARTITION BY event_type ORDER BY c, event_date) AS r,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM daily
  ) WHERE r = (n + 1) // 2
),
dv AS (
  SELECT d.event_type, d.event_date, d.c, m.median_count,
         abs(d.c - m.median_count) AS adev
  FROM daily d JOIN med m ON m.event_type = d.event_type
),
mad AS (
  SELECT event_type, adev AS mad_count FROM (
    SELECT event_type, adev,
           row_number() OVER (PARTITION BY event_type ORDER BY adev, event_date) AS r,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dv
  ) WHERE r = (n + 1) // 2
),
flagged AS (
  SELECT dv.event_type, dv.event_date, dv.adev, dv.median_count, md.mad_count,
         -- |c - med| > 3.5 * 1.4826 * MAD via integers: adev*10000 > 51891*MAD
         CASE WHEN dv.adev * 10000 > 51891 * md.mad_count THEN 1 ELSE 0 END AS is_anom
  FROM dv JOIN mad md ON md.event_type = dv.event_type
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(max(median_count) AS BIGINT) AS median_count,
       CAST(max(mad_count) AS BIGINT) AS mad_count,
       CAST(sum(is_anom) AS BIGINT) AS n_anomaly_days,
       CAST(max(adev) AS BIGINT) AS max_abs_dev,
       min(CASE WHEN adev = (SELECT max(f2.adev) FROM flagged f2
                             WHERE f2.event_type = flagged.event_type)
                THEN event_date END) AS worst_date
FROM flagged
GROUP BY 1
""",
)
def events_mad_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly-day detector per event type: lower-median and MAD of
    the daily-count series (exact discrete order statistics at rank
    ceil(n/2) — integers end to end, no interpolation convention to
    diverge on), flagging days where |c - med| > 3.5 x 1.4826 x MAD via
    the integer inequality adev x 10000 > 51891 x MAD. Reports the count
    of anomalous days and the worst day (earliest date tiebreak).
    Calendar-bounded rank windows after the daily collapse."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    ).agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("event_type")

    def _lower_median(df, val: str, out: str):
        return (
            df.select(
                "event_type",
                F.col(val),
                F.row_number().over(wt.orderBy(val, "event_date")).alias("r"),
                F.count(F.lit(1)).over(wt).alias("n"),
            )
            .filter(F.col("r") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col(val).alias(out))
        )

    med = _lower_median(daily, "c", "median_count")
    dv = daily.join(med, "event_type").select(
        "event_type",
        "event_date",
        "c",
        "median_count",
        F.abs(F.col("c") - F.col("median_count")).alias("adev"),
    )
    mad = _lower_median(dv, "adev", "mad_count")
    flagged = dv.join(mad, "event_type").withColumn(
        "is_anom",
        (F.col("adev") * 10000 > 51891 * F.col("mad_count")).cast("int"),
    )
    worst = flagged.withColumn(
        "wr", F.row_number().over(wt.orderBy(F.col("adev").desc(), "event_date"))
    ).filter(F.col("wr") == 1).select(
        "event_type", F.col("event_date").alias("worst_date")
    )
    agg = flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("median_count").cast("long").alias("median_count"),
        F.max("mad_count").cast("long").alias("mad_count"),
        F.sum("is_anom").cast("long").alias("n_anomaly_days"),
        F.max("adev").cast("long").alias("max_abs_dev"),
    )
    return agg.join(worst, "event_type").select(
        "event_type",
        "n_days",
        "median_count",
        "mad_count",
        "n_anomaly_days",
        "max_abs_dev",
        "worst_date",
    )


@register(
    "orders_kaplan_meier",
    """
WITH f AS (SELECT l_orderkey, min(l_shipdate) AS first_ship FROM lineitem GROUP BY 1),
cut AS (SELECT max(l_shipdate) AS mx FROM lineitem),
pts AS (
  SELECT CASE WHEN f.first_ship IS NOT NULL
              THEN date_diff('day', o.o_orderdate, f.first_ship)
              ELSE greatest(0, date_diff('day', o.o_orderdate, (SELECT mx FROM cut))) END
           AS duration_days,
         (f.first_ship IS NOT NULL) AS is_event
  FROM orders o LEFT JOIN f ON f.l_orderkey = o.o_orderkey
),
hist AS (
  SELECT duration_days,
         sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS d,
         sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS c
  FROM pts WHERE duration_days >= 0 GROUP BY 1
),
tot AS (SELECT sum(d + c) AS t FROM hist),
risk AS (
  SELECT duration_days, d, c,
         (SELECT t FROM tot)
           - sum(d + c) OVER (ORDER BY duration_days ROWS UNBOUNDED PRECEDING)
           + d + c AS n_risk
  FROM hist
),
step AS (
  -- per-step -ln(1 - d/n) on exact integers, half-up quantized to integer
  -- MICRO-nats BEFORE the cumulative sum (same discipline as the ppm
  -- hazards in orders_nelson_aalen: no float accumulation, order-free)
  SELECT duration_days, d, c, n_risk,
         CASE WHEN d = 0 THEN 0
              WHEN d >= n_risk THEN NULL
              ELSE CAST(floor(ln(CAST(n_risk AS DOUBLE) / (n_risk - d)) * 1000000 + 0.5)
                        AS BIGINT) END AS step_micro
  FROM risk
),
cum AS (
  SELECT duration_days, d, c, n_risk, step_micro,
         sum(step_micro) OVER (ORDER BY duration_days ROWS UNBOUNDED PRECEDING)
           AS cum_micro
  FROM step WHERE step_micro IS NOT NULL
)
SELECT CAST(duration_days AS BIGINT) AS duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(c AS BIGINT) AS n_censored,
       CAST(cum_micro AS BIGINT) AS cum_neg_ln_micro,
       round(exp(-(cum_micro / 1000000.0)), 6) AS km_survival
FROM cum
""",
)
def orders_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival for order fulfilment (event =
    first lineitem shipped; right-censored at the observation horizon —
    IDENTICAL risk-set construction to `orders_nelson_aalen`, its
    cumulative-hazard sibling). The product Π(1 - d/n) is carried as a
    SUM of per-step -ln(1 - d/n) values half-up-quantized to integer
    micro-nats BEFORE accumulating — the same no-float-accumulation
    discipline as the ppm hazards (each step's ln runs on exact integers,
    so both engines quantize identically; the cumulative sum is then an
    order-free integer). Plateau levels where everyone at risk dies
    (d = n) are excluded (survival 0, ln undefined) — the standard KM
    convention for a terminal drop. Running sums ride the two-phase
    distributed prefix sum (operators/sweep.py) over the duration
    histogram - no global single-partition window touches row-scaled
    data (the de-weak rule, same as nelson_aalen)."""
    from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    f = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    cut = li.agg(F.max("l_shipdate").alias("mx"))
    pts = (
        o.join(f, o["o_orderkey"] == f["l_orderkey"], "left")
        .crossJoin(F.broadcast(cut))
        .select(
            F.when(
                F.col("first_ship").isNotNull(),
                F.datediff(F.col("first_ship"), F.col("o_orderdate")),
            )
            .otherwise(
                F.greatest(F.lit(0), F.datediff(F.col("mx"), F.col("o_orderdate")))
            )
            .alias("duration_days"),
            F.col("first_ship").isNotNull().alias("is_event"),
        )
        .filter(F.col("duration_days") >= 0)
    )
    hist = pts.groupBy("duration_days").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("is_event"), 0).otherwise(1)).alias("c"),
    )
    tot = hist.agg(F.sum(F.col("d") + F.col("c")).alias("t"))
    risk = (
        value_ordered_running_sum(
            hist,
            order_col="duration_days",
            tie_cols=[],
            value_col=F.col("d") + F.col("c"),
            out_col="cum_le",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("n_risk", F.col("t") - F.col("cum_le") + F.col("d") + F.col("c"))
    )
    step = risk.withColumn(
        "step_micro",
        F.when(F.col("d") == 0, F.lit(0)).when(
            F.col("d") < F.col("n_risk"),
            F.floor(
                F.log(F.col("n_risk").cast("double") / (F.col("n_risk") - F.col("d")))
                * 1000000
                + 0.5
            ).cast("long"),
        ),
    ).filter(F.col("step_micro").isNotNull())
    cum = value_ordered_running_sum(
        step,
        order_col="duration_days",
        tie_cols=[],
        value_col=F.col("step_micro"),
        out_col="cum_micro",
    )
    return cum.select(
        F.col("duration_days").cast("long").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        F.col("cum_micro").cast("long").alias("cum_neg_ln_micro"),
        F.round(F.exp(-(F.col("cum_micro") / 1000000.0)), 6).alias("km_survival"),
    )


# ---------------------------------------------------------------------------
# Minimum spanning forest (Borůvka) over the nation latency graph
# ---------------------------------------------------------------------------

_MSF_ROUNDS = 5  # components at least halve per round: covers 25 nodes (2^5)


def _msf_round_ctes(k: int) -> str:
    """One unrolled Borůvka round: crossing edges under the previous round's
    component labels → per-component minimum under the (w, a, b) total order
    → distinct winners appended to the forest → fresh labels via recursive-CTE
    reachability (the ``dedup_clusters`` oracle pattern — exact connected
    components, mirroring the operator's min-label fixpoint result)."""
    prev_c = "c0" if k == 1 else f"c{k - 1}"
    base = f"""
cand{k} AS (
  SELECT comp, a, b, w,
         row_number() OVER (PARTITION BY comp ORDER BY w, a, b) AS rn
  FROM (
    SELECT ca.comp AS comp, e.a, e.b, e.w
    FROM edges e JOIN {prev_c} ca ON ca.node = e.a JOIN {prev_c} cb ON cb.node = e.b
    WHERE ca.comp <> cb.comp
    UNION ALL
    SELECT cb.comp AS comp, e.a, e.b, e.w
    FROM edges e JOIN {prev_c} ca ON ca.node = e.a JOIN {prev_c} cb ON cb.node = e.b
    WHERE ca.comp <> cb.comp
  )
),
add{k} AS (SELECT DISTINCT a, b, w FROM cand{k} WHERE rn = 1),
f{k} AS MATERIALIZED (
  {f"SELECT a, b, w, CAST({k} AS BIGINT) AS r FROM add{k}" if k == 1 else
   f"SELECT a, b, w, r FROM f{k - 1} UNION ALL SELECT a, b, w, CAST({k} AS BIGINT) FROM add{k}"}
)"""
    if k == _MSF_ROUNDS:
        return base
    return base + f""",
fs{k} AS (SELECT a AS na, b AS nb FROM f{k} UNION ALL SELECT b, a FROM f{k}),
r{k}(src, dst) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.src, e.nb FROM r{k} r JOIN fs{k} e ON r.dst = e.na
),
c{k} AS MATERIALIZED (SELECT src AS node, min(dst) AS comp FROM r{k} GROUP BY 1)"""


_SQL_NATION_MSF = (
    f"""
WITH RECURSIVE latency AS (
  SELECT least(c.c_nationkey, s.s_nationkey) AS a,
         greatest(c.c_nationkey, s.s_nationkey) AS b,
         greatest(0, date_diff('day', o.o_orderdate, l.l_shipdate)) AS days
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
edges AS MATERIALIZED (
  SELECT a, b, CAST((CAST(sum(days) AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS w
  FROM latency GROUP BY 1, 2
),
nodes AS (SELECT a AS node FROM edges UNION SELECT b FROM edges),
c0 AS (SELECT node, node AS comp FROM nodes),
{','.join(_msf_round_ctes(k) for k in range(1, _MSF_ROUNDS + 1))}
SELECT CAST(a AS BIGINT) AS nation_a, CAST(b AS BIGINT) AS nation_b,
       w AS mean_latency_micro_days, r AS round_added
FROM f{_MSF_ROUNDS}
"""
)


@register("nations_boruvka_msf", _SQL_NATION_MSF)
def nations_boruvka_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the undirected nation-to-nation supply
    graph (edge weight = MEAN observed order→ship latency in exact integer
    micro-days), via Borůvka rounds — the shuffle-parallel MST algorithm
    (``operators/graph.py::boruvka_msf``): every component elects its
    minimum crossing edge under the (w, a, b) TOTAL order simultaneously,
    components at least halve per round, O(log n) rounds — vs. Kruskal /
    Prim whose sequential edge admission cannot be bounded in shuffles.
    The total tie-break order makes the MSF unique, so the result is
    deterministic under any parallelism and the oracle can unroll the
    IDENTICAL trajectory: 5 rounds of per-component window minima with
    component labels recomputed by recursive-CTE reachability (exactly the
    min-reachable-label the operator's fixpoint produces). Rounds past
    convergence are idempotent (no crossing edges remain); the fixture
    graphs converge in 2. Edge extraction is the bounded 4-way FK join
    aggregated onto the ≤ n² nation grid (mean in truncating integer
    micro-units — HUGEINT/decimal(38,0) widened BEFORE the multiply); the
    round loop only ever shuffles the ≤ 625-row edge table and a ≤ n−1-row
    forest. round_added is part of the contract — it pins the whole
    trajectory cross-engine, not just the final edge set. Reference
    analog: none (beyond-reference graph op)."""
    from mobsos_event_log_generator_spark.operators.graph import boruvka_msf

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
            F.greatest(F.lit(0), F.datediff("l_shipdate", "o_orderdate")).alias("days"),
        )
        .groupBy("a", "b")
        .agg(
            F.expr(
                "CAST((CAST(sum(days) AS DECIMAL(38,0)) * 1000000) div count(*) AS BIGINT)"
            ).alias("w")
        )
    )
    msf = boruvka_msf(edges, src="a", dst="b", weight="w", rounds=_MSF_ROUNDS)
    return msf.select(
        F.col("a").cast("long").alias("nation_a"),
        F.col("b").cast("long").alias("nation_b"),
        F.col("w").alias("mean_latency_micro_days"),
        F.col("round_added"),
    )


# ---------------------------------------------------------------------------
# Rank-1 ALS matrix factorization (customer × part implicit ratings)
# ---------------------------------------------------------------------------

_SQL_ALS_RANK1 = """
WITH ratings AS MATERIALIZED (
  SELECT o.o_custkey AS c, l.l_partkey AS p,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS r
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
u1 AS MATERIALIZED (
  SELECT c, (CAST(sum(r) AS HUGEINT) * 1000000) // count(*) AS u
  FROM ratings GROUP BY 1
),
v1 AS MATERIALIZED (
  SELECT p, (sum(CAST(r AS HUGEINT) * u.u) * 1000000000000)
             // greatest(sum(CAST(u.u AS HUGEINT) * u.u), 1) AS v
  FROM ratings t JOIN u1 u ON u.c = t.c GROUP BY 1
),
u2 AS MATERIALIZED (
  SELECT t.c, (sum(CAST(r AS HUGEINT) * v.v) * 1000000000000)
              // greatest(sum(CAST(v.v AS HUGEINT) * v.v), 1) AS u
  FROM ratings t JOIN v1 v ON v.p = t.p GROUP BY 1
),
v2 AS (
  SELECT p, CAST(count(*) AS BIGINT) AS n_raters,
         CAST((sum(CAST(r AS HUGEINT) * u.u) * 1000000000000)
              // greatest(sum(CAST(u.u AS HUGEINT) * u.u), 1) AS BIGINT) AS v
  FROM ratings t JOIN u2 u ON u.c = t.c GROUP BY 1
)
SELECT p AS part, n_raters, v AS factor_micro
FROM v2 ORDER BY v DESC, p LIMIT 20
"""


@register("lineitem_als_rank1", _SQL_ALS_RANK1)
def lineitem_als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 ALS matrix factorization over the implicit customer × part
    rating matrix (rating = total quantity purchased): r ≈ u_c · v_p, solved
    by TWO full alternations of the closed-form least-squares half-steps
    u_c ← Σ_p r·v / Σ_p v², v_p ← Σ_c r·u / Σ_c u² over the OBSERVED entries
    — the alternating-least-squares recommender primitive (the registry's
    item-kNN is the neighborhood method; this is the latent-factor one).
    Each half-step is one equi-join of the ratings table against the
    just-solved factor side + one hash aggregate — the same shuffle shape
    per step at any scale, no iteration-count dependence on data size.
    EXACT cross-engine arithmetic: factors live on the 1e-6 grid via
    truncating integer division (Spark `div` ≡ DuckDB `//`); every
    accumulator widens the OPERAND to decimal(38,0)/HUGEINT before the
    multiply (v₁ ≥ 400 micro > 0 on any input with r ≥ 1, but the
    greatest(·,1) guard stays per the divide-guard rule). With v⁰ = 1 the
    first half-step is exactly the per-customer mean rating — unit-pinned.
    Top-20 parts by the converged factor via orderBy+limit
    (TakeOrderedAndProject — per-partition top-k, no global sort, no rank
    window). Reference analog: none (beyond-reference ML op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ratings = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("r"))
    )
    u1 = ratings.groupBy("c").agg(
        F.expr("(CAST(sum(r) AS DECIMAL(38,0)) * 1000000) div count(*)").alias("u")
    )
    half = "(sum(CAST(r AS DECIMAL(38,0)) * {f}) * 1000000000000) div greatest(sum(CAST({f} AS DECIMAL(38,0)) * {f}), 1)"
    v1 = (
        ratings.join(u1, "c")
        .groupBy("p")
        .agg(F.expr(half.format(f="u")).alias("v"))
    )
    u2 = (
        ratings.join(v1, "p")
        .groupBy("c")
        .agg(F.expr(half.format(f="v")).alias("u"))
    )
    v2 = (
        ratings.join(u2, "c")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raters"),
            F.expr(half.format(f="u")).cast("long").alias("v"),
        )
    )
    return (
        v2.orderBy(F.col("v").desc(), "p")
        .limit(20)
        .select(F.col("p").alias("part"), "n_raters", F.col("v").alias("factor_micro"))
    )


# ---------------------------------------------------------------------------
# Coarsened Exact Matching (CEM) average treatment effect on the treated
# ---------------------------------------------------------------------------

_SQL_CEM_ATT = """
WITH obs AS MATERIALIZED (
  SELECT o.o_orderpriority AS pri,
         CAST((CAST(floor(l.l_quantity) AS BIGINT) - 1) // 10 AS BIGINT) AS qty_bin,
         CAST(month(o.o_orderdate) AS BIGINT) AS omonth,
         CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS treated,
         CAST(greatest(0, date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS y
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
strata AS MATERIALIZED (
  SELECT pri, qty_bin, omonth,
         sum(treated) AS n_t, count(*) - sum(treated) AS n_c,
         sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS y_t,
         sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS y_c
  FROM obs GROUP BY 1, 2, 3
),
matched AS MATERIALIZED (
  SELECT pri, qty_bin, omonth, n_t, n_c,
         (CAST(y_t AS HUGEINT) * 1000000) // n_t
           - (CAST(y_c AS HUGEINT) * 1000000) // n_c AS diff_micro
  FROM strata WHERE n_t > 0 AND n_c > 0
)
SELECT pri, qty_bin, omonth,
       CAST(n_t AS BIGINT) AS n_treated, CAST(n_c AS BIGINT) AS n_control,
       CAST(diff_micro AS BIGINT) AS effect_micro_days
FROM matched
UNION ALL
SELECT 'ALL', -1, -1, CAST(sum(n_t) AS BIGINT), CAST(sum(n_c) AS BIGINT),
       CAST(sum(CAST(n_t AS HUGEINT) * diff_micro) // sum(n_t) AS BIGINT)
FROM matched
"""


@register("lineitem_cem_att", _SQL_CEM_ATT)
def lineitem_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened Exact Matching (Iacus/King/Porro) — the matching member of
    the causal-inference family (CUPED, diff-in-diff and regression
    discontinuity are the registry's adjustment members; CEM is the design
    member): does a deep discount (l_discount ≥ 0.05) change shipping
    latency? Covariates are COARSENED onto a bounded grid (order priority ×
    quantity decile-bin × order month — ≤ 300 strata at any corpus size),
    treated and control units match exactly within a stratum, unmatched
    strata are pruned, and the ATT is the treated-weighted mean of
    per-stratum outcome differences. ONE hash aggregate over the fact join
    computes every stratum's four accumulators (conditional sums — no
    per-arm scans); the stratum grid is bounded, so the final ATT fold is
    a ≤ 300-row aggregate. All arithmetic is exact integers: per-stratum
    mean differences on the 1e-6 grid via truncating div (widened operand,
    never the product), ATT as the n_t-weighted integer fold. Output =
    the per-stratum matched table + one 'ALL' summary row carrying the
    ATT in micro-days. Reference analog: none (beyond-reference causal
    op)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    obs = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("pri"),
        # floor() in BOTH engines: DuckDB's decimal->int CAST rounds while
        # Spark's truncates, so a bare CAST silently relies on l_quantity
        # being integral; floor-then-cast is identical cross-engine for any
        # (non-negative) quantity.
        F.expr("CAST((CAST(floor(l_quantity) AS BIGINT) - 1) div 10 AS BIGINT)").alias("qty_bin"),
        F.month("o_orderdate").cast("long").alias("omonth"),
        F.when(F.col("l_discount") >= 0.05, F.lit(1)).otherwise(F.lit(0)).alias("treated"),
        F.greatest(F.lit(0), F.datediff("l_shipdate", "o_orderdate")).cast("long").alias("y"),
    )
    strata = obs.groupBy("pri", "qty_bin", "omonth").agg(
        F.sum("treated").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("treated")).alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(F.lit(0))).alias("y_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(F.lit(0))).alias("y_c"),
    )
    matched = strata.filter((F.col("n_t") > 0) & (F.col("n_c") > 0)).withColumn(
        "diff_micro",
        F.expr(
            "(CAST(y_t AS DECIMAL(38,0)) * 1000000) div n_t"
            " - (CAST(y_c AS DECIMAL(38,0)) * 1000000) div n_c"
        ),
    )
    per_stratum = matched.select(
        "pri",
        "qty_bin",
        "omonth",
        F.col("n_t").cast("long").alias("n_treated"),
        F.col("n_c").cast("long").alias("n_control"),
        F.col("diff_micro").cast("long").alias("effect_micro_days"),
    )
    total = matched.agg(
        F.sum("n_t").cast("long").alias("n_treated"),
        F.sum("n_c").cast("long").alias("n_control"),
        F.expr(
            "CAST(sum(CAST(n_t AS DECIMAL(38,0)) * diff_micro) div sum(n_t) AS BIGINT)"
        ).alias("effect_micro_days"),
    ).select(
        F.lit("ALL").alias("pri"),
        F.lit(-1).cast("long").alias("qty_bin"),
        F.lit(-1).cast("long").alias("omonth"),
        "n_treated",
        "n_control",
        "effect_micro_days",
    )
    return per_stratum.unionByName(total)
