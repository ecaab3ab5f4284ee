"""Distributed sweep-line: global running aggregates without a global sort.

A naive global running sum is ``Window.orderBy(ts)`` with no partition key —
Spark executes that as a SINGLE partition holding the entire input, which is
the canonical 100-TB scale-killer. The two-phase shape here is the standard
distributed prefix-sum:

1. bucket rows by a fixed time grain and cumsum WITHIN each bucket (parallel
   across buckets, one shuffle);
2. cumsum the per-bucket totals (one row per bucket — days/hours, thousands of
   rows at any corpus size, so the single-partition window there is O(buckets)
   not O(rows)) and add each bucket's predecessor-offset back via an equi-join
   (broadcast: the offsets table is tiny).

The result equals the single-sort running sum exactly, for any total order
(ts, *tie_cols) that refines the bucket order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_running_sum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    tie_cols: list[str],
    out_col: str = "running",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Inclusive global running sum of ``value_col`` over the total order
    (``ts_col``, ``*tie_cols``). Adds ``out_col`` and keeps all input columns.
    ``tie_cols`` must make the order total or the result is nondeterministic.
    """
    bucket_us = bucket_seconds * 1_000_000
    bucketed = df.withColumn("__bucket", F.expr(f"unix_micros(`{ts_col}`) div {bucket_us}"))
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(ts_col), *[F.col(c) for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn("__within", F.sum(value_col).over(w_in))
    totals = bucketed.groupBy("__bucket").agg(F.sum(value_col).alias("__total"))
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket", F.coalesce(F.sum("__total").over(w_b), F.lit(0)).alias("__offset")
    )
    out = within.join(F.broadcast(offsets), "__bucket").withColumn(
        out_col, F.col("__offset") + F.col("__within")
    )
    return out.drop("__bucket", "__within", "__offset")


def value_ordered_running_sum(
    df: DataFrame,
    order_col: str,
    tie_cols: list[str],
    value_col: Column,
    out_col: str = "running",
    descending: bool = False,
    bounds: list[float] | None = None,
    num_buckets: int = 32,
    accuracy: int = 10_000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Inclusive global running sum over the total order (``order_col``
    ASC|DESC, ``*tie_cols`` ASC) — the time-grain-free sibling of
    ``global_running_sum`` for orderings over VALUE domains (revenue ranks,
    score quantiles), where a ``Window.orderBy`` with no partition key would
    drag the whole input through one partition.

    Buckets come from approximate quantiles of ``order_col``. ANY boundary
    choice is correct — bucketing only needs monotonicity w.r.t. the sort
    direction (ties on ``order_col`` always share a bucket, so the in-bucket
    tie order stays intact); the quantiles merely keep buckets balanced. The
    bucket id is built from chained codegen'd conditional sums (≤31 literal
    comparisons, no HOF), the in-bucket cumsum runs in parallel across
    buckets, and per-bucket offsets (``num_buckets`` rows) come back via a
    broadcast join. Exact for associative sums (longs, decimals).

    Pass precomputed ``bounds`` to skip the quantile probe action — callers
    that need several orderings batch all probes into one aggregate pass.
    ``order_col`` must be non-null (null comparisons would null the bucket).

    ``group_cols`` makes the running sum restart per group (the grouped
    sibling: one cumsum per group, all sharing the global bucket bounds —
    any bounds are CORRECT per the monotonicity argument above, shared
    ones just skip a per-group probe). The offsets table grows to
    groups × buckets rows, so this path is for BOUNDED group alphabets
    (event types, languages, status codes) — an unbounded group key would
    turn the broadcast offsets join into a real shuffle; use a grouped
    window directly if the per-group histogram is small instead.
    """
    v = F.col(order_col).cast("double")
    if bounds is None:
        probs = [i / num_buckets for i in range(1, num_buckets)]
        row = df.agg(
            F.percentile_approx(v, F.lit(probs), F.lit(accuracy)).alias("b")
        ).first()
        bounds = list(row["b"] or [])
    uniq = sorted({float(b) for b in bounds})
    # Count boundaries already passed in sort direction: bucket 0 holds the
    # rows that sort FIRST, so bucket order == global order. Assembled as one
    # parsed SQL expression (the ~31-term chained Column form cost ~150 Py4J
    # round trips per call); boundary literals go through CAST(string AS
    # DOUBLE) so they round-trip bit-exactly (repr -> parseDouble), and the
    # parsed tree is the identical comparison chain.
    cmp_op = "<" if descending else ">"
    vsql = f"CAST(`{order_col}` AS DOUBLE)"
    if uniq:
        bucket: Column = F.expr(
            "0 + "
            + " + ".join(
                f"CAST(({vsql} {cmp_op} CAST('{b!r}' AS DOUBLE)) AS INT)"
                for b in uniq
            )
        )
    else:
        bucket = F.lit(0)
    # Pin the bucket NON-NULLABLE (order_col is non-null by contract, so the
    # coalesce never fires): a nullable offsets-join key makes
    # InferFiltersFromConstraints push isnotnull(<whole chain>) below the
    # Project, re-inlining order_col's DEFINING expression into every one of
    # the ~31 comparisons — lineitem_zorder_layout's 20-term Morton code
    # exploded to 641 inlined shift terms in that filter and blew Janino's
    # 64 KB method limit (r10 bench codegen watch; interpreted fallback =
    # silent 2-7x row cost). Non-nullable key -> no inferred filter -> the
    # chain compiles exactly once, against the materialized attribute.
    bucket = F.coalesce(bucket, F.lit(0))
    gcols = list(group_cols or [])
    bucketed = df.withColumn("__bucket", bucket)
    head = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w_in = (
        Window.partitionBy(*gcols, "__bucket")
        .orderBy(head, *[F.col(c) for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn("__within", F.sum(value_col).over(w_in))
    totals = bucketed.groupBy(*gcols, "__bucket").agg(F.sum(value_col).alias("__total"))
    if gcols:
        w_b = (
            Window.partitionBy(*gcols)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        *gcols, "__bucket", F.coalesce(F.sum("__total").over(w_b), F.lit(0)).alias("__offset")
    )
    out = within.join(F.broadcast(offsets), [*gcols, "__bucket"]).withColumn(
        out_col, F.col("__offset") + F.col("__within")
    )
    return out.drop("__bucket", "__within", "__offset")


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    n_rows: int,
    order_col: str,
    tie_cols: list[str],
    out_col: str,
    descending: bool = False,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Exact SQL ``ntile`` over a total order without a single-partition
    window: the global row number comes from ``value_ordered_running_sum``
    (running count of 1s), and the tile from ntile's quota arithmetic —
    with ``n`` rows and ``k`` tiles, the first ``n % k`` tiles hold
    ``n div k + 1`` rows, the rest ``n div k``. Reproduces tie behavior
    bit-for-bit: like SQL ntile, ties on ``order_col`` are split across
    tiles by the ``tie_cols`` order, which is why the order must be total.

    ``n_rows`` is the exact input count, supplied by the caller so it can be
    batched into the same probe pass as the bucket ``bounds``.
    """
    rn = f"__rn_{out_col}"
    with_rn = value_ordered_running_sum(
        df,
        order_col,
        tie_cols,
        F.lit(1).cast("long"),
        out_col=rn,
        descending=descending,
        bounds=bounds,
    )
    size, extra = divmod(int(n_rows), n_tiles)
    if size == 0:  # fewer rows than tiles: row i is tile i
        tile = F.col(rn)
    else:
        head = extra * (size + 1)
        tile = F.when(
            F.col(rn) <= F.lit(head),
            F.expr(f"(`{rn}` - 1) div {size + 1} + 1"),
        ).otherwise(F.expr(f"{extra} + (`{rn}` - {head} - 1) div {size} + 1"))
    return with_rn.withColumn(out_col, tile.cast("long")).drop(rn)


def interval_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    tie_cols: list[str],
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Change-point concurrency over closed intervals: one output row per
    boundary event with the number of intervals open immediately AFTER it.
    Touching intervals (one ends exactly where another starts) count as
    overlapping: at equal timestamps every +1 (start) is applied before any
    -1 (end). Columns: ``ts``, ``delta``, ``concurrent`` + the tie columns.
    """
    keep = [F.col(c) for c in tie_cols]
    starts = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta"), *keep
    )
    ends = intervals.select(F.col(end_col).alias("ts"), F.lit(-1).alias("delta"), *keep)
    points = starts.unionByName(ends)
    # delta DESC: starts (+1) sort before ends (-1) at the same instant.
    order_ties = ["__delta_order", *tie_cols]
    points = points.withColumn("__delta_order", -F.col("delta"))
    out = global_running_sum(
        points,
        ts_col="ts",
        value_col="delta",
        tie_cols=order_ties,
        out_col="concurrent",
        bucket_seconds=bucket_seconds,
    )
    return out.drop("__delta_order")
