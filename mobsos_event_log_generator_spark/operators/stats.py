"""Distribution-drift and trend statistics, in exact integer arithmetic.

Feature-distribution monitoring at corpus scale needs two primitives:

* ``ks_statistic`` — the two-sample Kolmogorov–Smirnov distance
  D = max_v |F1(v) − F2(v)|. Multiplying through by n1·n2 makes it exact:
  D_num = max_v |n1·c2(v) − n2·c1(v)| over observed values v, with c_i the
  inclusive cumulative counts. No float CDF ever materializes (the
  cross-multiplied-rationals trick from the weekly-drift operator), so the
  result is bit-identical on any engine.

* ``group_trend_slopes`` — per-group OLS slope over integer (x, y) points.
  slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²): both numerator and
  denominator are exact integer aggregates, reported as a reduced-form pair
  plus a ppm quotient — trend DIRECTION and magnitude with no float sums.

Scale shape: the KS cumulative counts are the canonical distributed prefix
sum — per-value count aggregation (one shuffle, map-side combined), then
the two-phase bucket cumsum from operators/sweep.py (never a partition-less
window over the value domain). The trend slopes are one groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators.sweep import value_ordered_running_sum


def ks_statistic(
    df1: DataFrame,
    df2: DataFrame,
    value_col: str,
    num_buckets: int = 32,
    checkpoint_histogram: bool = False,
) -> DataFrame:
    """Exact two-sample KS distance. Returns one row:
    (n1, n2, ks_num, ks_ppm) where ks_num = max|n1·c2 − n2·c1| and
    ks_ppm = ks_num·10⁶ div (n1·n2). Nulls are dropped (no CDF position).

    Accumulator growth order (r8 audit): n² for the cross-multiplied gap,
    n²·10⁶ for the ppm numerator — both run in decimal(38,0) (long-form
    math overflowed int64 at ~3·10⁶ rows per sample). ks_num's bigint
    OUTPUT is the documented range bound: exact to ~3·10⁹ rows per sample.

    The ``per_value`` histogram lineage is consumed up to ~4x (the driver
    ``first()`` for bounds/sizes plus the two-phase cumsum's two passes);
    operators are persist-free by rule, so by default those are recomputes
    OF THE HISTOGRAM — bounded by the distinct-value count, never re-scans
    of the raw inputs beyond the first aggregation's own shuffle files,
    which Spark reuses across the jobs. For a very expensive upstream
    lineage (e.g. the histogram built over a join), pass
    ``checkpoint_histogram=True`` to cut it once via an eager
    localCheckpoint (the graph.py iteration pattern)."""
    s1 = df1.select(F.col(value_col).alias("v")).filter(F.col("v").isNotNull())
    s2 = df2.select(F.col(value_col).alias("v")).filter(F.col("v").isNotNull())
    tagged = s1.withColumn("__s", F.lit(1)).unionByName(s2.withColumn("__s", F.lit(2)))
    per_value = tagged.groupBy("v").agg(
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("__s") == 2, 1).otherwise(0)).alias("d2"),
    )
    if checkpoint_histogram:
        per_value = per_value.localCheckpoint()
    # ONE driver action supplies the sample sizes AND the shared bucket
    # bounds for both cumsums (three separate actions cost ~3 job rounds;
    # measured 3.1 s -> ~2 s warm at sf0.1 when folded).
    probs = [i / num_buckets for i in range(1, num_buckets)]
    row = per_value.agg(
        F.percentile_approx(F.col("v").cast("double"), F.lit(probs), F.lit(10_000)).alias("b"),
        F.sum("d1").alias("n1"),
        F.sum("d2").alias("n2"),
    ).first()
    bounds = list(row["b"] or [])
    n1c, n2c = int(row["n1"] or 0), int(row["n2"] or 0)
    c1 = value_ordered_running_sum(
        per_value, "v", [], F.col("d1").cast("long"), out_col="c1", bounds=bounds
    )
    both = value_ordered_running_sum(
        c1, "v", [], F.col("d2").cast("long"), out_col="c2", bounds=bounds
    )
    # Accumulator growth order: the cross-multiplied gap is n1*c2 - n2*c1
    # ~ n^2, and the ppm step multiplies by 1e6 on top — in int64 that
    # overflows at n1*n2*1e6 > 2^63, i.e. ~3e6 rows PER SAMPLE (the r7
    # find-#5 class, invisible at fixture SFs). Both steps therefore run
    # in decimal(38,0) (headroom ~1e16 rows per sample); only the final
    # ppm (<= 1e6 by construction) and ks_num narrow back to bigint —
    # ks_num itself fits int64 up to ~3e9 rows per sample, stated here as
    # the operator's documented range.
    dec = "decimal(38,0)"
    gap = F.abs(
        F.lit(n1c).cast(dec) * F.col("c2").cast(dec)
        - F.lit(n2c).cast(dec) * F.col("c1").cast(dec)
    )
    return both.agg(F.max(gap).alias("ks_num")).select(
        F.lit(n1c).cast("long").alias("n1"),
        F.lit(n2c).cast("long").alias("n2"),
        F.col("ks_num").cast("long").alias("ks_num"),
        F.expr(
            f"(ks_num * CAST(1000000 AS {dec})) div "
            f"(CAST({n1c} AS {dec}) * CAST({n2c} AS {dec}))"
        )
        .cast("long")
        .alias("ks_ppm"),
    )


def group_trend_slopes(
    df: DataFrame,
    group_cols: list[str],
    x_col: str | Column,
    y_col: str | Column,
) -> DataFrame:
    """Per-group OLS slope over integer points, exact: returns the raw
    rational (slope_num, slope_den) plus slope_ppm = num·10⁶ div den.
    Groups with < 2 distinct x (den = 0) report NULL ppm.

    Accumulator growth order (r8 audit): n²·x·y for the co-moments (long
    arithmetic): int64 to ~3e9 rows per group at day-index x and count-
    magnitude y — the intended grain (daily series per type). For raw
    row-level y at larger groups, pre-aggregate or widen to decimal as
    ks_statistic does."""
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("long")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    base = agg.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
    )
    return base.withColumn(
        "slope_ppm",
        F.when(
            F.col("slope_den") != 0, F.expr("(slope_num * 1000000L) div slope_den")
        ).cast("long"),
    )


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    side_col: str,
    group_cols: list[str] | None = None,
    num_buckets: int = 32,
) -> DataFrame:
    """Exact two-sample Mann–Whitney U (Wilcoxon rank-sum) per group.

    ``side_col`` tags each row 1 (sample A) or 2 (sample B); nulls in
    ``value_col`` are dropped. All rank arithmetic is exact integer via the
    DOUBLED-rank trick: for a tie group of ``t`` equal values preceded by
    ``cumc`` smaller ones, the average rank is ``cumc + (t+1)/2``, so its
    double ``2·cumc + t + 1`` is an integer — doubled rank sums, the
    doubled statistic ``u2 = 2·U_A = R_A·2 − n1·(n1+1)``, and the tie
    correction ``Σ(t³−t)`` are all integers, bit-identical on any engine.
    The normal-approximation z (the only float) divides exact integers:
    z = ((u2 − n1·n2)/2) / sqrt(n1·n2·((n+1) − T/(n·(n−1)))/12), 6 dp,
    NULL when either sample is empty or the tie-corrected variance is 0.

    Scale shape: one (group, value) histogram aggregation (map-side
    combined), the grouped two-phase prefix sum from operators/sweep.py
    (never a partition-less window), then one bounded per-group aggregate.
    Internal sums accumulate in decimal(38,0): doubled rank sums grow as
    n², past int64 around n ≈ 3·10⁹ rows per group — the OUTPUT cast to
    bigint is fixture-safe but would need widening at that size.
    """
    gcols = list(group_cols or [])
    s = df.filter(F.col(value_col).isNotNull()).select(
        *gcols, F.col(value_col).alias("v"), F.col(side_col).alias("__s")
    )
    g = s.groupBy(*gcols, "v").agg(
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("__s") == 2, 1).otherwise(0)).cast("long").alias("b"),
    )
    c = value_ordered_running_sum(
        g,
        "v",
        [],
        (F.col("a") + F.col("b")),
        out_col="ct",
        num_buckets=num_buckets,
        group_cols=gcols,
    ).withColumn("t", F.col("a") + F.col("b"))
    dec = "decimal(38,0)"
    agg = c.groupBy(*gcols).agg(
        F.sum("a").cast("long").alias("n1"),
        F.sum("b").cast("long").alias("n2"),
        F.sum(
            (F.col("a") * (F.lit(2) * F.col("ct") - F.col("t") + F.lit(1))).cast(dec)
        ).alias("__r1x2"),
        F.sum(
            (F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast(dec)
        ).alias("__tie"),
    )
    out = agg.select(
        *gcols,
        "n1",
        "n2",
        (
            F.col("__r1x2") - (F.col("n1").cast(dec) * (F.col("n1") + 1).cast(dec))
        )
        .cast("long")
        .alias("u2_before"),
        F.col("__tie").cast("long").alias("tie_term"),
    )
    return out.withColumn(
        "z_approx",
        F.expr(
            "CASE WHEN n1 > 0 AND n2 > 0 AND "
            "CAST(n1 + n2 + 1 AS DOUBLE) - CAST(tie_term AS DOUBLE) / "
            "(CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)) > 0 "
            "THEN round((CAST(u2_before - n1 * n2 AS DOUBLE) / 2.0) / "
            "sqrt(CAST(n1 * n2 AS DOUBLE) * (CAST(n1 + n2 + 1 AS DOUBLE) - "
            "CAST(tie_term AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * "
            "CAST(n1 + n2 - 1 AS DOUBLE))) / 12.0), 6) END"
        ),
    )
