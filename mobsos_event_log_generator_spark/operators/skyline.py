"""Skyline (Pareto frontier) queries — multi-criteria dominance filtering.

A row is on the skyline iff no other row strictly dominates it (at least as
good on every criterion, strictly better on one). The classic formulation is
the quadratic NOT EXISTS self-join — the oracle replays exactly that — but
the operator computes it with dominance tests against PREFIX AGGREGATES, so
nothing quadratic ever runs:

2-D case (minimize x, maximize y), pure JVM and exact:
  * a row is dominated by a strictly-cheaper row  iff  y ≤ M(x), where
    M(x) = max y over all rows with x' < x  (the price is already strictly
    better, so tying on y suffices for dominance);
  * a row is dominated within its own x-group     iff  y < max y of the group.
  So: skyline = rows with  y = groupmax(x)  AND  (M(x) missing OR y > M(x)).

  M is an EXCLUSIVE prefix max over the x-ordered group table. A naive
  ``Window.orderBy(x)`` computes it in one partition holding every distinct
  x — the canonical scale-killer (see operators/sweep.py). Here it is the
  standard two-phase prefix aggregate instead: bucket groups by quantile
  bounds on x, exclusive running max WITHIN each bucket in parallel, then an
  exclusive prefix max over the per-bucket maxima (one row per bucket) joined
  back broadcast. Identical result, no single-partition stage.

d-D case (``skyline_arrow``): local skyline per partition via an Arrow
mapInPandas kernel (each partition's dominated rows die locally — the
surviving set is tiny for realistic dimensionality), then one final merge
pass over the union of survivors. Correct because dominance is transitive
and partition-local elimination never removes a global-skyline row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_buckets: int = 32,
) -> DataFrame:
    """Exact skyline minimizing ``x_col`` and maximizing ``y_col``.
    Returns the input rows (all columns) that no other row strictly
    dominates. Nulls in either criterion are excluded (no dominance order).
    """
    rows = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    groups = rows.groupBy(x_col).agg(F.max(y_col).alias("__gmax"))

    xv = F.col(x_col).cast("double")
    probs = [i / num_buckets for i in range(1, num_buckets)]
    brow = groups.agg(F.percentile_approx(xv, F.lit(probs), F.lit(10_000)).alias("b")).first()
    bounds = sorted({float(b) for b in (brow["b"] or [])})
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (xv > F.lit(b)).cast("int")
    bucketed = groups.withColumn("__bucket", bucket)

    # Exclusive prefix max within the bucket (x is unique per group row, so
    # ROWS framing is the x-order framing).
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = bucketed.withColumn("__within", F.max("__gmax").over(w_in))
    totals = bucketed.groupBy("__bucket").agg(F.max("__gmax").alias("__total"))
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select("__bucket", F.max("__total").over(w_b).alias("__offset"))
    prefixed = within.join(F.broadcast(offsets), "__bucket").select(
        F.col(x_col),
        F.col("__gmax"),
        # greatest() skips nulls: null only when BOTH phases are empty-before.
        F.greatest(F.col("__within"), F.col("__offset")).alias("__before_max"),
    )
    frontier = prefixed.filter(
        F.col("__before_max").isNull() | (F.col("__gmax") > F.col("__before_max"))
    )
    return (
        rows.join(frontier, x_col)
        .filter(F.col(y_col) == F.col("__gmax"))
        .drop("__gmax", "__before_max")
    )


def skyline_arrow(
    df: DataFrame,
    minimize: list[str],
    maximize: list[str],
) -> DataFrame:
    """d-dimensional skyline: per-partition Arrow local skyline, then a final
    single-partition merge over the (small) survivor union. Strict-dominance
    semantics identical to the NOT EXISTS formulation; duplicates of a
    skyline point all survive."""
    import pandas as pd  # noqa: F401 — signals the Arrow path

    cols = list(df.columns)
    mins, maxs = list(minimize), list(maximize)
    rows = df
    for c in mins + maxs:
        rows = rows.filter(F.col(c).isNotNull())

    def local_skyline(batches):
        import numpy as np
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if len(pdf) == 0:
            return
        # canonical orientation: negate maximized dims -> minimize everything
        crit = np.column_stack(
            [pdf[c].to_numpy(dtype="float64") for c in mins]
            + [-pdf[c].to_numpy(dtype="float64") for c in maxs]
        )
        n = len(pdf)
        keep = np.ones(n, dtype=bool)
        # sort by sum as a heuristic: likely dominators come first
        order = np.argsort(crit.sum(axis=1), kind="stable")
        sky: list[int] = []
        for idx in order:
            c = crit[idx]
            dominated = False
            for s in sky:
                d = crit[s]
                if (d <= c).all() and (d < c).any():
                    dominated = True
                    break
            if dominated:
                keep[idx] = False
            else:
                sky.append(idx)
        yield pdf.loc[keep, cols]

    schema = rows.schema
    local = rows.mapInPandas(local_skyline, schema)
    return local.repartition(1).mapInPandas(local_skyline, schema)
