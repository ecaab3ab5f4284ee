"""Exact cross-engine arithmetic for rounded aggregates of fixed-precision data.

``round(avg(double), p)`` is a latent dies-at-scale parity bug whenever the
input is FIXED-PRECISION (money with 2 decimals, integer quantities, integer
microsecond durations): the true mean is then a small-denominator rational
that lands EXACTLY on a p-dp rounding midpoint with non-negligible
probability, and at a midpoint the one-ulp difference between Spark's
partial-merge float sum and DuckDB's sequential sum decides the rounded
digit. sf0.1 already produced such a flip in the gap-fill hourly means
(58.47375 → 58.4737 vs 58.4738); more groups at larger SFs mean more dice
rolls. Full-precision inputs (embeddings, idf weights) are NOT at risk —
their true aggregates sit on midpoints with measure zero — so they keep the
plain float contract.

The exact form: quantize each value to integer units via a DECIMAL cast
(deterministic per row on both engines), sum as integers, and round the mean
with half-up INTEGER division — a pure function of the row multiset,
independent of summation order. The DuckDB mirror is the same expression
with ``//``. Contract: non-negative sums (all call sites are money /
quantities / durations / metric values >= 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_units(col: Column, scale: int = 6) -> Column:
    """``col`` quantized to integer 10^-scale units (exact for inputs with
    <= ``scale`` decimals; deterministic for all doubles). DECIMAL(18,scale)
    bounds the integer part at 10^(18-scale) — ample for money/metrics,
    NOT for epoch-scale microsecond magnitudes (pass those in as longs)."""
    return (col.cast(f"decimal(18,{scale})") * F.lit(10**scale)).cast("long")


def mean_round(sum_units: Column, count_col: Column, out_dp: int, in_scale: int = 6) -> Column:
    """Half-up mean of an integer-unit sum, rounded to ``out_dp`` decimals,
    as DOUBLE — exact: with a = sum in 10^-in_scale units and d = count,
    round(a / (d·10^in_scale), out_dp) computed by half-up integer division
    on the reduced fraction. All arithmetic runs in DECIMAL(38,0), so
    epoch-scale sums times 10^4 cannot overflow, and the quotient is
    integer-valued so no result-scale rounding can occur; the final double
    division is exact (quotient < 2^53). NULL-propagates like avg."""
    a = sum_units.cast("decimal(38,0)")
    d = count_col.cast("decimal(38,0)")
    if in_scale >= out_dp:
        f = 10 ** (in_scale - out_dp)
        num, den = a * F.lit(2) + d * F.lit(f), d * F.lit(2 * f)
    else:
        s = 10 ** (out_dp - in_scale)
        num, den = a * F.lit(2 * s) + d, d * F.lit(2)
    q = ((num - num % den) / den).cast("long")
    return q.cast("double") / F.lit(float(10**out_dp))


def sql_int_units(col: str, scale: int = 6) -> str:
    """DuckDB mirror of ``int_units``."""
    return f"CAST(CAST({col} AS DECIMAL(18,{scale})) * {10**scale} AS BIGINT)"


def sql_mean_round(sum_expr: str, count_expr: str, out_dp: int, in_scale: int = 6) -> str:
    """DuckDB mirror of ``mean_round`` (``//`` floor division; HUGEINT
    intermediates make overflow a non-issue there)."""
    if in_scale >= out_dp:
        f = 10 ** (in_scale - out_dp)
        return (
            f"(CAST((2 * ({sum_expr}) + ({count_expr}) * {f}) "
            f"// ({2 * f} * ({count_expr})) AS DOUBLE) / {float(10**out_dp)})"
        )
    s = 10 ** (out_dp - in_scale)
    return (
        f"(CAST(({2 * s} * ({sum_expr}) + ({count_expr})) "
        f"// (2 * ({count_expr})) AS DOUBLE) / {float(10**out_dp)})"
    )
