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
    <= ``scale`` decimals; deterministic for all doubles — same floor-trick
    quantization as ``int_units_long``, whose magnitude bound applies);
    epoch-scale microsecond magnitudes should still be passed in as longs
    with in_scale=0.

    Returns DECIMAL(29,0), not LONG: a full-table revenue sum in 10^-6
    units crosses 2^63 around sf1000 (2.3e20 micro-units), and Spark's
    non-ANSI long sum would WRAP silently there — decimal sums widen to
    (38,0) instead. The DuckDB mirror keeps BIGINT per row (sums promote
    to HUGEINT there). Wide-decimal ACCUMULATION costs ~2x a long sum per
    expression (measured sf0.1), so use ``int_units_long`` instead
    wherever the group-sum ceiling provably fits 63 bits at the design
    scale (sf100k ~ 100 TB)."""
    return int_units_long(col, scale).cast("decimal(29,0)")


def int_units_long(col: Column, scale: int = 2) -> Column:
    """Fast-path quantization to LONG integer units via pure double ops:
    floor(x·10^scale + 0.5). EXACT — equal to the half-up DECIMAL cast —
    whenever |x|·10^scale < ~1e15: the relative error of the double
    product (~4·2^-53) stays under the 0.5 floor guard (verified
    bit-identical to the DECIMAL path over sf0.1 lineitem), and it keeps
    the whole expression in codegen'd double/long arithmetic (a DECIMAL
    cast chain here tripled TPC-H q1's runtime). Non-negative inputs per
    the module contract (floor(x+0.5) is half-toward-+inf on negatives).
    Long ACCUMULATION is only for sites whose per-group unit sums
    provably fit 2^63 at sf100k (~100 TB): 2-dp money per bounded key
    (cents ceiling $9.2e16), integer quantities (scale 0), per-key 4-dp
    revenue. Whole-table 4/6-dp sums (TPC-H q1 charge, q6/q14/q19-style
    single-group revenue) must accumulate via ``int_units``."""
    if scale == 0:
        return col.cast("long")
    return F.floor(col * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")


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


def sum_round(sum_units: Column, out_dp: int, in_scale: int = 6) -> Column:
    """Half-up rounded SUM of integer units, as DOUBLE — round(a/10^in, out)
    exactly (``mean_round`` with divisor 1). Money sums are the long-fuse
    version of the mean bug: the true sum sits ON the 2-dp grid, but float
    accumulation error grows ~sqrt(n)·ulp(sum) with scale and crosses the
    0.005 midpoint distance around sf100 — integer-unit sums never drift.
    Product expressions stay exact too: 2dp·2dp(·2dp) inputs have <= 6
    decimals, and the double product is within 1e-13 of that rational, so
    the DECIMAL quantization recovers it exactly."""
    return mean_round(sum_units, F.lit(1), out_dp, in_scale)


def ratio_round(num_units: Column, den_units: Column, out_dp: int) -> Column:
    """Half-up rounded ratio of two same-scale integer-unit quantities, as
    DOUBLE — round(a/b, out) via integer arithmetic in DECIMAL(38,0); the
    unit scale cancels. NULL if either side is NULL; caller guards b=0."""
    a = num_units.cast("decimal(38,0)")
    b = den_units.cast("decimal(38,0)")
    s = 10**out_dp
    num, den = a * F.lit(2 * s) + b, b * F.lit(2)
    q = ((num - num % den) / den).cast("long")
    return q.cast("double") / F.lit(float(s))


#: Chunk for hi/lo split sums — see ``split_hi``/``split_lo``.
SPLIT_CHUNK = 10**6


def split_hi(units: Column, chunk: int = SPLIT_CHUNK) -> Column:
    """High half of a hi/lo SPLIT SUM: wide integer sums on the LONG fast
    path. ``sum(decimal)`` costs ~2x ``sum(long)`` per expression (it leaves
    whole-stage codegen's primitive loop), but a plain long sum of 10^-4/-6
    units WRAPS near the design scale. Splitting each per-row unit value
    into ``units div chunk`` and ``units % chunk``, summing BOTH as longs,
    and recombining post-agg (``recombine_split``) is exact whenever

      rows_per_group < 2^63 / chunk                     (lo-sum ceiling)
      rows_per_group * max|units| / chunk < 2^63        (hi-sum ceiling)

    With chunk=10^6 and 6-dp units of ~1e5-magnitude money (|units|~1e11):
    rows_per_group < 9.2e12 — an order of magnitude above sf100k's whole
    lineitem (6e11 rows), the module's design point. Truncating %/- make
    the identity units = hi*chunk + lo hold for negatives too, and sums
    are additive, so recombination is exact regardless of sign.

    The double division below is EXACT under ``int_units_long``'s
    |units| < 1e15 contract: (units - lo) is an exactly-representable
    multiple of chunk and the integer quotient is < 2^53, so IEEE
    division returns it exactly."""
    u = units.cast("long")
    return ((u - u % F.lit(chunk)) / F.lit(chunk)).cast("long")


def split_lo(units: Column, chunk: int = SPLIT_CHUNK) -> Column:
    """Low half of a hi/lo split sum (see ``split_hi``)."""
    return units.cast("long") % F.lit(chunk)


def recombine_split(hi_sum: Column, lo_sum: Column, chunk: int = SPLIT_CHUNK) -> Column:
    """Exact recombination of the two long split sums into DECIMAL(38,0) —
    drop-in for the wide sum the split replaced."""
    return (
        hi_sum.cast("decimal(38,0)") * F.lit(chunk) + lo_sum.cast("decimal(38,0)")
    ).cast("decimal(38,0)")


def sql_int_units(col: str, scale: int = 6) -> str:
    """DuckDB mirror of ``int_units``/``int_units_long`` (BIGINT per row;
    DuckDB sums promote to HUGEINT, so no wide/narrow split is needed).
    Same floor(x·10^s + 0.5) form as the Spark side — identical IEEE ops
    on identical doubles pick identical integers."""
    if scale == 0:
        return f"CAST({col} AS BIGINT)"
    return f"CAST(floor(({col}) * {10**scale} + 0.5) AS BIGINT)"


def sql_sum_round(sum_expr: str, out_dp: int, in_scale: int = 6) -> str:
    """DuckDB mirror of ``sum_round``."""
    return sql_mean_round(sum_expr, "1", out_dp, in_scale)


def sql_ratio_round(num_expr: str, den_expr: str, out_dp: int) -> str:
    """DuckDB mirror of ``ratio_round``."""
    s = 10**out_dp
    return (
        f"(CAST(({2 * s} * ({num_expr}) + ({den_expr})) "
        f"// (2 * ({den_expr})) AS DOUBLE) / {float(s)})"
    )


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
