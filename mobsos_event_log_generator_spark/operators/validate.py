"""Declarative data-quality constraint checking (Deequ-style, single pass).

A constraint set compiles to ONE aggregation over the table — every rule is
an aggregate Column (conditional sum / distinct-count delta), so validating N
rules costs one scan with map-side partial aggregation, never N scans. The
1-row aggregate is then unpivoted (``stack``) into the (rule, n_violations)
report — tiny, collectible, joinable against thresholds.

At 100 TB this is the cheap pre-flight gate before a training run: the scan
is embarrassingly parallel, carries no shuffle beyond the 1-row merge, and
the per-rule expressions stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    """Violations: rows where ``col`` IS NULL."""
    return F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("long")


def unique(col: str) -> Column:
    """Violations: surplus rows sharing a key (count - distinct-count);
    0 iff the column is unique. NULLs are not counted by countDistinct, so
    pair with ``not_null`` when the key must also be total."""
    return (F.count(F.lit(1)) - F.countDistinct(F.col(col))).cast("long")


def in_set(col: str, allowed: tuple) -> Column:
    """Violations: rows whose value is NULL or outside the accepted set."""
    cond = F.col(col).isNull() | ~F.col(col).isin(*allowed)
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def in_range(col: str, lo, hi) -> Column:
    """Violations: non-null rows outside the closed [lo, hi] interval."""
    cond = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def check_constraints(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate all rules in one aggregation pass; returns the violation
    report as (rule, n_violations) rows, one per rule, in rule order."""
    if not rules:
        raise ValueError("check_constraints requires at least one rule")
    names = list(rules)
    agg = df.agg(*[rules[n].alias(f"__r{i}") for i, n in enumerate(names)])
    # explode an array of structs rather than string-assembling a stack()
    # expression: rule names never pass through the SQL parser, so any
    # characters (quotes included) are safe.
    pairs = F.array(
        *[
            F.struct(F.lit(n).alias("rule"), F.col(f"__r{i}").alias("n_violations"))
            for i, n in enumerate(names)
        ]
    )
    return agg.select(F.explode(pairs).alias("kv")).select("kv.rule", "kv.n_violations")
