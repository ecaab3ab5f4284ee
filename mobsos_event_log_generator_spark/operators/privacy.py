"""Privacy / re-identification governance operators.

k-anonymity: a row is re-identifiable when its quasi-identifier combination
(the attributes an attacker can link from outside data — location, segment,
coarse value bands) is shared by fewer than k rows. l-diversity strengthens
it: even a large group leaks the sensitive attribute if everyone in the
group shares one value. Both are pure relational aggregates — one
map-side-combined groupBy over the quasi columns, no shuffle of anything
but group keys — so auditing a 100-TB table costs one aggregation pass.

``suppress_small_groups`` is the enforcement half: rows in under-k groups
get their quasi identifiers nulled (cell suppression), everything else
passes through — a narrow projection joined against the (small) audit
output, broadcast back. Complements the row-level GDPR DELETE primitive in
sources/lake.py: DELETE removes the subject, suppression keeps the row but
severs linkability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | Column,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """Per-quasi-group audit: group size, distinct sensitive values, and the
    two risk flags (size < k; diversity < l). One aggregation pass."""
    sens = F.col(sensitive_col) if isinstance(sensitive_col, str) else sensitive_col
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(sens).alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            F.col("group_size").cast("long").alias("group_size"),
            F.col("n_sensitive").cast("long").alias("n_sensitive"),
            (F.col("group_size") < k).alias("under_k"),
            (F.col("n_sensitive") < l_div).alias("under_l"),
        )
    )


def suppress_small_groups(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Cell suppression: null every quasi-identifier on rows whose quasi
    group has fewer than k members. The under-k group list is tiny relative
    to the fact table, so it comes back as a broadcast LEFT SEMI-style mark
    join; suppressed rows keep all non-quasi columns intact.

    The mark join matches on ``eqNullSafe``: groupBy treats NULL as a
    grouping value, so a NULL-keyed under-k group is a real re-identification
    group — a plain equality join would never match it back to its rows and
    NULL-keyed groups would silently escape suppression."""
    small = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") < k)
        .select(
            *[F.col(c).alias(f"__q_{c}") for c in quasi_cols],
            F.lit(True).alias("__suppress"),
        )
    )
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__q_{c}"))
        cond = eq if cond is None else (cond & eq)
    out = df.join(F.broadcast(small), cond, "left")
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(F.col("__suppress").isNotNull(), F.lit(None)).otherwise(F.col(c))
        )
    return out.drop("__suppress", *[f"__q_{c}" for c in quasi_cols])
