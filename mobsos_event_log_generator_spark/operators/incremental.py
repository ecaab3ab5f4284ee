"""Retraction-aware incremental aggregate maintenance.

``streaming/rollup.py`` maintains an aggregate view under APPEND-ONLY input
(partial-fold per micro-batch). This module closes the other half: applying
a change feed that contains DELETES (snapshot overwrites, GDPR erasure,
late corrections) to a materialized aggregate without recomputing it — the
classic retraction trick: every delete contributes with sign −1, so any
MONOID aggregate (count, sum, and everything derived from them) is
maintainable from the delta alone.

Cost model at 100 TB: one hash-agg over the CHANGE (not the table) + one
key equi-join against the view — incremental refresh cost is proportional
to the delta, which is the whole point of pairing it with
``sources/snapshots.py::snapshot_diff`` (file-list CDC that also only reads
the change). Non-monoid aggregates (min/max/distinct) are NOT maintainable
under deletes without auxiliary state; callers keep those in the
recompute-from-scratch lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_TYPE_COL = "_change_type"


def cdc_delta_agg(cdc: DataFrame, keys: list[str], sum_cols: dict[str, str]) -> DataFrame:
    """Signed per-key delta of a CDC frame: inserts count +1, deletes −1;
    each ``sum_cols`` source column contributes ``±value``. Output columns:
    keys + ``n`` + the ``sum_cols`` aliases."""
    sign = F.when(F.col(CHANGE_TYPE_COL) == "insert", F.lit(1)).otherwise(F.lit(-1))
    aggs = [F.sum(sign).alias("n")]
    for src, out in sorted(sum_cols.items()):
        aggs.append(F.sum(F.col(src) * sign).alias(out))
    return cdc.groupBy(*keys).agg(*aggs)


def apply_cdc_to_agg(
    view: DataFrame, cdc: DataFrame, keys: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Merge a signed CDC delta into a materialized aggregate view.

    ``view`` has columns keys + ``n`` + sum aliases (as produced by a full
    groupBy or a prior refresh). Returns the refreshed view: counts and sums
    adjusted per key, keys whose count reaches zero dropped (fully-retracted
    groups disappear, matching a recompute). One delta hash-agg + one
    full-outer equi-join on the keys."""
    delta = cdc_delta_agg(cdc, keys, sum_cols)
    val_cols = ["n"] + sorted(sum_cols.values())
    v = view.select(*keys, *[F.col(c).alias(f"v_{c}") for c in val_cols])
    d = delta.select(*keys, *[F.col(c).alias(f"d_{c}") for c in val_cols])
    merged = v.join(d, keys, "full")
    out_cols = [
        (F.coalesce(F.col(f"v_{c}"), F.lit(0)) + F.coalesce(F.col(f"d_{c}"), F.lit(0))).alias(c)
        for c in val_cols
    ]
    return merged.select(*keys, *out_cols).filter(F.col("n") > 0)
