"""Single-pass pipeline observability: quality counters that ride the main
job via ``df.observe`` instead of a second scan.

``validate.check_constraints`` answers "is this table clean?" with a
dedicated aggregation job. At 100 TB you rarely get that second scan — the
production pattern is to attach counters to the job you were already
running (the write, the aggregation), harvested from Spark's observed
metrics when the action finishes: zero extra passes, exact counts, and the
numbers refer to exactly the rows the job processed (no read-after-write
race). Batch uses ``pyspark.sql.Observation``; streaming surfaces the same
metrics per micro-batch through ``StreamingQueryProgress.observedMetrics``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, rules: dict[str, Column], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach violation counters for ``rules`` (name -> boolean Column that
    is TRUE when the row VIOLATES the rule) plus a total row count. Returns
    the instrumented frame and the ``Observation`` — run any action on the
    frame, then read ``observation.get`` for exact counts:

        df2, obs = observe_quality(df, {"null_user": F.col("user_id").isNull()})
        df2.write.parquet(out)          # the job you were running anyway
        obs.get                        # {'rows': ..., 'null_user': ...}

    Counters are computed by the SAME tasks that execute the job — exact,
    race-free, zero extra scans."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(rule_name)
        for rule_name, cond in rules.items()
    ]
    return df.observe(obs, *metrics), obs


def observe_quality_stream(df: DataFrame, rules: dict[str, Column], name: str = "quality") -> DataFrame:
    """Streaming variant: attaches the same counters by METRIC NAME (the
    ``Observation`` helper is batch-only); every micro-batch's counts arrive
    in ``StreamingQueryProgress.observedMetrics[name]`` via any attached
    ``StreamingQueryListener`` — continuous data-quality telemetry with no
    second stream."""
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(rule_name)
        for rule_name, cond in rules.items()
    ]
    return df.observe(name, *metrics)
