"""As-of and range joins — temporal operators Spark lacks natively, built as
compositions of DataFrame ops (SURVEY.md custom-operator rule (a): never a
Python UDF when algebra can express it).

* ``asof_join`` — "latest reference row at or before each probe row, per
  key". The distributed-correct pattern is NOT probe×ref join + agg (that's
  quadratic per key); it is the union + ordered-window sweep: tag both sides,
  union, single shuffle on the key, one ordered window pass carrying the last
  reference seen. O(n log n) per partition, one shuffle total — survives any
  key cardinality / 100 TB.
* ``banded_range_join`` — "pairs within a time band, per key". Naive range
  predicates force a per-key cross product; bucketing time into band-width
  buckets and equi-joining each probe to its {-1, 0, +1} neighbor buckets
  turns it into an equi-join with a 3x fan-out, then an exact band filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probes: DataFrame,
    refs: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    ref_payload: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    backward_equal_ts_tie: str = "greatest",
) -> DataFrame:
    """For each probe row: the nearest reference row per key — with
    ``direction="backward"`` the greatest (ts, tie) that is <= the probe's ts,
    with ``direction="forward"`` the smallest (ts, tie) that is >= it (equal
    timestamps match in both directions). Probe rows keep all their columns;
    reference payload columns arrive as ``ref_<name>`` (NULL when no
    reference exists on that side). ``tie_col`` makes same-timestamp ordering
    deterministic. Both directions are the same single-shuffle union + ordered
    window sweep, just mirrored.

    ``backward_equal_ts_tie="least"`` keeps the greatest eligible timestamp
    but resolves DUPLICATE-timestamp references to the smallest tie instead
    of the greatest — the preference ``asof_join_nearest`` needs to match
    pandas/the oracle, while the plain backward contract above stays the
    default.

    ``tolerance_seconds`` matches pandas ``merge_asof(tolerance=...)``: a
    reference farther than the tolerance from the probe is treated as no
    match (ref columns NULL). Applied as a post-sweep projection — the sweep
    itself is unchanged, so tolerance costs nothing extra."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if backward_equal_ts_tie not in ("greatest", "least"):
        raise ValueError(f"backward_equal_ts_tie must be 'greatest' or 'least', got {backward_equal_ts_tie!r}")
    ref_struct = F.struct(
        F.col(ts_col).alias("__ts"), F.col(tie_col).alias("__tie"), *[F.col(c) for c in ref_payload]
    )
    tagged_refs = refs.select(
        F.col(key_col), F.col(ts_col), F.col(tie_col), F.lit(0).alias("__side"), ref_struct.alias("__ref")
    )
    probe_cols = probes.columns
    tagged_probes = probes.select(
        *probe_cols, F.lit(1).alias("__side"), F.lit(None).cast(tagged_refs.schema["__ref"].dataType).alias("__ref")
    )
    unioned = tagged_probes.unionByName(tagged_refs, allowMissingColumns=True)
    if direction == "backward":
        # refs (side 0) sort before probes (side 1) at equal ts: "at or
        # before"; carry the LAST ref seen up to the current row. With
        # "least", duplicate-ts refs sort tie-DESC so the last (carried) one
        # is the smallest tie; probe-to-probe order is irrelevant to the
        # sweep (their __ref is NULL), so the flip is safe to apply globally.
        tie_order = F.col(tie_col).desc() if backward_equal_ts_tie == "least" else F.col(tie_col).asc()
        w = (
            Window.partitionBy(key_col)
            .orderBy(F.col(ts_col), F.col("__side"), tie_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__ref", ignorenulls=True).over(w)
    else:
        # probes (side 1 → desc puts them first) sort before refs at equal
        # ts: "at or after"; take the FIRST ref from the current row onward.
        w = (
            Window.partitionBy(key_col)
            .orderBy(F.col(ts_col), F.col("__side").desc(), F.col(tie_col))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("__ref", ignorenulls=True).over(w)
    swept = unioned.withColumn("__last_ref", carried)
    if tolerance_seconds is not None:
        within = (
            F.abs(F.unix_micros(F.col("__last_ref")["__ts"]) - F.unix_micros(F.col(ts_col)))
            <= tolerance_seconds * 1_000_000
        )
        swept = swept.withColumn(
            "__last_ref", F.when(within, F.col("__last_ref")).otherwise(F.lit(None))
        )
    out = swept.filter(F.col("__side") == 1).select(
        *probe_cols,
        *[F.col("__last_ref")[c].alias(f"ref_{c}") for c in ["__ts", *ref_payload]],
    )
    return out.withColumnRenamed("ref___ts", "ref_ts")


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    band_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with the same key and |left.ts - right.ts| <=
    band. Left columns keep their names; right columns arrive ``r_<name>``.

    Implementation: bucket = floor(epoch / band); each left row explodes to
    its {bucket-1, bucket, bucket+1} neighborhood and equi-joins right on
    (key, bucket) — any in-band pair shares one of those buckets — then the
    exact |dt| filter prunes the corners."""
    band_us = band_seconds * 1_000_000
    r_cols = [c for c in right.columns]
    # Integer div for exact bucketing (double division could misround at
    # bucket boundaries).
    bucket = lambda c: F.expr(f"unix_micros(`{c}`) div {band_us}")  # noqa: E731
    lefted = left.withColumn(
        "__lbucket", F.explode(F.array(bucket(ts_col) - 1, bucket(ts_col), bucket(ts_col) + 1))
    )
    righted = right.select(
        F.col(key_col).alias("__rkey"),
        bucket(ts_col).alias("__rbucket"),
        *[F.col(c).alias(f"r_{c}") for c in r_cols],
    )
    joined = lefted.join(
        righted, (F.col(key_col) == F.col("__rkey")) & (F.col("__lbucket") == F.col("__rbucket")), "inner"
    )
    dt = F.unix_micros(F.col(f"r_{ts_col}")) - F.unix_micros(F.col(ts_col))
    return joined.filter(F.abs(dt) <= band_us).drop("__lbucket", "__rbucket", "__rkey")


def asof_join_nearest(
    probes: DataFrame,
    refs: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    ref_payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """pandas ``merge_asof(direction='nearest')``: for each probe the
    reference with the smallest |Δts| per key, composed from the backward
    and forward sweeps (each one single-shuffle). Tie on equal distance
    goes to the EARLIER reference (pandas' backward preference), then the
    smaller tie column — the backward leg runs with
    ``backward_equal_ts_tie="least"`` so duplicate-timestamp references
    resolve to the smallest tie on BOTH legs, matching the oracle's
    (|Δt|, backward-first, ref id ASC) ranking. Ref columns arrive
    ``ref_``-prefixed, NULL when neither side has a match (or both fall
    outside the tolerance)."""
    back = asof_join(
        probes, refs, key_col, ts_col, tie_col, ref_payload,
        direction="backward", tolerance_seconds=tolerance_seconds,
        backward_equal_ts_tie="least",
    )
    fwd = asof_join(
        probes, refs, key_col, ts_col, tie_col, ref_payload,
        direction="forward", tolerance_seconds=tolerance_seconds,
    )
    bsel = back.select(
        *probes.columns,
        *[F.col(f"ref_{c}").alias(f"__b_{c}") for c in ref_payload],
        F.col("ref_ts").alias("__b_ts"),
    )
    fsel = fwd.select(
        F.col(key_col),
        F.col(tie_col),
        *[F.col(f"ref_{c}").alias(f"__f_{c}") for c in ref_payload],
        F.col("ref_ts").alias("__f_ts"),
    )
    both = bsel.join(fsel, [key_col, tie_col])
    bdist = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__b_ts"))
    fdist = F.unix_micros(F.col("__f_ts")) - F.unix_micros(F.col(ts_col))
    take_back = F.col("__f_ts").isNull() | (
        F.col("__b_ts").isNotNull() & (bdist <= fdist)
    )
    out = both
    for c in ref_payload:
        out = out.withColumn(
            f"ref_{c}", F.when(take_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
        )
    out = out.withColumn(
        "ref_ts", F.when(take_back, F.col("__b_ts")).otherwise(F.col("__f_ts"))
    )
    drop = [f"__b_{c}" for c in ref_payload] + [f"__f_{c}" for c in ref_payload] + ["__b_ts", "__f_ts"]
    return out.drop(*drop)
