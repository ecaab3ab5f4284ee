"""Units for the temporal operators added in round 3: forward as-of joins and
the distributed sweep-line prefix sum (operators/sweep.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators.asof import asof_join
from mobsos_event_log_generator_spark.operators.sweep import (
    distributed_ntile,
    global_running_sum,
    interval_concurrency,
    value_ordered_running_sum,
)


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2026, 1, 1, 12, minute, second)


def test_asof_forward_picks_earliest_at_or_after(spark):
    probes = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(30)), (3, 20, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    refs = spark.createDataFrame(
        [(100, 10, _ts(10)), (101, 10, _ts(20)), (102, 10, _ts(40)), (103, 20, _ts(1))],
        "event_id long, user_id long, ts timestamp",
    )
    out = asof_join(
        probes, refs, key_col="user_id", ts_col="ts", tie_col="event_id",
        ref_payload=["event_id"], direction="forward",
    )
    got = {r["event_id"]: (r["ref_event_id"], r["ref_ts"]) for r in out.collect()}
    assert got[1] == (100, _ts(10))  # equal timestamp matches forward
    assert got[2] == (102, _ts(40))  # skips refs strictly before the probe
    assert got[3] == (None, None)  # no ref at-or-after → NULL


def test_asof_forward_tie_breaks_by_tie_col(spark):
    probes = spark.createDataFrame([(1, 7, _ts(0))], "event_id long, user_id long, ts timestamp")
    refs = spark.createDataFrame(
        [(52, 7, _ts(0)), (51, 7, _ts(0))], "event_id long, user_id long, ts timestamp"
    )
    out = asof_join(
        probes, refs, key_col="user_id", ts_col="ts", tie_col="event_id",
        ref_payload=["event_id"], direction="forward",
    ).collect()
    assert out[0]["ref_event_id"] == 51  # smallest (ts, tie) at-or-after


def test_asof_rejects_unknown_direction(spark):
    df = spark.createDataFrame([(1, 1, _ts(0))], "event_id long, user_id long, ts timestamp")
    try:
        asof_join(df, df, "user_id", "ts", "event_id", ["event_id"], direction="nearest")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_global_running_sum_matches_single_sort(spark):
    rows = [(_ts(m, s), (m * 7 + s) % 5 - 2, m * 60 + s) for m in range(0, 50) for s in (0, 30)]
    df = spark.createDataFrame(rows, "ts timestamp, delta long, tie long")
    # Tiny bucket (60 s) forces many buckets → exercises the offset join.
    out = global_running_sum(df, "ts", "delta", ["tie"], bucket_seconds=60)
    got = {r["tie"]: r["running"] for r in out.collect()}
    acc, want = 0, {}
    for ts, delta, tie in sorted(rows, key=lambda r: (r[0], r[2])):
        acc += delta
        want[tie] = acc
    assert got == want


def test_interval_concurrency_touching_intervals_overlap(spark):
    # [0,10] and [10,20] touch at minute 10: closed-interval semantics → both
    # open immediately after the second start point.
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(10)), (2, _ts(10), _ts(20))], "id long, s timestamp, e timestamp"
    )
    out = interval_concurrency(iv, "s", "e", tie_cols=["id"])
    seq = [
        (r["ts"], r["delta"], r["concurrent"])
        for r in sorted(out.collect(), key=lambda r: (r["ts"], -r["delta"], r["id"]))
    ]
    assert seq == [
        (_ts(0), 1, 1),
        (_ts(10), 1, 2),  # start of #2 applies before end of #1
        (_ts(10), -1, 1),
        (_ts(20), -1, 0),
    ]


def test_interval_concurrency_zero_length_interval(spark):
    iv = spark.createDataFrame([(1, _ts(5), _ts(5))], "id long, s timestamp, e timestamp")
    out = sorted(interval_concurrency(iv, "s", "e", tie_cols=["id"]).collect(), key=lambda r: -r["delta"])
    assert [(r["delta"], r["concurrent"]) for r in out] == [(1, 1), (-1, 0)]


def test_value_ordered_running_sum_matches_single_sort(spark):
    """Two-phase value-bucketed cumsum == the naive global-sort cumsum, both
    directions, with heavy ties (many rows share a value → share a bucket)."""
    rows = [((i * 37) % 11, i) for i in range(300)]  # values 0..10, ties galore
    df = spark.createDataFrame(rows, "v long, id long")
    for descending in (False, True):
        out = value_ordered_running_sum(
            df, "v", ["id"], F.col("v"), out_col="cum", descending=descending, num_buckets=8
        )
        got = {r["id"]: r["cum"] for r in out.collect()}
        acc, want = 0, {}
        key = (lambda r: (-r[0], r[1])) if descending else (lambda r: (r[0], r[1]))
        for v, i in sorted(rows, key=key):
            acc += v
            want[i] = acc
        assert got == want, f"descending={descending}"


def test_distributed_ntile_matches_sql_ntile(spark):
    """Exact quota + tie-splitting parity with Spark's own ntile, for counts
    that hit every remainder class (n % k in 0..3) and tied order values."""
    from pyspark.sql.window import Window

    for n in (7, 8, 9, 10, 3, 2):
        rows = [((i * 5) % 4, i) for i in range(n)]  # tied keys
        df = spark.createDataFrame(rows, "v long, id long")
        for descending in (False, True):
            order = F.col("v").desc() if descending else F.col("v").asc()
            want = {
                r["id"]: r["t"]
                for r in df.select(
                    "id", F.ntile(4).over(Window.orderBy(order, "id")).alias("t")
                ).collect()
            }
            got = {
                r["id"]: r["q"]
                for r in distributed_ntile(
                    df, 4, n, "v", ["id"], "q", descending=descending
                ).collect()
            }
            assert got == want, f"n={n} descending={descending}"


def test_value_ordered_running_sum_no_global_sort_of_rows(spark):
    """Same scale contract as global_running_sum: every per-row window
    carries the __bucket partition key; only the per-bucket offset window
    (num_buckets rows) is unpartitioned."""
    df = spark.createDataFrame([(i % 13, i) for i in range(100)], "v long, id long")
    plan = (
        value_ordered_running_sum(df, "v", ["id"], F.col("v"), out_col="cum")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window" in ln and "windowspecdefinition" in ln]
    unpartitioned = [ln for ln in windows if "__bucket#" not in ln.split("windowspecdefinition")[1][:200]]
    for ln in unpartitioned:
        assert "__total" in ln, f"row-level unpartitioned window found:\n{ln}"


def test_sweep_has_no_global_sort_of_rows(spark):
    """The scale contract: the only unpartitioned window runs over per-bucket
    totals, so the per-row windows must all carry a partition key."""
    rows = [(_ts(m), 1, m) for m in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp, delta long, tie long")
    plan = global_running_sum(df, "ts", "delta", ["tie"], bucket_seconds=60)._jdf.queryExecution().executedPlan().toString()
    import re

    windows = [ln for ln in plan.splitlines() if "Window" in ln and "windowspecdefinition" in ln]
    unpartitioned = [ln for ln in windows if "__bucket#" not in ln.split("windowspecdefinition")[1][:200]]
    # every unpartitioned window must be the bucket-offset one (operates on
    # __total, i.e. one row per bucket), never on the row-level delta
    for ln in unpartitioned:
        assert "__total" in ln, f"row-level unpartitioned window found:\n{ln}"


def test_asof_nearest_tie_and_tolerance(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.operators.asof import asof_join_nearest

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    probes = spark.createDataFrame([(1, 1, t(10))], "event_id long, user_id long, ts timestamp")
    refs = spark.createDataFrame(
        [(100, 1, t(5), 1.0), (101, 1, t(15), 2.0), (102, 1, t(30), 3.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = asof_join_nearest(
        probes, refs, "user_id", "ts", "event_id", ["event_id", "value"]
    ).collect()[0]
    # equidistant (5s both ways): tie goes to the EARLIER reference
    assert out["ref_event_id"] == 100
    # tolerance excludes everything -> NULLs
    out2 = asof_join_nearest(
        probes, refs, "user_id", "ts", "event_id", ["event_id", "value"], tolerance_seconds=2
    ).collect()[0]
    assert out2["ref_event_id"] is None and out2["ref_ts"] is None
    # only-forward match within tolerance
    out3 = asof_join_nearest(
        probes.withColumn("ts", F.lit(t(1)).cast("timestamp")),
        refs, "user_id", "ts", "event_id", ["event_id", "value"], tolerance_seconds=5,
    ).collect()[0]
    assert out3["ref_event_id"] == 100


def test_asof_nearest_duplicate_ts_takes_smallest_tie(spark):
    """Two references at the SAME timestamp and equal |Δt| from the probe:
    the winner must be the smallest tie (ref id), matching the oracle's
    (|Δt|, backward-first, ref id ASC) ranking — the backward sweep runs
    with backward_equal_ts_tie='least' for this. Pre-fix the sweep carried
    the GREATEST tie (latent: fixtures have no duplicate (user, ts) refs)."""
    from datetime import datetime

    from mobsos_event_log_generator_spark.operators.asof import asof_join, asof_join_nearest

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    probes = spark.createDataFrame([(1, 1, t(10))], "event_id long, user_id long, ts timestamp")
    refs = spark.createDataFrame(
        [(104, 1, t(8), 1.0), (101, 1, t(8), 2.0), (109, 1, t(12), 3.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = asof_join_nearest(
        probes, refs, "user_id", "ts", "event_id", ["event_id", "value"]
    ).collect()[0]
    # backward pair at -2s beats forward at +2s; among the two refs at t(8)
    # the SMALLER id wins
    assert out["ref_event_id"] == 101

    # the plain backward contract is unchanged: greatest (ts, tie)
    back = asof_join(
        probes, refs, "user_id", "ts", "event_id", ["event_id", "value"]
    ).collect()[0]
    assert back["ref_event_id"] == 104


def test_daily_entropy_bounds_and_replay(spark):
    """Entropy bounded by [0, ln(n_types)]; exact Python replay per day."""
    import math

    from mobsos_event_log_generator_spark.plans.analytics import events_type_entropy_daily
    from mobsos_event_log_generator_spark.sources.parquet import load_table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    rows = events_type_entropy_daily(spark, sf).collect()
    assert rows
    counts = {}
    for r in (
        load_table(spark, sf, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"), "event_type")
        .count()
        .collect()
    ):
        counts.setdefault(r["d"], []).append(r["count"])
    for r in rows:
        ns = counts[r["event_date"]]
        assert r["n_events"] == sum(ns) and r["n_types"] == len(ns)
        expect = round(math.log(sum(ns)) - sum(n * math.log(n) for n in ns) / sum(ns), 6)
        assert abs(r["entropy"] - expect) <= 1e-6
        assert -1e-9 <= r["entropy"] <= math.log(r["n_types"]) + 1e-9


def test_markov_attribution_matches_exact_fraction_replay(spark, sf_dir):
    """Independent check of the Cramer absorbing-chain solve: replay the
    transition counting and the removal-effect algebra in pure Python with
    fractions.Fraction (a different arithmetic path from the SQL decimal
    pipeline), then assert the query's quantized ppm outputs equal the
    floor-quantized exact rationals."""
    from fractions import Fraction

    from mobsos_event_log_generator_spark.plans.temporal import (
        events_markov_attribution,
    )
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .selectExpr("user_id", "event_id", "event_type AS t", "unix_micros(ts) AS tsu")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.tsu, r.event_id, r.t))
    cnt: dict = {}

    def bump(src, dst):
        cnt[(src, dst)] = cnt.get((src, dst), 0) + 1

    for evs in by_user.values():
        evs.sort()
        prev = None  # (tsu, type) of previous event, None at session break
        for tsu, _eid, t in evs:
            if prev is None or prev[1] == "purchase" or prev[0] < tsu - 3_600_000_000:
                bump("start", t)
            else:
                bump(prev[1], t)
            prev = (tsu, t)
        # terminal null transitions: a row ends its session when the next
        # row starts a new one (or it is the user's last row)
        for i, (tsu, _eid, t) in enumerate(evs):
            if t == "purchase":
                continue
            if i + 1 == len(evs):
                bump(t, "null")
            else:
                ntsu, _nid, _nt = evs[i + 1]
                if tsu < ntsu - 3_600_000_000:
                    bump(t, "null")

    g = lambda s, d: cnt.get((s, d), 0)
    n_s = sum(v for (s, _d), v in cnt.items() if s == "start")
    n_v = sum(v for (s, _d), v in cnt.items() if s == "view")
    n_c = sum(v for (s, _d), v in cnt.items() if s == "click")

    def conv(drop=None):
        # redirected-to-null removal: dropped channel's inbound transitions
        # vanish from numerators, row totals stay.
        sv, sc, sp = g("start", "view"), g("start", "click"), g("start", "purchase")
        vv, vc, vp = g("view", "view"), g("view", "click"), g("view", "purchase")
        cv, cc, cp = g("click", "view"), g("click", "click"), g("click", "purchase")
        if drop == "view":
            xc = Fraction(cp, n_c - cc)
            return (Fraction(sp) + sc * xc) / n_s
        if drop == "click":
            xv = Fraction(vp, n_v - vv)
            return (Fraction(sp) + sv * xv) / n_s
        d2 = (n_v - vv) * (n_c - cc) - vc * cv
        xv = Fraction(vp * (n_c - cc) + vc * cp, d2)
        xc = Fraction(cp * (n_v - vv) + cv * vp, d2)
        return (Fraction(sp) + sv * xv + sc * xc) / n_s

    full_ppm = (conv() * 1_000_000).__floor__()
    wo_view_ppm = (conv("view") * 1_000_000).__floor__()
    wo_click_ppm = (conv("click") * 1_000_000).__floor__()
    re_view = 1_000_000 - wo_view_ppm * 1_000_000 // full_ppm
    re_click = 1_000_000 - wo_click_ppm * 1_000_000 // full_ppm

    out = {r.channel: r for r in events_markov_attribution(spark, sf_dir).collect()}
    assert out["view"].conv_full_ppm == full_ppm
    assert out["view"].conv_removed_ppm == wo_view_ppm
    assert out["click"].conv_removed_ppm == wo_click_ppm
    assert out["view"].removal_effect_ppm == re_view
    assert out["click"].removal_effect_ppm == re_click
    assert out["view"].credit_share_ppm == re_view * 1_000_000 // (re_view + re_click)
    assert out["view"].n_sessions == n_s
