"""Units for the round-9 second-wave statistics (Mann-Kendall, Welch):
reference implementations recomputed in numpy/pandas on the same fixture."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mobsos_event_log_generator_spark.plans.queries import QUERIES
from mobsos_event_log_generator_spark.sources.parquet import load_table
from pyspark.sql import functions as F


def test_mann_kendall_matches_reference(spark, sf_dir):
    rows = QUERIES["events_mann_kendall_daily"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    for r in rows:
        c = daily[daily.event_type == r.event_type].sort_values("d").c.to_numpy()
        n = len(c)
        s = sum(
            int(np.sign(c[j] - c[i])) for i in range(n) for j in range(i + 1, n)
        )
        assert r.s_stat == s, r.event_type
        assert r.n_days == n
        _, tc = np.unique(c, return_counts=True)
        tie = int(sum(t * (t - 1) * (2 * t + 5) for t in tc if t > 1))
        var18 = n * (n - 1) * (2 * n + 5) - tie
        assert r.var18 == var18
        if s != 0:
            z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
            assert r.z_stat == pytest.approx(z, abs=2e-6)


def test_welch_matches_reference(spark, sf_dir):
    row = QUERIES["lineitem_welch_ttest"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_discount", "l_extendedprice")
    pdf = li.toPandas()
    cents = (pdf.l_extendedprice * 100 + 0.5).astype("int64")
    hi = cents[pdf.l_discount >= 0.05].to_numpy(dtype=float) / 100.0
    lo = cents[pdf.l_discount < 0.05].to_numpy(dtype=float) / 100.0
    assert row.n1 == len(hi) and row.n2 == len(lo)
    m1, m2 = hi.mean(), lo.mean()
    v1, v2 = hi.var(ddof=1), lo.var(ddof=1)
    se2 = v1 / len(hi) + v2 / len(lo)
    t = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / ((v1 / len(hi)) ** 2 / (len(hi) - 1) + (v2 / len(lo)) ** 2 / (len(lo) - 1))
    assert row.mean_diff == pytest.approx(m1 - m2, abs=2e-4)
    assert row.t_stat == pytest.approx(t, abs=1e-4)
    assert row.df_welch == pytest.approx(df, rel=1e-5)
    assert row.significant_5pct == (abs(t) > 1.959964)


def test_welch_accumulator_headroom():
    """cents^2 ~ 1e14/row; 6e8 rows/group at 100 TB -> ~6e22, 15 orders
    inside decimal(38,0). int64 would overflow at ~9e4 rows (documented)."""
    assert int(1e14) * int(6e8) < 10**38
    assert int(1e14) * int(1e5) > 2**63 - 1


def test_cusum_matches_reference(spark, sf_dir):
    rows = QUERIES["events_cusum_changepoint"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    for r in rows:
        g = daily[daily.event_type == r.event_type].sort_values("d")
        c = g.c.to_numpy()
        n, total = len(c), int(c.sum())
        s = n * np.cumsum(c) - (np.arange(1, n + 1)) * total
        peak = int(np.abs(s).max())
        assert r.cusum_peak_scaled == peak, r.event_type
        # earliest argmax tiebreak
        t_star = int(np.argmax(np.abs(s) == peak)) + 1
        assert r.changepoint_t == t_star
        assert r.peak_ratio == pytest.approx(peak / (n * total), abs=2e-6)


def test_mad_anomaly_matches_reference(spark, sf_dir):
    rows = QUERIES["events_mad_anomaly_days"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    for r in rows:
        g = daily[daily.event_type == r.event_type].sort_values("d")
        c = np.sort(g.c.to_numpy())
        med = int(c[(len(c) + 1) // 2 - 1])  # lower median
        assert r.median_count == med
        adev = np.sort(np.abs(g.c.to_numpy() - med))
        mad = int(adev[(len(adev) + 1) // 2 - 1])
        assert r.mad_count == mad
        n_anom = int(((np.abs(g.c.to_numpy() - med) * 10000) > 51891 * mad).sum())
        assert r.n_anomaly_days == n_anom
        assert r.max_abs_dev == int(np.abs(g.c.to_numpy() - med).max())


def test_kaplan_meier_matches_reference(spark, sf_dir):
    """KM survival vs a direct product-limit recomputation (float product)
    — the micro-nat quantization drift is bounded by ~1e-6 per step."""
    rows = sorted(
        QUERIES["orders_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows
    surv = 1.0
    prev_s = 1.0 + 1e-12
    for r in rows:
        assert 0 < r.n_events <= r.n_risk or r.n_events == 0
        if r.n_events < r.n_risk:
            surv *= 1.0 - r.n_events / r.n_risk
        assert r.km_survival == pytest.approx(surv, abs=max(2e-6 * len(rows), 1e-4))
        assert r.km_survival <= prev_s  # survival is non-increasing
        prev_s = r.km_survival
    # risk sets agree with nelson_aalen's construction on shared durations
    na = {
        r.duration_days: r.n_risk
        for r in QUERIES["orders_nelson_aalen"](spark, sf_dir).collect()
    }
    for r in rows:
        if r.duration_days in na and r.n_events > 0:
            assert r.n_risk == na[r.duration_days]


def test_benford_audit_reference(spark, sf_dir):
    """The long-standing r6 Benford entry (this round briefly shadowed it
    with a duplicate registration — caught and removed; the original, with
    its pre-scaled ppm literal table, is the keeper): pin its math."""
    rows = QUERIES["orders_benford_audit"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 9
    n = sum(r.cnt for r in rows)
    for r in rows:
        assert r.benford_ppm == round(math.log10(1 + 1 / r.d) * 1e6)
        assert r.obs_ppm == r.cnt * 1000000 // n
        assert r.dev_ppm == abs(r.obs_ppm - r.benford_ppm)


def test_moment_products_widen_before_multiply(spark):
    """r10 decimal-first-multiply audit: cross/second-moment accumulations
    (events_type_correlation's x*y, customers_revenue_gini's rank*cents)
    must widen the operand BEFORE the product — a BIGINT product of two
    ~3e9-scale counts wraps silently with ANSI off and flips corr_sign.
    Recreates both shapes at wrap scale against exact Python integers."""
    vals = [(i + 1, 3_000_000_000 + 7 * i, 4_000_000_000 + 11 * i) for i in range(10)]
    df = spark.createDataFrame(vals, "k LONG, x LONG, y LONG")
    xd = F.col("x").cast("decimal(38,0)")
    got = df.agg(
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("x")).alias("kx"),
    ).first()
    assert int(got["sxy"]) == sum(x * y for _, x, y in vals)
    assert int(got["kx"]) == sum(k * x for k, x, _ in vals)
    assert sum(x * y for _, x, y in vals) > 2**63 - 1  # int64 WOULD wrap
