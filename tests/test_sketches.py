"""Semantic units for plans/sketches.py (round 9): the portable-sketch lane.

Parity with DuckDB is gated by tools/check_parity.py / sweep_all.py; these
tests pin the MATH — estimator accuracy, mergeability (the property that
makes each sketch a 100 TB operator), exact-when-small contracts, and
pandas-reference agreement for the EWMA."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.plans.queries import QUERIES
from mobsos_event_log_generator_spark.sources.parquet import load_table


def test_hll_portable_estimate_within_rsd(spark, sf_dir):
    rows = QUERIES["sketch_hll_portable_daily"](spark, sf_dir).collect()
    assert rows, "no days"
    for r in rows:
        assert 1 <= r.buckets_used <= 256
        # m=256 -> rsd ~6.5%; allow 4 sigma.
        assert r.rel_err_pct <= 26.0, (r.event_date, r.rel_err_pct)
        assert r.hll_estimate > 0


def test_hll_registers_merge_like_union(spark, sf_dir):
    """The defining sketch property: registers of (A union B) == per-bucket
    MAX of A's and B's registers — what a 1000-executor rollup relies on.
    Recomputed from the same md5 derivation as the query."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h = ev.select(
        F.md5(F.concat(F.lit("hll|"), F.col("user_id").cast("string"))).alias("hx"),
        (F.col("user_id") % 2 == 0).alias("half"),
    ).select(
        F.substring("hx", 1, 2).alias("bucket"),
        F.length(F.regexp_extract(F.substring("hx", 3, 13), "^0*", 0)).alias("lz"),
        "half",
    )
    rho = F.least(F.col("lz") * 4 + 1, F.lit(50))  # lower bound on rho is fine here
    whole = {r.bucket: r.m for r in h.groupBy("bucket").agg(F.max(rho).alias("m")).collect()}
    halves = (
        h.groupBy("bucket", "half").agg(F.max(rho).alias("m")).groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .collect()
    )
    merged = {r.bucket: r.m for r in halves}
    assert merged == whole


def test_hll_union_monthly_consistency(spark, sf_dir):
    """Merged-register monthly estimate must obey the same rsd bound as a
    direct monthly sketch (they are EQUAL by max-associativity), and the
    overlap readout must be the exact identity sum_daily - exact."""
    rows = QUERIES["sketch_hll_union_monthly"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rel_err_pct <= 26.0, (r.month, r.rel_err_pct)
        assert r.repeat_user_days == r.sum_daily_users - r.exact_users
        assert r.repeat_user_days >= 0
        assert r.n_days >= 1


def test_kmv_exact_when_under_k(spark, sf_dir):
    out = QUERIES["sketch_kmv_distinct_daily"](spark, sf_dir)
    for r in out.collect():
        assert r.k_used <= 64
        if r.exact_users < 64:
            assert r.kmv_estimate == float(r.exact_users)
            assert r.rel_err_pct == 0.0
        else:
            assert r.k_used == 64
            # KMV rsd ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma.
            assert r.rel_err_pct <= 51.0, (r.event_date, r.rel_err_pct)


def test_histogram_quantile_within_one_bucket(spark, sf_dir):
    rows = QUERIES["lineitem_histogram_quantiles"](spark, sf_dir).collect()
    flags = {r.l_returnflag for r in rows}
    assert len(rows) == 3 * len(flags)  # P50/P90/P99 per flag
    for r in rows:
        assert r.abs_err <= 1000.0, r  # estimate can never leave its $1000 bucket
        assert abs(r.est_quantile - r.exact_quantile) == pytest.approx(r.abs_err, abs=0.011)


def test_histogram_exact_lane_matches_full_sort(spark, sf_dir):
    """The single-bucket exact audit must equal the k-th order statistic of
    a full per-group sort (the thing it avoids computing at scale)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    pdf = li.toPandas()
    rows = QUERIES["lineitem_histogram_quantiles"](spark, sf_dir).collect()
    for r in rows:
        grp = pdf[pdf.l_returnflag == r.l_returnflag].l_extendedprice
        cents = (grp * 100 + 0.5).astype("int64").sort_values().to_numpy()
        k = -(-r.q_pct * len(cents) // 100)  # ceil
        assert r.exact_quantile == pytest.approx(cents[int(k) - 1] / 100.0, abs=0.011)


def test_ewma_matches_pandas_reference(spark, sf_dir):
    out = QUERIES["events_ewma_daily"](spark, sf_dir).orderBy("event_type", "event_date")
    pdf = out.toPandas()
    assert len(pdf)
    for etype, g in pdf.groupby("event_type"):
        ref = g.daily_count.ewm(alpha=0.5, adjust=True).mean()
        # 30-day weight truncation + 4dp rounding -> tolerance 2e-4 relative.
        assert (g.ewma - ref).abs().max() <= max(2e-4 * ref.max(), 5e-4), etype


def test_bandit_posteriors_and_shares(spark, sf_dir):
    rows = QUERIES["orders_bandit_allocation"](spark, sf_dir).collect()
    assert rows
    total_share = sum(r.thompson_share for r in rows)
    assert total_share == pytest.approx(1.0, abs=len(rows) * 1e-6)
    for r in rows:
        assert 0 < r.posterior_mean < 1
        expect = (1 + r.n_success) / (2 + r.n_trials)
        assert r.posterior_mean == pytest.approx(expect, abs=1e-6)
        assert r.ucb1 >= r.n_success / r.n_trials


def test_ewma_accumulator_survives_scale_counts(spark):
    """Daily counts at 100 TB (~1e10/day) x 2^30 weights x 31 terms must not
    overflow the decimal(38,0) accumulator (r7/r8 audit discipline)."""
    horizon_terms = 31
    peak = int(1e10) * (2**30) * horizon_terms
    assert peak < 10**38
    # and the int64 path WOULD have died (documents why decimal is required)
    assert peak > 2**63 - 1


def test_sketch_plans_stay_jvm_side(spark, sf_dir):
    for name in (
        "sketch_hll_portable_daily",
        "sketch_hll_union_monthly",
        "sketch_kmv_distinct_daily",
        "lineitem_histogram_quantiles",
        "events_ewma_daily",
        "orders_bandit_allocation",
    ):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_kmv_day_overlap_contracts(spark, sf_dir):
    rows = QUERIES["events_kmv_day_overlap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.kmv_jaccard <= 1.0
        assert r.k_used <= 64
        if r.exact_union < 64:
            # under-k the union sketch IS the union: estimates are exact
            assert r.kmv_jaccard == pytest.approx(r.exact_jaccard, abs=2e-6)
            assert r.kmv_union == float(r.exact_union)
        else:
            # k=64 -> rsd ~ 12.5%; generous 4-sigma absolute band on J
            assert abs(r.kmv_jaccard - r.exact_jaccard) <= 0.5
            assert abs(r.kmv_union - r.exact_union) / r.exact_union <= 0.55


def test_holt_linear_matches_pandas_double_smoothing(spark, sf_dir):
    out = QUERIES["events_holt_linear_daily"](spark, sf_dir).orderBy(
        "event_type", "event_date"
    )
    pdf = out.toPandas()
    assert len(pdf)
    for etype, g in pdf.groupby("event_type"):
        s1 = g.daily_count.ewm(alpha=0.5, adjust=True).mean()
        s2 = s1.ewm(alpha=0.5, adjust=True).mean()
        lvl, tr = 2 * s1 - s2, s1 - s2
        tol = max(3e-4 * g.daily_count.max(), 2e-3)  # truncation + 2x micro-quant
        assert (g.s_single - s1).abs().max() <= tol, etype
        assert (g.level - lvl).abs().max() <= tol, etype
        assert (g.trend - tr).abs().max() <= tol, etype
        assert (g.forecast_next - (g.level + g.trend)).abs().max() <= 2e-3, etype


def test_ewma_weighted_sum_exact_past_int64(spark):
    """r9 ADVICE (high): the weighted accumulation must multiply in
    decimal(38,0), never in BIGINT — daily_count * 2^30 wraps silently past
    int64 at ~8.6e9/day with ANSI off, and fixture parity cannot see it.
    Recreates the _band_sum aggregation shape at wrap scale and checks the
    sum against exact Python integers."""
    horizon = 30
    counts = [9_000_000_000 + i for i in range(31)]  # each * 2^30 > int64
    rows = [(i + 1, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "t INT, daily_count LONG")
    w = F.pow(F.lit(2.0), horizon - (F.lit(31) - F.col("t"))).cast("bigint")
    got = df.agg(
        F.sum(F.col("daily_count").cast("decimal(38,0)") * w).alias("num"),
        F.sum(w).alias("den"),
    ).first()
    expect_num = sum(c * 2 ** (horizon - (31 - t)) for t, c in rows)
    expect_den = sum(2 ** (horizon - (31 - t)) for t, _ in rows)
    assert int(got["num"]) == expect_num  # > 2**63: the BIGINT path wrapped
    assert expect_num > 2**63 - 1
    assert int(got["den"]) == expect_den


def test_kmv_hash_cross_engine_and_wide_domain(spark):
    """The md5-derived 60-bit KMV hash must (a) agree bit-for-bit between
    Spark's conv() and DuckDB's '0x' cast and (b) stay injective-in-practice
    past 2^31 — the exact domain where the retired MINSTD permutation
    collapsed ids (r9 ADVICE)."""
    import duckdb

    ids = [0, 1, 63, 2**31 - 2, 2**31 - 1, 2**31, 2**40 + 17, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "user_id LONG")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    got = {r["user_id"]: r["hv"] for r in df.select("user_id", hv.alias("hv")).collect()}
    con = duckdb.connect()
    for i in ids:
        (dv,) = con.execute(
            "SELECT CAST('0x' || substring(md5('kmv|' || CAST(? AS VARCHAR)), 1, 15) AS BIGINT)",
            [i],
        ).fetchone()
        assert got[i] == dv, i
        assert 0 <= got[i] < 2**60
    assert len(set(got.values())) == len(ids)  # distinct past 2^31 too


def test_ams_f2_matches_python_replay_and_merges(spark, sf_dir):
    """The AMS counters, group means, lower-median estimate, and the exact
    lane all match an unbounded-precision Python replay from the raw
    (day, user) frequencies — and counters built from two halves of the
    stream MERGE BY ADDITION to the bulk counters (the mergeable-state
    property a multi-executor rollup relies on)."""
    import hashlib
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"), "user_id"
    )
    freq = defaultdict(int)
    for r in ev.collect():
        freq[(r["d"], r["user_id"])] += 1

    def sign(j: int, u: int) -> int:
        h = hashlib.md5(f"ams|{j}|{u}".encode()).hexdigest()
        return 1 if h[0] in "01234567" else -1

    counters = defaultdict(int)  # (day, j) -> c
    f2 = defaultdict(int)
    for (d, u), fu in freq.items():
        f2[d] += fu * fu
        for j in range(64):
            counters[(d, j)] += sign(j, u) * fu
    expect = {}
    for d in f2:
        gms = []
        for grp in range(8):
            s = sum(counters[(d, j)] ** 2 for j in range(grp * 8, grp * 8 + 8))
            gms.append((s // 8, grp))
        est = sorted(gms)[3][0]  # lower median (4th of 8)
        expect[d] = (f2[d], est, abs(est - f2[d]) * 10**6 // f2[d])

    rows = QUERIES["sketch_ams_f2_daily"](spark, sf_dir).collect()
    got = {r["event_date"]: (r["exact_f2"], r["ams_estimate"], r["err_ppm"]) for r in rows}
    assert got == expect
    for r in rows:
        assert r["within_50pct"] == (abs(r["ams_estimate"] - r["exact_f2"]) * 2 <= r["exact_f2"])

    # mergeability: per-user frequencies split into two disjoint halves ->
    # half counters sum to the bulk counters (c is linear in f).
    half = defaultdict(int)
    for (d, u), fu in freq.items():
        part = 0 if u % 2 == 0 else 1
        for j in range(64):
            half[(d, j, part)] += sign(j, u) * fu
    for (d, j), c in counters.items():
        assert half[(d, j, 0)] + half[(d, j, 1)] == c
