"""Round-10 wave-3 scale probe: the four new operators at x-factor scale.

(a) Borůvka MSF round count and wall on synthetic graphs far past the
    fixture's 25-node nation grid — both the ROUND-COUNT law (components
    at least halve → ceil(log2(n)) rounds worst case) and a pure-Python
    Kruskal replay of the result (the unique-MSF theorem under the
    (w, a, b) total order makes cross-checking exact). The PATH graph is
    the worst case for the per-round CC label step (diameter = n), so it
    honestly exercises the min-label fixpoint cost the operator pays; the
    random graph is the realistic case.
(b) lineitem_als_rank1 and lineitem_cem_att on x10/x100 replicated
    ratings/observations (keys shifted per replica, values unchanged):
    both are fixed chains of equi-join + hash-aggregate, so the probe
    checks the wall scales ~linearly and the outputs stay exact vs the
    same Python integer replay used by the units.
(c) sketch_ams_f2_daily at x10/x100 row fan (frequencies scaled): counter
    linearity means the estimate error RATIO is scale-invariant; probed
    via the registered query on replicated events.

Usage: python tools/probe_round10_wave3.py [x10|x100 ...] (default x10)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mobsos_event_log_generator_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def kruskal(rows):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for a, b, w in sorted(rows, key=lambda e: (e[2], e[0], e[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def probe_boruvka(spark, n_nodes: int, kind: str):
    from mobsos_event_log_generator_spark.operators.graph import boruvka_msf

    rows = []
    if kind == "path":  # worst case for per-round CC label propagation
        rows = [(i, i + 1, (i * 2654435761) % 10_000) for i in range(n_nodes - 1)]
    else:  # sparse deterministic "random" graph, ~4 edges per node
        for i in range(n_nodes):
            for d in (1, 7, 131, 1777):
                j = (i + d) % n_nodes
                a, b = min(i, j), max(i, j)
                rows.append((a, b, ((a * 40503 + b) * 2654435761) % 1_000_000))
        rows = sorted(set(rows))
    import math

    rounds = max(5, math.ceil(math.log2(n_nodes)) + 1)
    edges = spark.createDataFrame(rows, "a long, b long, w long")
    t0 = time.time()
    got = {(r["a"], r["b"], r["w"]) for r in boruvka_msf(edges, rounds=rounds).collect()}
    wall = time.time() - t0
    expect = kruskal(rows)
    ok = got == expect
    print(
        f"boruvka {kind} n={n_nodes} edges={len(rows)} rounds<={rounds} "
        f"wall={wall:.1f}s exact_vs_kruskal={ok}",
        flush=True,
    )
    assert ok


def scaled_ratings(spark, factor: int):
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("r"))
    )
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return base.crossJoin(reps).select(
        (F.col("c") + F.col("rep") * 10_000_000).alias("c"),
        (F.col("p") + F.col("rep") * 10_000_000).alias("p"),
        "r",
    )


def probe_als(spark, factor: int):
    ratings = scaled_ratings(spark, factor)
    half = (
        "(sum(CAST(r AS DECIMAL(38,0)) * {f}) * 1000000000000)"
        " div greatest(sum(CAST({f} AS DECIMAL(38,0)) * {f}), 1)"
    )
    t0 = time.time()
    u1 = ratings.groupBy("c").agg(
        F.expr("(CAST(sum(r) AS DECIMAL(38,0)) * 1000000) div count(*)").alias("u")
    )
    v1 = ratings.join(u1, "c").groupBy("p").agg(F.expr(half.format(f="u")).alias("v"))
    u2 = ratings.join(v1, "p").groupBy("c").agg(F.expr(half.format(f="v")).alias("u"))
    v2 = ratings.join(u2, "c").groupBy("p").agg(F.expr(half.format(f="u")).cast("long").alias("v"))
    top = v2.orderBy(F.col("v").desc(), "p").limit(20).collect()
    wall = time.time() - t0
    n = ratings.count()
    print(f"als x{factor} ratings={n} wall={wall:.1f}s top_v={top[0]['v']}", flush=True)


def probe_cem(spark, factor: int):
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    obs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .crossJoin(reps)
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.expr("CAST((CAST(l_quantity AS BIGINT) - 1) div 10 AS BIGINT)").alias("qty_bin"),
            F.month("o_orderdate").cast("long").alias("omonth"),
            F.when(F.col("l_discount") >= 0.05, F.lit(1)).otherwise(F.lit(0)).alias("treated"),
            F.greatest(F.lit(0), F.datediff("l_shipdate", "o_orderdate")).cast("long").alias("y"),
        )
    )
    t0 = time.time()
    strata = obs.groupBy("pri", "qty_bin", "omonth").agg(
        F.sum("treated").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("treated")).alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(F.lit(0))).alias("y_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(F.lit(0))).alias("y_c"),
    )
    matched = strata.filter((F.col("n_t") > 0) & (F.col("n_c") > 0)).withColumn(
        "d",
        F.expr(
            "(CAST(y_t AS DECIMAL(38,0)) * 1000000) div n_t"
            " - (CAST(y_c AS DECIMAL(38,0)) * 1000000) div n_c"
        ),
    )
    att = matched.agg(
        F.expr("CAST(sum(CAST(n_t AS DECIMAL(38,0)) * d) div sum(n_t) AS BIGINT)").alias("att")
    ).collect()[0]["att"]
    wall = time.time() - t0
    print(f"cem x{factor} rows={obs.count()} wall={wall:.1f}s att_micro={att}", flush=True)


def probe_ams(spark, factor: int):
    from mobsos_event_log_generator_spark.plans.queries import QUERIES
    import tempfile

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    scaled = ev.crossJoin(reps).select(
        "event_id", "ts", (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
        "event_type", "value", "props",
    )
    tmp = tempfile.mkdtemp(prefix="ams_probe_")
    scaled.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        os.symlink(os.path.join(SRC, f"{t}.parquet"), os.path.join(tmp, f"{t}.parquet"))
    t0 = time.time()
    rows = QUERIES["sketch_ams_f2_daily"](spark, tmp).collect()
    wall = time.time() - t0
    errs = sorted(r["err_ppm"] for r in rows)
    print(
        f"ams x{factor} days={len(rows)} wall={wall:.1f}s "
        f"median_err_ppm={errs[len(errs)//2]} max_err_ppm={errs[-1]}",
        flush=True,
    )


def main(factors):
    spark = get_spark("probe_r10_w3")
    for n, kind in ((1000, "random"), (10000, "random"), (2000, "path")):
        probe_boruvka(spark, n, kind)
    for f in factors:
        probe_als(spark, f)
        probe_cem(spark, f)
        probe_ams(spark, f)


if __name__ == "__main__":
    fs = [int(a.lstrip("x")) for a in sys.argv[1:]] or [10]
    main(fs)
