"""Round-10 probe: (a) every query-set-capped entry from the r9 verdict #1
list completes AS REGISTERED at x10/x100 (the class that timed out in the r7
probes when |Q| was corpus-coupled), and (b) the recall/cost point of the new
high-recall hybrid's dense parent (multitable LSH, `search_hybrid_rrf_ann_hq`)
vs the cheap SRP lane, measured against exact brute force on the SAME scaled
corpus — the r8/r9 verdict #4 bar is dense-lane recall@5 >= ~0.7 at x100.

Reuses probe_round7b's x-factor corpus builder (replica token salting keeps
near-dup structure honest; embeddings re-key with unchanged vectors, so IVF
cells densify exactly as a real x-factor corpus would). Re-keying by
+rep*10M keeps the capped demo query set (id % 50 = 0 AND id < 2000) pinned
to the SAME 40 rep-0 queries at every factor — the cap under test.

`streaming_ann_index_maintenance` is exercised at fixture SFs only: its
corpus-side work is the same IVF quantizer probed here via
similarity_topk_ann_ivf; the streaming wrapper's 4-micro-batch foreachBatch
choreography is fixture-rigged and adds nothing at x100.

Usage: python tools/probe_round10.py [x10|x100 ...]   (default x10 x100)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_round7b import SRC, build_scaled  # noqa: E402

CAP_SEC = 360.0

#: The r10-capped entries, probed as registered.
QUERIES_TO_PROBE = (
    "similarity_topk_ann_bucketed",
    "similarity_topk_ann_multiprobe",
    "similarity_topk_ann_multitable",
    "similarity_topk_ann_ivf",
    "similarity_topk_ann_ivf_arrow",
    "similarity_topk_ann_ivfpq",
    "similarity_topk_quantized",
    "similarity_topk_rerank",
    "similarity_srp_hamming",
    "search_bm25_topk",
    "search_rm3_expansion",
    "search_hybrid_rrf_ann_hq",
)

#: Dense lanes whose recall@5 vs brute force is the published tradeoff.
RECALL_LANES = ("similarity_topk_ann_multitable", "similarity_srp_hamming")


def build_recall_corpus(spark, factor: int) -> str:
    """x-factor embeddings for RECALL measurement: probe_round7b's timing
    corpus replicates vectors UNCHANGED (right for IVF-cell densification,
    but recall saturates trivially — every query's top-5 becomes its own
    exact-duplicate replicas at cosine 1.0). Here each replica adds
    deterministic per-element noise u ~ +-0.25 (md5-derived; element std of
    the fixture is 0.125, so replicas are genuinely distinct yet correlated
    neighbors — the hard case). rep 0 stays byte-identical, so the capped
    demo query set is the same 40 original vectors."""
    from pyspark.sql import functions as F

    out = f"/tmp/probe_r10_recall_x{factor}"
    done_flag = os.path.join(out, "_BUILT")
    if os.path.exists(done_flag):
        return out
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    scaled = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        F.when(F.col("rep") == 0, F.col("embedding"))
        .otherwise(
            F.expr(
                "transform(embedding, (x, j) -> x + "
                "(CAST(conv(substring(md5(concat(vec_id, '|', rep, '|', j)), 1, 6), 16, 10) AS DOUBLE) % 2001 - 1000)"
                " / 1000.0D * 0.25D)"
            )
        )
        .alias("embedding"),
        "label",
    )
    scaled.coalesce(8).write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    open(done_flag, "w").write("ok")
    return out


def recall_at_5(spark, sf_dir: str, lane: str) -> float:
    """Mean per-query |lane top-5 ∩ brute top-5| / 5 over the demo set."""
    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.plans.queries import QUERIES

    truth = QUERIES["similarity_topk_bruteforce"](spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    got = QUERIES[lane](spark, sf_dir).select("query_id", "neighbor_id")
    hits = truth.join(got, ["query_id", "neighbor_id"]).groupBy("query_id").count()
    row = (
        truth.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .agg(F.avg(F.coalesce(F.col("count"), F.lit(0)) / 5.0).alias("r"))
        .first()
    )
    return float(row["r"])


def main() -> int:
    factors = [int(a.lstrip("x")) for a in sys.argv[1:]] or [10, 100]
    from mobsos_event_log_generator_spark.plans.queries import QUERIES
    from mobsos_event_log_generator_spark.session import get_spark

    spark = get_spark("probe-r10", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(name, sf_dir):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    base = {n: timed(n, SRC) for n in QUERIES_TO_PROBE}
    print(f"{'recall@5 vs brute, sf0.1':34s} "
          + "  ".join(f"{l.split('_')[-1]}={recall_at_5(spark, SRC, l):.2f}"
                      for l in RECALL_LANES))
    failures = []
    for factor in factors:
        d = build_scaled(spark, factor)
        n_vecs = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        print(f"\n-- x{factor} corpus at {d}: {n_vecs} vectors --")
        print(f"{'query':34s} {'sf0.1':>8s} {'x' + str(factor):>9s}   ratio   cap({CAP_SEC:.0f}s)")
        for n in QUERIES_TO_PROBE:
            w = timed(n, d)
            ok = "ok" if w < CAP_SEC else "OVER CAP"
            if w >= CAP_SEC:
                failures.append(f"{n} x{factor}: {w:.1f}s")
            print(f"{n:34s} {base[n]:7.2f}s {w:8.2f}s   x{w / base[n]:5.1f}   {ok}")
            sys.stdout.flush()
        rd = build_recall_corpus(spark, factor)
        print(f"{'recall@5 vs brute, x' + str(factor) + ' (perturbed)':34s} "
              + "  ".join(f"{l.split('_')[-1]}={recall_at_5(spark, rd, l):.2f}"
                          for l in RECALL_LANES))
    if failures:
        print("\nOVER-CAP:", failures, file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
