"""Round-7 probe B: one rung BEYOND the sf ladder — x10 and x100 synthetic
corpora derived from sf0.1, timing the PPJoin/ER/retrieval family where the
sf-ladder probe (probe_round7.py) showed the steepest per-row slopes.

Scaling recipe (fair, not a duplicate-injection stress test): replica i of
each document re-keys doc_id by +i*KEY_STRIDE and salts every token with
an "ri" prefix — replicas share zero tokens with each other, so the corpus
keeps the ORIGINAL near-duplicate structure repeated x10/x100 instead of
turning every doc into a 10-way exact-duplicate clique (which would grow
candidate pairs quadratically by construction, telling us nothing about the
plan). Embeddings replicate with re-keyed ids and unchanged vectors (cells
densify x10 — what a real x10 corpus does to an IVF layout). Remaining
tables symlink to sf0.1.

Everything is written to /tmp (never /root/testdata).

Usage: python tools/probe_round7b.py [x10|x100 ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000
QUERIES_TO_PROBE = (
    "dedup_jaccard_prefix_join",
    "er_fellegi_sunter",
    "search_bm25_topk",
    "search_hybrid_rrf",
)
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def build_scaled(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = f"/tmp/probe_r7_x{factor}"
    done_flag = os.path.join(out, "_BUILT")
    if os.path.exists(done_flag):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t in ("documents", "embeddings") or not os.path.exists(src):
            continue
        if not os.path.exists(dst):
            os.symlink(src, dst)

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    scaled = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * KEY_STRIDE).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda tok: F.concat(F.lit("r"), F.col("rep"), F.lit("x"), tok),
                    ),
                    " ",
                )
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled.coalesce(8).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    emb_scaled = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep") * KEY_STRIDE).alias("vec_id"),
        "embedding",
        "label",
    )
    emb_scaled.coalesce(8).write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    open(done_flag, "w").write("ok")
    return out


def main() -> int:
    factors = [int(a.lstrip("x")) for a in sys.argv[1:]] or [10]
    from mobsos_event_log_generator_spark.plans.queries import QUERIES
    from mobsos_event_log_generator_spark.session import get_spark

    spark = get_spark("probe-r7b", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(name, sf_dir):
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    base = {n: timed(n, SRC) for n in QUERIES_TO_PROBE}
    for factor in factors:
        d = build_scaled(spark, factor)
        n_docs = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        print(f"\n-- x{factor} corpus at {d}: {n_docs} docs --")
        print(f"{'query':28s} {'sf0.1':>8s} {'x' + str(factor):>9s}   wall ratio (data x{factor})")
        for n in QUERIES_TO_PROBE:
            w = timed(n, d)
            print(f"{n:28s} {base[n]:7.2f}s {w:8.2f}s   x{w / base[n]:.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
