"""Round-8 probe B: dense-lane crossover in DIMENSION.

ENGINEERING_NOTES (round-8 log) records honestly that at x100/64-dim the
new ANN hybrid is NOT yet faster than the capped brute-force hybrid
(25 s vs 20 s) and claims the SRP lane's advantage "widens with dimension
and corpus". This probe substantiates the dimension half of that claim
with numbers: at a fixed 200k-vector corpus and the fixed 40-query demo
set, time three dense lanes at 64 / 256 / 1024 dims —

  * brute-JVM    exact cosine top-5 (`cosine_topk`, the registered
                 `similarity_topk_bruteforce` shape): O(N·|Q|·D) float
                 work against the full vectors,
  * brute-Arrow  the same exact scan through the Arrow/BLAS kernel
                 (`cosine_topk_arrow`, registered as
                 `similarity_topk_arrow`),
  * SRP+rerank   the ANN hybrid's dense lane: 32-plane SRP signatures
                 (stage 1 reads 8 B/vector regardless of D) -> hamming
                 top-20 shortlist -> exact-cosine rerank top-5,

and measure SRP recall@5 against the exact answer so the speed claim
carries its quality cost. Corpus is CLUSTERED (1000 centers + small
deterministic noise), not uniform — with uniform vectors "nearest
neighbor" is noise and recall would be meaningless.

Writes nothing outside /tmp. Results belong in BASELINE.md next to the
2M-vector SRP corpus-scaling probes.

Usage: python tools/probe_round8b.py [N_VECTORS]   (default 200000)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEFAULT = 200_000
DIMS = (64, 256, 1024)
N_CENTERS = 1000
K = 5
SHORTLIST = 20
PLANES = 32


def srp_signs(dim: int) -> list:
    """Same md5-derived fixed ±1 hyperplanes as plans/llm._SRP_SIGNS."""
    return [
        [
            1 if int(hashlib.md5(f"srp|{i}|{j}".encode()).hexdigest()[0], 16) >= 8 else -1
            for i in range(1, dim + 1)
        ]
        for j in range(PLANES)
    ]


def build_corpus(spark, n: int, dim: int) -> str:
    """Deterministic clustered float vectors: center(id % 1000) + 0.25·noise.

    hash(...) is Spark's Murmur3 — stable across sessions, no RNG state."""
    out = f"/tmp/probe_r8b_d{dim}_n{n}"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    df = spark.range(n).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(1, {dim}), i ->
              CAST(CAST(hash(id % {N_CENTERS}, i) % 1000 AS DOUBLE) / 1000.0
                   + 0.25 * CAST(hash(id, i) % 1000 AS DOUBLE) / 1000.0
              AS FLOAT)) AS embedding""",
    )
    df.repartition(32).write.mode("overwrite").parquet(out)
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mobsos_event_log_generator_spark.operators import similarity as S
    from mobsos_event_log_generator_spark.session import get_spark

    spark = get_spark("probe-r8b", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def srp_lane(emb, queries, signs):
        """Stage-1 hamming shortlist + exact rerank — the registered
        `search_hybrid_rrf_ann` dense-lane shape (plans/llm.py:5440)."""
        sig = S.srp_signatures(emb, signs)
        q = queries.select("vec_id").join(sig, "vec_id").select(
            F.col("vec_id").alias("query_id"), F.col("sig").alias("q_sig")
        )
        c = sig.select(F.col("vec_id").alias("neighbor_id"), F.col("sig").alias("c_sig"))
        pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
            "query_id", "neighbor_id",
            F.bit_count(F.col("q_sig").bitwiseXOR(F.col("c_sig"))).cast("long").alias("hamming"),
        )
        w1 = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
        short = (
            pairs.withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") <= SHORTLIST)
            .select("query_id", "neighbor_id")
        )
        qe = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
        ce = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
        rer = (
            short.join(F.broadcast(qe.join(queries.select(F.col("vec_id").alias("query_id")), "query_id")), "query_id")
            .join(ce, "neighbor_id")
            .select("query_id", "neighbor_id", S.cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"))
        )
        w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        return rer.withColumn("rank", F.row_number().over(w2).cast("long")).filter(F.col("rank") <= K)

    print(f"{'dim':>5s} {'brute-JVM':>10s} {'brute-Arrow':>12s} {'SRP+rerank':>11s} {'recall@5':>9s}")
    for dim in DIMS:
        path = build_corpus(spark, n, dim)
        emb = spark.read.parquet(path)
        queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))

        t_jvm = timed(S.cosine_topk(emb, queries, k=K))
        t_arrow = timed(S.cosine_topk_arrow(emb, queries, k=K))
        t_srp = timed(srp_lane(emb, queries, srp_signs(dim)))

        exact = S.cosine_topk(emb, queries, k=K).select("query_id", "neighbor_id")
        approx = srp_lane(emb, queries, srp_signs(dim)).select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
        total = exact.count()
        print(f"{dim:5d} {t_jvm:9.2f}s {t_arrow:11.2f}s {t_srp:10.2f}s {hits / total:9.3f}")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
