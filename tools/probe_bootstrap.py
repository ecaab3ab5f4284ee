"""Poisson-bootstrap scale probe (BASELINE.md): per-row cost flatness and
the shuffle-size argument — the B-way explode must collapse map-side so the
exchange carries <= B rows per partition regardless of corpus size. Warm
operator cores on local[32] — run manually, results recorded in BASELINE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mobsos_event_log_generator_spark.operators import exactmath as XM
    from mobsos_event_log_generator_spark.plans.analytics import (
        _POISSON1_CDF_48,
        BOOTSTRAP_REPLICATES,
    )

    for n in (1_000_000, 10_000_000):
        orders = (
            spark.range(n)
            .select(
                F.col("id").alias("o_orderkey"),
                (F.pmod(F.hash("id"), 100000) / 100.0 + 1.0).alias("o_totalprice"),
            )
            .repartition(32)
            .cache()
        )
        orders.count()
        def build():
            # fresh lineage per measurement — re-collecting one DataFrame
            # object would reuse its shuffle map outputs and time only the
            # 32-row final stage
            b = F.explode(F.sequence(F.lit(1), F.lit(BOOTSTRAP_REPLICATES))).alias("b")
            x = orders.select(
                "o_orderkey", XM.int_units_long(F.col("o_totalprice"), 2).alias("cents"), b
            )
            u = F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("o_orderkey").cast("string"), F.col("b").cast("string")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            ux = x.select("cents", "b", u.alias("u"))
            w = None
            for t in _POISSON1_CDF_48:
                term = F.when(F.col("u") >= F.lit(t), 1).otherwise(0)
                w = term if w is None else w + term
            return (
                ux.withColumn("w", w)
                .groupBy(F.col("b").cast("int").alias("replicate"))
                .agg(
                    F.sum("w").cast("long").alias("n_sampled"),
                    XM.sum_round(F.sum(F.col("w") * F.col("cents")), 2, in_scale=2).alias(
                        "boot_total"
                    ),
                )
            )

        for i in range(2):
            t0 = time.time()
            rows = build().collect()
            dt = time.time() - t0
            if i:  # warm (JIT + page cache; fresh shuffle)
                ns = next(r["n_sampled"] for r in rows if r["replicate"] == 1)
                print(
                    f"n={n:,}: warm {dt:.2f} s "
                    f"({dt / n * 1e6:.2f} us/row for all {BOOTSTRAP_REPLICATES} replicates), "
                    f"{len(rows)} replicate rows, n_sampled[1]={ns:,}"
                )
        orders.unpersist()


if __name__ == "__main__":
    main()
