"""Distributed Bloom-filter sketch as pure DataFrame algebra.

This PySpark build ships neither ``DataFrame.stat.bloomFilter`` nor a public
``bloom_filter_agg``, so the sketch is built from first principles: k md5
positions per key, folded into a bitmap of 32-bit words with ``bit_or`` —
one shuffle of (word, bits) partial bitmaps, map-side combined. Words are
32-bit, not 64: DuckDB's ``<<`` overflow-checks ``1 << 63``, so capping the
shift at 31 keeps every shifted value positive and engine-portable. The
bitmap is a tiny (num_bits/32)-row DataFrame: broadcast it and membership
probing is a broadcast join, never a shuffle of the probe side.

The 100 TB use case: semi-join pre-filtering. Instead of shipping a huge
build-side key set to every probe partition (or shuffling the probe fact),
ship the fixed-size bitmap; definite-miss rows drop immediately and only
"maybe" rows pay the real join. False positives are a deterministic function
of (keys, seeds, num_bits) — md5 everywhere — so the DuckDB oracle reproduces
the sketch bit-for-bit, including which absent keys false-positive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_BITS = 4096
NUM_HASHES = 4


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of k deterministic bit positions: ``hash_bucket`` (the single
    canonical md5 hash idiom shared with the DuckDB mirrors) over a per-hash
    seed prefix."""
    from mobsos_event_log_generator_spark.operators.sampling import hash_bucket

    return F.array(
        *[
            hash_bucket(F.concat(F.lit(f"b{i}|"), key.cast("string")), num_bits)
            for i in range(num_hashes)
        ]
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Build the bitmap: (word, bits) rows, one per 32-bit word that has any
    bit set. DISTINCT keys first (a duplicate key sets the same bits), then
    explode positions and bit_or per word — partial aggregation keeps the
    shuffle at O(words) per partition."""
    pos = (
        df.select(F.col(key_col)).distinct()
        .select(F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos"))
    )
    return (
        pos.select(
            F.floor(F.col("pos") / 32).cast("long").alias("word"),
            (F.col("pos") % 32).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
    )


def might_contain(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Probe: one row per DISTINCT candidate key with a ``bloom_hit`` flag
    (true = maybe present, with the sketch's deterministic false-positive
    rate; false = definitely absent). Keys are deduplicated first — a key
    appearing m times would otherwise contribute m·k hit rows and fail the
    sum == k test, i.e. a FALSE NEGATIVE, which the sketch must never
    produce. The bitmap side is broadcast; the only exchange is the final
    per-distinct-key aggregate (k rows each). To filter a fact table,
    semi-join it back against the keys where bloom_hit holds."""
    cpos = candidates.select(F.col(key_col)).distinct().select(
        F.col(key_col), F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos")
    ).select(
        F.col(key_col),
        F.floor(F.col("pos") / 32).cast("long").alias("word"),
        (F.col("pos") % 32).cast("int").alias("bit"),
    )
    probed = cpos.join(F.broadcast(bloom), "word", "left").withColumn(
        "hit",
        F.when(
            F.col("bits").isNotNull() & F.expr("((shiftright(bits, bit)) & 1) = 1"), 1
        ).otherwise(0),
    )
    return probed.groupBy(key_col).agg((F.sum("hit") == num_hashes).alias("bloom_hit"))


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two bitmaps built with identical (num_bits, num_hashes): bit_or
    per word. Exactly equals building one bloom over the union of key sets —
    the property that makes the sketch incrementally maintainable: build per
    partition/day/batch, merge instead of rebuilding."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))
