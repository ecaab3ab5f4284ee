"""Reproducible corpus splitting and sampling (LLM-data-pipeline ops).

``hash_split`` is the scale-correct train/val/test split: membership is a
pure function of the id (md5 bucket), so it is stable under re-runs,
repartitioning, incremental appends, and engine changes — no global shuffle,
no sampling state, no seed file to ship. ``sampleBy``-style stratified
sampling is also exposed for when approximate per-stratum fractions are what
is wanted (its row picks are engine/partition-dependent, so it is gated by
statistical tests, not a value oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, num_buckets: int = 100) -> Column:
    """Deterministic bucket 0..num_buckets-1 from md5 of the value's string
    form (first 8 hex chars → int). Identical hex → identical buckets in any
    engine that speaks md5 — the cross-engine reproducibility contract."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % num_buckets
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket (weights sum to 100).

    A narrow projection — no shuffle, no state; appending new rows later
    never reassigns existing ones."""
    splits = splits or {"train": 80, "val": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError(f"split weights must sum to 100, got {splits}")
    bucket = hash_bucket(F.col(id_col))
    expr: Column | None = None
    edge = 0
    *head, (last_name, _) = splits.items()
    for name, weight in head:
        edge += weight
        expr = F.when(bucket < edge, F.lit(name)) if expr is None else expr.when(bucket < edge, F.lit(name))
    expr = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): approximate fractions,
    deterministic for a fixed seed+partitioning but not across engines —
    use ``hash_split`` when exact reproducible membership matters."""
    return df.sampleBy(strata_col, fractions, seed)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    budget: int = 2048,
    num_shards: int = 8,
) -> DataFrame:
    """GPT-style sequence packing: documents are (conceptually) concatenated
    in deterministic id order and chunked into fixed ``budget``-token bins;
    each doc is assigned the bin where its first token lands (docs may
    straddle bin boundaries — concat-and-chunk semantics).

    Scale shape: packing is done independently per hash shard
    (``id % num_shards``), so the running-sum window parallelizes across
    shards instead of forcing a single global sort; a bin is identified by
    (shard, bin). Within a shard the running sum is one window fold over
    id-ordered rows. Deterministic: bin membership is a pure function of the
    id ordering and token counts — stable across engines and re-runs."""
    from pyspark.sql.window import Window

    shard = (F.col(id_col) % num_shards).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("start_offset", F.sum(n_tokens_col).over(w) - F.col(n_tokens_col))
        .withColumn("bin", F.floor(F.col("start_offset") / F.lit(float(budget))).cast("long"))
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    num_shards: int = 16,
) -> DataFrame:
    """Epoch-seeded deterministic corpus shuffle: the per-epoch random
    permutation every LLM training run needs, without a global sort or any
    sampling state. Each row gets a pseudo-random ``shuffle_key`` =
    md5(epoch ':' id) — a pure function of (epoch, id), so the permutation is
    reproducible across re-runs, engines, and repartitioning, and changing
    ``epoch`` yields an independent-looking reordering. The key's 32-bit
    prefix routes the row to one of ``num_shards`` shards; ``pos`` is the
    row's 0-based rank within its shard by (key, id).

    Scale shape: one hash exchange on ``shard`` plus a per-shard sort —
    shards parallelize the ordering the way ``pack_sequences`` shards its
    running sum, so no single-reducer global sort ever happens. Readers
    stream shards in (shard, pos) order to consume the epoch's permutation.
    """
    from pyspark.sql.window import Window

    key = F.md5(F.concat_ws(":", F.lit(str(epoch)), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.withColumn("shuffle_key", key)
        .withColumn(
            "shard",
            F.conv(F.substring(F.col("shuffle_key"), 1, 8), 16, 10).cast("long") % num_shards,
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
    )


def weighted_inclusion_sample(
    df: DataFrame,
    id_col: str,
    weight_cents: Column,
    expected_k: int,
) -> DataFrame:
    """Weight-proportional Poisson sampling with expected size ``expected_k``:
    row i is included iff u_i < k·w_i/W, where u_i is a deterministic
    uniform from md5(id) and W = Σw. The Horvitz-Thompson building block
    (inclusion probability known per row ⇒ unbiased weighted estimators),
    done STATELESSLY: membership is a pure function of (id, weights, k), so
    re-runs, repartitioning, and engine swaps reproduce the same sample.

    The inclusion test is EXACT integer arithmetic — u_i < k·w_i/W becomes
    h_i·W < k·w_i·2⁶⁰ with h_i the 60-bit md5 prefix. Spark evaluates it in
    DECIMAL: the declared product type h(20) × W(20) caps at (38,0), but the
    ACTUAL values fit exactly — h < 2⁶⁰ ≈ 1.16e18, so h·W < 1e38 whenever
    W < 8.6e19 cents (8.6e17 currency units; comfortably beyond 100-TB
    fact-table weight sums), and scale-0 decimals never round, they only
    null on true overflow. The DuckDB mirror uses HUGEINT. No float
    division ever runs, so the gate is bit-exact. Rows with k·w ≥ W are
    always included (u < 1 ≤ k·w/W).

    W is declared decimal(20,0), NOT a narrower type: sf0.1's orders table
    already sums to W = 3.75e12 (13 digits), and W grows linearly with SF —
    a decimal(12,0) here overflowed at 10× the oracle's scale factor.

    Scale shape: W is one map-side-combined aggregate broadcast back as a
    1-row dim; the filter is a narrow projection — no shuffle of the fact
    table, no sort, no state. Adds ``w_cents`` (the integer weight used).
    """
    weighted = df.withColumn("w_cents", weight_cents.cast("long"))
    tot = weighted.agg(F.sum("w_cents").cast("decimal(20,0)").alias("__W"))
    h = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("decimal(20,0)")
    )
    two60 = F.lit(1 << 60).cast("decimal(19,0)")
    rhs = (F.lit(expected_k).cast("decimal(15,0)") * F.col("w_cents")).cast("decimal(19,0)") * two60
    return (
        weighted.join(F.broadcast(tot))
        .filter((h * F.col("__W")) < rhs)
        .drop("__W")
    )
