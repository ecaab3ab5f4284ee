"""Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the point of each):

* **Exact** — hash-groupBy on a content digest; one shuffle on the digest key,
  perfectly parallel, no driver state.
* **MinHash+LSH** — the 100 TB fuzzy-dedup path: per-doc signatures are a
  single explode→groupBy (map-side combined); candidate generation is an
  equi-join on (band, band_hash) — i.e. only documents sharing a bucket ever
  meet, never an all-pairs product; candidates are exactly verified with set
  Jaccard. Hash family: lexicographic min of md5(seed || shingle) per seed —
  deterministic across engines, no RNG state to ship.
* **SimHash** — 32-bit signature from md5-nibble votes; near-dup = signature
  bucket equality (or small hamming radius via rotations).
* **n-gram Jaccard** — exact pairwise within a blocking key (for bounded
  blocks); the honest quadratic baseline the LSH path approximates.
* **Embedding cosine** — near-dup pairs over a vector column within a
  blocking key; the scale path is the LSH/IVF bucketing in ``similarity.py``.

All deterministic, all expressible as DataFrame algebra; the DuckDB oracles in
``plans/llm.py`` re-run the same algorithms (and, where the data allows, the
exhaustive ground truth) for byte-exact comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.operators.text import tokens, word_shingles

NUM_MINHASHES = 12
NUM_BANDS = 4
ROWS_PER_BAND = NUM_MINHASHES // NUM_BANDS
SIMHASH_BITS = 32  # one bit per md5 hex nibble


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: one row per duplicated digest with the surviving
    (minimum) id, the duplicate count, and the sorted member list."""
    digest = F.md5(F.col(text_col))
    return (
        df.groupBy(digest.alias("digest"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.array_join(F.array_sort(F.collect_list(F.col(id_col).cast("string"))), ",").alias("members"),
        )
        .filter(F.col("n_dups") > 1)
    )


def doc_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (docs with < n words drop
    out — they have no shingle set to compare)."""
    return (
        df.select(F.col(id_col), F.explode(word_shingles(tokens(text_col), n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = NUM_MINHASHES) -> DataFrame:
    """Per-doc minhash signature: sig_i = min(md5('s{i}|' || shingle)).

    One groupBy over the exploded shingles computes all hashes at once;
    partial aggregation combines map-side so the shuffle carries one row per
    (doc, partition), not per shingle.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_bands(signatures: DataFrame, id_col: str = "doc_id", num_bands: int = NUM_BANDS) -> DataFrame:
    """Band rows: (doc, band, band_hash) where band_hash folds r consecutive
    minhashes. Docs agreeing on any band become join candidates."""
    r = NUM_MINHASHES // num_bands
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * r + k}") for k in range(r)])).alias("band_hash"),
        )
        for b in range(num_bands)
    ]
    return signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bh")
    ).select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs from shared LSH buckets (equi-join on the
    bucket key — the only place two documents ever meet)."""
    a = bands.select(F.col(id_col).alias("id1"), "band", "band_hash")
    b = bands.select(F.col(id_col).alias("id2"), "band", "band_hash")
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    shingles: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact set-Jaccard on candidate pairs via shingle co-count:
    |A∩B| from a join on the shingle key, |A∪B| = |A|+|B|-|A∩B|.
    Jaccard is a ratio of small ints — bit-exact across engines."""
    counts = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    s1 = shingles.select(F.col(id_col).alias("id1"), "shingle")
    s2 = shingles.select(F.col(id_col).alias("id2"), "shingle")
    inter = (
        candidates.join(s1, "id1")
        .join(s2, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    c1 = counts.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(c1, "id1")
        .join(c2, "id2")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Full fuzzy-dedup pipeline: shingle → minhash → LSH buckets → candidate
    pairs → exact Jaccard verify. Returns (id1, id2, jaccard) near-dup pairs."""
    sh = doc_shingles(df, id_col, text_col)
    sig = minhash_signatures(sh, id_col)
    cand = lsh_candidate_pairs(lsh_bands(sig, id_col), id_col)
    return jaccard_verify(cand, sh, id_col, threshold)


def simhash(words: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over a word array: bit j is the sign of the sum over words of
    ±1 votes taken from md5 hex nibble j (occurrence-weighted). Returns a
    non-negative bigint (bits 0..31)."""
    def vote(j: int):
        return lambda acc, w: acc + F.when(
            F.substring(F.md5(w), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1
        ).otherwise(-1)

    votes = [F.aggregate(words, F.lit(0).cast("long"), vote(j)) for j in range(bits)]
    out = F.lit(0).cast("long")
    for j, v in enumerate(votes):
        out = out + F.when(v > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_buckets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc simhash + exact-signature duplicate buckets (hamming-0). Small
    hamming radii are reachable by re-bucketing on bit-rotations."""
    sigs = df.select(F.col(id_col), simhash(tokens(text_col)).alias("simhash"))
    return (
        sigs.groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.array_sort(F.collect_list(F.col(id_col).cast("string"))), ",").alias("members"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard within a blocking key (honest quadratic baseline;
    blocks must be bounded — at scale prefer minhash_lsh_dedup)."""
    sh = (
        df.select(F.col(id_col), F.col(block_col).alias("block"), F.explode(word_shingles(tokens(text_col), n)).alias("shingle"))
        .distinct()
    )
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id1"), F.col("block"), "shingle")
    b = sh.select(F.col(id_col).alias("id2"), F.col("block"), "shingle")
    inter = (
        a.join(b, ["block", "shingle"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    c1 = counts.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(c1, "id1")
        .join(c2, "id2")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
