"""Bucketed inverted-index layout for sparse retrieval (BM25 / TF-IDF).

The ad-hoc registry queries (plans/llm.py::search_bm25_topk,
doc_tfidf_cosine_pairs) derive postings, per-doc lengths, and norms from the
corpus INSIDE the query — correct, but every run re-shuffles the corpus-scaled
postings on the term key and the per-doc dims on doc_id. At 100 TB those are
the two dominant exchanges, and they are the same bytes every time: the index
is static between corpus refreshes.

This module is the persisted layout that removes both:

* ``postings``  — (doc_id, tok, tf), bucketed AND sorted by ``tok``: a term
  lookup join needs no Exchange on the postings side, ever — only the (small,
  query-sized) probe set shuffles into the bucket layout.
* ``termdf``    — (tok, df), bucketed by ``tok``: idf joins ride the same
  layout, so scoring adds no postings-side exchange either.
* ``doclen``    — (doc_id, dlen), bucketed by ``doc_id``: the BM25 length
  normalization joins candidates to doc dims with no Exchange on the
  corpus-scaled side; only the candidate set (queries x matched postings,
  bounded) moves.
* ``docnorm``   — (doc_id, nrm), bucketed by ``doc_id``: same contract for
  TF-IDF cosine rerank.
* ``stats``     — 1 row (n_docs, avgdl): broadcast scalar.

Bucket counts must match between co-joined tables only if BOTH sides are
bucketed; here each join has exactly one corpus-scaled side, so the bucket
count just sizes per-bucket files (pick ~total_size / 256 MB at scale).

Scoring formulas are shared verbatim with the registry queries (Robertson
BM25 with the +1 idf smoothing; plain tf*idf / L2 cosine), so results are
bit-identical to the ad-hoc path — asserted by tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def corpus_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, tok, tf) term frequencies — the inverted-index fact table."""
    from mobsos_event_log_generator_spark.operators.text import tokens

    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def index_table_names(prefix: str) -> dict[str, str]:
    return {
        "postings": f"{prefix}_postings",
        "termdf": f"{prefix}_termdf",
        "doclen": f"{prefix}_doclen",
        "docnorm": f"{prefix}_docnorm",
        "stats": f"{prefix}_stats",
    }


def build_retrieval_index(
    docs: DataFrame,
    prefix: str = "retrieval",
    num_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, str]:
    """Materialize the bucketed index tables; returns {role: table_name}.

    One corpus pass builds postings; doc/term dims and the idf inputs are
    map-side-combined aggregates of it. Buckets are sorted so sort-merge
    joins skip the per-task sort on the indexed side too."""
    spark = docs.sparkSession
    names = index_table_names(prefix)
    tf = corpus_postings(docs, id_col, text_col)

    for t in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    (
        tf.write.mode("overwrite")
        .bucketBy(num_buckets, "tok")
        .sortBy("tok")
        .saveAsTable(names["postings"])
    )
    postings = spark.table(names["postings"])
    (
        postings.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.mode("overwrite")
        .bucketBy(num_buckets, "tok")
        .sortBy("tok")
        .saveAsTable(names["termdf"])
    )
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dlen"))
    (
        dl.write.mode("overwrite")
        .bucketBy(num_buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(names["doclen"])
    )
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dlen").alias("avgdl"))
    stats.write.mode("overwrite").saveAsTable(names["stats"])

    n_docs = spark.table(names["stats"]).first()["n_docs"]
    idf_w = F.log(F.lit(float(n_docs)) / F.col("df"))
    norms = (
        postings.join(spark.table(names["termdf"]), "tok")
        .select("doc_id", (F.col("tf") * idf_w).alias("w"))
        .groupBy("doc_id")
        .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    )
    (
        norms.write.mode("overwrite")
        .bucketBy(num_buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(names["docnorm"])
    )
    return names


def bm25_topk_from_index(
    spark: SparkSession,
    queries: DataFrame,
    prefix: str = "retrieval",
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k over the persisted index. ``queries`` is (query_id, tok).

    Join shape at scale: probe → postings and → termdf ride the ``tok``
    bucket layout (no Exchange above either indexed scan); the candidate →
    doclen join rides the ``doc_id`` layout (no Exchange above the doclen
    scan). The only data that moves is the probe set and the candidate set.
    Identical scores/ranking to plans/llm.py::search_bm25_topk."""
    from pyspark.sql.window import Window

    names = index_table_names(prefix)
    postings = spark.table(names["postings"])
    termdf = spark.table(names["termdf"])
    dl = spark.table(names["doclen"])
    stats = spark.table(names["stats"])
    idf = termdf.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.log(((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)) + 1.0).alias("idf"),
    )
    scored = (
        queries.join(postings, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(idf, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy(F.col("query_id"), F.col("doc_id").alias("result_id"))
        .agg(
            F.round(
                F.sum(
                    F.col("idf")
                    * (F.col("tf") * (k1 + 1.0))
                    / (F.col("tf") + k1 * (1.0 - b + b * F.col("dlen") / F.col("avgdl")))
                ),
                6,
            ).alias("bm25")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("result_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def tfidf_cosine_pairs_from_index(
    spark: SparkSession,
    prefix: str = "retrieval",
    min_cosine: float = 0.9,
) -> DataFrame:
    """All-pairs TF-IDF cosine ≥ ``min_cosine`` over the persisted index —
    the near-dup candidate sweep of plans/llm.py::doc_tfidf_cosine_pairs,
    bit-identical (same idf = ln(N/df), same 6-dp round).

    Join shape at scale: the weighted-vector build (postings ⋈ termdf on
    tok) and the dot-product self-join both ride the ``tok`` bucket layout —
    no Exchange above any postings/termdf scan; the norm joins ride the
    ``doc_id`` layout of docnorm, so the corpus-scaled norm table never
    re-shuffles — only the surviving dot-product pairs move."""
    names = index_table_names(prefix)
    postings = spark.table(names["postings"])
    termdf = spark.table(names["termdf"])
    norms = spark.table(names["docnorm"])
    stats = spark.table(names["stats"])
    idf = termdf.crossJoin(F.broadcast(stats)).select(
        "tok", F.log(F.col("n_docs").cast("double") / F.col("df")).alias("idf")
    )
    wv = postings.join(idf, "tok").select(
        "doc_id", "tok", (F.col("tf") * F.col("idf")).alias("w")
    )
    a = wv.select(F.col("doc_id").alias("id1"), F.col("tok").alias("t1"), F.col("w").alias("w1"))
    b = wv.select(F.col("doc_id").alias("id2"), F.col("tok").alias("t2"), F.col("w").alias("w2"))
    dots = (
        a.join(b, (F.col("t1") == F.col("t2")) & (F.col("id1") < F.col("id2")))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    n1 = norms.select(F.col("doc_id").alias("id1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("doc_id").alias("id2"), F.col("nrm").alias("nrm2"))
    return (
        dots.join(n1, "id1")
        .join(n2, "id2")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")), 6))
        .filter(F.col("cosine") >= min_cosine)
        .select("id1", "id2", "cosine")
    )
