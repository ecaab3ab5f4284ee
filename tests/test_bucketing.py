"""Bucketed-table co-located join: writing both fact tables bucketed by the
join key lets Spark join them with NO shuffle exchange — the pre-partitioning
technique for repeated fact-fact joins at 100 TB (SURVEY.md 'bucketing for
co-located joins')."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_bkt"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_bkt"))
    yield spark.table("orders_bkt"), spark.table("lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o, li = bucketed_tables
    # Force a shuffle-based strategy decision: disable broadcast so the only
    # way to avoid an Exchange is the bucket layout itself.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # The join itself must not introduce exchanges on either side; the
        # only allowed Exchange is the one for the final groupBy.
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section[:2000]
        # correctness unchanged vs the unbucketed join
        base_o = load_table(spark, "/root/testdata/sf0.001", "orders")
        base_li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        want = {
            (r["o_orderpriority"], r["n"])
            for r in base_li.join(base_o, base_li.l_orderkey == base_o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {(r["o_orderpriority"], r["n"]) for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_ivf_persisted_index_matches_in_memory(spark, tmp_path):
    """ivf_write_index + ivf_query_index ≡ ivf_ann_topk (same deterministic
    training), and the probe join prunes list partitions (DPP or static)."""
    from mobsos_event_log_generator_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_query_index,
        ivf_write_index,
    )
    from mobsos_event_log_generator_spark.sources.parquet import ensure_min_partitions, load_table

    emb = ensure_min_partitions(load_table(spark, "/root/testdata/sf0.001", "embeddings"))
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "ivf")
    ivf_write_index(emb, path, num_centroids=8, iters=1)

    got = ivf_query_index(spark, path, queries, k=5, nprobe=2)
    want = ivf_ann_topk(emb, queries, k=5, nprobe=2, num_centroids=8, iters=1)
    a = sorted(map(tuple, got.select("query_id", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, want.select("query_id", "neighbor_id", "rank").collect()))
    assert a == b and len(a) > 0

    plan = got._jdf.queryExecution().executedPlan().toString()
    # The lists scan must carry a cid PartitionFilter fed by dynamic
    # partition pruning (probe cells -> pruned cid= directories).
    assert "PartitionFilters: [isnotnull(cid" in plan
    assert "dynamicpruning" in plan.lower()


def test_multitable_persisted_index_matches_in_memory(spark, tmp_path):
    """multitable_write_index + multitable_query_index ≡ multitable_ann_topk
    (identical candidate set, cosine, tie order), and candidate generation
    reads ONLY the id-only postings (partition-pruned buckets) — vectors
    enter via the bounded candidate equi-join, never the stage-1 scan."""
    from mobsos_event_log_generator_spark.operators.similarity import (
        multitable_ann_topk,
        multitable_query_index,
        multitable_write_index,
    )
    from mobsos_event_log_generator_spark.sources.parquet import ensure_min_partitions, load_table

    emb = ensure_min_partitions(load_table(spark, "/root/testdata/sf0.001", "embeddings"))
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "mt")
    multitable_write_index(emb, path)

    got = multitable_query_index(spark, path, queries, k=5)
    want = multitable_ann_topk(emb, queries, k=5)
    a = sorted(map(tuple, got.select("query_id", "neighbor_id", "cosine", "rank").collect()))
    b = sorted(map(tuple, want.select("query_id", "neighbor_id", "cosine", "rank").collect()))
    assert a == b and len(a) > 0

    plan = got._jdf.queryExecution().executedPlan().toString()
    # postings scan: partition-pruned on (tbl, code), id-only payload.
    # Identify it by its projected column list (plan metadata fields like
    # Location truncate at 100 chars, so path matching is unreliable).
    assert "dynamicpruning" in plan.lower()
    postings_scans = re.findall(r"FileScan parquet \[neighbor_id#\d+L,tbl#[^\]]*\]", plan)
    assert postings_scans and all(
        "embedding" not in s and "c_vec" not in s for s in postings_scans
    )


def test_retrieval_index_bm25_matches_adhoc_and_saves_shuffles(spark):
    """The persisted bucketed inverted index (operators/retrieval_index.py)
    must (a) reproduce plans/llm.py::search_bm25_topk bit-for-bit on the
    same corpus and query set, and (b) remove the exchanges above the
    corpus-scaled sides: postings/termdf ride the tok bucket layout and
    doclen rides the doc_id layout, so the bucketed plan shuffles strictly
    less than the identical joins over unbucketed copies."""
    from mobsos_event_log_generator_spark.operators import retrieval_index as R
    from mobsos_event_log_generator_spark.plans.queries import QUERIES
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    names = R.build_retrieval_index(docs, prefix="t_retr", num_buckets=4)
    try:
        queries = (
            R.corpus_postings(docs)
            .filter(F.col("doc_id") % 50 == 0)
            .select(F.col("doc_id").alias("query_id"), "tok")
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            got_df = R.bm25_topk_from_index(spark, queries, prefix="t_retr", k=5)
            plan_idx = got_df._jdf.queryExecution().executedPlan().toString()
            got = {(r["query_id"], r["result_id"], r["bm25"], r["rank"]) for r in got_df.collect()}

            # identical joins over UNBUCKETED copies of the same tables
            for role in ("postings", "termdf", "doclen"):
                spark.table(names[role]).write.mode("overwrite").saveAsTable(f"flat_{role}")
            spark.table(names["stats"]).write.mode("overwrite").saveAsTable("flat_stats")
            flat_names = {role: f"flat_{role}" for role in ("postings", "termdf", "doclen", "stats")}
            import unittest.mock as mock

            with mock.patch.object(R, "index_table_names", return_value=dict(R.index_table_names("x"), **flat_names)):
                flat_df = R.bm25_topk_from_index(spark, queries, prefix="ignored", k=5)
            plan_flat = flat_df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

        # (a) bit-identical to the ad-hoc registry query on the same corpus
        want = {
            (r["query_id"], r["result_id"], r["bm25"], r["rank"])
            for r in QUERIES["search_bm25_topk"](spark, "/root/testdata/sf0.001").collect()
        }
        assert got == want and got

        # (b) the bucket layout removes the corpus-side exchanges: postings,
        # termdf (tok) and doclen (doc_id) each stop shuffling
        n_idx = plan_idx.count("Exchange hashpartitioning")
        n_flat = plan_flat.count("Exchange hashpartitioning")
        assert n_idx <= n_flat - 3, (n_idx, n_flat)
    finally:
        for t in list(names.values()) + [f"flat_{r}" for r in ("postings", "termdf", "doclen", "stats")]:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_retrieval_index_tfidf_cosine_matches_adhoc(spark):
    """tfidf_cosine_pairs_from_index must reproduce the registry's
    doc_tfidf_cosine_pairs on the same corpus (same idf/norm/6-dp-round
    contract), with the norm joins riding the doc_id bucket layout."""
    from mobsos_event_log_generator_spark.operators import retrieval_index as R
    from mobsos_event_log_generator_spark.plans.queries import QUERIES
    from mobsos_event_log_generator_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    names = R.build_retrieval_index(docs, prefix="t_retr2", num_buckets=4)
    try:
        got = {
            (r["id1"], r["id2"], r["cosine"])
            for r in R.tfidf_cosine_pairs_from_index(spark, prefix="t_retr2").collect()
        }
        want = {
            (r["id1"], r["id2"], r["cosine"])
            for r in QUERIES["doc_tfidf_cosine_pairs"](spark, "/root/testdata/sf0.001").collect()
        }
        assert got == want
    finally:
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
