"""Distributed connected components — dedup clustering.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one doc
per transitive group: A~B, B~C ⇒ {A,B,C} even if A,C never matched). This is
connected components over the match graph, the step after any fuzzy-dedup
pass in an LLM-data pipeline.

Algorithm: min-label propagation to a fixpoint — each node's label becomes
the minimum label among itself and its neighbors, iterated until no label
changes. Every iteration is one shuffle (join + groupBy on node id);
``localCheckpoint`` truncates the plan lineage between iterations (otherwise
the unresolved plan doubles per round and the convergence-check action
re-executes the whole history — the measured quadratic, see
ENGINEERING_NOTES). Checkpoint blocks are freed by Spark's ContextCleaner
when the final DataFrame is garbage-collected, so the operator stays
caller-cache-free like everything else in ``operators/``.

Iterations needed = graph diameter (≤ a few for dedup clusters, which are
near-cliques by construction). For adversarial long-chain graphs at 100 TB,
swap the propagation step for the large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
same per-round shuffle shape, O(log²) rounds; the hook is ``step=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min node id
    reachable through the undirected pair graph (a canonical, deterministic
    cluster id — the survivor in keep-min dedup policies).

    Raises if the fixpoint isn't reached in ``max_iterations`` (diameter
    larger than expected) rather than returning wrong clusters silently."""
    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # edges are reused every round — one materialization, lineage-free
    edges = edges.localCheckpoint(eager=True)

    labels = edges.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias("comp"),
                (F.col("n_comp") < F.col("comp")).alias("__changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels.select(F.col("node"), F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations; "
        "graph diameter exceeds expectation — raise max_iterations or use a "
        "star-contraction step"
    )
