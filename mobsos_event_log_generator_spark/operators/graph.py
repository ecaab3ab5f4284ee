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

Two interchangeable algorithms, same (node, component) contract:

* ``connected_components`` — min-label propagation; iterations = graph
  DIAMETER. Cheapest per round; right when clusters are near-cliques.
* ``connected_components_star`` — alternating large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14): each round attaches nodes to their neighborhood
  minimum, halving component height, so rounds are O(log n) regardless of
  diameter — the scale-safe choice for a 100-TB dedup graph whose shape
  you don't control (a chain of pairwise-similar docs is a long path).
  ``dedup_clusters`` routes through this one.
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
        "graph diameter exceeds expectation — raise max_iterations or use "
        "connected_components_star (O(log n) rounds)"
    )


def _symmetric(edges: DataFrame) -> DataFrame:
    # callers maintain the a > b normal form, so the union is duplicate-free
    # by construction — no distinct shuffle needed
    return edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One star contraction over the symmetric closure of ``edges``.

    For each node u with neighborhood minimum m = min(N(u) ∪ {u}):
    large-star attaches every STRICTLY GREATER neighbor to m; small-star
    attaches every smaller-or-equal member of N(u) ∪ {u} to m. Both are a
    groupBy(min) + equi-join — the same shuffle shape as one min-label
    round — and both preserve connectivity (Kiveris et al., Lemmas 1-2)."""
    nb = _symmetric(edges)
    mins = nb.groupBy("a").agg(F.min("b").alias("mn")).select("a", F.least("mn", "a").alias("m"))
    j = nb.join(mins, "a")
    if large:
        out = j.filter(F.col("b") > F.col("a")).select(F.col("b").alias("a"), F.col("m").alias("b"))
    else:
        out = j.filter(F.col("b") < F.col("a")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        ).union(mins.select(F.col("a"), F.col("m").alias("b")))
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components_star(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star contraction —
    O(log n) rounds in the component size, independent of graph diameter
    (min-label propagation needs diameter rounds: 10^4 sequential shuffles
    on a 10^4-long chain; this needs ~14).

    Same contract as ``connected_components``: component = min reachable
    node id; raises rather than returning wrong clusters if the round
    budget is exhausted. Per round: two star steps (groupBy + join each)
    plus a one-job fixpoint probe, all lineage-truncated via
    localCheckpoint. Edges stay in the a > b (child > parent) normal form
    so the symmetric closure never needs a dedup shuffle."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        edges = _star_round(_star_round(edges, large=True), large=False)
        edges = edges.localCheckpoint(eager=True)
        # Small-star output is a union of child→parent stars with parent =
        # neighborhood min. Fixpoint ⇔ no parent is still someone's child
        # (then every component is a single depth-1 star whose center is
        # the component min — star steps preserve components). One semi-join
        # probe on the checkpointed edges, detected the same round the
        # stars form (an edge-set compare needs one extra no-op round).
        parents = edges.select(F.col("b").alias("a")).distinct()
        if edges.join(parents, "a", "left_semi").limit(1).count() == 0:
            members = edges.select(F.col("a").alias("node"), F.col("b").alias("component"))
            centers = edges.select(F.col("b").alias("node"), F.col("b").alias("component"))
            return members.union(centers).distinct()
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iterations} rounds; "
        "this bounds O(log n) — raise max_iterations for astronomically large components"
    )
