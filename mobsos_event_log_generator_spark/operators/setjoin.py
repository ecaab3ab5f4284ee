"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin family:
Bayardo et al. WWW'07, Xiao et al. WWW'08 — public algorithms).

This is the scalable EXACT counterpart to the quadratic baseline in
``dedup.ngram_jaccard_pairs``: instead of joining every posting against every
posting (O(Σ df²) candidate rows), each record emits only its *prefix* — the
p = n − ⌈τ·n⌉ + 1 globally-rarest tokens — and candidates come from an
equi-join on prefix tokens. Full recall is a theorem, not a heuristic:

    For J(A,B) ≥ τ, the overlap o = |A∩B| ≥ τ·|A∪B| ≥ τ·max(|A|,|B|).
    Let t* = min(A∩B) under the canonical (df, token) order, and k = number
    of A-tokens ordered before t*. Those k tokens are not in B, so
    o ≤ |A| − k, giving k ≤ |A| − ⌈τ·|A|⌉ — i.e. t* sits inside A's
    p_A-prefix; by the symmetric argument (o ≥ τ·|B| too) t* also sits
    inside B's p_B-prefix. The equi-join on prefix tokens therefore sees
    every qualifying pair at least once.

The prefix length is computed in EXACT integer arithmetic (threshold as a
fraction, ⌈num·n/den⌉ = (num·n + den − 1) div den). A float ``ceil(τ·n)``
can round UP on exact multiples (0.8*5 → 4.000000000000001 → 5), silently
shortening the prefix and losing recall — the failure mode the driver's
exhaustive oracle would catch, so it is designed out here.

Scale shape (100 TB posture): document frequencies are one map-side-combined
aggregate; attaching df to postings is a shuffle on the token (skew-free —
tokens are near-unique after shingling); prefix selection is a per-document
WindowExec (partitioned by doc, never global); candidate generation is an
equi-join on prefix tokens whose fan-out is bounded because prefixes hold the
RAREST tokens by construction (a stop-shingle shared by B docs never lands in
a prefix once df ordering pushes it last). The size filter τ·|A| ≤ |B| ≤
|A|/τ is applied inside the join condition so oversized candidates never
materialize. Verification reuses ``dedup.jaccard_verify`` (equi-join
co-count — ratio of small ints, bit-exact cross-engine).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mobsos_event_log_generator_spark.operators.dedup import doc_shingles, jaccard_verify


def _threshold_fraction(threshold: float) -> Fraction:
    """Exact rational form of the user threshold (0.8 → 4/5)."""
    frac = Fraction(threshold).limit_denominator(10**6)
    if not 0 < frac <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    return frac


def prefix_postings(
    shingles: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Per-document prefix postings: the p = n − ⌈τ·n⌉ + 1 rarest tokens,
    under the canonical (document-frequency, token) total order.

    Input: distinct (id, shingle) postings. Output columns:
    (id, shingle, n_sh, pos) — n_sh is carried so the candidate join can
    apply the length filter without another join against the size table;
    pos (1-based rank under the canonical order) feeds the PPJoin
    positional filter in ``prefix_filter_candidates``.
    """
    frac = _threshold_fraction(threshold)
    dfreq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("t_df"))
    ranked = shingles.join(dfreq, "shingle")
    # n_sh rides the SAME doc-partitioned window shuffle as the rank (an
    # unordered count spec shares the row_number spec's exchange), replacing
    # the former groupBy(id)+join — one fewer shuffle of the posting table.
    w = Window.partitionBy(id_col).orderBy("t_df", "shingle")
    w_n = Window.partitionBy(id_col)
    # p = n − ⌈(num·n)/den⌉ + 1, all-integer so exact multiples never round up.
    prefix_len = (
        F.col("n_sh")
        - F.expr(f"(({frac.numerator} * n_sh) + {frac.denominator} - 1) div {frac.denominator}")
        + F.lit(1)
    )
    return (
        ranked.withColumn("pos", F.row_number().over(w))
        .withColumn("n_sh", F.count(F.lit(1)).over(w_n))
        .filter(F.col("pos") <= prefix_len)
        .select(id_col, "shingle", "n_sh", "pos")
    )


def prefix_filter_candidates(
    prefixes: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Candidate pairs from the symmetric prefix equi-join, with the length
    filter den·|B| ≥ num·|A| (⇔ |B| ≥ τ·|A|, exact integers) fused into the
    join condition on both sides, then the PPJoin POSITIONAL filter
    (Xiao et al. WWW'08, public algorithm) applied on the pair aggregate.

    Positional filter, exactly in integers: let m = number of prefix tokens
    the pair shares, and (i_last, j_last) the 1-based prefix positions of the
    LAST shared token under the canonical (df, token) order. Every common
    token NOT counted in m orders strictly after that token in both documents
    (a prefix(A)∩suffix(B) token orders after all of prefix(B), and
    vice-versa; suffix∩suffix tokens after both), so

        o = |A∩B| ≤ m + min(n1 − i_last, n2 − j_last),

    while J ≥ τ=num/den requires o ≥ α = ⌈num·(n1+n2)/(num+den)⌉. Pairs whose
    upper bound misses α are pruned BEFORE the verify join — recall is
    preserved by the bound, and the pair aggregate replaces the DISTINCT the
    plain prefix join already paid, so the filter costs no extra shuffle."""
    frac = _threshold_fraction(threshold)
    num, den = frac.numerator, frac.denominator
    # Rename BOTH sides' token columns before the self-join: a shared lineage
    # makes `a.shingle == b.shingle` resolve to the same attribute id
    # (Spark's "trivially true equals" warning), silently degrading the
    # candidate join into a size-filtered cross join.
    a = prefixes.select(
        F.col(id_col).alias("id1"),
        F.col("shingle").alias("sh1"),
        F.col("n_sh").alias("n1"),
        F.col("pos").alias("p1"),
    )
    b = prefixes.select(
        F.col(id_col).alias("id2"),
        F.col("shingle").alias("sh2"),
        F.col("n_sh").alias("n2"),
        F.col("pos").alias("p2"),
    )
    return (
        a.join(
            b,
            (F.col("sh1") == F.col("sh2"))
            & (F.col("id1") < F.col("id2"))
            & (F.col("n2") * den >= F.col("n1") * num)
            & (F.col("n1") * den >= F.col("n2") * num),
        )
        .groupBy("id1", "id2", "n1", "n2")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.max("p1").alias("i_last"),
            F.max("p2").alias("j_last"),
        )
        .filter(
            F.col("m")
            + F.least(F.col("n1") - F.col("i_last"), F.col("n2") - F.col("j_last"))
            >= F.expr(f"({num} * (n1 + n2) + {num} + {den} - 1) div ({num} + {den})")
        )
        # n1/n2 (exact distinct-shingle counts, carried from the prefix
        # window) ride along so the verify step can skip re-deriving a
        # per-doc counts aggregate — one whole copy of the shingle
        # pipeline plus two joins saved in every consumer plan.
        .select("id1", "id2", "n1", "n2")
    )


def prefix_filter_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact all-pairs Jaccard ≥ τ self-join: shingle → df-ordered prefix →
    prefix equi-join candidates → exact verify. Returns (id1, id2, jaccard),
    identical to the exhaustive quadratic truth (the driver oracle) but
    without ever forming the full posting×posting join."""
    sh = doc_shingles(df, id_col, text_col, n)
    pref = prefix_postings(sh, id_col, threshold)
    cand = prefix_filter_candidates(pref, id_col, threshold)
    return jaccard_verify(cand, sh, id_col, threshold, sizes_in_candidates=True)


def _deletion_variants_expr(col: str, radius: int) -> str:
    """SQL expression producing the DISTINCT deletion neighborhood of
    ``col`` up to ``radius`` single-character deletions (the FastSS /
    SymSpell signature set; Bocek et al., "Fast Similarity Search in
    Large Dictionaries", 2007 — public algorithm). Built entirely from
    JVM-side higher-order functions (transform/flatten over a position
    sequence) — no Python in the path; the per-string blowup is
    1 + L + L·(L−1)/2 for radius 2, bounded by string length."""
    if radius not in (1, 2):
        raise ValueError(f"radius must be 1 or 2, got {radius}")
    del1 = (
        "transform(sequence(1, length({x})), i -> "
        "concat(substring({x}, 1, i - 1), substring({x}, i + 1, length({x}))))"
    )
    d1 = del1.format(x=col)
    if radius == 1:
        return f"array_distinct(concat(array({col}), {d1}))"
    d2 = f"flatten(transform({d1}, t -> {del1.format(x='t')}))"
    return f"array_distinct(concat(array({col}), {d1}, {d2}))"


def edit_distance_join(
    df: DataFrame,
    key_col: str = "name",
    max_dist: int = 2,
) -> DataFrame:
    """Exact all-pairs edit-distance self-join, lev(a, b) <= max_dist,
    WITHOUT the quadratic cross product: every key emits its deletion
    neighborhood of radius max_dist and candidates come from an equi-join
    on shared variants. Full recall is the FastSS theorem: if
    lev(a, b) <= d then deleting (at most d) non-matching characters
    from each side yields a common string, so a and b share a radius-d
    deletion variant. Candidates are deduplicated, then verified with
    the built-in ``levenshtein`` (JVM-side, exact unit-cost edit
    distance — identical semantics in DuckDB's ``levenshtein``).

    Scale shape: per-key fan-out is 1 + L + L(L-1)/2 variant rows
    (bounded by key LENGTH, not data volume); the variant equi-join is
    the only shuffle; a length filter |len(a) - len(b)| <= d inside the
    join condition drops impossible candidates before the verify.
    Returns (name_a, name_b, dist) with name_a < name_b."""
    keys = df.select(F.col(key_col).alias("k")).distinct()
    sig = keys.select(
        "k", F.explode(F.expr(_deletion_variants_expr("k", max_dist))).alias("v")
    )
    a = sig.select(F.col("k").alias("name_a"), F.col("v").alias("va"))
    b = sig.select(F.col("k").alias("name_b"), F.col("v").alias("vb"))
    cand = (
        a.join(
            b,
            (F.col("va") == F.col("vb"))
            & (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length(F.col("name_a")) - F.length(F.col("name_b")))
                <= max_dist
            ),
        )
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.filter(
        F.levenshtein(F.col("name_a"), F.col("name_b")) <= max_dist
    ).select(
        "name_a",
        "name_b",
        F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long").alias("dist"),
    )
