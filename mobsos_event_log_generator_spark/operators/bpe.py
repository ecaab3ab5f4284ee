"""Distributed BPE merge training (Sennrich et al. 2016, public algorithm).

Learns byte-pair-encoding merges over a document corpus the way a training
pipeline does before tokenizer freeze: each iteration counts every adjacent
symbol pair across the corpus (weighted by word frequency), promotes the most
frequent pair to a new symbol, and rewrites the vocabulary. The loop is
inherently iterative (each merge depends on the previous rewrite), so this is
a driver-coordinated sequence of distributed aggregations — the same shape as
``graph.py``'s connected components: per-iteration jobs over a DataFrame,
``localCheckpoint`` to keep the plan from deepening, and only ONE tiny row
(the winning pair) ever reaching the driver per iteration.

Scale notes:
* The working set is the DISTINCT-WORD vocabulary with frequencies — shrinks
  the corpus by orders of magnitude before any iteration starts (100 TB of
  text is typically < 10⁸ unique words), and iterations never touch the
  corpus again.
* The greedy left-to-right merge rewrite is a single JVM
  ``regexp_replace`` on the space-delimited symbol string (Java's
  ``replaceAll`` IS non-overlapping left-to-right — exactly BPE's greedy
  semantics); no Python in the loop.
* Pair counting is explode → map-side-combined sum keyed on the pair.

Determinism: ties on pair count break lexicographically on (left, right), so
the learned merge table is a pure function of the corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Adjacent symbol pairs of the space-delimited symbol string, as structs.
_PAIRS_EXPR = (
    "transform(sequence(1, size(syms) - 1), i -> "
    "struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
)


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    from mobsos_event_log_generator_spark.operators.text import tokens

    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        # "h e l l o": one space between every character.
        .withColumn("symstr", F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_freq: int = 2,
    checkpoint_every: int = 4,
) -> list[dict]:
    """Learn up to ``num_merges`` BPE merges; returns them in rank order as
    dicts ``{rank, left, right, merged, pair_freq}``. Stops early when no
    pair reaches ``min_pair_freq``.

    Round fusion (r10 verdict #4): the per-rank rewrite is applied LAZILY —
    the next rank's pair-count job executes the pending ``regexp_replace``
    chain as part of its own scan, and the vocabulary is only materialized
    every ``checkpoint_every`` ranks (plan depth stays bounded). This
    halves the driver-round job count vs checkpoint-per-rank (the
    bpe_train_merges cost class is round-bound, not data-bound); the merge
    trajectory is unchanged — the rewrites applied are identical, only
    WHERE they execute moves."""
    vocab = _word_vocab(docs, text_col).localCheckpoint()
    merges: list[dict] = []
    pending = 0
    for rank in range(num_merges):
        top = (
            vocab.select("freq", F.split("symstr", " ").alias("syms"))
            .filter(F.size("syms") >= 2)
            .select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_freq:
            break
        l, r = top[0]["l"], top[0]["r"]
        merges.append(
            {"rank": rank, "left": l, "right": r, "merged": l + r, "pair_freq": int(top[0]["n"])}
        )
        # Greedy non-overlapping left-to-right rewrite, all JVM-side. The
        # lookarounds pin whole symbols: "l r" only between space/edges.
        pattern = r"(?<!\S)" + re.escape(f"{l} {r}") + r"(?!\S)"
        # Java replacement-string escaping: only backslash and dollar are
        # special there (NOT regex metachars — re.escape would inject
        # literal backslashes into the merged symbol).
        replacement = (l + r).replace("\\", "\\\\").replace("$", "\\$")
        vocab = vocab.withColumn("symstr", F.regexp_replace("symstr", pattern, replacement))
        pending += 1
        if pending >= checkpoint_every:
            vocab = vocab.localCheckpoint()
            pending = 0
    return merges


def bpe_merges_df(docs: DataFrame, text_col: str = "text", num_merges: int = 20) -> DataFrame:
    """The learned merge table as a DataFrame (rank-ordered)."""
    spark = docs.sparkSession
    rows = bpe_train(docs, text_col, num_merges)
    schema = "rank int, left string, right string, merged string, pair_freq long"
    from mobsos_event_log_generator_spark.driver_rows import driver_rows_df

    return driver_rows_df(
        spark, [(m["rank"], m["left"], m["right"], m["merged"], m["pair_freq"]) for m in rows], schema
    )


def bpe_segment(df: DataFrame, merges: list[dict], text_col: str = "text") -> DataFrame:
    """Apply a learned merge table: segment every word of every document into
    BPE tokens by replaying the merges in rank order. The whole chain is
    nested JVM ``regexp_replace`` over the space-delimited symbol string —
    rank order IS the replay order (BPE inference applies merges in learned
    priority), and each replace is greedy left-to-right like training.
    Output: one row per (doc, word position) with the token array."""
    out = df.select(
        "*",
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("word_pos", "__w"),
    ).filter(F.col("__w") != "")
    symstr = F.trim(F.regexp_replace(F.col("__w"), "(.)", "$1 "))
    for m in merges:
        pattern = r"(?<!\S)" + re.escape(f"{m['left']} {m['right']}") + r"(?!\S)"
        replacement = m["merged"].replace("\\", "\\\\").replace("$", "\\$")
        symstr = F.regexp_replace(symstr, pattern, replacement)
    return out.withColumn("bpe_tokens", F.split(symstr, " ")).drop("__w")
