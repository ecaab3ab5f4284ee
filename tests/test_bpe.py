"""Distributed BPE trainer vs a pure-Python reference implementation of the
same published algorithm (Sennrich et al. 2016) — merge-for-merge equality,
including tie-breaks and greedy overlap handling."""

from __future__ import annotations

from collections import Counter

from mobsos_event_log_generator_spark.operators.bpe import bpe_train
from mobsos_event_log_generator_spark.sources.parquet import load_table


def _reference_bpe(texts: list[str], num_merges: int, min_pair_freq: int = 2):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[tuple(w)] += 1
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        # max count, ties lexicographic on (left, right)
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_freq:
            break
        merges.append((rank, l, r, l + r, n))
        new_vocab: Counter = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_on_tiny_corpus(spark):
    texts = ["low lower lowest", "low low newer newest", "wider wide wide"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, num_merges=10)
    want = _reference_bpe(texts, 10)
    assert [(m["rank"], m["left"], m["right"], m["merged"], m["pair_freq"]) for m in got] == want


def test_bpe_greedy_overlap_semantics(spark):
    # 'aaaa' with merge (a,a): greedy left-to-right yields (aa)(aa), never
    # the overlapping middle pair.
    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    got = bpe_train(df, num_merges=2)
    want = _reference_bpe(["aaaa aaaa"], 2)
    assert [(m["rank"], m["left"], m["right"], m["merged"], m["pair_freq"]) for m in got] == want
    assert got[0]["merged"] == "aa" and got[1]["merged"] == "aaaa"


def test_bpe_matches_reference_on_fixture(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe_train(docs, num_merges=8)
    want = _reference_bpe(texts, 8)
    assert [(m["rank"], m["left"], m["right"], m["merged"], m["pair_freq"]) for m in got] == want
    assert len(got) == 8


def _reference_segment(word: str, merges):
    syms = list(word)
    for _, l, r, merged, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_segment_matches_reference(spark):
    from mobsos_event_log_generator_spark.operators.bpe import bpe_segment

    texts = ["low lower lowest newer", "wide wider lowest low"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges_list = bpe_train(df, num_merges=6)
    ref_merges = [(m["rank"], m["left"], m["right"], m["merged"], m["pair_freq"]) for m in merges_list]

    seg = bpe_segment(df, merges_list)
    got = {
        (r["text"], r["word_pos"]): list(r["bpe_tokens"]) for r in seg.collect()
    }
    for t in texts:
        for i, w in enumerate(t.split()):
            assert got[(t, i)] == _reference_segment(w, ref_merges), (w, got[(t, i)])
