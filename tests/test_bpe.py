"""Distributed BPE learner vs an independent pure-Python reference
implementation of the Sennrich et al. 2016 algorithm (exact merge-
sequence equality), plus kernel-level greedy-rewrite semantics."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from rmlint_spark.operators.bpe import (
    END_MARK,
    apply_merge,
    bpe_token_counts,
    initial_symbols,
    learn_bpe,
    pair_counts,
    word_counts,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the lowest newest widest low",
]


def _ref_word_freqs(texts):
    wf = Counter()
    for t in texts:
        for w in t.split():
            if w:
                wf[w] += 1
    return wf


def _ref_bpe(texts, n_merges, min_count=2):
    """Independent reference: Counter-based Sennrich BPE with the same
    tie-break (count desc, then lexicographic pair asc)."""
    vocab = {
        tuple(w) + (END_MARK,): f for w, f in _ref_word_freqs(texts).items()
    }
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        if counts[best] < min_count:
            break
        merges.append((rank, best[0], best[1], counts[best]))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_word_counts_census(docs):
    got = {r["word"]: r["freq"] for r in word_counts(docs).collect()}
    assert got == dict(_ref_word_freqs(CORPUS))


def test_initial_symbols_and_pair_counts(docs):
    syms = initial_symbols(word_counts(docs))
    row = {r["word"]: r["symbols"] for r in syms.collect()}["low"]
    assert row == ["l", "o", "w", END_MARK]
    got = {
        (r["left_sym"], r["right_sym"]): r["pair_cnt"]
        for r in pair_counts(syms).collect()
    }
    ref = Counter()
    for w, f in _ref_word_freqs(CORPUS).items():
        s = tuple(w) + (END_MARK,)
        for a, b in zip(s, s[1:]):
            ref[(a, b)] += f
    assert got == dict(ref)


def test_apply_merge_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [("aaaa", 1, ["a", "a", "a", "a"]), ("aba", 1, ["a", "b", "a"])],
        "word string, freq long, symbols array<string>",
    )
    got = {r["word"]: r["symbols"] for r in apply_merge(df, "a", "a").collect()}
    assert got["aaaa"] == ["aa", "aa"]  # non-overlapping, left-to-right
    assert got["aba"] == ["a", "b", "a"]


def test_learn_bpe_matches_reference_exactly(docs):
    want, ref_vocab = _ref_bpe(CORPUS, n_merges=12)
    got = learn_bpe(docs, n_merges=12)
    assert got == want
    # segmented vocabulary agrees too
    from rmlint_spark.operators.bpe import segment_words

    seg = {
        r["word"]: tuple(r["symbols"])
        for r in segment_words(word_counts(docs), got).collect()
    }
    ref_seg = {"".join(s).replace(END_MARK, ""): s for s in ref_vocab}
    for word, syms in seg.items():
        assert syms == ref_seg[word], word


def test_learn_bpe_min_count_stops_early(docs):
    merges = learn_bpe(docs, n_merges=500, min_count=4)
    assert 0 < len(merges) < 500
    assert all(c >= 4 for _, _, _, c in merges)


def test_token_counts_shrink_with_merges(docs):
    merges = learn_bpe(docs, n_merges=10)
    with_merges = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    without = {
        r["doc_id"]: r["n_tokens"] for r in bpe_token_counts(docs, []).collect()
    }
    assert set(with_merges) == set(without) == set(range(len(CORPUS)))
    assert all(with_merges[d] < without[d] for d in with_merges)
    # chars+marker count when no merges apply
    assert without[0] == 5 * (len("low") + 1)


def test_pair_count_plan_is_single_agg(docs):
    """The iteration body must stay JVM-side: no Python evaluators in
    the pair-count plan, exactly one aggregate key exchange."""
    plan = pair_counts(initial_symbols(word_counts(docs)))._jdf.queryExecution().optimizedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_learn_bpe_matches_reference_on_randomized_corpus(spark):
    """Second parity corpus: seeded random words over a 4-letter
    alphabet force heavy pair collisions and tie-breaks."""
    import numpy as np

    rng = np.random.RandomState(11)
    words = [
        "".join(rng.choice(list("abcd"), size=rng.randint(1, 9)))
        for _ in range(120)
    ]
    texts = [" ".join(words[i::3]) for i in range(3)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want, _ = _ref_bpe(texts, n_merges=15)
    assert learn_bpe(docs, n_merges=15) == want
