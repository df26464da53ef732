"""Unit tests for the corpus-model operator family: char-bigram LM
quality scoring, deterministic quota/mixture sampling, and TF-IDF
keyword extraction — planted corpora with hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from rmlint_spark.operators.lm_quality import charlm_scores, doc_bigram_counts
from rmlint_spark.operators.sampling import quota_sample
from rmlint_spark.operators.tfidf import tfidf_topk


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


# ---------------------------------------------------------------- charlm


def test_bigram_counts_exact(spark):
    d = _docs(spark, [("abab", "s")])
    got = {r["bg"]: r["c"] for r in doc_bigram_counts(d).collect()}
    # "abab" -> ab, ba, ab
    assert got == {"ab": 2, "ba": 1}


def test_charlm_rare_fraction_flags_gibberish(spark):
    common = "the cat sat on the mat and the cat sat again"
    rows = [(common, "s")] * 6 + [(common + " qzxj", "s")]
    d = _docs(spark, rows)
    # every bigram of `common` occurs >= 7 times corpus-wide; the
    # gibberish bigrams (" q", "qz", "zx", "xj") occur exactly once
    out = {r["doc_id"]: r.asDict() for r in charlm_scores(d, rare_max=3).collect()}
    assert out[0]["rare_frac"] == 0.0
    assert out[6]["rare_frac"] > 0.0
    n = len(common) - 1
    assert out[0]["n_bigrams"] == n
    assert out[6]["n_bigrams"] == len(common + " qzxj") - 1
    # familiarity: the gibberish doc's average corpus count is lower
    assert out[6]["avg_corpus_count"] < out[0]["avg_corpus_count"]


def test_charlm_short_doc_excluded(spark):
    d = _docs(spark, [("x", "s"), ("ab", "s")])
    out = charlm_scores(d, rare_max=100).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_bigrams"] == 1


# ---------------------------------------------------------------- sampling


def _src_docs(spark, sizes):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, "t", src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_quota_sample_respects_weights_and_is_deterministic(spark):
    d = _src_docs(spark, {"a": 200, "b": 200})
    w = F.when(F.col("source") == "a", F.lit(3)).otherwise(F.lit(1))
    got = quota_sample(d, weight=w, frac=0.5).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    # targets: N=400, frac 0.5 -> 200 split 3:1 -> a=150, b=50
    assert by_src["a"][0]["target_n"] == 150
    assert by_src["b"][0]["target_n"] == 50
    # hash sampling lands near target (within 25% here, deterministic)
    assert abs(len(by_src["a"]) - 150) <= 38
    assert abs(len(by_src["b"]) - 50) <= 13
    again = quota_sample(d, weight=w, frac=0.5).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in got)


def test_quota_sample_zero_weight_drops_source_full_rate_keeps_all(spark):
    d = _src_docs(spark, {"a": 50, "b": 50})
    w = F.when(F.col("source") == "a", F.lit(1)).otherwise(F.lit(0))
    got = quota_sample(d, weight=w, frac=0.5).collect()
    assert {r["source"] for r in got} == {"a"}
    # frac=1, uniform weight: rate is exactly 1 for every source
    all_kept = quota_sample(d, weight=F.lit(1), frac=1.0).collect()
    assert len(all_kept) == 100


# ---------------------------------------------------------------- tfidf


def test_tfidf_topk_hand_computed(spark):
    d = _docs(
        spark,
        [
            ("apple apple banana", "s"),
            ("banana cherry", "s"),
            ("cherry apple durian durian durian", "s"),
        ],
    )
    got = {
        (r["doc_id"], r["rk"]): r.asDict() for r in tfidf_topk(d, k=2).collect()
    }
    # N=3; df: apple 2, banana 2, cherry 2, durian 1
    # doc0: apple tf2 -> 2*3/2=3.0 ; banana 1*3/2=1.5
    assert got[(0, 1)]["term"] == "apple" and got[(0, 1)]["tfidf"] == 3.0
    assert got[(0, 2)]["term"] == "banana" and got[(0, 2)]["tfidf"] == 1.5
    # doc1: banana and cherry tie at 1.5 -> term-asc tiebreak
    assert got[(1, 1)]["term"] == "banana"
    assert got[(1, 2)]["term"] == "cherry"
    # doc2: durian tf3 df1 -> 9.0 beats apple/cherry 1.5
    assert got[(2, 1)]["term"] == "durian" and got[(2, 1)]["tfidf"] == 9.0
    assert got[(2, 1)]["df"] == 1 and got[(2, 1)]["tf"] == 3


def test_tfidf_ignores_empty_tokens(spark):
    d = _docs(spark, [("a  a  b", "s")])
    got = tfidf_topk(d, k=10).collect()
    assert {r["term"] for r in got} == {"a", "b"}
    assert {r["tf"] for r in got if r["term"] == "a"} == {2}


# ---------------------------------------------------------------- shuffle


def test_shard_shuffle_layout_is_a_deterministic_bijection(spark):
    from rmlint_spark.operators.sampling import shard_shuffle

    d = _docs(spark, [("t", "s")] * 257)
    got = shard_shuffle(d, n_shards=8).collect()
    assert len(got) == 257
    # every input row appears exactly once
    assert sorted(r["doc_id"] for r in got) == list(range(257))
    # positions are 1..n_shard contiguous within each shard
    by_shard = {}
    for r in got:
        assert r["shard"] == r["u"] % 8
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
        # within-shard order follows the pseudorandom draw
        us = [(r["u"], r["doc_id"]) for r in rows]
        assert us == sorted(us)
    # uniform hash -> shards are balanced (257/8 ~ 32, generous band)
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[0] >= 16 and sizes[-1] <= 52
    # identical layout on re-run at different parallelism
    again = shard_shuffle(d.repartition(13), n_shards=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))
