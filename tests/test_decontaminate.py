"""Benchmark decontamination: planted-overlap recall + exclusion."""

from __future__ import annotations

from pyspark.sql import functions as F

from rmlint_spark.operators.decontaminate import contaminated_docs


def test_planted_contamination_found(spark):
    bench_text = " ".join(f"b{i}" for i in range(20))
    rows = [
        (0, "clean " + " ".join(f"w{i}" for i in range(30))),
        # doc 1 embeds 13 consecutive benchmark words mid-document
        (1, " ".join(f"x{i}" for i in range(5)) + " "
            + " ".join(f"b{i}" for i in range(4, 17)) + " tail words here"),
        # doc 2 shares only a 12-word run: below the 13-gram bar
        (2, " ".join(f"b{i}" for i in range(4, 16)) + " "
            + " ".join(f"y{i}" for i in range(10))),
        # doc 3 contains the benchmark twice
        (3, bench_text + " sep " + bench_text),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    benchmark = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in contaminated_docs(corpus, benchmark, n=13).collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_grams_matched"] == 1  # exactly one 13-gram window
    # doc 3: benchmark has 8 distinct 13-grams, each present twice
    assert got[3]["n_grams_matched"] == 8
    assert got[3]["n_hits"] == 16


def test_short_docs_and_empty_benchmark(spark):
    corpus = spark.createDataFrame(
        [(0, "only three words")], "doc_id long, text string"
    )
    benchmark = spark.createDataFrame(
        [(1, "tiny")], "doc_id long, text string"
    )
    assert contaminated_docs(corpus, benchmark, n=13).count() == 0


def test_broadcast_join_no_corpus_shuffle(spark):
    # the corpus n-gram relation must reach the join WITHOUT an
    # Exchange: benchmark grams broadcast (the 100-TB design point)
    corpus = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[F.concat(F.lit(f"t{i}_"), F.col("id")) for i in range(20)]).alias("text"),
    )
    benchmark = corpus.filter(F.col("doc_id") == 5).select("doc_id", "text")
    result = contaminated_docs(corpus, benchmark, n=13)
    result.collect()
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the CORPUS (streamed) side must reach the join with no shuffle;
    # in the tree it prints between the join node and the build side's
    # BroadcastQueryStage. (The benchmark side's distinct() exchange is
    # fine — that side is tiny by construction.)
    streamed = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastQueryStage", 1)[0]
    assert "Exchange hashpartitioning" not in streamed, streamed
