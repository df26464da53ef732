"""Corpus generator invariants — determinism and planted structure."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rmlint_spark.corpus import generate_corpus


def test_schema_and_rowcount(corpus):
    files, truth = corpus
    assert files.columns == ["repo", "path", "commit", "lang", "content"]
    n = files.count()
    assert n > 2000  # base rows + path doubles
    assert truth.count() == n


def test_scenarios_present(corpus):
    _, truth = corpus
    got = {r["scenario"] for r in truth.select("scenario").distinct().collect()}
    assert {"exact", "near", "nearmiss", "collision", "vendored", "empty", "pathdouble", "unique"} <= got


def test_exact_groups_are_identical_and_cross_repo(corpus):
    files, truth = corpus
    joined = files.join(truth, ["repo", "path", "commit"])
    ex = joined.filter(F.col("scenario") == "exact")
    stats = (
        ex.groupBy("near_group_id")
        .agg(
            F.count_distinct("content").alias("nc"),
            F.count_distinct("repo").alias("nr"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert stats
    for r in stats:
        assert r["nc"] == 1, "exact group must share content"
        assert r["n"] >= 2
        assert r["nr"] >= 2, "exact groups must span repos"


def test_nearmiss_same_size_different_content(corpus):
    files, truth = corpus
    joined = files.join(truth, ["repo", "path", "commit"])
    nm = joined.filter(F.col("scenario") == "nearmiss")
    # pair id = floor(id/2) is not visible; recompute via size grouping:
    stats = (
        nm.groupBy(F.length("content").alias("sz"), "path")
        .count()
        .groupBy("sz")
        .count()
    )
    # every nearmiss pair shares byte length but not content
    pairs = (
        nm.select("content", F.length("content").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").alias("n"), F.count_distinct("content").alias("nc"))
        .collect()
    )
    for r in pairs:
        assert r["nc"] >= 2  # contents differ within the same size


def test_collision_bucket_same_length_distinct(corpus):
    files, truth = corpus
    joined = files.join(truth, ["repo", "path", "commit"])
    col = joined.filter(F.col("scenario") == "collision")
    r = col.agg(
        F.count_distinct(F.length("content")).alias("nlen"),
        F.count_distinct("content").alias("nc"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert r["nlen"] == 1, "collision bucket must share one byte length"
    assert r["nc"] == r["n"], "collision bucket contents must be distinct"
    assert r["n"] >= 50


def test_determinism_across_parallelism(spark):
    """Metamorphic requirement (SURVEY.md §5.2): identical corpus
    regardless of partitioning."""
    f1, _ = generate_corpus(spark, n_rows=500)
    f2, _ = generate_corpus(spark, n_rows=500)
    f2 = f2.repartition(17)
    h1 = sorted(hashlib.sha256(str(r).encode()).hexdigest() for r in f1.collect())
    h2 = sorted(hashlib.sha256(str(r).encode()).hexdigest() for r in f2.collect())
    assert h1 == h2


def test_skewed_repo(corpus):
    files, _ = corpus
    top = files.groupBy("repo").count().orderBy(F.desc("count")).first()
    assert top["repo"] == "repo0000"
    assert top["count"] > files.count() * 0.15
