"""Text-analysis expressions (LLM-pipeline token accounting)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rmlint_spark.functions.text import bpe_token_count, token_count


def test_bpe_token_count_planted(spark):
    rows = [
        ("hello world", 2),            # two letter runs
        ("it's here", 3),              # it + 's + " here"
        ("x2, go!", 5),                # x + 2 + "," + " go" + "!"
        ("", 0),
        ("   ", 0),                    # whitespace-only: no token arms match
        ("a1b2", 4),                   # alternating letter/digit runs
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    got = [
        r["n"] for r in
        df.select(bpe_token_count(F.col("text")).alias("n")).collect()
    ]
    assert got == [n for _, n in rows]


def test_ws_vs_bpe_token_counts(spark):
    df = spark.createDataFrame([("one two three.",)], ["text"])
    row = df.select(
        token_count(F.col("text")).alias("ws"),
        bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert row["ws"] == 3
    assert row["bpe"] == 4  # "one", " two", " three", "."
