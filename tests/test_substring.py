"""Cross-file substring lint tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from rmlint_spark.config import EngineConfig, SignatureConfig
from rmlint_spark.operators.substring import substring_clones, window_hashes_batch

CFG = EngineConfig(sig=SignatureConfig(substr_window=32, substr_stride=16))


def test_window_hashes_deterministic():
    t = "x" * 100
    a = window_hashes_batch([t], 32, 16)[0]
    b = window_hashes_batch([t, "other " * 20], 32, 16)[0]
    assert (a == b).all()
    assert len(a) == (100 - 32) // 16 + 1


def test_shared_block_detected(spark):
    shared = "this long shared block of source code appears verbatim in both files " * 3
    rows = [
        ("r1", "a.py", "c1", "python", "prefix one " * 10 + shared + "suffix one"),
        ("r2", "b.py", "c2", "python", "different preamble " * 8 + shared + "tail two"),
        ("r3", "c.py", "c3", "python", "entirely unrelated content here " * 20),
    ]
    files = spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])
    pairs, oversized = substring_clones(files, CFG, min_shared=2)
    got = pairs.collect()
    assert len(got) == 1
    assert got[0]["shared_windows"] >= 2
    assert oversized.count() == 0


def test_no_false_pairs_on_corpus_uniques(corpus):
    """Unique filler docs (random token streams) share no 32-char
    aligned windows."""
    files, truth = corpus
    uniq = files.join(
        truth.filter(F.col("scenario") == "unique").select("repo", "path", "commit"),
        ["repo", "path", "commit"],
        "left_semi",
    ).limit(300)
    pairs, _ = substring_clones(uniq, CFG, min_shared=2)
    assert pairs.count() == 0
