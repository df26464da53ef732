"""Incremental (streaming) dedup: new batches fold into the store."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rmlint_spark.streaming.incremental import IncrementalDedup


def test_incremental_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows1 = [
        ("r1", "a.py", "c1", "python", "SHARED CONTENT"),
        ("r1", "b.py", "c1", "python", "only in batch one"),
    ]
    rows2 = [
        ("r2", "c.py", "c2", "python", "SHARED CONTENT"),  # dup lands later
        ("r2", "d.py", "c2", "python", "unique two"),
        ("r1", "a.py", "c1", "python", "SHARED CONTENT"),  # replayed row: must not double-count
    ]
    cols = ["repo", "path", "commit", "lang", "content"]
    spark.createDataFrame(rows1, cols).coalesce(1).write.mode("append").parquet(src)

    dedup = IncrementalDedup(str(tmp_path / "store"))
    q = dedup.start(spark, src, str(tmp_path / "ckpt1"))
    q.awaitTermination()

    # no dups yet
    sigs = dedup.signatures(spark)
    assert sigs.count() == 2
    assert dedup.current_clusters(spark).count() == 0

    spark.createDataFrame(rows2, cols).coalesce(1).write.mode("append").parquet(src)
    q = dedup.start(spark, src, str(tmp_path / "ckpt1"))
    q.awaitTermination()

    sigs = dedup.signatures(spark)
    assert sigs.count() == 4  # replayed (r1,a.py) skipped by anti-join
    clusters = dedup.current_clusters(spark)
    got = {(r["repo"], r["path"]) for r in clusters.collect()}
    assert got == {("r1", "a.py"), ("r2", "c.py")}
