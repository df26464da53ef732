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


def test_incremental_near_dup_across_batches(spark, tmp_path):
    """A near-duplicate arriving in a LATER batch must cluster with its
    earlier twin; already-seen content must not be re-signed."""
    import os as _os

    from rmlint_spark.streaming.incremental import IncrementalNearDup

    src = str(tmp_path / "src_nd")
    _os.makedirs(src)
    base_tokens = [f"tok{i}" for i in range(200)]
    base = " ".join(base_tokens)
    edited = list(base_tokens)
    edited[50] = "CHANGED"
    near = " ".join(edited)  # ~0.95 shingle jaccard vs base
    unrelated = " ".join(f"other{i}" for i in range(200))

    cols = ["repo", "path", "commit", "lang", "content"]
    rows1 = [("r1", "a.py", "c1", "py", base),
             ("r1", "u.py", "c1", "py", unrelated)]
    rows2 = [("r2", "b.py", "c2", "py", near),          # near-dup of batch-1 doc
             ("r2", "a2.py", "c2", "py", base),          # exact dup of batch-1 doc
             ("r1", "a.py", "c1", "py", base)]           # replayed row
    spark.createDataFrame(rows1, cols).coalesce(1).write.mode("append").parquet(src)

    nd = IncrementalNearDup(str(tmp_path / "nd_store"))
    nd.start(spark, src, str(tmp_path / "nd_ck")).awaitTermination()
    assert nd.current_clusters(spark).count() == 0  # nothing similar yet

    spark.createDataFrame(rows2, cols).coalesce(1).write.mode("append").parquet(src)
    nd.start(spark, src, str(tmp_path / "nd_ck")).awaitTermination()

    # each distinct content signed exactly once (3 distinct shas)
    assert spark.read.parquet(nd.sig_path).count() == 3
    # replayed row not re-indexed
    assert spark.read.parquet(nd.index_path).count() == 4

    clusters = nd.current_clusters(spark)
    by_cluster = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster_id"], set()).add((r["repo"], r["path"]))
    assert len(by_cluster) == 1
    (members,) = by_cluster.values()
    assert members == {("r1", "a.py"), ("r2", "b.py"), ("r2", "a2.py")}
    # exactly one original in the cluster
    assert clusters.filter("is_original").count() == 1

    # offline compaction: fewer files, identical clusters
    report = nd.compact(spark, target_partitions=1)
    assert set(report) == {"index", "neardup_sigs", "bands", "edges"}
    after = {
        (r["repo"], r["path"]): r["cluster_id"]
        for r in nd.current_clusters(spark).collect()
    }
    assert set(after) == {("r1", "a.py"), ("r2", "b.py"), ("r2", "a2.py")}
    for p in (nd.index_path, nd.sig_path, nd.band_path, nd.edge_path):
        import os as _os2

        assert sum(1 for f in _os2.listdir(p) if f.endswith(".parquet")) == 1


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Row

    from rmlint_spark.streaming.incremental import start_windowed_counts

    src = str(tmp_path / "events_src")
    ck = str(tmp_path / "ck_win")
    out = str(tmp_path / "win_out")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(event_id=i, user_id=i % 3, event_type="click" if i % 2 else "view",
            ts=t0 + dt.timedelta(minutes=7 * i), value=float(i))
        for i in range(40)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(src)
    q = start_windowed_counts(spark, src, ck, out)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    # append mode emits only windows the watermark has passed; with
    # 40*7min of data and a 2h watermark, the early windows finalize
    assert got.count() >= 1
    assert set(got.columns) == {"window_start", "event_type", "n", "sum_value"}
    # batch twin agrees on finalized windows
    from rmlint_spark.streaming.incremental import windowed_event_counts  # noqa: F401

    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    want = {(r["window_start"], r["event_type"]): r["n"] for r in batch.collect()}
    for r in got.collect():
        assert want[(r["window_start"], r["event_type"])] == r["n"]
