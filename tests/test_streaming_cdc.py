"""Incremental chunk-level dedup (streaming/incremental.py
IncrementalChunkDedup): O(new) chunking economics, replay-safe commit
order, and accounting parity with the batch operator.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rmlint_spark.streaming.incremental import IncrementalChunkDedup

COLS = ["repo", "path", "commit", "lang", "content"]
# small CDC params (test texts are a few hundred bytes)
PARAMS = dict(window=16, avg_bits=5, min_size=16, max_size=128)


def _text(seed: int, n: int) -> str:
    import random

    rng = random.Random(seed)
    return "".join(rng.choice("abcdefghij klmnopqrstuvwxyz.") for _ in range(n))


def test_chunk_store_is_o_new_across_batches(spark, tmp_path):
    """A content arriving again in a later batch (same or different
    file identity) must NOT be re-chunked; new content must be."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    a, b, c = _text(1, 400), _text(2, 500), _text(3, 450)
    batch1 = [("r1", "a.py", "c1", "py", a), ("r1", "b.py", "c1", "py", b)]
    batch2 = [
        ("r2", "a_copy.py", "c2", "py", a),  # duplicate content, new file
        ("r1", "a.py", "c1", "py", a),       # replayed row
        ("r2", "c.py", "c2", "py", c),       # genuinely new
    ]
    cd = IncrementalChunkDedup(str(tmp_path / "store"), n_partitions=8, **PARAMS)

    spark.createDataFrame(batch1, COLS).coalesce(1).write.mode("append").parquet(src)
    cd.start(spark, src, str(tmp_path / "ckpt")).awaitTermination()
    store1 = cd.chunk_store(spark)
    n1 = store1.count()
    assert store1.select("sha").distinct().count() == 2

    spark.createDataFrame(batch2, COLS).coalesce(1).write.mode("append").parquet(src)
    cd.start(spark, src, str(tmp_path / "ckpt")).awaitTermination()
    store2 = cd.chunk_store(spark)
    # exactly content c's chunks were added; a was not re-chunked
    assert store2.select("sha").distinct().count() == 3
    from rmlint_spark.operators.cdc import chunk_document

    assert store2.count() == n1 + len(chunk_document(c.encode(), 16, 5, 16, 128))
    # no duplicate chunk rows anywhere
    assert store2.dropDuplicates(["sha", "chunk_idx"]).count() == store2.count()
    # metrics lineage: epoch rows record the O(new) economics
    m = {r["epoch"]: r for r in cd.metrics(spark).collect()}
    assert sum(r["n_new"] for r in m.values()) == 3
    assert all(r["n_new"] <= r["n_contents"] for r in m.values())


def test_ratio_matches_batch_operator(spark, tmp_path):
    """The incremental store's dedup ratio equals the batch operator
    run once over the distinct contents."""
    from rmlint_spark.operators.cdc import cdc_chunks, dedup_ratio

    src = str(tmp_path / "src")
    os.makedirs(src)
    boiler = _text(9, 600)
    docs = [
        ("r1", "a.py", "c1", "py", _text(1, 300) + boiler),
        ("r1", "b.py", "c1", "py", boiler + _text(2, 250)),
        ("r1", "c.py", "c1", "py", _text(3, 700)),
    ]
    cd = IncrementalChunkDedup(str(tmp_path / "store"), n_partitions=8, **PARAMS)
    # two batches
    spark.createDataFrame(docs[:2], COLS).coalesce(1).write.mode("append").parquet(src)
    cd.start(spark, src, str(tmp_path / "ckpt")).awaitTermination()
    spark.createDataFrame(docs[2:], COLS).coalesce(1).write.mode("append").parquet(src)
    cd.start(spark, src, str(tmp_path / "ckpt")).awaitTermination()

    got = cd.current_dedup_ratio(spark).collect()[0]
    direct = spark.createDataFrame(
        [(t,) for _, _, _, _, t in docs], "content string"
    ).select(F.sha2("content", 256).alias("sha"), "content")
    expect = dedup_ratio(
        cdc_chunks(direct, id_col="sha", text_col="content", id_type="string", **PARAMS)
    ).collect()[0]
    assert (got.total_chunks, got.distinct_chunks, got.total_bytes, got.unique_bytes) == (
        expect.total_chunks,
        expect.distinct_chunks,
        expect.total_bytes,
        expect.unique_bytes,
    )
    # the planted shared region actually dedups
    assert got.unique_bytes < got.total_bytes


def test_replay_after_partial_crash(spark, tmp_path, monkeypatch):
    """Crash AFTER the chunk append but BEFORE the seen marker: the
    replay must redo the fold without duplicating chunk rows, and the
    metrics reader must collapse the replayed epoch to the full
    (pre-crash) counts."""
    from rmlint_spark.sources import bucketed as bk

    rows = [
        ("r1", "a.py", "c1", "py", _text(4, 400)),
        ("r1", "b.py", "c1", "py", _text(5, 350)),
    ]
    batch = spark.createDataFrame(rows, COLS)
    cd = IncrementalChunkDedup(str(tmp_path / "store"), n_partitions=8, **PARAMS)

    real_append = bk.append_partitioned

    def crash_on_seen(df, path):
        if path == cd.seen_path:
            raise RuntimeError("simulated crash before the seen marker")
        return real_append(df, path)

    monkeypatch.setattr(bk, "append_partitioned", crash_on_seen)
    with pytest.raises(RuntimeError):
        cd.process_batch(batch, epoch_id=3)
    monkeypatch.setattr(bk, "append_partitioned", real_append)

    # chunks landed, seen did not
    n_after_crash = spark.read.parquet(cd.chunk_path).count()
    assert n_after_crash > 0
    with pytest.raises(Exception):
        spark.read.parquet(cd.seen_path).count()

    cd.process_batch(batch, epoch_id=3)
    store = cd.chunk_store(spark)
    assert store.count() == n_after_crash  # replay added nothing
    assert store.dropDuplicates(["sha", "chunk_idx"]).count() == store.count()
    assert spark.read.parquet(cd.seen_path).count() == 2
    # replay appended a second, smaller metrics row (n_new = 0); the
    # reader takes max per epoch -> the full pre-crash counts
    raw = spark.read.parquet(cd.metrics_path)
    assert raw.count() == 2
    m = cd.metrics(spark).collect()
    assert len(m) == 1 and m[0]["n_new"] == 2


def test_weighted_ratio_composes_with_file_store(spark, tmp_path):
    """Chunk store keyed by distinct content + the exact-dup file
    store's multiplicities = the corpus's PHYSICAL dedup ratio: three
    identical files must weigh their content's chunks three times."""
    from rmlint_spark.operators.cdc import cdc_chunks, weighted_dedup_ratio
    from rmlint_spark.streaming.incremental import IncrementalDedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    a, b = _text(6, 500), _text(7, 400)
    rows = [
        ("r1", "a.py", "c1", "py", a),
        ("r2", "a_copy.py", "c1", "py", a),
        ("r3", "a_again.py", "c1", "py", a),
        ("r1", "b.py", "c1", "py", b),
    ]
    spark.createDataFrame(rows, COLS).coalesce(1).write.mode("append").parquet(src)
    cd = IncrementalChunkDedup(str(tmp_path / "cstore"), n_partitions=8, **PARAMS)
    fd = IncrementalDedup(str(tmp_path / "fstore"), n_partitions=8)
    cd.start(spark, src, str(tmp_path / "ck1")).awaitTermination()
    fd.start(spark, src, str(tmp_path / "ck2")).awaitTermination()

    counts = (
        fd.signatures(spark)
        .groupBy("checksum")
        .agg(F.count("*").alias("n_files"))
        .withColumnRenamed("checksum", "sha")
    )
    got = weighted_dedup_ratio(cd.chunk_store(spark), counts, id_col="sha").collect()[0]
    # physical footprint: content a three times, b once
    assert got.total_bytes == 3 * len(a.encode()) + len(b.encode())
    # unique bytes equal the unweighted distinct-chunk bytes
    direct = spark.createDataFrame([(t,) for t in (a, b)], "content string").select(
        F.sha2("content", 256).alias("sha"), "content"
    )
    from rmlint_spark.operators.cdc import dedup_ratio

    unweighted = dedup_ratio(
        cdc_chunks(direct, id_col="sha", text_col="content", id_type="string", **PARAMS)
    ).collect()[0]
    assert got.unique_bytes == unweighted.unique_bytes
    assert got.distinct_chunks == unweighted.distinct_chunks
    assert got.dedup_ratio < unweighted.dedup_ratio  # file dups add savings
