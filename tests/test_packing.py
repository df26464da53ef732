"""Sequence packing: greedy shard-parallel bin assignment."""

from __future__ import annotations

from rmlint_spark.operators.packing import bin_utilization, pack_sequences


def test_greedy_fill_and_spill(spark):
    # one shard (n_shards=1): docs of 1000/1000/100/2000 tokens into
    # 2048-token bins -> starts 0 / 1000 / 2000 / 2100
    rows = [
        (0, " ".join(["t"] * 1000)),
        (1, " ".join(["t"] * 1000)),
        (2, " ".join(["t"] * 100)),
        (3, " ".join(["t"] * 2000)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in pack_sequences(docs, capacity=2048, n_shards=1).collect()
    }
    assert [got[i]["n_tokens"] for i in range(4)] == [1000, 1000, 100, 2000]
    assert [got[i]["bin_id"] for i in range(4)] == [0, 0, 0, 1]
    assert [got[i]["offset_in_bin"] for i in range(4)] == [0, 1000, 2000, 52]
    # doc 2 starts at offset 2000 and SPILLS past 2048 (greedy
    # sequential fill semantics: assignment by start offset)
    util = {
        r["bin_id"]: r
        for r in bin_utilization(
            pack_sequences(docs, capacity=2048, n_shards=1), 2048
        ).collect()
    }
    assert util[0]["n_docs"] == 3 and util[0]["n_tokens"] == 2100
    assert util[1]["n_docs"] == 1


def test_shards_pack_independently_and_deterministically(spark):
    docs = spark.range(500).selectExpr(
        "id AS doc_id", "repeat('w ', CAST(id % 97 + 3 AS INT)) AS text"
    )
    a = {r["doc_id"]: (r["shard_id"], r["bin_id"], r["offset_in_bin"])
         for r in pack_sequences(docs, capacity=256, n_shards=8).collect()}
    b = {r["doc_id"]: (r["shard_id"], r["bin_id"], r["offset_in_bin"])
         for r in pack_sequences(docs.repartition(13), capacity=256, n_shards=8).collect()}
    assert a == b  # partitioning-independent
    assert {s for s, _, _ in a.values()} == set(range(8))
    # every offset respects the capacity
    assert all(off < 256 for _, _, off in a.values())
