"""Sequence packing: assign documents to fixed-capacity token bins —
the sample-packing step that turns a deduplicated corpus into training
batches.

Scale shape: a single global greedy packer is a serial bottleneck, so
documents are sharded deterministically (``doc_id % n_shards``) and
each shard packs independently with a running-token-sum window — one
shuffle on the shard key, bins namespaced by shard. The greedy
sequential fill is the standard approximation: a document starts in
the bin its running offset falls in and may spill past the capacity
boundary (real packers truncate or pad; the assignment is what
matters here and is exactly reproducible in SQL on any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rmlint_spark.functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, shard_id, bin_id, offset_in_bin): greedy
    sequential packing of whitespace-token counts into ``capacity``-
    token bins, independently per shard. Deterministic: shard and
    order derive from the document id alone."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard_id"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    d = d.select("doc_id", "n_tokens", "shard_id", start)
    return d.select(
        "doc_id",
        "n_tokens",
        "shard_id",
        F.floor(F.col("start") / capacity).cast("long").alias("bin_id"),
        F.pmod(F.col("start"), F.lit(capacity)).cast("long").alias("offset_in_bin"),
    )


def bin_utilization(packed: DataFrame, capacity: int = 2048) -> DataFrame:
    """(shard_id, bin_id, n_docs, n_tokens, fill_frac): how full each
    bin is — the packing-quality metric (padding waste = 1 - fill)."""
    return packed.groupBy("shard_id", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        (F.sum("n_tokens") / F.lit(float(capacity))).alias("fill_frac"),
    )
