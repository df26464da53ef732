"""Bucketed/sorted table layout for co-located joins.

At deployment scale (the 10^12-row Iceberg corpus of the north rule)
every hot join in the near-dup layer keys on the same identifiers —
``fid``/``sha`` for signature re-attachment, pair verification, and CC
edge resolution. Writing those relations BUCKETED by the join key
makes every subsequent equi-join on it exchange-free: both sides
arrive pre-partitioned, so Spark plans a zero-shuffle sort-merge join
per bucket pair (and the optional sortBy removes the sort too).

This is Spark's local stand-in for an Iceberg ``bucket(N, fid)``
partition transform; the write-side shuffle is paid ONCE, then every
downstream join against the store is narrow. rmlint's analog is the
disk-order elevator (O4, lib/shredder.c — sequencing reads to match
the physical layout); ours sequences SHUFFLES to match the stored
partitioning.

Bucketed tables must go through the session catalog (``saveAsTable``)
— plain ``.parquet()`` writes drop bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Materialize ``df`` bucketed (and optionally sorted) by ``key``.
    ``path`` makes it an external table (parquet files + catalog
    metadata); omit for a managed table under the warehouse dir."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (the catalog
    carries it; a raw parquet read of the same files would not)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts neither side shuffles (verify with
    ``n_exchanges_in_plan`` — the point of the layout)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key, how
    )


def n_exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan (plan
    audit helper: 0 for a co-located join)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines() if "Exchange hashpartitioning" in line
    )


# --------------------------------------------------------------------
# Hash-partitioned append stores (the streaming layer's layout).
#
# Catalog ``bucketBy`` tables give exchange-free joins but (a) need the
# session catalog, (b) don't support value-level pruning on append
# workloads the way we need. A directory layout partitioned by
# ``hash(key) mod N`` is the faithful local stand-in for an Iceberg
# ``bucket(N, key)`` partition TRANSFORM: appends land in their hash
# directory, and a reader that knows which key values it wants prunes
# to the matching directories (partition pruning) plus pushes an
# ``In(key, ...)`` filter into the scan (row-group skip locally; bloom
# filter / file skip on Iceberg). That combination is what makes the
# incremental near-dup fold O(new x bucket-mates) per batch instead of
# O(accumulated history) — see streaming/incremental.py.
# --------------------------------------------------------------------

def hex_pt(col: Column, n_partitions: int) -> Column:
    """Partition id for a hex-string key (e.g. a sha256): the first 8
    hex digits as an int, mod N. Mirrors ``hex_pt_py`` exactly so the
    driver can compute partition lists without a collect."""
    return F.pmod(
        F.conv(F.substring(col, 1, 8), 16, 10).cast("long"), F.lit(n_partitions)
    ).cast("int")


def hex_pt_py(key: str, n_partitions: int) -> int:
    """Driver-side twin of ``hex_pt`` (same bytes, same result)."""
    return int(key[:8], 16) % n_partitions


def long_pt(col: Column, n_partitions: int) -> Column:
    """Partition id for a long key (e.g. an xxhash64 band hash)."""
    return F.pmod(col, F.lit(n_partitions)).cast("int")


def long_pt_py(key: int, n_partitions: int) -> int:
    """Driver-side twin of ``long_pt`` (Python % matches pmod for
    negative keys: both return the non-negative residue)."""
    return key % n_partitions


def append_partitioned(df: DataFrame, path: str) -> None:
    """Append a relation carrying a ``pt`` partition column to its
    hash-partitioned store directory."""
    df.write.partitionBy("pt").mode("append").parquet(path)


def pruned_read(
    store: DataFrame,
    pts: list[int],
    key_col: str | None = None,
    values: list | None = None,
    isin_limit: int = 100_000,
) -> DataFrame:
    """Prune a hash-partitioned store scan to the partitions (and,
    when the value list is small enough to ship as a literal In
    filter, the exact key values) a batch touches. Falls back to
    partition-level pruning alone for huge batches."""
    out = store.filter(F.col("pt").isin(pts))
    if key_col is not None and values is not None and len(values) <= isin_limit:
        out = out.filter(F.col(key_col).isin(values))
    return out
