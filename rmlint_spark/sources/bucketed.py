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

from pyspark.sql import DataFrame, SparkSession


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
