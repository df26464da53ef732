"""Source readers.

Reference analogs: the filesystem walk (S1, lib/traverse.c:489-550) is
replaced entirely by a table scan; the ``documents`` driver table is
adapted into the canonical ``files(repo, path, commit, lang, content)``
relation of BASELINE.json ``input_hint``. At scale the same adapter
shape reads an Iceberg table (``spark.read.format("iceberg")``) —
Iceberg jars are not in this image, so the parquet reader stands in
(stubbed behind `read_files_table`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def documents_as_files(docs: DataFrame) -> DataFrame:
    """Map the driver's ``documents(doc_id, text, lang, source,
    n_chars)`` onto the canonical files relation. Deterministic
    synthetic path/commit derived from doc_id (no data invented).

    NOTE on read layout: the driver tables are single-row-group
    parquet, so a scan is one task. An A/B at sf1.0 (round 6) measured
    an eager ``repartition("path")`` here as a net LOSS — the corpus is
    small enough (~170 MB text) that single-task decode costs ~0.3 s
    while the added exchange taxes every downstream subtree — so the
    spread happens only where per-row work is heavy (the explicit
    repartition before the signature kernels in
    ``lsh.representative_rows``)."""
    return docs.select(
        F.col("source").alias("repo"),
        F.format_string("docs/d%02d/doc%d.txt", F.pmod("doc_id", F.lit(50)), "doc_id").alias("path"),
        F.substring(F.sha2(F.concat(F.lit("c"), F.col("doc_id").cast("string")), 256), 1, 8).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def paths_source(spark: SparkSession, keys: list[tuple[str, str, str]]) -> DataFrame:
    """S3 stdin-path source (rm_cmd_parse_paths_from_stdin,
    lib/cmdline.c — newline/NUL-delimited path lists): a small explicit
    key list becomes a one-column-per-key relation, used to scope a run
    to caller-supplied rows via semi-join."""
    return spark.createDataFrame(keys, ["repo", "path", "commit"])


def scope_to_paths(files: DataFrame, paths: DataFrame) -> DataFrame:
    """Restrict the corpus to the stdin-supplied key list (S3)."""
    return files.join(
        F.broadcast(paths.select("repo", "path", "commit")),
        ["repo", "path", "commit"],
        "left_semi",
    )


def read_files_table(spark: SparkSession, location: str, fmt: str = "parquet") -> DataFrame:
    """Canonical corpus reader. ``fmt='iceberg'`` is the production
    path (needs the Iceberg runtime jar on the classpath)."""
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(location)
        except Exception as exc:  # jar not present in this image
            raise NotImplementedError(
                "Iceberg runtime not on classpath; use fmt='parquet'"
            ) from exc
    return spark.read.parquet(location)
