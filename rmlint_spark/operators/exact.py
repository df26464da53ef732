"""Exact-duplicate funnel — the engine's core (SURVEY.md §7.1).

Reference semantics: rmlint's shredder (lib/shredder.c:47-60 design
note) — "hash everything" rewritten as a staged funnel:

  gen-0  group by file size; unique sizes never read       (R1,
         lib/shredder.c:50-56, qualify :798-809)
  gen-k  hash a prefix increment; only still-colliding groups
         read more                                          (R2,
         rm_shred_get_read_size lib/shredder.c:496-533)
  final  full digest; optional byte-for-byte confirm        (paranoid
         mode, lib/shredder.c:218-258)

Spark realization: each generation is one hash aggregation over
``(size, sig_so_far)`` followed by a count>=2 qualification
(``rm_shred_group_qualifies``, lib/shredder.c:798-809). Thread
boundaries become shuffle boundaries; "only read survivors" becomes
"re-scan content only for surviving keys" — the funnel's wide ops
shuffle only (key, size, sig) projections, never ``content`` (the one
exception is the explicit byte-confirm, which touches only confirmed
duplicate rows — a tiny fraction of the corpus).

Scale notes (100 TB / 10^12 rows):
- gen-0 runs on a column-pruned scan (no ``content`` read; with
  Iceberg/parquet, ``length(content)`` still requires the column —
  a real deployment materializes ``size`` as a stats column; here the
  projection keeps the shuffle minimal either way).
- qualification results (surviving key sets) are orders of magnitude
  smaller than the corpus; AQE turns the semi-joins back into
  broadcasts at runtime.
- no driver-side collection anywhere; cluster ids are content-derived
  (sha256), hence deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rmlint_spark.config import DEFAULT, EngineConfig
from rmlint_spark.operators.lint import KEY, drop_path_doubles, size_filter
from rmlint_spark.operators.rank import tag_originals


def _qualify(df: DataFrame, keys: list[str]) -> DataFrame:
    """A4 group qualification: keep rows whose group has >= 2 members
    (lib/shredder.c:798-809). Implemented as agg + semi-join so the
    surviving-key relation (small) drives the join; AQE broadcasts it."""
    survivors = df.groupBy(*keys).count().filter(F.col("count") >= 2).drop("count")
    return df.join(survivors, keys, "left_semi")


def exact_clusters(files: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Run the funnel; return one row per clustered file:

    (repo, path, commit, size, checksum, cluster_id, cluster_size,
     rank, is_original)

    ``checksum`` is the sha256 hex of ``content`` (the per-row
    invariant vs the reference — BASELINE.json input_hint);
    ``cluster_id == checksum`` (content-derived, partition-independent).
    """
    prefix_len = cfg.sig.prefix_len

    base = drop_path_doubles(size_filter(files, cfg))

    # gen-0: metadata only — content column pruned from this branch (R1)
    meta = base.select(*KEY, F.length("content").alias("size"))
    surv0 = _qualify(meta, ["size"])

    # gen-1: prefix signature for survivors only (R2; prefix default =
    # rmlint's 4-page first read, lib/shredder.c:52,272-275)
    with_content = base.join(surv0, KEY, "inner")  # re-attach content + size
    sig1 = with_content.select(
        *KEY,
        "size",
        F.xxhash64(F.substring("content", 1, prefix_len)).alias("sig1"),
    )
    surv1 = _qualify(sig1, ["size", "sig1"])

    # final generation: full sha256 for remaining survivors
    final = (
        base.join(surv1.select(*KEY), KEY, "inner")
        .select(*KEY, F.length("content").alias("size"), F.sha2("content", 256).alias("checksum"))
    )
    clustered = _qualify(final, ["size", "checksum"])

    if cfg.byte_confirm:
        # paranoid analog (lib/shredder.c:218-258): byte-equality check
        # within each sha cluster. Shuffles content only for clustered
        # rows. Clusters failing the check (sha collision) are dropped
        # and surface via `collision_report`.
        confirm = (
            base.join(clustered.select(*KEY, "checksum"), KEY, "inner")
            .groupBy("checksum")
            .agg(F.count_distinct("content").alias("n_distinct"))
            .filter(F.col("n_distinct") == 1)
            .select("checksum")
        )
        clustered = clustered.join(confirm, "checksum", "left_semi")

    sizes = clustered.groupBy("checksum").agg(F.count("*").alias("cluster_size"))
    out = (
        clustered.join(sizes, "checksum")
        .withColumn("cluster_id", F.col("checksum"))
    )
    return tag_originals(out, cfg.rank_criteria).select(
        "repo", "path", "commit", "size", "checksum",
        "cluster_id", "cluster_size", "rank", "is_original",
    )


def uniques(files: DataFrame, clusters: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """K5 uniques sink source: files with no twin — the complement of
    the clustered set (lib/formats/uniques.c:1-81; routing
    lib/shredder.c:1279-1281)."""
    base = drop_path_doubles(size_filter(files, cfg))
    return base.select(*KEY).join(clusters.select(*KEY), KEY, "left_anti")


def collision_report(files: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """sha256 clusters whose members are NOT byte-identical (would be a
    hash collision; practically empty — exists for the paranoid
    contract and its test)."""
    base = drop_path_doubles(size_filter(files, cfg))
    final = base.select(*KEY, F.sha2("content", 256).alias("checksum"), "content")
    grouped = _qualify(final, ["checksum"])
    return (
        grouped.groupBy("checksum")
        .agg(F.count_distinct("content").alias("n_distinct"), F.count("*").alias("n_rows"))
        .filter(F.col("n_distinct") > 1)
    )


def session_totals(clusters: DataFrame) -> DataFrame:
    """A7 session totals (rm_shred_dupe_totals, lib/shredder.c:1333-1348;
    counters lib/session.h:84-101): dupes, sets, duplicate bytes
    (non-original rows), original bytes."""
    return clusters.agg(
        F.sum(F.when(~F.col("is_original"), 1).otherwise(0)).alias("dup_counter"),
        F.count_distinct("cluster_id").alias("dup_group_counter"),
        F.sum(F.when(~F.col("is_original"), F.col("size")).otherwise(0)).alias("duplicate_bytes"),
        F.sum(F.when(F.col("is_original"), F.col("size")).otherwise(0)).alias("original_bytes"),
    )
