"""Per-file classification and routing (non-duplicate "lint").

Reference: inline classification during traversal
(``rm_traverse_file``, lib/traverse.c:132-221, type decisions :145-175)
and the other-lint router ``rm_pp_handle_other_lint``
(lib/preprocess.c:478-494, 600-631). Filesystem-only types (badlink,
bad uid/gid, nonstripped binaries) have no table analog; the table
world's lint types are:

- ``emptyfile``       content length 0 (lib/traverse.c:148-149)
- ``pathdouble``      duplicate (repo,path,commit) rows
                      (lib/preprocess.c:136-198, removal :496-512)
- ``dupe_candidate``  everything else — enters the funnel

The enum ordering of the output mirrors the reference's lint-type
output order (lib/file.h:50-84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from rmlint_spark.config import DEFAULT, EngineConfig

KEY = ["repo", "path", "commit"]


def classify(files: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Add a ``lint_type`` column. Path doubles are flagged on every
    occurrence after the first (row_number over the identity key —
    deterministic because duplicate rows are byte-identical).

    Scale note: the per-occurrence window moves full rows (content)
    through one shuffle — fine for lint REPORTS on filtered subsets;
    the pipeline router below derives the same information narrowly."""
    w = W.partitionBy(*KEY).orderBy(F.lit(1))
    return files.withColumn(
        "lint_type",
        F.when(F.row_number().over(w) > 1, F.lit("pathdouble"))
        .when(F.length("content") == 0, F.lit("emptyfile"))
        .otherwise(F.lit("dupe_candidate")),
    )


def drop_path_doubles(files: DataFrame) -> DataFrame:
    """J2: anti-join the same physical row reached twice
    (lib/preprocess.c:496-512). Duplicate rows are fully identical, so
    ``dropDuplicates`` on the key is value-deterministic."""
    return files.dropDuplicates(KEY)


def hidden_filter(files: DataFrame, keep_hidden: bool = False) -> DataFrame:
    """F2: skip dot-segment paths unless configured
    (lib/traverse.c:325-338)."""
    if keep_hidden:
        return files
    return files.filter(~F.col("path").rlike(r"(^|/)\."))


def hidden_policy(files: DataFrame, cfg: EngineConfig = DEFAULT) -> tuple[DataFrame, DataFrame]:
    """Resolve the hidden-file policy into the two pipeline inputs:
    (dupe_candidates, treemerge_input).

    --partial-hidden (lib/treemerge.c:877-879,963-966): hidden files
    never appear in plain duplicate reports, but duplicate-DIRECTORY
    detection still sees them (a dir with a differing hidden member is
    not a full duplicate)."""
    if cfg.keep_hidden:
        return files, files
    filtered = hidden_filter(files)
    if cfg.partial_hidden:
        return filtered, files
    return filtered, filtered


def size_filter(files: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """F1: min/max size limits (lib/traverse.c:160-173)."""
    out = files.filter(F.length("content") >= cfg.min_size)
    if cfg.max_size is not None:
        out = out.filter(F.length("content") <= cfg.max_size)
    return out


def route(
    files: DataFrame, cfg: EngineConfig = DEFAULT
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """F10 router, scalable form: (empty_lint, pathdouble_lint,
    dupe_candidates).

    - ``empty_lint``: emptyfile rows — a narrow filter on the scan, no
      shuffle (lib/traverse.c:148-149);
    - ``pathdouble_lint``: one row per doubled key with the EXCESS
      count (rows beyond the first) — a key-only aggregate, content
      never shuffles (lib/preprocess.c:496-512);
    - ``dupe_candidates``: raw nonempty rows; the funnel deduplicates
      path doubles on narrow projections itself (operators/exact.py).
    """
    empty = files.filter(F.length("content") == 0).withColumn(
        "lint_type", F.lit("emptyfile")
    )
    doubles = (
        files.groupBy(*KEY)
        .count()
        .filter(F.col("count") > 1)
        .select(
            *KEY,
            F.lit("pathdouble").alias("lint_type"),
            (F.col("count") - 1).alias("n_extra"),
        )
    )
    candidates = files.filter(F.length("content") > 0)
    return empty, doubles, candidates
