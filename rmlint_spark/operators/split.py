"""Group splitting and tagged-constraint qualification.

Reference semantics:

- W3 mtime-window split (``--mtime-window T``): sort a duplicate
  group by mtime and start a new subgroup whenever the gap to the
  previous member exceeds T (rm_file_cmp_split, lib/preprocess.c:
  105-122; rejects lib/shredder.c:1381-1402). Spark: the classic
  gap-and-island window (lag + running sum), appended to the
  cluster key.
- W4 unmatched-basename split (``-B``): twins sharing the head's
  basename are split off (lib/shredder.c:1404-1423) — generalized
  here to sub-clustering by basename.
- J7 tagged constraints: ``--must-match-tagged`` keeps only groups
  containing a preferred member (NEEDS_PREF, lib/shredder.c:329-332,
  qualify :798-809); ``--keep-all-tagged`` forces every preferred
  member to be an original (lib/shredder.c:1264-1283).

All are post-funnel, window/group-level transforms over the cluster
relation — one shuffle each, on the (already small) clustered subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rmlint_spark.operators.rank import DEFAULT_CRITERIA, tag_originals


def _requalify(df: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """A4: subgroups of size 1 stop being duplicate groups."""
    w = W.partitionBy(cluster_col)
    return (
        df.withColumn("cluster_size", F.count("*").over(w))
        .filter(F.col("cluster_size") >= 2)
    )


def gap_split(
    clusters: DataFrame,
    ts: Column,
    window_seconds: float,
    criteria: str = DEFAULT_CRITERIA,
) -> DataFrame:
    """W3: subdivide each cluster into gap-islands of ``ts`` and
    re-rank originals per island. ``ts`` is any numeric/sortable
    column expression (the corpus analog of mtime is a commit
    timestamp joined in by the caller)."""
    df = clusters.withColumn("_ts", ts)
    w = W.partitionBy("cluster_id").orderBy("_ts", "repo", "path", "commit")
    gap = F.col("_ts") - F.lag("_ts").over(w)
    island = F.sum(
        F.when(gap > window_seconds, 1).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, 0))
    df = df.withColumn(
        "cluster_id", F.concat_ws("#", "cluster_id", island.cast("string"))
    ).drop("rank", "is_original", "cluster_size")
    df = _requalify(df)
    return tag_originals(df, criteria).drop("_ts")


def basename_split(clusters: DataFrame, criteria: str = DEFAULT_CRITERIA) -> DataFrame:
    """W4 generalization: sub-cluster by basename; groups where all
    members shared one basename survive intact, mixed groups split."""
    basename = F.element_at(F.split("path", "/"), -1)
    df = clusters.withColumn(
        "cluster_id", F.concat_ws("#", "cluster_id", basename)
    ).drop("rank", "is_original", "cluster_size")
    df = _requalify(df)
    return tag_originals(df, criteria)


def must_match_tagged(clusters: DataFrame, preferred: Column) -> DataFrame:
    """J7 semi-constraint: keep only clusters containing at least one
    preferred member (group-level HAVING max(is_preferred))."""
    w = W.partitionBy("cluster_id")
    return (
        clusters.withColumn("_pref", preferred.cast("int"))
        .withColumn("_has_pref", F.max("_pref").over(w))
        .filter(F.col("_has_pref") == 1)
        .drop("_pref", "_has_pref")
    )


def keep_all_tagged(clusters: DataFrame, preferred: Column) -> DataFrame:
    """J7/W2: preferred members are originals regardless of rank."""
    return clusters.withColumn(
        "is_original", F.col("is_original") | preferred
    )


def keep_hardlinked(clusters: DataFrame, inode: Column | None = None) -> DataFrame:
    """W5 ``--keep-hardlinked`` (lib/shredder.c:1427-1455): a duplicate
    that shares storage with an original is re-tagged as an original —
    unlinking it would reclaim nothing, so it must not be reported as
    removable. Storage identity in the table model is (repo, inode);
    ``inode`` defaults to the ``inode`` column. One window over the
    clustered subset, no join.

    Null inodes (the column is an optional extras field) mean "storage
    identity unknown" — Spark windows group NULL keys together, so
    without a guard every null-inode row in a (cluster, repo) would
    share one partition and a single null-inode original would re-tag
    all of them. Null-inode rows are therefore left untouched."""
    ino = inode if inode is not None else F.col("inode")
    w = W.partitionBy("cluster_id", "repo", "_ino")
    keep = F.max((F.col("is_original") & F.col("_ino").isNotNull()).cast("int")).over(w)
    return (
        clusters.withColumn("_ino", ino)
        .withColumn("_keep", keep)
        .withColumn(
            "is_original",
            F.col("is_original")
            | ((F.col("_keep") == 1) & F.col("_ino").isNotNull()),
        )
        .drop("_ino", "_keep")
    )


def needs_new_qualify(clusters: DataFrame, is_new: Column) -> DataFrame:
    """F6/NEEDS_NEW: keep only clusters containing at least one "new"
    member (rmlint ``-N/--newer-than``: old files still participate in
    grouping so a new file's twins are found, but a group qualifies
    only if something in it is new — lib/shredder.c:333-334,805-806;
    mtime filter lib/preprocess.c:483-485). ``is_new`` is the
    mtime-cutoff predicate's table analog (commit-timestamp newness)."""
    w = W.partitionBy("cluster_id")
    return (
        clusters.withColumn("_new", is_new.cast("int"))
        .withColumn("_has_new", F.max("_new").over(w))
        .filter(F.col("_has_new") == 1)
        .drop("_new", "_has_new")
    )


def report_new_only(clusters: DataFrame, is_new: Column) -> DataFrame:
    """F6 output side (rmlint ``-n``): after NEEDS_NEW qualification,
    report only the new rows themselves (originals are still ranked on
    the full group — lib/shredder.c:805-806)."""
    return needs_new_qualify(clusters, is_new).filter(is_new)
