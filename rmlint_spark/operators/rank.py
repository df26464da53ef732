"""Original selection — ranking within a cluster.

Reference: ``rm_shred_group_find_original`` (lib/shredder.c:1257-1298),
criterion comparator (lib/shredder.c:1234-1251), criteria evaluation
(lib/preprocess.c:388-427,435-455). rmlint's ``-S [dlamprxDLAMPRX]``
string (default ``pOma``, lib/cfg.c:65) maps to a Spark Window
``orderBy``; the head row (row_number == 1) is the original (W1).
Forced originals (``-k/-K`` keep-all-tagged, lib/shredder.c:1264-1283)
become an OR'd boolean (W2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def criteria_columns(spec: str) -> list[Column]:
    """Translate an rmlint-style criteria string to window sort keys.

    Supported (lowercase asc / uppercase desc where meaningful):
      p/P preferred first/last    a/A alphabetic path
      l/L basename length         d/D path depth
      m/M commit asc/desc (mtime analog)
    Unknown chars raise — same strictness as the reference parser.
    """
    cols: list[Column] = []
    basename = F.element_at(F.split("path", "/"), -1)
    depth = F.size(F.split("path", "/"))
    for ch in spec:
        if ch == "p":
            cols.append(F.col("is_preferred").desc())
        elif ch == "P":
            cols.append(F.col("is_preferred").asc())
        elif ch == "a":
            cols.append(F.col("path").asc())
        elif ch == "A":
            cols.append(F.col("path").desc())
        elif ch == "l":
            cols.append(F.length(basename).asc())
        elif ch == "L":
            cols.append(F.length(basename).desc())
        elif ch == "d":
            cols.append(depth.asc())
        elif ch == "D":
            cols.append(depth.desc())
        elif ch == "m":
            cols.append(F.col("commit").asc())
        elif ch == "M":
            cols.append(F.col("commit").desc())
        else:
            raise ValueError(f"unknown rank criterion {ch!r}")
    # total order for determinism across parallelism levels
    cols += [F.col("repo").asc(), F.col("path").asc(), F.col("commit").asc()]
    return cols


def tag_originals(
    clusters: DataFrame,
    criteria: str = "pa",
    cluster_col: str = "cluster_id",
    forced: Column | None = None,
) -> DataFrame:
    """Add ``rank`` (1-based within cluster) and ``is_original``.

    ``forced`` is the W2 analog: rows matching it are originals
    regardless of rank (``--keep-all-tagged``)."""
    df = clusters
    if "is_preferred" not in df.columns:
        df = df.withColumn("is_preferred", F.lit(False))
    w = W.partitionBy(cluster_col).orderBy(*criteria_columns(criteria))
    df = df.withColumn("rank", F.row_number().over(w))
    orig = F.col("rank") == 1
    if forced is not None:
        orig = orig | forced
    return df.withColumn("is_original", orig)
