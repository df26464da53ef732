"""Original selection — ranking within a cluster.

Reference: ``rm_shred_group_find_original`` (lib/shredder.c:1257-1298),
criterion comparator ``rm_pp_cmp_criterion`` (lib/preprocess.c:388-427),
regex-criteria compilation (lib/preprocess.c:304-356), evaluation loop
``rm_pp_cmp_orig_criteria`` (lib/preprocess.c:435-455). rmlint's
``-S [dlamprxhoDLAMPRXHO]`` string (default ``pOma``, lib/cfg.c:65)
maps to a Spark Window ``orderBy``; the head row (row_number == 1) is
the original (W1). Forced originals (``-k/-K`` keep-all-tagged,
lib/shredder.c:1264-1283) become an OR'd boolean (W2).

Criterion letters (lowercase as listed; UPPERCASE reverses, mirroring
``isupper -> sign = -1`` at lib/preprocess.c:391):

  m  oldest mtime first (here: commit asc — the table mtime analog)
  a  alphabetical basename, case-insensitive (g_ascii_strcasecmp)
  l  shortest basename first
  d  shallowest path depth first
  p  preferred ("tagged") path first
  h  lowest hardlink count first  (optional ``link_count`` column;
     constant 0 when the data model has no hardlink analog)
  o  lowest outer-hardlink count first (optional ``outer_link_count``)
  r<regex>  paths matching <regex> first (pattern in angle brackets,
            exactly rmlint's ``-S 'r<\\.bak$>a'`` syntax)
  x<regex>  basenames matching <regex> first
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DEFAULT_CRITERIA = "pOma"  # lib/cfg.c:65


def parse_criteria(spec: str) -> list[tuple[str, str | None]]:
    """Split a criteria string into (letter, pattern|None) terms.
    ``r``/``x`` consume a ``<pattern>`` immediately after the letter
    (lib/preprocess.c:304-356). Unknown letters raise — same
    strictness as the reference parser."""
    terms: list[tuple[str, str | None]] = []
    i = 0
    while i < len(spec):
        ch = spec[i]
        if ch.lower() not in "maldphorx":
            raise ValueError(f"unknown rank criterion {ch!r}")
        pat = None
        if ch.lower() in ("r", "x"):
            if i + 1 >= len(spec) or spec[i + 1] != "<":
                raise ValueError(f"criterion {ch!r} requires a <pattern>")
            end = spec.find(">", i + 2)
            if end < 0:
                raise ValueError(f"unterminated <pattern> after {ch!r}")
            pat = spec[i + 2 : end]
            i = end
        terms.append((ch, pat))
        i += 1
    return terms


def criteria_columns(spec: str) -> list[Column]:
    """Translate an rmlint-style criteria string to window sort keys.
    A trailing (repo, path, commit) tiebreak guarantees a total order
    (determinism across parallelism levels).

    Preferred ("tagged") rows sort first UNCONDITIONALLY, before any
    -S criterion is evaluated (rm_pp_cmp_orig_criteria orders by
    preference before entering the criteria loop,
    lib/preprocess.c:435-455); 'p'/'P' remain as explicit criteria."""
    cols: list[Column] = [F.col("is_preferred").desc()]
    basename = F.element_at(F.split("path", "/"), -1)
    depth = F.size(F.split("path", "/"))

    def opt_col(name: str) -> Column:
        # optional data-model columns (hardlink analogs); constant when
        # absent so the criterion is a documented no-op
        return F.col(name)

    for ch, pat in parse_criteria(spec):
        lower = ch.lower()
        if lower == "p":
            key: Column = F.col("is_preferred")
            # p: preferred FIRST -> descending on the boolean
            cols.append(key.desc() if ch == "p" else key.asc())
            continue
        if lower == "a":
            key = F.lower(basename)
        elif lower == "l":
            key = F.length(basename)
        elif lower == "d":
            key = depth
        elif lower == "m":
            key = F.col("commit")
        elif lower == "h":
            key = opt_col("link_count")
        elif lower == "o":
            key = opt_col("outer_link_count")
        elif lower == "r":
            # match first: descending on the boolean match flag
            key = F.col("path").rlike(pat)
            cols.append(key.desc() if ch == "r" else key.asc())
            continue
        else:  # x
            key = basename.rlike(pat)
            cols.append(key.desc() if ch == "x" else key.asc())
            continue
        cols.append(key.asc() if ch.islower() else key.desc())
    # total order for determinism across parallelism levels
    cols += [F.col("repo").asc(), F.col("path").asc(), F.col("commit").asc()]
    return cols


def tag_originals(
    clusters: DataFrame,
    criteria: str = DEFAULT_CRITERIA,
    cluster_col: str = "cluster_id",
    forced: Column | None = None,
) -> DataFrame:
    """Add ``rank`` (1-based within cluster) and ``is_original``.

    ``forced`` is the W2 analog: rows matching it are originals
    regardless of rank (``--keep-all-tagged``)."""
    df = clusters
    if "is_preferred" not in df.columns:
        df = df.withColumn("is_preferred", F.lit(False))
    needed = {ch.lower() for ch, _ in parse_criteria(criteria)}
    if "h" in needed and "link_count" not in df.columns:
        df = df.withColumn("link_count", F.lit(0))
    if "o" in needed and "outer_link_count" not in df.columns:
        df = df.withColumn("outer_link_count", F.lit(0))
    w = W.partitionBy(cluster_col).orderBy(*criteria_columns(criteria))
    df = df.withColumn("rank", F.row_number().over(w))
    orig = F.col("rank") == 1
    if forced is not None:
        orig = orig | forced
    return df.withColumn("is_original", orig)
