"""Robust winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 —
the MOSS algorithm): hash every character k-gram, slide a w-wide
window over the hash sequence, and keep each window's minimum. The
guarantee: any substring match of length >= k + w - 1 between two
documents shares at least one selected fingerprint, while only
~2/(w+1) of the grams are kept — the standard local-fingerprinting
scheme for source-code plagiarism/clone detection.

Implementation is pure JVM higher-order functions (sequence /
transform / slice / array_min / array_distinct): fingerprint
selection happens inside the scan partition and only the selected
(doc_id, fp) pairs ever move. Hashes are 8-hex-char sha256 prefixes
so the window minimum is a plain lexicographic string min any SQL
engine reproduces exactly (no engine-specific integer hash).

Reference analog: the substring-lint shingle stage
(lib/treemerge.c / the J-new inverted-index clone join) — winnowing
is the principled subsampling of exactly that shingle relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fp) — the distinct winnowed fingerprints per document.
    Documents shorter than k + w - 1 characters (no full window)
    contribute nothing."""
    # greatest(..., 1) keeps the expressions TOTAL: Catalyst's
    # InferFiltersFromGenerate + codegen subexpression elimination can
    # evaluate them on rows the length filter rejects (sequence(1, 0)
    # yields a DESCENDING [1, 0] and slice throws on start 0). The
    # clamp only fires on rows the filter drops, so output is unchanged.
    #
    # The gram array is LET-BOUND as the lambda variable of a
    # singleton-array transform. Projecting it as a column instead
    # invites Catalyst's CollapseProject to inline the whole gram
    # transform into the window lambda, where `slice(grams, j, w)`
    # re-evaluates every k-gram hash once PER WINDOW POSITION —
    # O(len^3) per document (measured: one 25-minute single task at
    # 5000 docs). Bound as a lambda variable, grams evaluates once
    # per row no matter how the optimizer rearranges projections;
    # tests/test_plans.py pins the plan shape.
    grams = (
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> substr(sha2(substr({text_col}, i, {k}), 256), 1, 8))"
    )
    fps = (
        f"transform(array({grams}), g -> "
        f"  array_distinct(transform(sequence(1, greatest(size(g) - {w - 1}, 1)), "
        f"  j -> array_min(slice(g, j, {w})))))[0]"
    )
    d = docs.filter(F.length(text_col) >= k + w - 1)
    return d.select(F.col(id_col).alias(id_col), F.explode(F.expr(fps)).alias("fp"))


def shared_fingerprint_pairs(
    fps: DataFrame, max_bucket_width: int = 64, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Candidate clone pairs from a winnowed fingerprint relation:
    self-join on fp with the repo-standard width cap. Returns
    (pairs with shared-fp counts, dropped over-cap fingerprints) —
    the same (result, dropped) observability contract as the LSH and
    ANN candidate stages."""
    width = fps.groupBy("fp").agg(F.count("*").alias("_w"))
    # only the over-cap set is small by construction — broadcast THAT
    # and anti-join, never the full fingerprint vocabulary
    dropped = width.filter(F.col("_w") > max_bucket_width).select("fp", "_w")
    usable = fps.join(F.broadcast(dropped.select("fp")), "fp", "left_anti")
    a = usable.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = usable.select(F.col("fp"), F.col(id_col).alias("id_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return pairs, dropped
