"""Exact substring span dedup — the ExactSubstr removal transform.

Detect character spans (length >= window) that occur more than once in
the corpus and EXCISE every occurrence except the globally-first one,
per Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better" (suffix-array ExactSubstr dedup). The repo already
detects shared windows (operators/substring.py) and fingerprints
(operators/winnow.py); this operator is the *transform*: it rewrites
the corpus with duplicated spans removed.

Pipeline (all position bookkeeping relational, text shuffles once):

  text --stride-1 window hashes (Arrow SipHash pass)--> (doc_id, pos, h)
       --groupBy h: count >= 2--> duplicated occurrences
       --keeper = min(doc_id, pos) per h--> removal candidates
       --gaps-and-islands merge per doc--> maximal removal spans
       --zip_with gap slicing (JVM HOFs)--> clean text

Scale properties (the reason this shape is 100 TB-safe):

- NO pair join anywhere: a window duplicated across w documents emits
  w rows, not w^2 — boilerplate cannot explode this operator, so it
  needs no width cap (contrast clone_pairs' capped self-join).
- Shuffles carry (h, doc_id, pos) triples only; text crosses the wire
  exactly once, in the final doc_id join that rebuilds documents.
- stride-1 hashing is exact (every duplicated span of length >= window
  is found, suffix-array-equivalent recall); cost is O(len) int64
  hashes per doc, the same order as suffix-array construction. For
  petabyte corpora set stride > 1: any duplicated span of length
  >= window + stride - 1 still contains an aligned window on both
  sides of the duplication, so recall degrades only for near-minimal
  spans (document the tradeoff per corpus; winnow.py offers the
  alignment-robust fingerprint alternative).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def positioned_window_udf(window: int, stride: int):
    """array<long> of SipHash values, one per char window
    [i*stride, i*stride + window); docs shorter than ``window`` emit
    none (nothing shorter can be a duplicated span)."""

    @F.pandas_udf("array<long>")
    def _wh(text: pd.Series) -> pd.Series:
        texts = text.tolist()
        all_windows: list[str] = []
        counts = []
        for t in texts:
            t = t or ""
            ws = [t[i : i + window] for i in range(0, len(t) - window + 1, stride)]
            all_windows.extend(ws)
            counts.append(len(ws))
        if not all_windows:
            return pd.Series([[] for _ in texts])
        h = pd.util.hash_array(np.asarray(all_windows, dtype=object)).astype(np.int64)
        out, pos = [], 0
        for c in counts:
            out.append(h[pos : pos + c].tolist())
            pos += c
        return pd.Series(out)

    return _wh.asNondeterministic()  # pure; barrier against re-evaluation


def removal_spans(
    docs: DataFrame, window: int = 50, stride: int = 1
) -> DataFrame:
    """(doc_id, start, end) character spans to remove: every occurrence
    of a duplicated window except the globally-first (min doc_id, then
    min position) occurrence. Spans are unmerged window extents; feed
    to merge_spans."""
    udf = positioned_window_udf(window, stride)
    occ = docs.select(
        "doc_id", F.posexplode(udf(F.col("text"))).alias("idx", "h")
    ).select("doc_id", (F.col("idx") * stride).alias("pos"), "h")

    per_h = occ.groupBy("h").agg(
        F.count("*").alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("keeper"),
    )
    dup = per_h.filter(F.col("n_occ") >= 2)
    return (
        occ.join(dup, "h")
        .filter(
            (F.col("doc_id") != F.col("keeper.doc_id"))
            | (F.col("pos") != F.col("keeper.pos"))
        )
        .select(
            "doc_id",
            F.col("pos").alias("start"),
            (F.col("pos") + window).alias("end"),
        )
        .dropDuplicates(["doc_id", "start", "end"])
    )


def merge_spans(spans: DataFrame) -> DataFrame:
    """Gaps-and-islands merge of overlapping/adjacent [start, end)
    spans per doc_id -> maximal removal spans. One window pass + one
    agg; only (doc_id, start, end) rows shuffle."""
    by_start = W.partitionBy("doc_id").orderBy("start", "end")
    prev_max_end = F.max("end").over(by_start.rowsBetween(W.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "brk",
        F.when(prev_max_end.isNull() | (F.col("start") > prev_max_end), 1).otherwise(0),
    ).withColumn("island", F.sum("brk").over(by_start))
    return flagged.groupBy("doc_id", "island").agg(
        F.min("start").alias("start"), F.max("end").alias("end")
    ).select("doc_id", "start", "end")


def excise(docs: DataFrame, merged: DataFrame) -> DataFrame:
    """Rewrite each doc with its merged spans removed:
    (doc_id, clean_text, n_spans, removed_chars). Docs without spans
    pass through unchanged. Slicing runs as JVM higher-order functions
    over the per-doc span array; text never enters a UDF."""
    per_doc = merged.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("sp")
    )
    joined = docs.join(per_doc, "doc_id", "left").withColumn(
        "sp", F.coalesce("sp", F.array())
    )
    # kept gaps: [0, sp[0].start), [sp[i].end, sp[i+1].start), [last.end, len)
    gap_starts = F.concat(
        F.array(F.lit(0)), F.transform("sp", lambda x: x["end"])
    )
    gap_ends = F.concat(
        F.transform("sp", lambda x: x["start"]),
        F.array(F.length("text")),
    )
    clean = F.array_join(
        F.zip_with(
            gap_starts,
            gap_ends,
            lambda s, e: F.expr("text").substr(s + 1, F.greatest(e - s, F.lit(0))),
        ),
        "",
    )
    return joined.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size("sp").alias("n_spans"),
        (F.length("text") - F.length(clean)).alias("removed_chars"),
    )


def span_dedup(
    docs: DataFrame, window: int = 50, stride: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Full transform: returns (clean_docs, merged_spans). ``docs``
    needs (doc_id, text); output keeps every doc_id."""
    merged = merge_spans(removal_spans(docs, window, stride))
    return excise(docs, merged), merged
