"""Benchmark decontamination: flag corpus documents sharing any
word n-gram with a benchmark/eval set (the published 13-gram overlap
rule used to keep test sets out of training data).

Scale shape: the benchmark side is tiny relative to the corpus, so
its distinct n-gram hashes broadcast and the corpus side resolves as
a map-side semi/inner join — corpus n-grams NEVER shuffle, and only
(doc_id, hits) aggregates move. All JVM expressions (split /
transform / xxhash64), no UDF. The reference analog is the tagged
semi-join constraint family (J7, --must-match-tagged): membership in
a keyed reference set decides the row's fate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngram_hashes(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram_hash) — one row per word n-gram occurrence. Hashes
    (xxhash64) keep the relation 16 bytes/row; documents shorter than
    n words contribute nothing."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: F.length(x) > 0)
    d = df.select(F.col(id_col).alias("_id"), words.alias("w")).filter(
        F.size("w") >= n
    )
    # ws is LET-BOUND (singleton-array transform): projected as a bare
    # column, CollapseProject inlines the split+filter into the slice
    # lambda and re-tokenizes the document once per gram position —
    # O(words^2) per doc (see operators/winnow.py for the O(len^3)
    # variant this repo measured).
    gram = (
        f"transform(array(w), ws -> transform(sequence(1, size(ws) - {n - 1}), "
        f"i -> xxhash64(concat_ws(' ', slice(ws, i, {n})))))[0]"
    )
    return d.select("_id", F.explode(F.expr(gram)).alias("gram_hash"))


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_hits, n_grams_matched): corpus documents sharing at
    least one n-gram with the benchmark. ``n_hits`` counts overlapping
    occurrences, ``n_grams_matched`` distinct overlapping grams."""
    bench = F.broadcast(
        _ngram_hashes(benchmark, text_col, id_col, n).select("gram_hash").distinct()
    )
    hits = _ngram_hashes(corpus, text_col, id_col, n).join(bench, "gram_hash")
    return hits.groupBy(F.col("_id").alias(id_col)).agg(
        F.count("*").alias("n_hits"),
        F.countDistinct("gram_hash").alias("n_grams_matched"),
    )
