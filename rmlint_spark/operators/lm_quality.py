"""Corpus-trained character-bigram LM quality scoring (the CCNet /
Wenzek et al. 2020 idea — score each document by how familiar its
character statistics are to the corpus — with the model trained on
the corpus itself, so no external data is needed).

The deliberately integer-only formulation keeps the oracle exact:
instead of summing floating log-probabilities (whose addition order
is nondeterministic under parallel aggregation), each document
reports the **integer** total corpus frequency of its bigram
occurrences and the fraction that are "rare" (corpus count <=
``rare_max``). Rarity flags the same gibberish/non-language pages a
log-prob tail cut would, and every comparison is an exact int64
compare, so Spark and a SQL oracle agree bit-for-bit.

Scale shape: the model is at most ``|alphabet|^2`` rows, so it
broadcasts; per-document bigram counts shuffle as (doc_id, bg,
count) — bounded by distinct-bigrams-per-doc, not characters — and
the final per-document rollup is a map-side-combinable sum. Text
bytes never leave the scan partition. The reference analog is the
A2/A4 group-counter family (lib/shredder.c size-group accounting):
membership statistics against a corpus-wide table decide per-item
fate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# transform() needs an explicit >=2-char guard: Spark's sequence(1, n)
# infers step -1 when n < 1 and would emit [1, 0] for empty text.
_BIGRAMS = "transform(sequence(1, length({c}) - 1), i -> substr({c}, i, 2))"


def doc_bigram_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, bg, c) — per-document character-bigram occurrence counts.
    Documents shorter than 2 characters contribute nothing."""
    d = docs.filter(F.length(text_col) >= 2).select(
        F.col(id_col).alias("_id"),
        F.explode(F.expr(_BIGRAMS.format(c=text_col))).alias("bg"),
    )
    return d.groupBy("_id", "bg").agg(F.count("*").cast("long").alias("c"))


def charlm_scores(
    docs: DataFrame,
    rare_max: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-familiarity signals from the self-trained
    bigram model: (doc_id, n_bigrams, sum_corpus_count,
    avg_corpus_count, rare_frac)."""
    per_doc = doc_bigram_counts(docs, text_col, id_col)
    model = per_doc.groupBy("bg").agg(F.sum("c").cast("long").alias("corpus_count"))
    joined = per_doc.join(F.broadcast(model), "bg")
    out = joined.groupBy(F.col("_id").alias(id_col)).agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.sum(F.col("c") * F.col("corpus_count")).cast("long").alias("sum_corpus_count"),
        F.sum(F.when(F.col("corpus_count") <= rare_max, F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rare_occ"),
    )
    return out.select(
        id_col,
        "n_bigrams",
        "sum_corpus_count",
        (F.col("sum_corpus_count") / F.col("n_bigrams")).alias("avg_corpus_count"),
        (F.col("rare_occ") / F.col("n_bigrams")).alias("rare_frac"),
    )
