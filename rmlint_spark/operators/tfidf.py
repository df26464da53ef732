"""TF-IDF keyword extraction: top-k terms per document by term
frequency x inverse document frequency, using the raw-idf variant
``tfidf = tf * N / df`` so every score is an exact integer ratio
(int64 numerator / int64 denominator) — the ranking is identical to
any monotone idf transform per fixed tf, and the integer-rational
form lets a SQL oracle reproduce the doubles bit-for-bit (no libm
log whose last ulp differs across engines).

Scale shape: explode -> (doc_id, term) count with map-side combine;
document frequency is a second tiny aggregation over the vocabulary;
the corpus total N rides a broadcast cross join (one row); df joins
back broadcast when the vocabulary fits (AQE falls back to shuffle
when it does not); top-k is a per-document window — the only
full-width shuffle is on doc_id, carrying (term, tf) pairs, never
text. Reference analog: O2/O5 per-group rank sort + top-k
(lib/session ranking), re-keyed by term statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, tf, df, tfidf, rk) — the k highest-tfidf terms
    per document; ties broken by term ascending for determinism."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: F.length(x) > 0)
    tf = (
        docs.select(F.col(id_col).alias("_id"), F.explode(words).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("_id").alias(id_col),
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")) / F.col("df")).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
