"""Approximate nearest neighbors over an embedding column.

Training-data-pipeline operator family (no reference counterpart; the
funnel discipline still applies: cheap bucketing first, exact scoring
only within buckets).

- ``brute_force_topk``: exact cosine top-k. The query side is
  broadcast (it's the small side by construction); similarity is a
  JVM-side ``zip_with``/``aggregate`` dot product over double arrays —
  no Python in the loop. O(N*Q) — the baseline and the verifier.
- ``hyperplane_topk``: the scale path. R random-hyperplane sign bits
  (vector SimHash) computed in one vectorized numpy matmul per Arrow
  batch; candidates = same bucket in >= 1 of B bands; exact cosine
  re-scores candidates only. Recall tunes with B x R.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def _as_double(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, neighbor_id, cos_sim, rk) — exact top-k by cosine.

    ``queries`` defaults to the corpus itself (self-join, excluding
    self-matches). The query side is broadcast."""
    corpus = _as_double(embeddings.select(id_col, vec_col), vec_col)
    q = _as_double((queries or embeddings).select(id_col, vec_col), vec_col)
    qq = q.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    joined = corpus.join(F.broadcast(qq), F.col(id_col) != F.col("qid"))
    scored = joined.select(
        F.col("qid").alias(id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qvec"), F.col(vec_col)).alias("cos_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def brute_force_topk_blas(
    embeddings: DataFrame,
    k: int = 5,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via blocked numpy matmul (BLAS) — same results and
    tie-break as ``brute_force_topk``, ~10-50x faster.

    The query matrix is broadcast to executors (queries are the small
    side by construction); each Arrow batch of the corpus computes a
    (batch x Q) similarity block and emits its per-query top-k
    candidates; a final window rank reduces partials to global top-k.
    Shuffle volume: k rows per (query, corpus-batch) — never the full
    cross product."""
    spark = embeddings.sparkSession
    q_rows = (queries or embeddings).select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = f"{id_col} long, neighbor_id long, cos_sim double"

    def block(batches):
        ids_q, mat_q = bc.value
        for pdf in batches:
            n_ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = mat_q @ m.T  # (Q, batch)
            # self-match exclusion
            same = ids_q[:, None] == n_ids[None, :]
            sims[same] = -np.inf
            kk = min(k, sims.shape[1])
            # per-query top-k within this batch (argpartition + stable sort)
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {"qid": [], "nid": [], "sim": []}
            for qi in range(sims.shape[0]):
                cand = idx[qi]
                s = sims[qi, cand]
                keep = s > -np.inf
                rows["qid"].extend([ids_q[qi]] * int(keep.sum()))
                rows["nid"].extend(n_ids[cand[keep]])
                rows["sim"].extend(s[keep])
            yield pd.DataFrame(
                {id_col: rows["qid"], "neighbor_id": rows["nid"], "cos_sim": rows["sim"]}
            )

    partial = embeddings.select(id_col, vec_col).mapInPandas(block, schema=out_schema)
    w = W.partitionBy(id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return partial.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def hyperplane_udf(dim: int, n_planes: int, seed: int = 42):
    """Sign-bit bucket per band: one numpy matmul per Arrow batch."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes > 0).astype(np.uint64)  # (batch, n_planes)
        shifts = np.arange(n_planes, dtype=np.uint64)
        return pd.Series(((bits << shifts).sum(axis=1, dtype=np.uint64)).astype(np.int64))

    return _sig


def hyperplane_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_bands: int = 8,
    bits_per_band: int = 8,
    dim: int = 64,
    max_bucket: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed top-k: candidates share a hyperplane-sign bucket in
    at least one band; exact cosine re-scores candidates only."""
    emb = _as_double(embeddings.select(id_col, vec_col), vec_col)
    banded = emb
    for b in range(n_bands):
        sig = hyperplane_udf(dim, bits_per_band, seed=1000 + b)
        banded = banded.withColumn(f"band_{b}", sig(F.col(vec_col)))
    buckets = banded.select(
        id_col,
        vec_col,
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(n_bands)])).alias(
            "band_id", "bucket"
        ),
    )
    widths = buckets.groupBy("band_id", "bucket").agg(F.count("*").alias("w"))
    ok = buckets.join(
        widths.filter(F.col("w") > max_bucket).select("band_id", "bucket"),
        ["band_id", "bucket"],
        "left_anti",
    )
    a = ok.select("band_id", "bucket", F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    b_ = ok.select("band_id", "bucket", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    cand = (
        a.join(b_, ["band_id", "bucket"])
        .filter(F.col("qid") != F.col("neighbor_id"))
        .select("qid", "neighbor_id", "qvec", "nvec")
        .dropDuplicates(["qid", "neighbor_id"])
    )
    scored = cand.select(
        F.col("qid").alias(id_col),
        "neighbor_id",
        cosine(F.col("qvec"), F.col("nvec")).alias("cos_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
