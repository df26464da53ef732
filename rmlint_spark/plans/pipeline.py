"""End-to-end near-duplicate pipeline (SURVEY.md §3.1 Spark equivalent).

  files
   -> exact funnel                 (operators/exact.py;  R1/R2/J3)
   -> MinHash signatures + LSH     (operators/lsh.py;    layer A)
   -> SimHash Hamming candidates   (operators/simhash_op.py; layer B)
   -> union edge list -> connected components (cluster resolution)
   -> original ranking (W1) -> cluster output contract

Near-dup verification accepts estimated Jaccard >= (threshold -
verify_margin): the margin absorbs MinHash estimator noise around the
threshold (sd ~ sqrt(j(1-j)/num_perm) ~ 0.04 at 128 perms) so planted
pairs AT the threshold still clear the recall>=0.99 bar; exact-dup
edges (same sha256) are unioned in so exact recall is always 1.0.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rmlint_spark.config import DEFAULT, EngineConfig
from rmlint_spark.operators import exact as EX
from rmlint_spark.operators.connected_components import connected_components
from rmlint_spark.operators.lint import KEY
from rmlint_spark.operators.lsh import (
    file_id,
    jaccard_verify,
    verified_pairs,
    with_signatures,
)
from rmlint_spark.operators.rank import tag_originals
from rmlint_spark.operators.simhash_op import simhash_candidates, with_simhash

VERIFY_MARGIN = 0.10


@dataclass
class PipelineResult:
    exact_clusters: DataFrame     # funnel output (cluster contract)
    near_edges: DataFrame         # (fid_a, fid_b) union edge list
    near_clusters: DataFrame      # (repo,path,commit,fid,cluster_id,cluster_size,rank,is_original)
    oversized_buckets: DataFrame  # skew guard report (band/block buckets over cap)


def exact_edges(exact: DataFrame) -> DataFrame:
    """Exact-dup pairs as edges: within each sha cluster, connect every
    member to the cluster head (star topology — O(n) edges per cluster,
    never O(n^2); CC resolves the rest)."""
    keyed = exact.select(file_id().alias("fid"), "cluster_id")
    heads = keyed.groupBy("cluster_id").agg(F.min("fid").alias("head"))
    return (
        keyed.join(heads, "cluster_id")
        .filter(F.col("fid") != F.col("head"))
        .select(F.col("head").alias("fid_a"), F.col("fid").alias("fid_b"))
    )


def run_pipeline(files: DataFrame, cfg: EngineConfig = DEFAULT, use_simhash: bool = True) -> PipelineResult:
    # exact funnel result feeds both the output contract and the edge
    # list — cache so the staged scans run once (at cluster scale this
    # is a stage checkpoint instead, sources/checkpoint.py)
    exact = EX.exact_clusters(files, cfg).cache()

    sigs = with_signatures(files, cfg).cache()
    relaxed = replace(cfg, jaccard_threshold=max(0.0, cfg.jaccard_threshold - VERIFY_MARGIN))
    mh_pairs, over_mh = verified_pairs(sigs, relaxed)

    edges = mh_pairs.select("fid_a", "fid_b")
    oversized = over_mh.select(F.lit("minhash_band").alias("kind"), F.col("width"))
    if use_simhash:
        sims = with_simhash(files, cfg)
        sh_cand, over_sh = simhash_candidates(sims, cfg)
        # unified verification: SimHash candidates must clear the same
        # estimated-Jaccard bar (SimHash proximity alone is too weak on
        # short same-vocab docs — the pathological collision bucket)
        sh_pairs = jaccard_verify(sh_cand, sigs, relaxed.jaccard_threshold)
        edges = edges.union(sh_pairs.select("fid_a", "fid_b"))
        oversized = oversized.union(
            over_sh.select(F.lit("simhash_block").alias("kind"), F.col("width"))
        )
    edges = edges.union(exact_edges(exact)).dropDuplicates(["fid_a", "fid_b"])

    comp = connected_components(edges)
    members = (
        sigs.select("fid", *KEY)
        .join(comp, "fid", "inner")
        .withColumnRenamed("component", "cluster_id")
    )
    sizes = members.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    near = tag_originals(members.join(sizes, "cluster_id"), cfg.rank_criteria).select(
        *KEY, "fid", "cluster_id", "cluster_size", "rank", "is_original"
    )
    return PipelineResult(exact, edges, near, oversized)
