"""Replication-invariance: the pipeline's closed-form scale law.

Replicating the corpus k x with fresh repo names (identical contents)
is a scale-up whose correct outputs are known a priori, which makes it
a metamorphic test of exactly the property that decides whether the
engine survives 100 TB:

(1) the verified near-dup edge relation over content REPRESENTATIVES
    is INVARIANT — rmlint's J1 bundling (lib/preprocess.c:514-526)
    applied to identical contents means candidate volume scales with
    DISTINCT content, not corpus size, so exact-dup families can
    never blow up the LSH band join no matter how many copies exist;
(2) every file becomes exact- and near-clustered (each content now
    has >= k copies), and both membership counts equal the distinct
    nonempty file-identity count — no more, no less.

A failure here means family size leaked into the signature/candidate
layer (quadratic blowup at scale) or the signatures went
nondeterministic. scripts/replica_scale.py runs the same law at 1.6M
files via spark-submit; this test pins it at unit scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rmlint_spark.operators.lsh import row_index
from rmlint_spark.plans.pipeline import run_pipeline

K = 4


def replicate(files, k: int):
    """k copies of the corpus under fresh repo names (same contents)."""
    out = None
    for i in range(k):
        part = files.withColumn("repo", F.concat(F.col("repo"), F.lit(f"_r{i}")))
        out = part if out is None else out.unionByName(part)
    return out


def sha_edges(result, files):
    """Normalize the fid edge list to unordered (sha, sha) pairs —
    fid labels depend on which replica won representative election,
    so the invariant lives at the content level."""
    idx = row_index(files).select("fid", "sha")
    e = (
        result.near_edges
        .join(idx.withColumnRenamed("fid", "fid_a").withColumnRenamed("sha", "sha_a"), "fid_a")
        .join(idx.withColumnRenamed("fid", "fid_b").withColumnRenamed("sha", "sha_b"), "fid_b")
        .select(
            F.least("sha_a", "sha_b").alias("lo"),
            F.greatest("sha_a", "sha_b").alias("hi"),
        )
    )
    return {(r["lo"], r["hi"]) for r in e.collect()}


@pytest.fixture(scope="module")
def base_result(corpus):
    files, _ = corpus
    return files, run_pipeline(files)


@pytest.fixture(scope="module")
def replica_result(corpus):
    files, _ = corpus
    files_k = replicate(files, K).cache()
    files_k.count()
    return files_k, run_pipeline(files_k)


def test_edge_relation_invariant_under_replication(base_result, replica_result):
    files, r1 = base_result
    files_k, rk = replica_result
    assert sha_edges(rk, files_k) == sha_edges(r1, files)


def test_every_file_clusters_after_replication(replica_result):
    files_k, rk = replica_result
    distinct_nonempty = (
        files_k.filter(F.length("content") > 0)
        .dropDuplicates(["repo", "path", "commit"])
        .count()
    )
    assert rk.exact_clusters.count() == distinct_nonempty
    assert rk.near_clusters.count() == distinct_nonempty


def test_cluster_structure_scales_by_k(base_result, replica_result):
    """Each base near-cluster reappears with every member k-plicated;
    contents unclustered in the base corpus surface as pure exact
    families of size k. Cluster count = base clusters + base
    unclustered distinct contents."""
    files, r1 = base_result
    files_k, rk = replica_result
    base_members = r1.near_clusters.count()
    base_clusters = r1.near_clusters.select("cluster_id").distinct().count()
    distinct_nonempty_base = (
        files.filter(F.length("content") > 0)
        .dropDuplicates(["repo", "path", "commit"])
        .count()
    )
    # contents (by sha) never clustered in the base run
    idx = row_index(files)
    clustered_shas = (
        r1.near_clusters
        .join(idx, ["repo", "path", "commit"])
        .select("sha").distinct().count()
    )
    total_shas = idx.select("sha").distinct().count()
    assert rk.near_clusters.count() == K * distinct_nonempty_base
    assert (
        rk.near_clusters.select("cluster_id").distinct().count()
        == base_clusters + (total_shas - clustered_shas)
    )
    # sanity: the base corpus genuinely had unclustered files, so the
    # "every file clusters" assertion above is non-vacuous
    assert base_members < distinct_nonempty_base
