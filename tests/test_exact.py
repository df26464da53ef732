"""Exact-dup funnel vs an independent hashlib oracle.

Oracle design is a port of the reference's verifier
(tests/test_speed/verify.py:23-44): recompute sha256 with Python
hashlib over collected rows (no Spark involvement) and compare
cluster assignments pairwise.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from rmlint_spark.config import DEFAULT, EngineConfig, SignatureConfig
from rmlint_spark.operators.exact import exact_clusters, session_totals, uniques
from rmlint_spark.operators.lint import classify, drop_path_doubles


def oracle_clusters(files_df):
    """Brute-force: dedupe rows, drop empties, group by full content."""
    rows = files_df.collect()
    seen = set()
    groups = defaultdict(list)
    for r in rows:
        key = (r["repo"], r["path"], r["commit"])
        if key in seen or len(r["content"]) == 0:
            continue
        seen.add(key)
        groups[hashlib.sha256(r["content"].encode()).hexdigest()].append(key)
    return {h: sorted(ks) for h, ks in groups.items() if len(ks) >= 2}


def as_pairs(cluster_map):
    pairs = set()
    for ks in cluster_map.values():
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                pairs.add((ks[i], ks[j]))
    return pairs


@pytest.fixture(scope="module")
def clustered(corpus):
    files, _ = corpus
    # small prefix to force the prefix stage to actually discriminate
    cfg = EngineConfig(sig=SignatureConfig(prefix_len=64))
    return exact_clusters(files, cfg).cache()


def test_clusters_match_oracle_exactly(corpus, clustered):
    files, _ = corpus
    oracle = oracle_clusters(files)
    got = defaultdict(list)
    for r in clustered.collect():
        got[r["cluster_id"]].append((r["repo"], r["path"], r["commit"]))
    got = {h: sorted(ks) for h, ks in got.items()}
    assert as_pairs(got) == as_pairs(oracle)
    # checksum invariant: cluster ids ARE the content sha256
    assert set(got.keys()) == set(oracle.keys())


def test_recall_is_one_for_exact(corpus, clustered):
    """north rule: dup-pair recall >= 0.99; exact funnel must hit 1.0."""
    files, _ = corpus
    oracle_pairs = as_pairs(oracle_clusters(files))
    got = defaultdict(list)
    for r in clustered.collect():
        got[r["cluster_id"]].append((r["repo"], r["path"], r["commit"]))
    got_pairs = as_pairs({h: sorted(k) for h, k in got.items()})
    recall = len(got_pairs & oracle_pairs) / len(oracle_pairs)
    assert recall == 1.0


def test_one_original_per_cluster(clustered):
    bad = (
        clustered.groupBy("cluster_id")
        .agg(F.sum(F.col("is_original").cast("int")).alias("n_orig"))
        .filter(F.col("n_orig") != 1)
        .count()
    )
    assert bad == 0


def test_nearmiss_never_clusters(corpus, clustered):
    _, truth = corpus
    nm = truth.filter(F.col("scenario") == "nearmiss")
    joined = clustered.join(nm, ["repo", "path", "commit"], "inner")
    # nearmiss rows may only cluster with... nothing: contents are unique
    assert joined.count() == 0


def test_uniques_complement(corpus, clustered):
    files, _ = corpus
    cfg = EngineConfig(sig=SignatureConfig(prefix_len=64))
    u = uniques(files, clustered, cfg)
    base_n = drop_path_doubles(files).filter(F.length("content") >= 1).count()
    assert u.count() + clustered.count() == base_n


def test_lint_routing(corpus):
    files, truth = corpus
    classified = classify(files)
    joined = classified.join(truth, ["repo", "path", "commit"])
    empties = joined.filter(F.col("scenario") == "empty")
    assert empties.filter(F.col("lint_type") != "emptyfile").count() == 0
    # each planted pathdouble contributes exactly one 'pathdouble' row
    n_doubles_truth = truth.filter(F.col("scenario") == "pathdouble").count()
    n_doubles_clf = classified.filter(F.col("lint_type") == "pathdouble").count()
    assert n_doubles_clf == n_doubles_truth


def test_session_totals(clustered):
    r = session_totals(clustered).collect()[0]
    assert r["dup_group_counter"] > 0
    assert r["dup_counter"] >= r["dup_group_counter"]
    assert r["duplicate_bytes"] > 0


def test_metamorphic_parallelism(corpus):
    """Pedantic-mode analog (reference tests/utils.py:250-305): same
    clusters under different shuffle partitioning and prefix config."""
    files, _ = corpus
    base = {
        (r["repo"], r["path"], r["commit"], r["cluster_id"])
        for r in exact_clusters(files, EngineConfig(sig=SignatureConfig(prefix_len=64))).collect()
    }
    rep = files.repartition(3)
    alt = {
        (r["repo"], r["path"], r["commit"], r["cluster_id"])
        for r in exact_clusters(rep, EngineConfig(sig=SignatureConfig(prefix_len=7))).collect()
    }
    assert base == alt


def test_route_narrow_router(spark):
    from pyspark.sql import Row

    from rmlint_spark.operators.lint import route

    rows = [
        Row(repo="r", path="a", commit="c", lang="t", content="X"),
        Row(repo="r", path="a", commit="c", lang="t", content="X"),  # double
        Row(repo="r", path="b", commit="c", lang="t", content=""),
        Row(repo="r", path="d", commit="c", lang="t", content="Y"),
    ]
    empty, doubles, cand = route(spark.createDataFrame(rows))
    assert [r["path"] for r in empty.collect()] == ["b"]
    d = doubles.collect()
    assert len(d) == 1 and d[0]["path"] == "a" and d[0]["n_extra"] == 1
    assert cand.count() == 3  # raw nonempty rows; funnel dedups doubles


def test_fused_single_pass_identical_output(corpus):
    """fuse_full_digest=True (one content scan for prefix sig + full
    digest) must reproduce the two-pass funnel's FULL output rows —
    not just cluster pairs — across the configs that interact with the
    fusion: byte_confirm, match keys, and a byte-range clamp. The
    fusion's value-equivalence argument (a pruned row is size- or
    prefix-unique, hence checksum-unique within its key) is exactly
    what this pins."""
    from dataclasses import replace

    files, _ = corpus

    def rows(cfg):
        return {
            tuple(r) for r in exact_clusters(files, cfg)
            .select("repo", "path", "commit", "size", "checksum",
                    "cluster_id", "cluster_size", "rank", "is_original")
            .collect()
        }

    variants = [
        EngineConfig(sig=SignatureConfig(prefix_len=64)),
        EngineConfig(sig=SignatureConfig(prefix_len=64), byte_confirm=True),
        EngineConfig(sig=SignatureConfig(prefix_len=7), match_with_extension=True),
        EngineConfig(sig=SignatureConfig(prefix_len=64, clamp_start=2, clamp_end=0.9)),
    ]
    for cfg in variants:
        fused = replace(cfg, sig=replace(cfg.sig, fuse_full_digest=True))
        assert rows(cfg) == rows(fused), f"fused output diverges for {cfg}"
