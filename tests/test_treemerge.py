"""Duplicate-directory rollup (treemerge analog) tests.

Mirrors reference tests/test_options/test_merge_directories.py
scenarios: identical subtree -> match; one-file-differs -> no match;
layout-(in)sensitivity; only MAXIMAL dup dirs reported (extract
phase, lib/treemerge.c:840-985).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rmlint_spark.operators.treemerge import duplicate_dirs, prefix_counts


def make_files(spark, rows):
    return spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])


BASE = [
    # per-repo distinguishing file so repo roots never match
    ("r1", "readme.md", "c1", "markdown", "R1"),
    ("r2", "readme.md", "c2", "markdown", "R2"),
    ("r3", "readme.md", "c3", "markdown", "R3"),
    ("r4", "readme.md", "c4", "markdown", "R4"),
    # identical subtree vendored into two repos
    ("r1", "vendor/lib/a.py", "c1", "python", "AAA"),
    ("r1", "vendor/lib/b.py", "c1", "python", "BBB"),
    ("r2", "vendor/lib/a.py", "c2", "python", "AAA"),
    ("r2", "vendor/lib/b.py", "c2", "python", "BBB"),
    # same contents, different layout (renamed file) in r3
    ("r3", "vendor/lib/renamed.py", "c3", "python", "AAA"),
    ("r3", "vendor/lib/b.py", "c3", "python", "BBB"),
    # one file differs in r4 -> must NOT match
    ("r4", "vendor/lib/a.py", "c4", "python", "AAA"),
    ("r4", "vendor/lib/b.py", "c4", "python", "DIFFERENT"),
]


def test_identical_subtrees_cluster(spark):
    files = make_files(spark, BASE)
    dd = duplicate_dirs(files)
    rows = {(r["repo"], r["dir"]): r["cluster_id"] for r in dd.collect()}
    # maximal matched dir is 'vendor' (vendor == vendor/lib multiset,
    # child pruned as non-maximal)
    assert rows[("r1", "vendor")] == rows[("r2", "vendor")]
    # layout-insensitive default: renamed-file repo matches too
    assert rows.get(("r3", "vendor")) == rows[("r1", "vendor")]
    # children of matched dirs are pruned (maximality)
    assert ("r1", "vendor/lib") not in rows
    # one-file-differs never matches (its nested self-chain is pruned
    # and re-qualification kills the singleton cluster)
    assert not any(repo == "r4" for repo, _ in rows)


def test_layout_sensitive_excludes_renames(spark):
    files = make_files(spark, BASE)
    dd = duplicate_dirs(files, layout_sensitive=True)
    rows = {(r["repo"], r["dir"]): r["cluster_id"] for r in dd.collect()}
    assert rows[("r1", "vendor")] == rows[("r2", "vendor")]
    assert not any(repo == "r3" for repo, _ in rows)  # rename breaks layout match


def test_vendored_corpus_subtrees(corpus):
    """Every planted vendored subtree is matched across its two repos —
    either as the tree dir itself or as a matched ancestor (maximality
    may promote the match to 'vendor' or the repo root)."""
    files, truth = corpus
    vend_rows = (
        truth.filter(F.col("scenario") == "vendored")
        .select("repo", "path")
        .collect()
    )
    trees = {}
    for r in vend_rows:
        tree = r["path"].split("/")[1]
        trees.setdefault(tree, set()).add(r["repo"])
    dd = duplicate_dirs(files)
    clusters = {}
    for r in dd.collect():
        clusters.setdefault(r["cluster_id"], []).append((r["repo"], r["dir"]))
    found = 0
    for tree, repos in trees.items():
        tree_dir = f"vendor/{tree}"
        ok = any(
            sum(
                1
                for repo, d in members
                if repo in repos and (tree_dir == d or tree_dir.startswith(d + "/") or d == "")
            )
            >= 2
            for members in clusters.values()
        )
        found += ok
    assert found >= len(trees) * 0.99, f"{found}/{len(trees)} vendored trees matched"


def test_prefix_counts(spark):
    files = make_files(spark, BASE)
    pc = {(r["repo"], r["prefix"]): r["n_files"] for r in prefix_counts(files).collect()}
    assert pc[("r1", "vendor")] == 2
    assert pc[("r1", "vendor/lib")] == 2


def test_one_original_per_dir_cluster(spark):
    files = make_files(spark, BASE)
    dd = duplicate_dirs(files)
    bad = (
        dd.groupBy("cluster_id")
        .agg(F.sum(F.col("is_original").cast("int")).alias("n"))
        .filter(F.col("n") != 1)
        .count()
    )
    assert bad == 0


def test_salted_rollup_same_duplicate_dirs(spark, corpus):
    # two-phase salted aggregation (cfg.salt_buckets) must find the
    # SAME duplicate-directory clusters as the single-phase rollup —
    # digests differ in value, not in equality structure
    from rmlint_spark.config import EngineConfig
    from rmlint_spark.operators.treemerge import duplicate_dirs

    files, _ = corpus
    cfg = EngineConfig()
    plain = duplicate_dirs(files, cfg)
    salted = duplicate_dirs(files, cfg, salted=True)
    key = lambda df: sorted((r["repo"], r["dir"], r["n_files"]) for r in df.collect())
    assert key(plain) == key(salted)
    # every row still clustered (>= 2 members per sig)
    assert salted.filter("cluster_size < 2").count() == 0
