"""Cluster splitting + tagged constraints (W3/W4/J7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rmlint_spark.operators.split import (
    basename_split,
    gap_split,
    keep_all_tagged,
    must_match_tagged,
)


def clusters(spark):
    rows = [
        # cluster A: 4 members, ts gaps 0, 10, 1000, 1010
        ("r1", "a/f.py", "c1", 100, "X", "X", 4, 1, True, 0.0),
        ("r2", "b/f.py", "c2", 100, "X", "X", 4, 2, False, 10.0),
        ("r3", "c/g.py", "c3", 100, "X", "X", 4, 3, False, 1000.0),
        ("r4", "d/g.py", "c4", 100, "X", "X", 4, 4, False, 1010.0),
        # cluster B: 2 members close together
        ("r1", "e/h.py", "c5", 50, "Y", "Y", 2, 1, True, 5.0),
        ("r5", "f/h.py", "c6", 50, "Y", "Y", 2, 2, False, 6.0),
    ]
    cols = ["repo", "path", "commit", "size", "checksum", "cluster_id",
            "cluster_size", "rank", "is_original", "ts"]
    return spark.createDataFrame(rows, cols)


def test_gap_split_islands(spark):
    out = gap_split(clusters(spark), F.col("ts"), window_seconds=100)
    got = {}
    for r in out.collect():
        got.setdefault(r["cluster_id"], []).append(r["repo"])
    # cluster A splits into two islands of 2; cluster B survives whole
    assert len(got) == 3
    sizes = sorted(len(v) for v in got.values())
    assert sizes == [2, 2, 2]
    # one original per island
    orig = (
        out.groupBy("cluster_id")
        .agg(F.sum(F.col("is_original").cast("int")).alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in orig)


def test_gap_split_drops_singletons(spark):
    # huge window -> no split; tiny window -> all islands singleton -> dropped
    out_all = gap_split(clusters(spark), F.col("ts"), window_seconds=1e9)
    assert out_all.count() == 6
    out_none = gap_split(clusters(spark), F.col("ts"), window_seconds=0.5)
    assert out_none.count() == 0


def test_basename_split(spark):
    out = basename_split(clusters(spark))
    got = {}
    for r in out.collect():
        got.setdefault(r["cluster_id"], []).append(r["path"])
    # cluster A splits into f.py-pair and g.py-pair; B stays (h.py both)
    assert len(got) == 3
    assert all(len(v) == 2 for v in got.values())


def test_must_match_tagged(spark):
    pref = F.col("repo") == "r3"  # only cluster A has r3
    out = must_match_tagged(clusters(spark), pref)
    assert {r["cluster_id"] for r in out.collect()} == {"X"}


def test_keep_all_tagged(spark):
    pref = F.col("repo").isin("r2", "r5")
    out = keep_all_tagged(clusters(spark), pref)
    origs = {r["repo"] for r in out.filter("is_original").collect()}
    assert origs == {"r1", "r2", "r5"}  # rank-1s plus forced tagged


def test_keep_hardlinked_end_to_end(spark):
    # W5 --keep-hardlinked (lib/shredder.c:1427-1455): the planted
    # scenario the round-2 audit asked for — two exact-dup families
    # where one dupe shares storage (same repo+inode) with an original.
    # Unlinking that dupe reclaims nothing, so it must be re-tagged
    # original; the genuinely removable dupes must stay dupes.
    from rmlint_spark.operators.exact import exact_clusters
    from rmlint_spark.operators.split import keep_hardlinked

    rows = [
        # family AAA: o1 is the ranked original (lowest commit); d1 is
        # a hardlink of o1 (same repo+inode); d2 is a real copy
        ("r1", "a/orig.txt", "c1", "t", "AAA-content", 11),
        ("r1", "a/hardlink.txt", "c2", "t", "AAA-content", 11),
        ("r1", "a/copy.txt", "c3", "t", "AAA-content", 12),
        # family BBB: no hardlinks — behavior unchanged
        ("r2", "b/orig.txt", "c4", "t", "BBB-content", 21),
        ("r2", "b/copy.txt", "c5", "t", "BBB-content", 22),
    ]
    files = spark.createDataFrame(
        rows, ["repo", "path", "commit", "lang", "content", "inode"]
    )
    plain = exact_clusters(files)
    kept = keep_hardlinked(plain)
    origs = {r["path"] for r in kept.filter("is_original").collect()}
    assert origs == {"a/orig.txt", "a/hardlink.txt", "b/orig.txt"}
    # the representative-bundling subsumption claim is NOT exact for
    # the funnel path: without keep_hardlinked the hardlink ranks as a
    # removable dupe (this is the planted evidence W5 lacked)
    plain_origs = {r["path"] for r in plain.filter("is_original").collect()}
    assert plain_origs == {"a/orig.txt", "b/orig.txt"}


def test_keep_hardlinked_null_inodes_left_untouched(spark):
    # inode is an OPTIONAL extras column; Spark windows group NULL keys
    # together, so without the isNotNull gate a null-inode original
    # would re-tag every null-inode dupe in its (cluster, repo) as an
    # original (round-3 advice finding). Null inode = storage identity
    # unknown = no hardlink inference.
    from rmlint_spark.operators.exact import exact_clusters
    from rmlint_spark.operators.split import keep_hardlinked

    rows = [
        ("r1", "a/orig.txt", "c1", "t", "AAA-content", None),
        ("r1", "a/copy1.txt", "c2", "t", "AAA-content", None),
        ("r1", "a/copy2.txt", "c3", "t", "AAA-content", None),
        # a REAL hardlink family in the same frame still re-tags
        ("r2", "b/orig.txt", "c4", "t", "BBB-content", 7),
        ("r2", "b/hardlink.txt", "c5", "t", "BBB-content", 7),
    ]
    files = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
        "content string, inode long"
    )
    kept = keep_hardlinked(exact_clusters(files))
    origs = {r["path"] for r in kept.filter("is_original").collect()}
    assert origs == {"a/orig.txt", "b/orig.txt", "b/hardlink.txt"}
