"""Round-2 option surface: clamp, digest selection, hidden policy,
newness qualification, rank criteria, stdin source, _equal sink.

Reference test models: tests/test_options/ (mtime, rankby, clamp) and
tests/utils.py:26-47 (algorithm sweep).
"""

from __future__ import annotations

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from rmlint_spark.config import EngineConfig, SignatureConfig
from rmlint_spark.operators.exact import DIGEST_ALGOS, exact_clusters
from rmlint_spark.operators.lint import hidden_policy
from rmlint_spark.operators.rank import criteria_columns, parse_criteria, tag_originals
from rmlint_spark.operators.split import needs_new_qualify, report_new_only

CFG = EngineConfig(sig=SignatureConfig(prefix_len=64))


def files_df(spark, rows):
    return spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])


# ---------------------------------------------------------------- clamp

def test_clamp_start_ignores_leading_bytes(spark):
    # identical except the first byte -> only cluster under clamp_start=1
    rows = [
        ("r1", "a.txt", "c1", "t", "Xsame-tail-content"),
        ("r2", "b.txt", "c2", "t", "Ysame-tail-content"),
    ]
    df = files_df(spark, rows)
    assert exact_clusters(df, CFG).count() == 0
    clamped = replace(CFG, sig=replace(CFG.sig, clamp_start=1))
    out = exact_clusters(df, clamped)
    assert out.count() == 2
    # grouping size is the clamped length
    assert out.select("size").distinct().collect()[0]["size"] == len("same-tail-content")


def test_clamp_end_and_factor(spark):
    rows = [
        ("r1", "a.txt", "c1", "t", "shared-head-0000"),
        ("r2", "b.txt", "c2", "t", "shared-head-1111"),
    ]
    df = files_df(spark, rows)
    # absolute end: first 11 chars agree
    by_end = replace(CFG, sig=replace(CFG.sig, clamp_end=11))
    assert exact_clusters(df, by_end).count() == 2
    # factor end: first half (len 16 -> 8 chars) agrees
    by_factor = replace(CFG, sig=replace(CFG.sig, clamp_end=0.5))
    assert exact_clusters(df, by_factor).count() == 2


def test_clamp_empty_slice_skips_file(spark):
    # rm_file_new returns NULL when the clamped slice is empty
    # (lib/file.c:44-56,76-85): files shorter than clamp_start must be
    # SKIPPED, not clustered together as duplicates of ''
    rows = [
        ("r1", "a.txt", "c1", "t", "abc"),           # len 3 < clamp_start
        ("r2", "b.txt", "c2", "t", "xyz"),           # len 3 < clamp_start
        ("r3", "c.txt", "c3", "t", "0123456789tail"),
        ("r4", "d.txt", "c4", "t", "abcdefghijtail"),
    ]
    df = files_df(spark, rows)
    clamped = replace(CFG, sig=replace(CFG.sig, clamp_start=10))
    out = exact_clusters(df, clamped).collect()
    # the two long files share the clamped tail; the two short files
    # must NOT appear as a spurious empty-slice cluster
    assert len(out) == 2
    assert {r["path"] for r in out} == {"c.txt", "d.txt"}


def test_preference_orders_first_without_p_criterion(spark):
    # rm_pp_cmp_orig_criteria orders preferred files first BEFORE
    # evaluating any -S criteria (lib/preprocess.c:435-455): criteria
    # 'a' without 'p' must still pick the preferred row as original
    from pyspark.sql import functions as F

    rows = [
        ("r1", "zzz.txt", "c1", "t", "same-content"),
        ("r2", "aaa.txt", "c2", "t", "same-content"),
    ]
    df = files_df(spark, rows).withColumn("is_preferred", F.col("repo") == "r1")
    cfg = replace(CFG, rank_criteria="a")
    out = {r["path"]: r["is_original"] for r in exact_clusters(df, cfg).collect()}
    assert out == {"zzz.txt": True, "aaa.txt": False}


# ---------------------------------------------------------------- digests

def test_digest_algorithms_cluster_identically(spark):
    rows = [
        ("r1", "a.txt", "c1", "t", "same content"),
        ("r2", "b.txt", "c2", "t", "same content"),
        ("r3", "c.txt", "c3", "t", "other content"),
    ]
    df = files_df(spark, rows)
    for algo in sorted(DIGEST_ALGOS):
        cfg = replace(CFG, sig=replace(CFG.sig, checksum_algo=algo))
        got = exact_clusters(df, cfg)
        assert got.count() == 2, algo
        assert got.select("cluster_id").distinct().count() == 1, algo


def test_unknown_digest_rejected():
    from rmlint_spark.operators.exact import digest

    with pytest.raises(ValueError):
        digest(F.col("content"), "crc99")


def test_blake2b_matches_hashlib(spark):
    # blake2b is the reference DEFAULT digest (lib/config.h.in:29);
    # pin the engine's hex output to CPython's reference implementation
    import hashlib

    from rmlint_spark.operators.exact import digest

    df = spark.createDataFrame([("same content",), ("other",)], ["content"])
    got = {r["content"]: r["d"] for r in
           df.select("content", digest(F.col("content"), "blake2b").alias("d")).collect()}
    for text, hexd in got.items():
        assert hexd == hashlib.blake2b(text.encode()).hexdigest()


# ---------------------------------------------------------------- hidden

def test_partial_hidden_policy(spark):
    rows = [
        ("r1", "src/f.txt", "c1", "t", "visible content"),
        ("r1", ".git/f.txt", "c1", "t", "hidden content"),
    ]
    df = files_df(spark, rows)
    dup_in, tree_in = hidden_policy(df, replace(CFG, partial_hidden=True))
    assert dup_in.count() == 1 and tree_in.count() == 2
    dup_in, tree_in = hidden_policy(df, CFG)  # default: hidden dropped everywhere
    assert dup_in.count() == 1 and tree_in.count() == 1
    dup_in, tree_in = hidden_policy(df, replace(CFG, keep_hidden=True))
    assert dup_in.count() == 2 and tree_in.count() == 2


def test_partial_hidden_dirs_see_hidden_members(spark):
    # two dirs identical only when the hidden member is counted
    from rmlint_spark.operators.treemerge import duplicate_dirs

    rows = [
        ("r1", "d1/a.txt", "c", "t", "AAAA"),
        ("r1", "d1/.h.txt", "c", "t", "HHHH"),
        ("r1", "d2/a.txt", "c", "t", "AAAA"),
        ("r1", "d2/.h.txt", "c", "t", "ZZZZ"),  # differs -> d2 not a twin
        ("r1", "d3/a.txt", "c", "t", "AAAA"),
        ("r1", "d3/.h.txt", "c", "t", "HHHH"),  # d3 == d1
    ]
    df = files_df(spark, rows)
    _, tree_in = hidden_policy(df, replace(CFG, partial_hidden=True))
    dd = duplicate_dirs(tree_in, CFG)
    dirs = {r["dir"] for r in dd.collect()}
    assert dirs == {"d1", "d3"}


# ---------------------------------------------------------------- newness

def _clusters(spark):
    rows = [
        ("r1", "a.txt", "2024", "t", "dup-one"),
        ("r2", "b.txt", "2020", "t", "dup-one"),
        ("r3", "c.txt", "2019", "t", "dup-two"),
        ("r4", "d.txt", "2018", "t", "dup-two"),
    ]
    return exact_clusters(files_df(spark, rows), CFG)


def test_needs_new_keeps_whole_qualifying_group(spark):
    out = needs_new_qualify(_clusters(spark), F.col("commit") >= "2021")
    got = sorted(r["path"] for r in out.collect())
    assert got == ["a.txt", "b.txt"]  # the old twin stays in the group


def test_report_new_only_outputs_new_rows(spark):
    out = report_new_only(_clusters(spark), F.col("commit") >= "2021")
    got = [(r["path"], r["is_original"]) for r in out.collect()]
    # only the new row is reported; the original was ranked on the full
    # group (oldest commit 2020 = original -> the new 2024 row is a dupe)
    assert got == [("a.txt", False)]


# ---------------------------------------------------------------- criteria

def test_parse_criteria_patterns():
    assert parse_criteria("pOma") == [("p", None), ("O", None), ("m", None), ("a", None)]
    assert parse_criteria("r<\\.bak$>a") == [("r", "\\.bak$"), ("a", None)]
    with pytest.raises(ValueError):
        parse_criteria("z")
    with pytest.raises(ValueError):
        parse_criteria("r")  # missing <pattern>
    with pytest.raises(ValueError):
        parse_criteria("x<oops")  # unterminated


def test_regex_criterion_ranks_matches_first(spark):
    rows = [
        ("r1", "keep/x.txt", "c1", "X", 2),
        ("r2", "other/x.txt", "c2", "X", 2),
    ]
    df = spark.createDataFrame(rows, ["repo", "path", "commit", "cluster_id", "cluster_size"])
    out = tag_originals(df, "r<^keep/>")
    got = {r["path"]: r["rank"] for r in out.collect()}
    assert got == {"keep/x.txt": 1, "other/x.txt": 2}
    # uppercase reverses
    out2 = tag_originals(df, "R<^keep/>")
    got2 = {r["path"]: r["rank"] for r in out2.collect()}
    assert got2 == {"keep/x.txt": 2, "other/x.txt": 1}


def test_basename_criterion_case_insensitive(spark):
    rows = [
        ("r1", "d/ALPHA.txt", "c1", "X", 2),
        ("r2", "d/beta.txt", "c2", "X", 2),
    ]
    df = spark.createDataFrame(rows, ["repo", "path", "commit", "cluster_id", "cluster_size"])
    got = {r["path"]: r["rank"] for r in tag_originals(df, "a").collect()}
    # case-insensitive: ALPHA < beta (byte-order would put it after)
    assert got == {"d/ALPHA.txt": 1, "d/beta.txt": 2}


def test_default_criteria_is_reference_default():
    # lib/cfg.c:65
    from rmlint_spark.operators.rank import DEFAULT_CRITERIA

    assert DEFAULT_CRITERIA == "pOma"
    # + unconditional preferred-first key + (repo, path, commit) tiebreak
    assert len(criteria_columns("pOmalhd")) == 7 + 1 + 3


# ---------------------------------------------------------------- sources/sinks

def test_paths_source_scopes_run(spark):
    from rmlint_spark.sources.tables import paths_source, scope_to_paths

    rows = [
        ("r1", "a.txt", "c1", "t", "dup"),
        ("r2", "b.txt", "c2", "t", "dup"),
        ("r3", "c.txt", "c3", "t", "dup"),
    ]
    df = files_df(spark, rows)
    wanted = paths_source(spark, [("r1", "a.txt", "c1"), ("r3", "c.txt", "c3")])
    scoped = scope_to_paths(df, wanted)
    assert {r["repo"] for r in scoped.collect()} == {"r1", "r3"}


def test_equal_check(spark):
    from rmlint_spark.sources.sinks import equal_check

    same = files_df(spark, [("r1", "a", "c", "t", "X"), ("r2", "b", "c", "t", "X")])
    diff = files_df(spark, [("r1", "a", "c", "t", "X"), ("r2", "b", "c", "t", "Y")])
    single = files_df(spark, [("r1", "a", "c", "t", "X")])
    assert equal_check(same) is True
    assert equal_check(diff) is False
    assert equal_check(single) is False


def test_gap_sessions_timezone_invariant(spark):
    # round-1 driver-red regression: the sessionization query must be
    # identical under ANY spark.sql.session.timeZone (events.ts is
    # TIMESTAMP_NTZ; the gap is interval arithmetic, never an NTZ->LTZ
    # cast)
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = sorted(tuple(r) for r in E.queries()["gap_sessions"](spark, sf).collect())
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        est = sorted(tuple(r) for r in E.queries()["gap_sessions"](spark, sf).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc == est and len(utc) > 0


def test_murmur_matches_canonical_vectors(spark):
    # MurmurHash3 x64 128 (reference 'murmur' checksum type,
    # lib/checksum.c:815-851): pinned to the canonical smhasher output
    from rmlint_spark.functions.murmur import murmur3_x64_128
    from rmlint_spark.operators.exact import digest

    assert murmur3_x64_128(b"").hex() == "00000000000000000000000000000000"
    assert (
        murmur3_x64_128(b"The quick brown fox jumps over the lazy dog").hex()
        == "6c1b07bc7bbc4be347939ac4a93c437a"
    )
    assert murmur3_x64_128(b"a").hex() == "897859f6655555855a890e51483ab5e6"
    df = spark.createDataFrame([("hello",)], "content string")
    (row,) = df.select(digest(F.col("content"), "murmur").alias("d")).collect()
    assert row["d"] == murmur3_x64_128(b"hello").hex()


# ------------------------------------------- R6 matching criteria -b/-e/-i

def test_match_with_extension_splits_groups(spark):
    """-e/--match-with-extension (rm_file_cmp_with_extension,
    lib/preprocess.c:37-46; reference test
    tests/test_options/test_match_with_extension.py): same-content
    files only group when the (case-insensitive) extension agrees."""
    rows = [
        ("r1", "src/a.c", "c1", "t", "SAME CONTENT"),
        ("r1", "src/b.C", "c1", "t", "SAME CONTENT"),   # case-insensitive twin
        ("r1", "inc/c.h", "c1", "t", "SAME CONTENT"),
        ("r1", "inc/d.h", "c1", "t", "SAME CONTENT"),
        ("r1", "doc/e.md", "c1", "t", "SAME CONTENT"),  # lone extension: drops
    ]
    df = files_df(spark, rows)
    # default: one cluster of all five
    base = exact_clusters(df, CFG)
    assert base.count() == 5
    assert base.select("cluster_id").distinct().count() == 1
    cfg = replace(CFG, match_with_extension=True)
    out = exact_clusters(df, cfg).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["path"])
    assert sorted(by_cluster.values(), key=len) == [
        {"src/a.c", "src/b.C"},
        {"inc/c.h", "inc/d.h"},
    ] or sorted(
        [v for v in by_cluster.values()], key=sorted
    ) == sorted(
        [{"src/a.c", "src/b.C"}, {"inc/c.h", "inc/d.h"}], key=sorted
    )


def test_match_with_extension_no_ext_rules(spark):
    """A file WITH an extension never matches one without; two
    no-extension files DO match (the NULL/NULL branch returns 0)."""
    rows = [
        ("r1", "a/Makefile", "c1", "t", "SAME CONTENT"),
        ("r1", "b/Makefile.bak", "c1", "t", "SAME CONTENT"),
        ("r1", "c/rules", "c1", "t", "SAME CONTENT"),
    ]
    cfg = replace(CFG, match_with_extension=True)
    out = exact_clusters(files_df(spark, rows), cfg).collect()
    got = {r["path"] for r in out}
    assert got == {"a/Makefile", "c/rules"}  # the .bak file has no twin


def test_match_without_extension_stem_semantics(spark):
    """-i/--match-without-extension (rm_file_cmp_without_extension,
    lib/preprocess.c:48-62): same stem, any extension -> twins; the
    compare covers the basename up to AND INCLUDING the last dot, so
    'foo' never matches 'foo.c'."""
    rows = [
        ("r1", "v1/report.pdf", "c1", "t", "SAME CONTENT"),
        ("r1", "v2/Report.docx", "c1", "t", "SAME CONTENT"),  # case-insensitive
        ("r1", "v3/summary.pdf", "c1", "t", "SAME CONTENT"),  # other stem: drops
        ("r1", "v4/foo", "c1", "t", "OTHER BYTES"),
        ("r1", "v5/foo.c", "c1", "t", "OTHER BYTES"),         # 'foo' != 'foo.'
    ]
    cfg = replace(CFG, match_without_extension=True)
    out = exact_clusters(files_df(spark, rows), cfg).collect()
    got = {r["path"] for r in out}
    assert got == {"v1/report.pdf", "v2/Report.docx"}


def test_match_basename_gen0(spark):
    """-b/--match-basename as a gen-0 key (rm_file_basenames_cmp):
    same content only groups under an agreeing basename."""
    rows = [
        ("r1", "x/conf.ini", "c1", "t", "SAME CONTENT"),
        ("r1", "y/conf.ini", "c1", "t", "SAME CONTENT"),
        ("r1", "z/other.ini", "c1", "t", "SAME CONTENT"),
    ]
    cfg = replace(CFG, match_basename=True)
    out = exact_clusters(files_df(spark, rows), cfg).collect()
    assert {r["path"] for r in out} == {"x/conf.ini", "y/conf.ini"}


def test_match_keys_absent_from_output_schema(spark):
    rows = [
        ("r1", "a/x.c", "c1", "t", "SAME"),
        ("r1", "b/y.c", "c1", "t", "SAME"),
    ]
    cfg = replace(CFG, match_with_extension=True, match_without_extension=True)
    out = exact_clusters(files_df(spark, rows), cfg)
    assert not [c for c in out.columns if c.startswith("_mk_")]
