"""Duplicate-directory detection — the treemerge analog.

Reference: lib/treemerge.c — rmlint's ``-D`` mode. Semantics taken
over:

- a directory's identity is the **multiset of its files' content
  digests**, computed order-independently: XOR-fold of member digests
  (RM_DIGEST_CUMULATIVE, lib/checksum.c:283-375, used at
  lib/treemerge.c:446-450) — cheap but collision-prone, so candidate
  equality is **re-verified against the sorted digest multiset**
  (digest-set comparison, lib/treemerge.c:399-424). We keep the same
  two-tier check: ``bit_xor`` group key + sorted-multiset sha confirm.
- every file counts toward every ancestor directory (the trie count
  rollup, lib/treemerge.c:136-187) — here a path-prefix explode.
- optional layout sensitivity (``--honour-dir-layout``,
  lib/treemerge.c:452-464): member contribution hashes include the
  path relative to the rolled-up ancestor.

Scale notes: the explode multiplies rows by path depth (shallow, ~3-6
for code repos); aggregation is a single hash shuffle on
(repo, ancestor). ``sort_array(collect_list(...))`` bounds memory by
directory width — giant directories are capped upstream by the skew
guard discipline; the XOR key means the wide agg can also be done in
two phases if a deployment needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rmlint_spark.config import DEFAULT, EngineConfig
from rmlint_spark.operators.rank import tag_originals


def file_digests(files: DataFrame) -> DataFrame:
    """(repo, path, sha): one full-content digest per file.

    treemerge needs digests for ALL files (a dir is only duplicate if
    every member matches), unlike the funnel which prunes singletons.
    The digest is computed map-side; path-double removal deduplicates
    the narrow (key, sha) projection so content never shuffles."""
    return (
        files.select("repo", "path", "commit", F.sha2("content", 256).alias("sha"))
        .dropDuplicates(["repo", "path", "commit"])
        .select("repo", "path", "sha")
    )


def ancestor_rollup(
    digests: DataFrame, layout_sensitive: bool = False, salt_buckets: int = 0
) -> DataFrame:
    """Explode each file onto every ancestor directory and aggregate:

    (repo, dir, n_files, xor_sig, set_sig)

    xor_sig: A5 commutative XOR fold (fast group key).
    set_sig: A6 exact confirm — sha256 of the sorted digest multiset
    (with relative paths when layout_sensitive).
    salt_buckets > 0 switches to the two-phase salted aggregation
    (cfg.salt_buckets) — bounded per-task state for giant directories.
    """
    parts = F.split("path", "/")
    exploded = digests.select(
        "repo",
        "sha",
        parts.alias("parts"),
        F.explode(F.sequence(F.lit(0), F.size(parts) - 1)).alias("i"),
    ).select(
        "repo",
        "sha",
        F.when(F.col("i") == 0, F.lit("")).otherwise(
            F.concat_ws("/", F.slice("parts", F.lit(1), F.col("i")))
        ).alias("dir"),
        # path relative to the ancestor dir
        F.concat_ws(
            "/", F.slice("parts", F.col("i") + 1, F.size("parts") - F.col("i"))
        ).alias("relpath"),
    )
    member = (
        F.concat_ws("\x01", "sha", "relpath") if layout_sensitive else F.col("sha")
    )
    tagged = exploded.withColumn("member", member)
    if salt_buckets:
        # two-phase salted aggregation for million-file directories:
        # phase 1 groups (repo, dir, salt) — no single task ever holds
        # more than ~1/salt_buckets of a directory's members — and
        # digests each salt bucket's sorted slice; phase 2 folds the
        # (salt, partial) pairs in salt order. The digest VALUE differs
        # from the unsalted form, but it is equally deterministic and
        # order-insensitive, so duplicate detection (equality of sigs)
        # is unchanged. Salt derives from the member hash: uniform by
        # construction (north-rule giant-repo skew defense).
        salt = F.pmod(F.abs(F.xxhash64("member")), F.lit(salt_buckets))
        partial = (
            tagged.withColumn("salt", salt)
            .groupBy("repo", "dir", "salt")
            .agg(
                F.count("*").alias("n_part"),
                F.expr("bit_xor(xxhash64(member))").alias("xor_part"),
                F.sha2(
                    F.concat_ws("\x02", F.sort_array(F.collect_list("member"))), 256
                ).alias("sig_part"),
            )
        )
        return (
            partial.groupBy("repo", "dir")
            .agg(
                F.sum("n_part").alias("n_files"),
                F.expr("bit_xor(xor_part)").alias("xor_sig"),
                F.sha2(
                    F.concat_ws(
                        "\x02",
                        F.expr("transform(array_sort(collect_list(struct(salt, sig_part))), s -> s.sig_part)"),
                    ),
                    256,
                ).alias("set_sig"),
            )
        )
    return (
        tagged.groupBy("repo", "dir")
        .agg(
            F.count("*").alias("n_files"),
            F.expr("bit_xor(xxhash64(member))").alias("xor_sig"),
            F.sha2(F.concat_ws("\x02", F.sort_array(F.collect_list("member"))), 256).alias("set_sig"),
        )
    )


def duplicate_dirs(
    files: DataFrame,
    cfg: EngineConfig = DEFAULT,
    layout_sensitive: bool = False,
    salted: bool = False,
) -> DataFrame:
    """J5: directories whose full contents match across locations.

    Output: (repo, dir, n_files, set_sig, cluster_id, cluster_size,
    rank, is_original) — one row per matched directory, >= 2 per
    cluster. The (xor_sig, n_files) pair is the cheap group key; the
    sorted-multiset set_sig is the verifier (both must agree).

    Only MAXIMAL duplicate dirs are reported (reference extract phase,
    rm_tm_extract lib/treemerge.c:840-985): a matched dir whose
    ancestor (same repo) is also matched is pruned — otherwise every
    single-child chain matches itself level-by-level — and clusters
    are re-qualified (>= 2 members) after pruning.
    """
    rollup = ancestor_rollup(
        file_digests(files), layout_sensitive, cfg.salt_buckets if salted else 0
    )
    groups = (
        rollup.groupBy("n_files", "xor_sig", "set_sig")
        .agg(F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
    )
    matched = rollup.join(groups, ["n_files", "xor_sig", "set_sig"]).drop("cluster_size")

    # maximality pruning: drop rows with a matched ancestor in the same
    # repo (the matched set is small — this non-equi self-join is cheap)
    m = matched.select("repo", "dir")
    p = m.select(F.col("repo").alias("p_repo"), F.col("dir").alias("p_dir"))
    nested = (
        m.join(
            p,
            (F.col("repo") == F.col("p_repo"))
            & (F.col("dir") != F.col("p_dir"))
            & (
                (F.col("p_dir") == "")
                | F.col("dir").startswith(F.concat(F.col("p_dir"), F.lit("/")))
            ),
        )
        .select("repo", "dir")
        .distinct()
    )
    pruned = matched.join(nested, ["repo", "dir"], "left_anti")

    groups2 = (
        pruned.groupBy("set_sig")
        .agg(F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
    )
    matched = pruned.join(groups2, "set_sig")
    out = matched.withColumn("cluster_id", F.col("set_sig")).select(
        "repo",
        F.col("dir").alias("path"),  # rank criteria operate on `path`
        F.lit("").alias("commit"),
        "n_files",
        "set_sig",
        "cluster_id",
        "cluster_size",
    )
    ranked = tag_originals(out, cfg.rank_criteria)
    return ranked.select(
        "repo", F.col("path").alias("dir"), "n_files", "set_sig",
        "cluster_id", "cluster_size", "rank", "is_original",
    )


def prefix_counts(files: DataFrame) -> DataFrame:
    """A8: plain file-count rollup per ancestor prefix
    (lib/treemerge.c:136-187)."""
    parts = F.split("path", "/")
    # guard: a depth-1 path has no proper prefix — without the filter,
    # sequence(1, 0) yields the DESCENDING [1, 0], emitting a spurious
    # '' prefix and counting the file itself
    exploded = files.filter(F.size(parts) > 1).select(
        "repo",
        parts.alias("parts"),
        F.explode(F.sequence(F.lit(1), F.size(parts) - 1)).alias("i"),
    )
    prefix = F.concat_ws("/", F.slice("parts", F.lit(1), F.col("i")))
    return (
        exploded.select("repo", prefix.alias("prefix"))
        .groupBy("repo", "prefix")
        .agg(F.count("*").alias("n_files"))
    )
