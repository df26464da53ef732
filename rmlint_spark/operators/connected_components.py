"""Iterative connected components over a candidate-pair edge list.

The distributed generalization of the reference's union-by-digest
sift (rm_shred_sift, lib/shredder.c:979-1045) and treemerge's upward
clustering (rm_tm_cluster_up, lib/treemerge.c:987-1015): resolve
near-dup candidate pairs into clusters.

Algorithm: min-label propagation (a driver loop over DataFrames — no
GraphX, which is RDD/Scala-only). Each iteration is ONE aggregation:

    labels <- union(neighbor messages, self labels)
              .groupBy(node).min(label)

converging to the minimum fid per component. Deterministic under any
partitioning (min is commutative; labels are content-independent).

Scale notes:
- one shuffle per iteration (join + union feeds a single hash agg
  with map-side partial min);
- `localCheckpoint` per iteration truncates lineage so plan size
  stays O(1) in iterations (the Spark analog of rmlint's
  generation-at-a-time pipelining, lib/shredder.c:86-116);
- convergence detection is a fingerprint aggregate (count +
  sum(xxhash64(label))) computed in the SAME action that
  materializes the checkpoint — labels only decrease, so an
  unchanged fingerprint means a fixpoint (no extra join);
- near-dup clusters are dense (similarity is near-transitive), so
  few iterations; `max_iter` caps adversarial chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "fid_a",
    dst: str = "fid_b",
    max_iter: int = 25,
    on_nonconverged: str = "raise",
    jump_after: int = 8,
) -> DataFrame:
    """Return (fid, component) — component = min fid in the component.

    ``edges``: distinct undirected pairs (either orientation).

    Plain min-propagation advances one hop per iteration — ideal for
    the dense components near-dup graphs produce (2-4 rounds), but a
    path-shaped component needs O(diameter) rounds. After
    ``jump_after`` rounds without convergence, each subsequent round
    adds a POINTER-JUMPING step (label <- label-of-label, one extra
    self-join) so remaining distance halves per round: long chains
    finish in O(log diameter) extra rounds instead of O(diameter).
    Dense graphs never pay for the extra join.

    If the loop still exhausts without the fingerprint stabilizing we
    refuse to return silently: ``on_nonconverged`` = "raise" (default)
    or "warn"."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("u").alias("fid"))
        .distinct()
        .withColumn("component", F.col("fid"))
        .localCheckpoint(eager=True)
    )

    def fingerprint(df: DataFrame):
        # decimal(38,0) sum: exact and overflow-free under ANSI mode
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("component").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    fp = fingerprint(labels)
    converged = False
    for it in range(max_iter):
        msgs = sym.join(labels.withColumnRenamed("fid", "u"), "u").select(
            F.col("v").alias("fid"), "component"
        )
        # lazy checkpoint: the fingerprint action below materializes it,
        # so each iteration costs ONE job (plus its shuffles).
        new_labels = (
            msgs.union(labels)
            .groupBy("fid")
            .agg(F.min("component").alias("component"))
        )
        if it >= jump_after:
            # pointer jumping: component <- label(component). Every
            # component value is itself a node fid, so the self-join
            # resolves one more indirection level per round.
            parents = new_labels.select(
                F.col("fid").alias("component"), F.col("component").alias("_parent")
            )
            new_labels = new_labels.join(parents, "component", "left").select(
                "fid", F.coalesce("_parent", "component").alias("component")
            )
        new_labels = new_labels.localCheckpoint(eager=False)
        new_fp = fingerprint(new_labels)
        labels = new_labels
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    if not converged:
        msg = (
            f"connected_components did not converge within max_iter={max_iter} "
            "(component diameter exceeds the iteration cap); labels would be wrong"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels
