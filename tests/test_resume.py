"""Checkpoint/resume: kill mid-stage, resume, identical output.

Reference analog: replay (lib/replay.c) + xattr cache (lib/xattr.c) —
a second run must skip completed work and produce identical results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rmlint_spark.config import EngineConfig, SignatureConfig
from rmlint_spark.operators.lsh import with_signatures
from rmlint_spark.sources.checkpoint import CheckpointManager

CFG = EngineConfig(sig=SignatureConfig(prefix_len=64))


def test_kill_and_resume_identical(spark, corpus, tmp_path):
    files, _ = corpus
    sigs = with_signatures(files, CFG)

    # cold full run
    cold_mgr = CheckpointManager(str(tmp_path / "cold"), CFG, n_partitions=8)
    cold = cold_mgr.run_stage(spark, sigs, "signatures", "fid")
    cold_rows = {r["fid"]: tuple(r["sig"]) for r in cold.collect()}

    # killed run: only 3 of 8 partitions complete
    mgr = CheckpointManager(str(tmp_path / "kr"), CFG, n_partitions=8)
    with pytest.raises(RuntimeError, match="simulated kill"):
        mgr.run_stage(spark, sigs, "signatures", "fid", max_partitions=3)
    done_before = sum(mgr.is_partition_done("signatures", p) for p in range(8))
    assert done_before == 3

    # resumed run completes only the missing partitions
    mgr2 = CheckpointManager(str(tmp_path / "kr"), CFG, n_partitions=8)
    resumed = mgr2.run_stage(spark, sigs, "signatures", "fid")
    res_rows = {r["fid"]: tuple(r["sig"]) for r in resumed.collect()}
    assert res_rows == cold_rows

    # lineage: manifest shows 8 partition completions total, each with metrics
    manifest = mgr2.manifest("signatures")
    assert len(manifest) == 8
    parts = sorted(m["partition"] for m in manifest)
    assert parts == list(range(8))
    assert all(m["config_hash"] == CFG.config_hash() for m in manifest)
    assert all(m["wall_sec"] > 0 for m in manifest)
    assert sum(m["n_rows"] for m in manifest) == len(cold_rows)


def test_config_change_invalidates(tmp_path, spark, corpus):
    files, _ = corpus
    sigs = with_signatures(files, CFG)
    mgr = CheckpointManager(str(tmp_path / "cfg"), CFG, n_partitions=2)
    mgr.run_stage(spark, sigs, "signatures", "fid")
    other = EngineConfig(sig=SignatureConfig(prefix_len=64, num_perm=64, bands=16))
    mgr_other = CheckpointManager(str(tmp_path / "cfg"), other, n_partitions=2)
    # different config hash -> nothing considered done
    assert not mgr_other.is_partition_done("signatures", 0)


def test_pending_keys_skips_done(spark, corpus, tmp_path):
    files, _ = corpus
    sigs = with_signatures(files, CFG)
    mgr = CheckpointManager(str(tmp_path / "pk"), CFG, n_partitions=4)
    try:
        mgr.run_stage(spark, sigs, "signatures", "fid", max_partitions=2)
    except RuntimeError:
        pass
    pending = mgr.pending_keys(sigs, "signatures", ["fid"])
    total = sigs.count()
    n_pending = pending.count()
    assert 0 < n_pending < total


def test_cc_mid_iteration_kill_and_resume(spark, tmp_path):
    """Durable CC iterations (the SCALE.md localCheckpoint->durable
    swap): kill the label-propagation loop mid-iteration, resume from
    the last durable iteration, produce identical components."""
    from rmlint_spark.operators.connected_components import connected_components

    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(30)], ["fid_a", "fid_b"]
    )
    baseline = sorted(map(tuple, connected_components(edges).collect()))

    ckpt = str(tmp_path / "cc_state")
    stats1: dict = {}
    with pytest.raises(RuntimeError, match="simulated kill"):
        connected_components(
            edges, checkpoint_dir=ckpt, checkpoint_every=2,
            _kill_after=6, stats=stats1,
        )
    assert stats1["iters_run"] == 6

    stats2: dict = {}
    out = connected_components(edges, checkpoint_dir=ckpt, checkpoint_every=2, stats=stats2)
    # resumed from the last durable iteration, not from scratch
    assert stats2["start_iter"] == 6
    assert sorted(map(tuple, out.collect())) == baseline


def test_cc_resume_of_converged_checkpoint(spark, tmp_path):
    """A checkpoint whose state already converged must short-circuit on
    resume — even when the resume would land at start_iter == max_iter
    (round-3 advice: that case used to raise 'did not converge')."""
    from rmlint_spark.operators.connected_components import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["fid_a", "fid_b"]
    )
    ckpt = str(tmp_path / "cc_done")
    stats1: dict = {}
    base = sorted(
        map(tuple, connected_components(edges, checkpoint_dir=ckpt, stats=stats1).collect())
    )
    import os

    assert os.path.exists(os.path.join(ckpt, "DONE"))
    # resume with max_iter equal to the iterations already done: the
    # loop body would never run — the DONE short-circuit must return
    done_iter = stats1["start_iter"] + stats1["iters_run"] - 1
    stats2: dict = {}
    out = connected_components(
        edges, checkpoint_dir=ckpt, max_iter=done_iter + 1, stats=stats2
    )
    assert stats2["iters_run"] == 0
    assert sorted(map(tuple, out.collect())) == base


def test_cc_checkpoint_refuses_different_edges(spark, tmp_path):
    """Checkpointed labels are only valid for the edge relation they
    came from: resuming against a grown edge list would silently omit
    the new nodes, so it must refuse instead."""
    import pytest as _pytest

    from rmlint_spark.operators.connected_components import connected_components

    edges1 = spark.createDataFrame([("a", "b")], ["fid_a", "fid_b"])
    edges2 = spark.createDataFrame([("a", "b"), ("c", "d")], ["fid_a", "fid_b"])
    ckpt = str(tmp_path / "cc_fp")
    connected_components(edges1, checkpoint_dir=ckpt)
    with _pytest.raises(ValueError, match="different edge relation"):
        connected_components(edges2, checkpoint_dir=ckpt)
