"""Per-partition checkpointing with lineage + metrics (resume layer).

Reference analog: the replay cache (S4, lib/replay.c:777-860 — a prior
run's JSON re-ingested as input) and xattr checksum cache (S5/R4,
lib/xattr.c:245-283 — skip hashing when a cached digest exists). Ours
generalizes both: every expensive stage materializes to parquet in
deterministic hash partitions, each with a manifest line (rows, wall
seconds, config hash, written_at), and a resumed run recomputes ONLY
the partitions that never finished.

Why a driver loop of per-partition jobs instead of one big write:
Spark's output commit is all-or-nothing per job, so a single killed
write leaves nothing readable. Writing each hash partition as its own
job (dir with _SUCCESS) makes completed partitions durable — that is
the "resume mid-stage" semantics the north rule pins. Partition count
is small (default 16) so driver overhead is negligible, and each
sub-job is fully distributed.

Config invalidation: the checkpoint tree is rooted at
``root/<config_hash>/``, so a changed signature config never reuses
stale signatures (reference precedent: replay re-validates against
live stat, lib/replay.c:777-860).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rmlint_spark.config import DEFAULT, EngineConfig


@dataclass
class StageMetrics:
    stage: str
    partition: int
    n_rows: int
    wall_sec: float
    config_hash: str
    written_at: float


class CheckpointManager:
    def __init__(self, root: str, cfg: EngineConfig = DEFAULT, n_partitions: int = 16):
        self.cfg = cfg
        self.n_partitions = n_partitions
        self.root = os.path.join(root, cfg.config_hash())
        os.makedirs(self.root, exist_ok=True)

    # -- layout -----------------------------------------------------
    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def part_dir(self, stage: str, p: int) -> str:
        return os.path.join(self.stage_dir(stage), f"part={p}")

    def manifest_path(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "manifest.jsonl")

    def is_partition_done(self, stage: str, p: int) -> bool:
        return os.path.exists(os.path.join(self.part_dir(stage, p), "_SUCCESS"))

    def _append_manifest(self, m: StageMetrics) -> None:
        with open(self.manifest_path(m.stage), "a") as f:
            f.write(json.dumps(m.__dict__) + "\n")

    def manifest(self, stage: str) -> list[dict]:
        path = self.manifest_path(stage)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- core -------------------------------------------------------
    def run_stage(
        self,
        spark: SparkSession,
        df: DataFrame,
        stage: str,
        partition_key: str,
        max_partitions: int | None = None,
    ) -> DataFrame:
        """Materialize ``df`` into n_partitions hash partitions on
        ``partition_key``; skip partitions already completed by a
        previous (possibly killed) run. ``max_partitions`` exists for
        the kill/resume test: stop after completing that many.

        Returns the stage read back from parquet (all partitions).

        The input is persisted (memory-and-disk) before the partition
        loop so the upstream plan is computed ONCE; each per-partition
        job then filters the cached rows (round-1 version recomputed
        the full upstream plan n_partitions times). Kill/resume
        semantics are unchanged: every completed partition is durable
        behind its own _SUCCESS.
        """
        os.makedirs(self.stage_dir(stage), exist_ok=True)
        pending = [
            p for p in range(self.n_partitions) if not self.is_partition_done(stage, p)
        ]
        if pending:
            from pyspark.storagelevel import StorageLevel

            bucket = F.pmod(
                F.abs(F.xxhash64(F.col(partition_key))), F.lit(self.n_partitions)
            )
            staged = df.withColumn("_cp_bucket", bucket).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            try:
                done = 0
                for p in pending:
                    if max_partitions is not None and done >= max_partitions:
                        raise RuntimeError(
                            f"simulated kill after {done} partitions of {stage}"
                        )
                    t0 = time.time()
                    part = staged.filter(F.col("_cp_bucket") == p).drop("_cp_bucket")
                    part.write.mode("overwrite").parquet(self.part_dir(stage, p))
                    n = spark.read.parquet(self.part_dir(stage, p)).count()
                    self._append_manifest(
                        StageMetrics(
                            stage, p, n, time.time() - t0, self.cfg.config_hash(), time.time()
                        )
                    )
                    done += 1
            finally:
                staged.unpersist()
        return spark.read.parquet(os.path.join(self.stage_dir(stage), "part=*"))

    def pending_keys(self, base: DataFrame, stage: str, key_cols: list[str]) -> DataFrame:
        """R4 analog: left-anti join of the input against an existing
        (possibly partial) stage checkpoint — compute only misses."""
        if not os.path.exists(self.stage_dir(stage)):
            return base
        spark = base.sparkSession
        try:
            existing = spark.read.parquet(os.path.join(self.stage_dir(stage), "part=*"))
        except Exception:
            return base
        return base.join(existing.select(*key_cols), key_cols, "left_anti")
