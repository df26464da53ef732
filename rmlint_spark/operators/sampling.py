"""Deterministic quota / mixture sampling for training-data mixture
building: given per-source target weights and a global sampling
fraction, keep a hash-selected subset of each source sized to the
weight (the domain-reweighting step every published LLM data recipe
runs between filtering and tokenization).

Determinism contract: membership is a pure function of the row id —
``u = (id * 2654435761) % 2^32 < floor(min(1, target/actual) * 2^32)``
(Knuth multiplicative hashing; integer-only, so any SQL engine
reproduces it bit-for-bit). Re-running the job, changing
parallelism, or adding unrelated sources never flips a kept row.

Scale shape: the per-source census is a map-side-combinable count
(tiny result, one row per source), the rate table broadcasts back,
and the filter itself is a map — the corpus never shuffles. The
reference analog is the F1/F10 filter family (lib/filter through
cfg limits): a per-row predicate derived from small global state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KNUTH = 2654435761
_M32 = 4294967296


def hash_u32(id_col: Column) -> Column:
    """Deterministic pseudo-uniform draw in [0, 2^32) from an integer
    id. int64 arithmetic only (safe under ANSI mode for ids < 2^31)."""
    return (id_col.cast("long") * F.lit(_KNUTH)) % F.lit(_M32)


def quota_sample(
    docs: DataFrame,
    weight: Column,
    frac: float = 0.4,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic per-source subset whose expected size is
    ``frac * N`` split across sources proportionally to ``weight``
    (a Column over ``source_col``). Returns the kept rows with the
    census columns (n_source, target_n, u) for observability."""
    census = docs.groupBy(source_col).agg(F.count("*").cast("long").alias("n_source"))
    census = census.withColumn("w", weight.cast("long"))
    totals = census.agg(
        F.sum("n_source").cast("long").alias("n_total"),
        F.sum("w").cast("long").alias("w_total"),
    )
    rates = census.crossJoin(F.broadcast(totals)).select(
        source_col,
        "n_source",
        F.floor(F.lit(frac) * F.col("n_total") * F.col("w") / F.col("w_total"))
        .cast("long")
        .alias("target_n"),
    )
    rates = rates.withColumn(
        "u_max",
        F.floor(
            F.least(F.lit(1.0), F.col("target_n") / F.col("n_source")) * F.lit(_M32)
        ).cast("long"),
    )
    u = hash_u32(F.col(id_col)).alias("u")
    kept = docs.select(id_col, source_col, u).join(F.broadcast(rates), source_col)
    return kept.filter(F.col("u") < F.col("u_max")).select(
        id_col, source_col, "u", "n_source", "target_n"
    )


def shard_shuffle(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic shard-balanced global shuffle — the pre-training
    permutation step: every row gets a pseudorandom draw ``u``, a
    shard (``u % n_shards``), and its position within the shard
    (ordered by ``u``, doc_id tiebreak). Equivalent to a global
    pseudorandom ORDER BY followed by round-robin sharding, but the
    plan is ONE hash shuffle on ``shard`` plus a per-shard window
    sort — no range-partitioned global sort, no skew (u is uniform),
    and re-running at any parallelism yields the identical layout.
    Returns (id, *carry, u, shard, pos) — ``carry`` names upstream
    columns to keep alongside the layout (e.g. the quota census when
    shuffling a sampled mixture), saving a re-join on the id."""
    d = docs.select(
        F.col(id_col), *[F.col(c) for c in carry],
        hash_u32(F.col(id_col)).alias("u"),
    )
    d = d.withColumn("shard", F.pmod(F.col("u"), F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy(F.col("u").asc(), F.col(id_col).asc())
    return d.withColumn("pos", F.row_number().over(w).cast("long"))
