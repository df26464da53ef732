"""SimHash near-duplicate candidate generation (layer B).

Complement to MinHash/LSH (operators/lsh.py): a 64-bit SimHash per
file, candidates = pairs within Hamming distance <= D. Candidate
generation uses the pigeonhole block trick: split the 64-bit signature
into B contiguous blocks; any pair within Hamming distance D < B must
agree exactly on at least one block, so a self-join per (block_id,
block_value) finds all such pairs; the exact Hamming check
(JVM-side ``bit_count(xor)``) then filters false positives.

Same skew discipline as the LSH join, with a tighter default cap
(cfg.simhash_max_bucket_width — see config.py for the measured
rationale): block buckets wider than the cap are excluded and
reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rmlint_spark.config import DEFAULT, EngineConfig
from rmlint_spark.functions.simhash import hamming, simhash_udf
from rmlint_spark.operators.lint import KEY
from rmlint_spark.operators.lsh import representative_rows


def with_simhash(files: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """(fid, repo, path, commit, sha, simhash) — one row per distinct
    content (representative bundling, see operators/lsh.py), one
    vectorized pass."""
    udf = simhash_udf()
    return representative_rows(files).select(
        "fid", *KEY, "sha", udf(F.col("content")).alias("simhash")
    )


def simhash_blocks(sims: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """(fid, block_id, block_value): contiguous 16-bit (for 4 blocks)
    slices extracted with shifts/masks — pure codegen expressions."""
    nblocks = cfg.sig.simhash_blocks
    width = cfg.sig.simhash_bits // nblocks
    mask = (1 << width) - 1
    expr = (
        f"transform(sequence(0, {nblocks - 1}), "
        f"b -> shiftright(simhash, b * {width}) & {mask}L)"
    )
    return sims.select("fid", F.posexplode(F.expr(expr)).alias("block_id", "block_value"))


def simhash_candidates(
    sims: DataFrame, cfg: EngineConfig = DEFAULT
) -> tuple[DataFrame, DataFrame]:
    """Pairs within Hamming distance <= cfg.sig.simhash_max_hamming.

    Returns (pairs(fid_a, fid_b, hamming), oversized_report).
    """
    blocks = simhash_blocks(sims, cfg)
    widths = blocks.groupBy("block_id", "block_value").agg(F.count("*").alias("width"))
    oversized = widths.filter(F.col("width") > cfg.simhash_max_bucket_width)
    ok = blocks.join(
        oversized.select("block_id", "block_value"), ["block_id", "block_value"], "left_anti"
    )
    a = ok.select("block_id", "block_value", F.col("fid").alias("fid_a"))
    b = ok.select("block_id", "block_value", F.col("fid").alias("fid_b"))
    cand = (
        a.join(b, ["block_id", "block_value"])
        .filter(F.col("fid_a") < F.col("fid_b"))
        .select("fid_a", "fid_b")
        .dropDuplicates(["fid_a", "fid_b"])
    )
    s = sims.select("fid", "simhash")
    joined = (
        cand.join(s.withColumnRenamed("fid", "fid_a").withColumnRenamed("simhash", "sh_a"), "fid_a")
        .join(s.withColumnRenamed("fid", "fid_b").withColumnRenamed("simhash", "sh_b"), "fid_b")
        .withColumn("hamming", hamming(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= cfg.sig.simhash_max_hamming)
        .select("fid_a", "fid_b", "hamming")
    )
    return joined, oversized
