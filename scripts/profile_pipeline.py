"""Stage-level wall-time breakdown of the near-dup pipeline.

Usage: python scripts/profile_pipeline.py <corpus_parquet> [cores]
Prints per-stage JSON so the slow shuffle is identifiable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus_dir = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from rmlint_spark.config import EngineConfig, SignatureConfig
    from rmlint_spark.operators.connected_components import connected_components
    from rmlint_spark.operators.exact import exact_clusters
    from rmlint_spark.operators.lsh import (
        candidate_pairs,
        jaccard_verify,
        row_index,
        with_combined_signatures,
    )
    from rmlint_spark.operators.simhash_op import simhash_candidates
    from rmlint_spark.session import get_spark

    spark = get_spark("profile", cores=cores, shuffle_partitions=cores)
    cfg = EngineConfig(sig=SignatureConfig(prefix_len=4096))
    files = spark.read.parquet(corpus_dir)

    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"{name}: {t[name]}s -> {out}")
        return out

    timed("scan_count", lambda: files.count())
    timed("exact_funnel", lambda: exact_clusters(files, cfg).count())
    sigs = with_combined_signatures(files, cfg).cache()
    timed("signatures(reps)", lambda: sigs.count())
    pairs, over = candidate_pairs(sigs, cfg)
    timed("lsh_candidates", lambda: pairs.count())
    timed("lsh_oversized", lambda: over.count())
    ver = jaccard_verify(pairs, sigs, cfg.jaccard_threshold - 0.1)
    timed("jaccard_verify", lambda: ver.count())
    sh_cand, sh_over = simhash_candidates(sigs, cfg)
    timed("simhash_candidates", lambda: sh_cand.count())
    edges = ver.select("fid_a", "fid_b").union(sh_cand.select("fid_a", "fid_b")).dropDuplicates()
    edges = edges.cache()
    timed("edges_union", lambda: edges.count())
    comp = timed("connected_components", lambda: connected_components(edges))
    timed("cc_labels_count", lambda: comp.count())
    rep_comp = (
        sigs.select("sha", "fid", "n_rows")
        .join(comp, "fid", "left")
        .select("sha", F.coalesce("component", F.when(F.col("n_rows") >= 2, F.col("fid"))).alias("cluster_id"))
        .filter(F.col("cluster_id").isNotNull())
    )
    members = row_index(files).join(rep_comp, "sha", "inner")
    timed("members_expand", lambda: members.count())
    print(json.dumps(t))
    spark.stop()


if __name__ == "__main__":
    main()
