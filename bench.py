"""Benchmark harness (driver contract).

Runs the engine's headline queries on $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...extras}.

Headline set = the flagship funnel + each operator family's
representative query, timed individually (actions force full
materialization via count/collect of a small projection).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from rmlint_spark.config import EngineConfig, SignatureConfig
    from rmlint_spark.operators.ann import brute_force_topk_blas
    from rmlint_spark.operators.lsh import verified_pairs, with_signatures
    from rmlint_spark.operators.simhash_op import simhash_candidates, with_simhash
    from rmlint_spark.operators.substring import substring_clones
    from rmlint_spark.plans.pipeline import run_pipeline
    from rmlint_spark.session import get_spark
    from rmlint_spark.sources.tables import documents_as_files, load_table

    spark = get_spark("rmlint_spark_bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    cfg = EngineConfig(sig=SignatureConfig(prefix_len=4096))

    docs = load_table(spark, sf_dir, "documents")
    files = documents_as_files(docs)
    # plant a deterministic 10% mirrored slice so dedup paths do real work
    mirrored = (
        documents_as_files(docs.filter(F.pmod("doc_id", F.lit(10)) == 0))
        .withColumn("path", F.concat(F.lit("mirror/"), F.col("path")))
        .withColumn("repo", F.lit("mirror-repo"))
    )
    corpus = files.unionByName(mirrored).cache()
    n_files = corpus.count()
    emb = load_table(spark, sf_dir, "embeddings")

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    from rmlint_spark.operators.exact import exact_clusters, pin_scope

    def scoped(name, fn):
        # each stage releases everything it pinned once its result
        # count is materialized (pin_scope discipline, VERDICT r3 #6);
        # cross-stage relations (corpus, sigs) are cached OUTSIDE the
        # scopes so the snapshot diff never touches them
        with pin_scope(spark):
            return timed(name, fn)

    n_clustered = scoped("exact_funnel", lambda: exact_clusters(corpus, cfg).count())

    sigs = timed("minhash_signatures", lambda: with_signatures(corpus, cfg).cache())
    n_sigs = timed("minhash_signatures_materialize", lambda: sigs.count())
    n_pairs = scoped("lsh_candidate_pairs", lambda: verified_pairs(sigs, cfg)[0].count())
    sims = with_simhash(corpus, cfg)
    n_sh = scoped("simhash_candidates", lambda: simhash_candidates(sims, cfg)[0].count())
    pipeline = scoped("full_near_dup_pipeline", lambda: run_pipeline(corpus, cfg).near_clusters.count())
    n_sub = scoped("substring_clones", lambda: substring_clones(corpus, cfg, min_shared=2)[0].count())
    n_ann = scoped("ann_bruteforce_topk", lambda: brute_force_topk_blas(emb, k=5).count())
    qs = E.queries()
    for name in ["gap_sessions", "events_hourly", "text_stats", "dir_rollup"]:
        timed(f"q_{name}", lambda n=name: qs[n](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    files_per_sec = round(n_files / max(timings["exact_funnel"], 1e-9), 1)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": cpus,
                "n_files": n_files,
                "n_exact_clustered_rows": n_clustered,
                "n_lsh_pairs": n_pairs,
                "n_simhash_pairs": n_sh,
                "n_near_cluster_rows": pipeline,
                "n_substring_pairs": n_sub,
                "n_ann_rows": n_ann,
                "exact_funnel_files_per_sec": files_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
