"""Benchmark harness (driver contract).

Runs the engine's headline queries on $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...extras}.

Headline set = the flagship funnel + each operator family's
representative query, timed individually (actions force full
materialization via count/collect of a small projection).

Estimator (round 5): the battery runs TWICE in one session and each
query reports its per-pass MINIMUM; "value" is the sum of minima.
This VM's effective speed swings up to ~30x between identical runs
(host memory-bandwidth throttle, root-caused and probe-annotated in
BENCH/BASELINE.md), so a single-pass wall measures the window as much
as the code; per-query best-of-2 inside one session is the smallest
estimator that mostly removes the throttle while keeping every query
measured on identical input. Both raw pass totals and a 50 MB-numpy
bandwidth probe (same formula as scripts/probe_window.py) before and
after are recorded in the extras, so the window itself stays visible
in the recorded artifact. Result counts are asserted identical across
passes (the metamorphic check every scale sample uses).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _bw_probe_mbs() -> float:
    """50 MB numpy multiply, best of 3 — scripts/probe_window.py's
    bandwidth detector, inlined so the bench artifact is
    self-annotating."""
    import numpy as np

    best = 0.0
    for _ in range(3):
        a = np.ones(50 * 1024 * 1024 // 8)
        t = time.time()
        a * 2
        best = max(best, 50 / (time.time() - t))
    return round(best, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from rmlint_spark.config import EngineConfig, SignatureConfig
    from rmlint_spark.operators.ann import brute_force_topk_blas
    from rmlint_spark.operators.exact import exact_clusters, pin_scope
    from rmlint_spark.operators.lsh import verified_pairs, with_signatures
    from rmlint_spark.operators.simhash_op import simhash_candidates, with_simhash
    from rmlint_spark.operators.substring import substring_clones
    from rmlint_spark.plans.pipeline import run_pipeline
    from rmlint_spark.session import get_spark
    from rmlint_spark.sources.tables import documents_as_files, load_table

    bw_before = _bw_probe_mbs()
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
    qs = E.queries()

    def battery() -> tuple[dict[str, float], dict[str, int]]:
        timings: dict[str, float] = {}

        def timed(name, fn):
            t0 = time.time()
            out = fn()
            timings[name] = round(time.time() - t0, 3)
            return out

        def scoped(name, fn):
            # each stage releases everything it pinned once its result
            # count is materialized (pin_scope discipline, VERDICT r3
            # #6); cross-stage relations (corpus, sigs) are cached
            # OUTSIDE the scopes so the snapshot diff never touches them
            with pin_scope(spark):
                return timed(name, fn)

        counts: dict[str, int] = {}
        counts["n_exact_clustered_rows"] = scoped(
            "exact_funnel", lambda: exact_clusters(corpus, cfg).count()
        )
        sigs = timed("minhash_signatures", lambda: with_signatures(corpus, cfg).cache())
        timed("minhash_signatures_materialize", lambda: sigs.count())
        counts["n_lsh_pairs"] = scoped(
            "lsh_candidate_pairs", lambda: verified_pairs(sigs, cfg)[0].count()
        )
        sims = with_simhash(corpus, cfg)
        counts["n_simhash_pairs"] = scoped(
            "simhash_candidates", lambda: simhash_candidates(sims, cfg)[0].count()
        )
        counts["n_near_cluster_rows"] = scoped(
            "full_near_dup_pipeline", lambda: run_pipeline(corpus, cfg).near_clusters.count()
        )
        counts["n_substring_pairs"] = scoped(
            "substring_clones", lambda: substring_clones(corpus, cfg, min_shared=2)[0].count()
        )
        counts["n_ann_rows"] = scoped(
            "ann_bruteforce_topk", lambda: brute_force_topk_blas(emb, k=5).count()
        )
        for name in ["gap_sessions", "events_hourly", "text_stats", "dir_rollup"]:
            timed(f"q_{name}", lambda n=name: qs[n](spark, sf_dir).count())
        sigs.unpersist()
        return timings, counts

    passes: list[dict[str, float]] = []
    counts: dict[str, int] = {}
    for i in range(max(n_passes, 1)):
        t, c = battery()
        passes.append(t)
        if i == 0:
            counts = c
        else:
            assert c == counts, f"pass {i} result counts differ: {c} vs {counts}"
    bw_after = _bw_probe_mbs()

    timings = {k: min(p[k] for p in passes) for k in passes[0]}
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
                **counts,
                "exact_funnel_files_per_sec": files_per_sec,
                "estimator": f"per-query min of {len(passes)} passes",
                "pass_totals": [round(sum(p.values()), 3) for p in passes],
                "bw_mbs_before": bw_before,
                "bw_mbs_after": bw_after,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
