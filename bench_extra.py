"""Round-6 optimization harness (bench.py stays FROZEN — guide §1.4).

Reproduces bench.py's battery query-by-query so individual queries can
be (a) timed in isolation with the SAME actions the frozen bench uses,
(b) dumped as .explain("formatted") into plans/r06/<query>_{suffix}.txt,
and (c) optionally forced through the noop sink to time full
materialization independent of count()-pruning.

Usage:
  python bench_extra.py [--sf DIR] [--passes N] [--queries a,b,c]
                        [--explain-dir plans/r06] [--suffix before]
                        [--noop] [--extra]

--extra adds the round-5 operators the frozen bench does not cover
(VERDICT r5 next-round #4): span_dedup, sa_lcp, bpe_pair_counts,
winnow_clone_pairs.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def grab_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--queries", default="")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--extra", action="store_true")
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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

    spark = get_spark("rmlint_spark_bench_extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    cfg = EngineConfig(sig=SignatureConfig(prefix_len=4096))

    docs = load_table(spark, args.sf, "documents")
    files = documents_as_files(docs)
    mirrored = (
        documents_as_files(docs.filter(F.pmod("doc_id", F.lit(10)) == 0))
        .withColumn("path", F.concat(F.lit("mirror/"), F.col("path")))
        .withColumn("repo", F.lit("mirror-repo"))
    )
    corpus = files.unionByName(mirrored).cache()
    corpus.count()
    emb = load_table(spark, args.sf, "embeddings")
    qs = E.queries()

    # name -> (df-producer, uses own action) mirroring bench.py's battery
    sigs_holder = {}

    def mk_sigs():
        s = with_signatures(corpus, cfg).cache()
        sigs_holder["sigs"] = s
        return s

    battery = {
        "exact_funnel": lambda: exact_clusters(corpus, cfg),
        "minhash_signatures_materialize": mk_sigs,
        "lsh_candidate_pairs": lambda: verified_pairs(sigs_holder["sigs"], cfg)[0],
        "simhash_candidates": lambda: simhash_candidates(with_simhash(corpus, cfg), cfg)[0],
        "full_near_dup_pipeline": lambda: run_pipeline(corpus, cfg).near_clusters,
        "substring_clones": lambda: substring_clones(corpus, cfg, min_shared=2)[0],
        "ann_bruteforce_topk": lambda: brute_force_topk_blas(emb, k=5),
        "q_gap_sessions": lambda: qs["gap_sessions"](spark, args.sf),
        "q_events_hourly": lambda: qs["events_hourly"](spark, args.sf),
        "q_text_stats": lambda: qs["text_stats"](spark, args.sf),
        "q_dir_rollup": lambda: qs["dir_rollup"](spark, args.sf),
    }
    if args.extra:
        battery.update(
            {
                "x_span_dedup": lambda: qs["span_dedup"](spark, args.sf),
                "x_sa_lcp": lambda: qs["sa_lcp"](spark, args.sf),
                "x_bpe_pair_counts": lambda: qs["bpe_pair_counts"](spark, args.sf),
                "x_winnow_clone_pairs": lambda: qs["winnow_clone_pairs"](spark, args.sf),
            }
        )

    wanted = [q.strip() for q in args.queries.split(",") if q.strip()] or list(battery)

    results: dict[str, list[float]] = {q: [] for q in wanted}
    counts: dict[str, int] = {}
    for p in range(args.passes):
        for name in wanted:
            if name == "lsh_candidate_pairs" and "sigs" not in sigs_holder:
                s = with_signatures(corpus, cfg).cache()
                s.count()
                sigs_holder["sigs"] = s
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            with pin_scope(spark):
                t0 = time.time()
                df = battery[name]()
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                    n = -1
                else:
                    n = df.count()
                dt = time.time() - t0
            results[name].append(round(dt, 3))
            counts[name] = n
            if args.explain_dir and p == 0:
                os.makedirs(args.explain_dir, exist_ok=True)
                plan = grab_plan(battery[name]())
                base = name[2:] if name.startswith("q_") else name
                with open(
                    os.path.join(args.explain_dir, f"{base}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(plan)
            spark.sparkContext.setJobDescription(None)
    mins = {q: min(v) for q, v in results.items()}
    print(
        json.dumps(
            {
                "sf": args.sf,
                "cpus": cpus,
                "queries_min": mins,
                "total_min": round(sum(mins.values()), 3),
                "samples": results,
                "counts": counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
