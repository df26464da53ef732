"""4x-replica scale run: the replication-invariance law at 1.6M files.

Builds the standard 400k-row scale corpus (identical bytes to every
round's ladder runs: generate_corpus seed 42), replicates it 4x under
fresh repo names, and runs the full spark-submit pipeline job on the
1,609,072-row result. Correct outputs are known a priori
(tests/test_scale_replica.py proves the law at unit scale):

  n_exact_rows == n_near_rows == distinct nonempty file identities
  n_edges      == the 400k corpus's edge count (87,030 with the
                  default config) — the representative edge relation
                  is INVARIANT under content replication, i.e.
                  candidate volume scales with distinct content, not
                  corpus size.

This is simultaneously a weak-scaling sample: same job, 4x the rows
of the ladder corpus at the same core count — compare files/s against
the 400k anchors in BENCH/scale_samples_*.jsonl.

Usage: python scripts/replica_scale.py [cores] [n_rows_base]
Appends one JSON line to BENCH/replica_scale_r05.jsonl.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

from scale_samples import probe  # noqa: E402
from scaling_bench import build_zip, gen_corpus, run_level  # noqa: E402

EXPECT_EDGES = int(os.environ.get("EXPECT_EDGES", "87030"))
K = 4


def build_replica(corpus: str, out: str, k: int) -> dict:
    from pyspark.sql import functions as F

    from rmlint_spark.session import get_spark

    spark = get_spark("replica_gen", cores=32, shuffle_partitions=64)
    files = spark.read.parquet(corpus)
    rep = None
    for i in range(k):
        part = files.withColumn("repo", F.concat(F.col("repo"), F.lit(f"_r{i}")))
        rep = part if rep is None else rep.unionByName(part)
    rep.repartition(128).write.mode("overwrite").parquet(out)
    big = spark.read.parquet(out)
    expect = {
        "n_files": big.count(),
        "expect_members": (
            big.filter(F.length("content") > 0)
            .dropDuplicates(["repo", "path", "commit"])
            .count()
        ),
    }
    spark.stop()
    return expect


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    tmp = tempfile.mkdtemp(prefix="rmlint_spark_replica_")
    zip_path = build_zip(tmp)
    if os.environ.get("REPLICA_CORPUS"):
        # reuse a previously built replica corpus (reruns after a
        # harness timeout); recompute the expectation cheaply
        from pyspark.sql import functions as F

        from rmlint_spark.session import get_spark

        big = os.environ["REPLICA_CORPUS"]
        spark = get_spark("replica_expect", cores=32, shuffle_partitions=64)
        bigdf = spark.read.parquet(big)
        expect = {
            "n_files": bigdf.count(),
            "expect_members": (
                bigdf.filter(F.length("content") > 0)
                .dropDuplicates(["repo", "path", "commit"])
                .count()
            ),
        }
        spark.stop()
    else:
        corpus = os.environ.get("SCALE_CORPUS") or gen_corpus(tmp, n_rows)
        big = os.path.join(tmp, "corpus_x4")
        expect = build_replica(corpus, big, K)
    print(f"replica corpus at {big}: {expect}", flush=True)

    p0 = probe()
    (rec,) = run_level(zip_path, big, cores, 1)
    p1 = probe()
    rec.update(
        {
            "cores": cores,
            "k": K,
            "n_rows_base": n_rows,
            "ts": datetime.datetime.now().isoformat(timespec="seconds"),
            "bw_before": p0.get("bw_mbs"),
            "bw_after": p1.get("bw_mbs"),
            "speedup_before": p0.get("speedup_k"),
            "speedup_after": p1.get("speedup_k"),
            "expect_members": expect["expect_members"],
            "expect_edges": EXPECT_EDGES,
            "law_exact": rec["n_exact_rows"] == expect["expect_members"],
            "law_near": rec["n_near_rows"] == expect["expect_members"],
            # EXPECT_EDGES=-1 skips the edge check (smoke runs on
            # corpora whose base edge count isn't pre-established)
            "law_edges": EXPECT_EDGES < 0 or rec["n_edges"] == EXPECT_EDGES,
        }
    )
    out_path = os.path.join(REPO, "BENCH", "replica_scale_r05.jsonl")
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    ok = rec["law_exact"] and rec["law_near"] and rec["law_edges"]
    print(("LAW HOLDS: " if ok else "LAW VIOLATED: ") + json.dumps(rec), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
