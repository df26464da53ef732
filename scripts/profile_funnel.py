"""Stage-level A/B of the exact funnel's content-pass economy.

Times, on the same corpus and core count:
  1. two-pass funnel (fuse_full_digest=False) with byte_confirm on
  2. two-pass funnel, byte_confirm off
  3. one-pass funnel (fuse_full_digest=True), byte_confirm off
  4. one-pass funnel, byte_confirm on
and asserts all four produce identical (rows, distinct clusters).

Usage: python scripts/profile_funnel.py <corpus_parquet> [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus_dir = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from dataclasses import replace

    from pyspark.sql import functions as F

    from rmlint_spark.config import EngineConfig, SignatureConfig
    from rmlint_spark.operators.exact import exact_clusters, pin_scope
    from rmlint_spark.session import get_spark

    spark = get_spark("profile_funnel", cores=cores, shuffle_partitions=cores)
    files = spark.read.parquet(corpus_dir)
    n = files.count()
    print(f"corpus rows: {n}")

    results = {}
    for name, fuse, confirm in [
        ("two_pass_confirm", False, True),
        ("two_pass_noconfirm", False, False),
        ("one_pass_noconfirm", True, False),
        ("one_pass_confirm", True, True),
    ]:
        cfg = EngineConfig(
            sig=SignatureConfig(prefix_len=4096, fuse_full_digest=fuse),
            byte_confirm=confirm,
        )
        t0 = time.time()
        with pin_scope(spark):
            out = exact_clusters(files, cfg)
            rows = out.count()
            clusters = out.select("cluster_id").distinct().count()
        dt = round(time.time() - t0, 2)
        results[name] = {"sec": dt, "rows": rows, "clusters": clusters}
        print(f"{name}: {dt}s rows={rows} clusters={clusters}", flush=True)

    vals = {(r["rows"], r["clusters"]) for r in results.values()}
    assert len(vals) == 1, f"variant outputs DIVERGE: {results}"
    print(json.dumps({"cores": cores, "n_files": n, **results}))


if __name__ == "__main__":
    main()
