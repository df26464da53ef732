import json, os, sys, time
sys.path.insert(0, "/root/repo")
from dataclasses import replace
from rmlint_spark.config import EngineConfig, SignatureConfig
from rmlint_spark.operators.exact import exact_clusters, pin_scope
from rmlint_spark.session import get_spark

spark = get_spark("ab_fuse", cores=8, shuffle_partitions=8)
files = spark.read.parquet("/root/repo/.bench_tmp/corpus")
out = []
for rep in range(3):
    for name, fuse in [("two_pass", False), ("one_pass", True)]:
        cfg = EngineConfig(sig=SignatureConfig(prefix_len=4096, fuse_full_digest=fuse))
        t0 = time.time()
        with pin_scope(spark):
            n = exact_clusters(files, cfg).count()
        out.append({"rep": rep, "variant": name, "sec": round(time.time()-t0, 2), "rows": n})
        print(out[-1], flush=True)
print(json.dumps(out))
