"""Collect scaling samples across levels WITHOUT rewriting
BENCH/BASELINE.md (round-4 evidence protocol: merged best-of samples
per level across invocations, both the (2,8) and (1,4) pairs).

Usage: python scripts/scale_samples.py [plan] [n_rows]
  plan: comma-separated core levels in run order, e.g. "8,2,8,2,4,1"
Each sample appends one JSON line to BENCH/scale_samples_r04.jsonl.
The corpus is generated once per invocation (or reused via
SCALE_CORPUS) so every sample sees identical bytes.
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

from scaling_bench import build_zip, gen_corpus, run_level  # noqa: E402


def probe() -> dict:
    """Memory-bandwidth + parallel-grant probe (the round-4 throttle
    detector): bw < ~100 MB/s or a low parallel speedup marks a
    window whose wall-clock is garbage."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "probe_window.py")],
        capture_output=True,
        text=True,
    )
    try:
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return {"bw_mbs": None}


def main() -> None:
    plan = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "8,2,8,2,8,2,4,1,4,1").split(",")]
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    out_name = os.environ.get("SCALE_OUT", "scale_samples_r04.jsonl")
    tmp = tempfile.mkdtemp(prefix="rmlint_spark_scale_")
    zip_path = build_zip(tmp)
    corpus = os.environ.get("SCALE_CORPUS") or gen_corpus(tmp, n_rows)
    print(f"corpus at {corpus}", flush=True)
    out_path = os.path.join(REPO, "BENCH", out_name)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    for cores in plan:
        p0 = probe()
        (rec,) = run_level(zip_path, corpus, cores, 1)
        p1 = probe()
        rec["cores"] = cores
        rec["ts"] = datetime.datetime.now().isoformat(timespec="seconds")
        rec["n_rows"] = n_rows
        # window annotations: a sample is quiet only if the probe was
        # healthy on BOTH sides of the run (mid-run collapse shows as
        # a degraded bw_after)
        rec["bw_before"] = p0.get("bw_mbs")
        rec["bw_after"] = p1.get("bw_mbs")
        rec["speedup_before"] = p0.get("speedup_k")
        rec["speedup_after"] = p1.get("speedup_k")
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"sample done: cores={cores} total={rec.get('total_sec')} "
              f"bw {rec['bw_before']}->{rec['bw_after']}", flush=True)


if __name__ == "__main__":
    main()
