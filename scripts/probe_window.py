"""Pre-flight probe for perf windows: the host throttles this VM in
two INDEPENDENT modes, and each needs its own detector.

1. Memory-bandwidth throttle (round-4 root cause): large-array numpy
   ops drop from GB/s to single-digit MB/s while cache-resident work
   stays fast.  Detector: 50 MB numpy multiply.
2. Effective-core-grant ceiling (observed round-3, re-observed
   round-4 session-3 WITH a healthy bandwidth probe): the host grants
   fewer schedulable threads than advertised, so local[8] and
   local[2] walls converge and any (N, 4N) ratio measures the ceiling
   rather than the job.  Detector: aggregate throughput of K
   CPU-bound processes vs 1 — the parallel speedup IS the usable
   grant.

Usage: python scripts/probe_window.py [K]   (default K=8)
Prints one JSON line: {"bw_mbs": ..., "speedup_k": ..., "grant_ok":
bool, "bw_ok": bool}.  A scaling pair (N, 4N) is only evidentiary
when speedup_k comfortably exceeds 4N·2 threads' worth of grant —
rule of thumb: require speedup_k >= 0.75*K for the (2,8) pair, else
drop to (1,4).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

_SPIN_N = 200_000


def _spin(dur: float, out) -> None:
    """Tight integer/float loop, cache-resident (immune to the
    bandwidth throttle so the two probes stay independent)."""
    end = time.time() + dur
    iters = 0
    x = 1.0
    while time.time() < end:
        for _ in range(1000):
            x = x * 1.0000001 + 1e-9
        iters += 1000
    out.put(iters + (x == -1))  # keep x live


def _aggregate(k: int, dur: float = 2.0) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_spin, args=(dur, q)) for _ in range(k)]
    t0 = time.time()
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / (time.time() - t0)


def probe(k: int = 8) -> dict:
    import numpy as np

    best_bw = 0.0
    for _ in range(3):
        a = np.ones(50 * 1024 * 1024 // 8)
        t = time.time()
        a * 2
        best_bw = max(best_bw, 50 / (time.time() - t))
    solo = _aggregate(1)
    par = _aggregate(k)
    speedup = par / solo if solo else 0.0
    return {
        "bw_mbs": round(best_bw, 1),
        "k": k,
        "speedup_k": round(speedup, 2),
        "bw_ok": best_bw >= 100,
        "grant_ok": speedup >= 0.75 * k,
    }


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(json.dumps(probe(k)))
