"""Band-tuning A/B: candidate volume vs per-grade band-stage recall.

Three (bands, rows) choices for num_perm=128, jaccard_threshold 0.7,
over the planted corpus (near groups at Jaccard grades
0.95/0.90/0.80/0.70):

- default        (32, 4)  — the library's static choice, S-curve
                            effective threshold 0.42 (recall-padded);
- tuned-balanced (16, 8)  — optimal_band_config(0.7, fp_weight=0.5),
                            effective threshold 0.707;
- tuned-recall   fp_weight=0.1 — the recall-biased optimum.

Reported per config: band-stage candidate count, per-grade recall of
the CANDIDATE stage against brute-force shingle-Jaccard truth (the
verify join prunes false positives later, so band-stage recall is the
number that can actually lose signal), and wall seconds.

The analytic expectation this measures: P(cand | s=0.70) under
(16, 8) is 1-(1-0.7^8)^16 ~ 0.61 — the balanced optimum trades away
recall exactly at the threshold boundary, which a dedup pipeline with
a downstream verify join must NOT do. The decision rule this feeds
(documented in operators/lsh.py): tune with fp_weight <= ~0.2 for
dedup (recall-critical, verification absorbs false positives); the
balanced/precision weightings are for candidate-budgeted retrieval.

Usage: python scripts/band_tuning_ab.py [n_rows] [out.jsonl]
"""

from __future__ import annotations

import json
import sys
import time
from itertools import combinations

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from rmlint_spark.config import EngineConfig, SignatureConfig  # noqa: E402
from rmlint_spark.corpus import generate_corpus  # noqa: E402
from rmlint_spark.operators.lsh import (  # noqa: E402
    candidate_pairs,
    lsh_collision_probability,
    optimal_band_config,
    with_signatures,
)
from rmlint_spark.session import get_spark  # noqa: E402

GRADES = (0.95, 0.90, 0.80, 0.70)


def shingle_set(text: str, k: int = 5) -> set:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)}


def graded_truth(files, truth) -> tuple[dict[float, set], dict]:
    """Planted near-group pairs bucketed by brute-force Jaccard into
    [grade, next_grade) bands (keys = GRADES, descending), plus the
    key -> representative-key map (min key per identical content —
    the collapse the band join operates on)."""
    joined = files.join(truth, ["repo", "path", "commit"]).filter(
        F.col("near_group_id").isNotNull()
    )
    rows = joined.select("repo", "path", "commit", "near_group_id",
                         "content").collect()
    by_group: dict = {}
    content: dict = {}
    for r in rows:
        key = (r["repo"], r["path"], r["commit"])
        by_group.setdefault(r["near_group_id"], []).append(key)
        content[key] = r["content"]
    import hashlib

    def fid_of(key):
        payload = "\x01" + "\x01".join(key)     # concat_ws('\x01', '', ...)
        return hashlib.sha256(payload.encode()).hexdigest()[:32]

    by_sha: dict = {}
    for key, text in content.items():
        by_sha.setdefault(text, []).append(key)
    # the engine elects the representative by MIN fid (lsh.py
    # representative_rows), not min key
    rep_of = {k: min(ks, key=fid_of) for ks in by_sha.values() for k in ks}
    out: dict[float, set] = {g: set() for g in GRADES}
    bounds = list(GRADES) + [0.0]
    for ks in by_group.values():
        for x, y in combinations(sorted(set(ks)), 2):
            if content[x] == content[y]:
                continue        # identical content = exact-funnel
                                # territory (reps collapse it before
                                # the band join by design)
            sx, sy = shingle_set(content[x]), shingle_set(content[y])
            if not sx or not sy:
                continue
            j = len(sx & sy) / len(sx | sy)
            for gi, g in enumerate(GRADES):
                if g <= j and (gi == 0 or j < bounds[gi - 1]):
                    out[g].add(frozenset((x, y)))
    return out, rep_of


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("band_tuning_ab", cores=8)

    files, truth = generate_corpus(spark, n)
    files = files.localCheckpoint(eager=True)
    truth_by_grade, rep_of = graded_truth(files, truth)

    b_bal, _ = optimal_band_config(0.7, 128, fp_weight=0.5)
    b_rec, _ = optimal_band_config(0.7, 128, fp_weight=0.05)
    configs = {
        "default_32x4": 32,
        f"tuned_balanced_{b_bal}x{128 // b_bal}": b_bal,
        f"tuned_recall_{b_rec}x{128 // b_rec}": b_rec,
    }
    for name, bands in configs.items():
        cfg = EngineConfig(
            sig=SignatureConfig(prefix_len=4096, bands=bands)
        )
        t0 = time.time()
        sigs = with_signatures(files, cfg).localCheckpoint(eager=True)
        pairs, _report = candidate_pairs(sigs, cfg)
        rows = pairs.select("fid_a", "fid_b").count()
        # candidate ids -> (repo,path,commit) pairs for recall
        from rmlint_spark.operators.lsh import row_index

        fid_map = {
            r["fid"]: (r["repo"], r["path"], r["commit"])
            for r in row_index(files).select(
                "fid", "repo", "path", "commit").collect()
        }
        got = {
            frozenset((fid_map[r["fid_a"]], fid_map[r["fid_b"]]))
            for r in pairs.collect()
        }
        r_per_band = 128 // bands
        cell = {
            "config": name,
            "bands": bands,
            "rows_per_band": r_per_band,
            "eff_threshold": round((1 / bands) ** (1 / r_per_band), 3),
            "p_at_070": round(
                lsh_collision_probability(0.70, bands, r_per_band), 3),
            "n_docs": n,
            "n_candidates": rows,
            "wall_sec": round(time.time() - t0, 1),
        }
        for g in GRADES:
            want = truth_by_grade[g]
            # a truth pair is FOUND if its representatives' pair was
            # emitted (the pipeline re-expands reps after CC)
            hit = len([p for p in want
                       if frozenset(rep_of[k] for k in p) in got])
            cell[f"recall_{g}"] = round(hit / len(want), 4) if want else 1.0
            cell[f"want_{g}"] = len(want)
        line = json.dumps(cell)
        print(line, flush=True)
        if out_path:
            with open(out_path, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
