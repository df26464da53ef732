"""Stop-shingle filter A/B: candidate-count vs recall at df=0.3.

VERDICT r4 #7: the filter shipped default-off; decide the default with
numbers. Two corpora, two settings, full near-dup pipeline each:

- corpus "plain": the planted generate_corpus (near groups in GRADES
  bands 0.95/0.90/0.80/0.70 — the recall ground truth).
- corpus "boilerplate": the same corpus with a shared 120-token
  license-style header prepended to EVERY doc (the contamination class
  the filter exists for: license headers / shared templates,
  VERDICT r3 #3).

Recall is reported against TWO truths:
- recall_full: brute-force shingle Jaccard over the text as fed to the
  engine (header included) >= jaccard_threshold. With the filter ON,
  pairs similar ONLY because of the header are intentionally excluded
  from similarity — so this number is expected to drop on the
  boilerplate corpus; its drop measures the filter's redefinition of
  similarity, not lost signal.
- recall_signal: the same brute-force truth over the BODY (pre-header)
  text — "pairs whose actual content is near-dup". This is the number
  that must stay >= 0.99 for the filter to be safe.

Usage: python scripts/stop_shingle_ab.py [n_rows] [out.jsonl]
Prints one JSON line per (corpus, stop_df) cell.
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
from rmlint_spark.operators.lsh import candidate_pairs, with_signatures  # noqa: E402
from rmlint_spark.plans.pipeline import run_pipeline  # noqa: E402
from rmlint_spark.session import get_spark  # noqa: E402

HEADER = " ".join(f"lic{i}" for i in range(120))


def shingle_set(text: str, k: int = 5) -> set:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def truth_pairs(files, truth, min_grade: float, body_of=None) -> set:
    """Planted within-near-group pairs whose brute-force shingle
    Jaccard >= min_grade; ``body_of`` optionally maps content before
    shingling (the signal-truth variant)."""
    joined = files.join(truth, ["repo", "path", "commit"]).filter(
        F.col("near_group_id").isNotNull()
    )
    rows = joined.select("repo", "path", "commit", "near_group_id", "content").collect()
    by_group: dict = {}
    content: dict = {}
    for r in rows:
        key = (r["repo"], r["path"], r["commit"])
        by_group.setdefault(r["near_group_id"], []).append(key)
        content[key] = body_of(r["content"]) if body_of else r["content"]
    pairs = set()
    for ks in by_group.values():
        for x, y in combinations(sorted(set(ks)), 2):
            sx, sy = shingle_set(content[x]), shingle_set(content[y])
            if not sx or not sy:
                continue
            if len(sx & sy) / len(sx | sy) >= min_grade:
                pairs.add((x, y))
    return pairs


def emitted_pairs(near_clusters) -> set:
    rows = near_clusters.select("repo", "path", "commit", "cluster_id").collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(
            (r["repo"], r["path"], r["commit"])
        )
    pairs = set()
    for ks in by_cluster.values():
        for x, y in combinations(sorted(set(ks)), 2):
            pairs.add((x, y))
    return pairs


def recall(want: set, got: set) -> float:
    return 1.0 if not want else 1 - len(want - got) / len(want)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("stop_shingle_ab", cores=8)

    files, truth = generate_corpus(spark, n)
    files = files.localCheckpoint(eager=True)
    strip = len(HEADER) + 1
    corpora = {
        "plain": (files, None),
        "boilerplate": (
            files.withColumn(
                "content", F.concat(F.lit(HEADER + " "), F.col("content"))
            ).localCheckpoint(eager=True),
            lambda text: text[strip:],
        ),
    }

    results = []
    for cname, (corpus, body_of) in corpora.items():
        for stop_df in (0.0, 0.3):
            cfg = EngineConfig(
                sig=SignatureConfig(
                    prefix_len=4096,
                    stop_shingle_df=stop_df,
                    stop_shingle_sample=20000,
                )
            )
            t0 = time.time()
            sigs = with_signatures(corpus, cfg).localCheckpoint(eager=True)
            pairs, esc_report = candidate_pairs(sigs, cfg)
            n_cand = pairs.count()
            res = run_pipeline(corpus, cfg)
            got = emitted_pairs(res.near_clusters)
            wall = round(time.time() - t0, 1)

            want_full = truth_pairs(corpus, truth, cfg.jaccard_threshold)
            want_signal = truth_pairs(corpus, truth, cfg.jaccard_threshold, body_of)
            cell = {
                "corpus": cname,
                "stop_df": stop_df,
                "n_docs": n,
                "n_candidates": n_cand,
                "near_rows": res.near_clusters.count(),
                "want_full": len(want_full),
                "recall_full": round(recall(want_full, got), 4),
                "want_signal": len(want_signal),
                "recall_signal": round(recall(want_signal, got), 4),
                "wall_sec": wall,
            }
            results.append(cell)
            line = json.dumps(cell)
            print(line, flush=True)
            if out_path:
                with open(out_path, "a") as f:
                    f.write(line + "\n")

    # decision summary
    by = {(c["corpus"], c["stop_df"]): c for c in results}
    plain_off, plain_on = by[("plain", 0.0)], by[("plain", 0.3)]
    bp_off, bp_on = by[("boilerplate", 0.0)], by[("boilerplate", 0.3)]
    print(
        json.dumps(
            {
                "summary": {
                    "plain_cand_ratio": round(
                        plain_on["n_candidates"] / max(1, plain_off["n_candidates"]), 3
                    ),
                    "boilerplate_cand_ratio": round(
                        bp_on["n_candidates"] / max(1, bp_off["n_candidates"]), 3
                    ),
                    "plain_recall_signal_on": plain_on["recall_signal"],
                    "boilerplate_recall_signal_on": bp_on["recall_signal"],
                    "boilerplate_recall_full_on": bp_on["recall_full"],
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
