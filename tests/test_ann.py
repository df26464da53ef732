"""ANN operators: brute-force exactness + LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rmlint_spark.operators.ann import brute_force_topk, hyperplane_topk


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def numpy_topk(rows, k=5):
    ids = np.array([r["vec_id"] for r in rows])
    m = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    out = {}
    for i, vid in enumerate(ids):
        # sort by (-sim, neighbor_id) to mirror the engine tiebreak
        order = sorted(range(len(ids)), key=lambda j: (-sims[i, j], ids[j]))[:k]
        out[int(vid)] = [int(ids[j]) for j in order]
    return out


def test_brute_force_matches_numpy(embeddings):
    want = numpy_topk(embeddings.collect(), k=5)
    got = {}
    for r in brute_force_topk(embeddings, k=5).collect():
        got.setdefault(r["vec_id"], []).append((r["rk"], r["neighbor_id"]))
    got = {k: [n for _, n in sorted(v)] for k, v in got.items()}
    exact = sum(got[k] == want[k] for k in want)
    assert exact >= len(want) * 0.99  # allow fp tiebreak noise at most 1%


def test_hyperplane_recall(embeddings):
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, k=5).collect()
    }
    approx = {
        (r["vec_id"], r["neighbor_id"])
        for r in hyperplane_topk(embeddings, k=5, n_bands=24, bits_per_band=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH ANN recall {recall:.3f}"


def test_blas_variant_matches_sql_variant(embeddings):
    from rmlint_spark.operators.ann import brute_force_topk_blas

    sql_v = {
        (r["vec_id"], r["rk"]): r["neighbor_id"]
        for r in brute_force_topk(embeddings, k=5).collect()
    }
    blas_v = {
        (r["vec_id"], r["rk"]): r["neighbor_id"]
        for r in brute_force_topk_blas(embeddings, k=5).collect()
    }
    agree = sum(sql_v[k] == blas_v[k] for k in sql_v) / len(sql_v)
    assert agree >= 0.99


def test_brute_force_self_excluded(embeddings):
    got = brute_force_topk(embeddings, k=3)
    assert got.filter(F.col("vec_id") == F.col("neighbor_id")).count() == 0
