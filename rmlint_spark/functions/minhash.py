"""Vectorized MinHash signatures over token shingles.

New capability (no rmlint counterpart — mandated by the north rule);
the *funnel philosophy* is the reference's: compute a cheap signature
first, verify candidates byte-exactly later (lib/shredder.c:47-60).

Design (Arrow-batched, zero per-row Python in the hot loop):

- shingles: k consecutive whitespace tokens joined by one space;
- shingle hash: ``pd.util.hash_array`` (SipHash, fixed key —
  deterministic across processes/partitions), truncated to 32 bits;
- permutations: ``(a_i * h + b_i) mod M61`` masked to 32 bits, the
  standard numpy MinHash scheme (same family as the public
  `datasketch` library); a/b drawn from a seeded RNG so the
  signature config is pinned (recall>=0.99 comparison requirement);
- per-permutation ``np.minimum.reduceat`` over the flattened shingle
  array — one vectorized pass per permutation, O(batch) memory.

Estimated Jaccard between two docs = fraction of equal signature
slots (unbiased estimator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_MERSENNE61 = np.uint64((1 << 61) - 1)
_MAX32 = np.uint64((1 << 32) - 1)


def perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """32-bit shingle hashes for one document (helper for oracles and
    the flattened batch path)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(shingles, dtype=object))
    return h.astype(np.uint64) & _MAX32


def minhash_batch(texts: list[str], k: int, num_perm: int, seed: int) -> np.ndarray:
    """(len(texts), num_perm) int64 signature matrix. Empty docs get an
    all -1 sentinel signature (never matches anything)."""
    per_doc = [shingle_hashes(t if t is not None else "", k) for t in texts]
    counts = np.array([len(h) for h in per_doc], dtype=np.int64)
    out = np.full((len(texts), num_perm), -1, dtype=np.int64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    flat = np.concatenate([h for h in per_doc if len(h)])
    starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(counts[nonempty][:-1], out=starts[1:])
    a, b = perm_params(num_perm, seed)
    sig = np.empty((int(nonempty.sum()), num_perm), dtype=np.int64)
    for i in range(num_perm):
        # uint64 wraparound multiply then mod M61 — standard numpy
        # MinHash permutation; deterministic, vectorized
        v = ((a[i] * flat + b[i]) % _MERSENNE61) & _MAX32
        sig[:, i] = np.minimum.reduceat(v, starts).astype(np.int64)
    out[nonempty] = sig
    return out


def minhash_udf(k: int, num_perm: int, seed: int):
    """pandas_udf: content string -> array<long> signature."""

    @F.pandas_udf("array<long>")
    def _minhash(content: pd.Series) -> pd.Series:
        sig = minhash_batch(content.tolist(), k, num_perm, seed)
        return pd.Series(list(sig))

    return _minhash


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Native (JVM-side) estimator: fraction of equal slots."""
    eq = F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / F.size(sig_a)
