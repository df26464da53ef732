"""Vectorized 64-bit SimHash.

New capability (north rule). SimHash: each token contributes +1/-1 to
each of 64 bit positions according to its 64-bit hash; the signature's
bit j is 1 iff the weighted sum is positive. Near-identical documents
land within a small Hamming distance.

Vectorization: one ``pd.util.hash_array`` over the flattened token
array, bit-matrix expansion to (n_tokens, 64) int8, then
``np.add.reduceat`` per document — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash_batch(texts: list[str]) -> np.ndarray:
    """int64 simhash per text (bit pattern reinterpreted as signed)."""
    toks_per_doc = [(t or "").split() for t in texts]
    counts = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks_per_doc if t])
    h = pd.util.hash_array(flat).astype(np.uint64)
    bits = ((h[:, None] >> _SHIFTS) & np.uint64(1)).astype(np.int32)  # (n,64) in {0,1}
    contrib = bits * 2 - 1  # {−1, +1}
    starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(counts[nonempty][:-1], out=starts[1:])
    sums = np.add.reduceat(contrib, starts, axis=0)  # (docs, 64)
    sig_bits = (sums > 0).astype(np.uint64)
    packed = (sig_bits << _SHIFTS).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed.astype(np.int64)  # two's-complement reinterpret
    return out


def simhash_udf():
    @F.pandas_udf("long")
    def _simhash(content: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(content.tolist()))

    return _simhash


def hamming(a: Column, b: Column) -> Column:
    """JVM-side Hamming distance between two int64 bit patterns."""
    return F.bit_count(a.bitwiseXOR(b))
