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

# SWAR spread table: byte b -> uint64 with one 8-bit counter field per
# bit of b (field j = bit j of b). Summing spreads of byte-position p
# across <= 255 tokens accumulates per-bit ones-counts for bits
# 8p..8p+7 without overflow — the whole 64-bit histogram lives in 8
# uint64 lanes instead of 64 expanded uint8 columns.
_SPREAD = np.zeros(256, dtype=np.uint64)
for _b in range(256):
    _SPREAD[_b] = sum(1 << (8 * _j) for _j in range(8) if (_b >> _j) & 1)
_SUB = 255  # max tokens per sub-segment (8-bit counter capacity)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: spread 32-bit shingle hashes over all 64
    bit positions so shingle-feature simhash votes are unbiased (the
    raw shingle hashes only occupy the low 32 bits)."""
    x = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def simhash_from_token_hashes(h: np.ndarray, starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Packed uint64 simhash per doc from flat token hashes.

    bit j of doc d = 1 iff #(tokens with bit j set) * 2 > n_tokens —
    computed as ones-count per bit via unpackbits + reduceat, O(1)
    bytes per token-bit, chunked to bound memory."""
    n_docs = len(starts)
    out = np.zeros(n_docs, dtype=np.uint64)
    CHUNK = 2048  # docs per inner chunk -> spread matrix stays ~tens of MB
    for lo in range(0, n_docs, CHUNK):
        hi = min(lo + CHUNK, n_docs)
        t0 = starts[lo]
        t1 = starts[hi - 1] + counts[hi - 1]
        hh = h[t0:t1]
        cnt = counts[lo:hi]
        # SWAR ones-count. np.add.reduceat over the naive
        # (n_tokens, 64) uint8 bit matrix is a scalar per-element loop
        # (dtype-cast accumulate) — measured 4.7 s of the 4.9 s kernel
        # at 9M tokens. Packing each token BYTE's 8 bits into eight
        # 8-bit counter fields of one uint64 (_SPREAD gather) turns
        # that into a reduceat over 8 native-uint64 columns — 8x fewer
        # segment-adds, no cast. Fields hold <= 255, so docs split
        # into <= _SUB-token sub-segments (cuts built vectorized);
        # sub-segment totals unpack to a (n_sub, 64) uint8 view summed
        # per doc in a second, tiny reduceat.
        n_sub = (cnt + (_SUB - 1)) // _SUB
        sub0 = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(n_sub[:-1], out=sub0[1:])
        total_sub = int(sub0[-1] + n_sub[-1])
        doc_of_sub = np.repeat(np.arange(len(cnt)), n_sub)
        sub_rank = np.arange(total_sub, dtype=np.int64) - sub0[doc_of_sub]
        cuts = (starts[lo:hi] - t0)[doc_of_sub] + sub_rank * _SUB
        spread = _SPREAD[hh.view(np.uint8).reshape(-1, 8)]
        packed = np.add.reduceat(spread, cuts, axis=0)  # (n_sub, 8) u64
        # little-endian uint64 view: byte 8p+j of a row = count of bit
        # 8p+j — the (n_sub, 64) per-bit counts in bit order
        sub_ones = packed.view(np.uint8).reshape(total_sub, 64)
        if total_sub == len(cnt):  # no doc exceeded _SUB tokens
            ones = sub_ones.astype(np.int32)
        else:
            ones = np.add.reduceat(sub_ones, sub0, axis=0, dtype=np.int32)
        sig_bits = (ones * 2 > cnt[:, None]).astype(np.uint64)
        out[lo:hi] = (sig_bits << _SHIFTS).sum(axis=1, dtype=np.uint64)
    return out


def simhash_from_feature_arrays(
    per_doc: list[np.ndarray], mix: bool = False
) -> np.ndarray:
    """Packed uint64 simhash per doc from per-doc uint64 feature-hash
    arrays (the shingle-feature path); empty docs get the 0 sentinel.

    ``mix``: apply the splitmix64 finalizer to the CONCATENATED flat
    array (one vectorized pass) instead of the caller looping
    ``mix64`` over thousands of small per-doc arrays — same bits,
    batch-level cost."""
    counts = np.array([len(a) for a in per_doc], dtype=np.int64)
    out = np.zeros(len(per_doc), dtype=np.uint64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    flat = np.concatenate([a for a in per_doc if len(a)])
    if mix:
        flat = mix64(flat)
    ne_counts = counts[nonempty]
    starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(ne_counts[:-1], out=starts[1:])
    out[nonempty] = simhash_from_token_hashes(flat, starts, ne_counts)
    return out


def simhash_batch(texts: list[str], features: str = "token", k: int = 5) -> np.ndarray:
    """int64 simhash per text (bit pattern reinterpreted as signed).

    ``features``: "token" votes with single-token hashes; "shingle"
    votes with splitmix-spread k-token shingle hashes (the web-dedup
    variant — see config.SignatureConfig.simhash_features for the
    measured trade-off).

    Tokenize + SipHash run through minhash._token_hashes_flat — the
    Arrow C++ tokenizer + distinct-token hash pass the combined kernel
    already uses (bit-identical to the former per-doc ``.split()`` +
    object-array hash, which was this kernel's hot spot — guide §4.2)."""
    from rmlint_spark.functions.minhash import _per_doc_shingles, _token_hashes_flat

    h, counts = _token_hashes_flat(texts)
    out = np.zeros(len(texts), dtype=np.int64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    if features == "shingle":
        per_doc, ne = _per_doc_shingles(h, counts, k)
        out[ne] = simhash_from_feature_arrays(per_doc, mix=True).astype(np.int64)
    else:
        ne_counts = counts[nonempty]
        starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(ne_counts[:-1], out=starts[1:])
        out[nonempty] = simhash_from_token_hashes(h, starts, ne_counts).astype(np.int64)
    return out


def simhash_udf(features: str = "token", k: int = 5):
    @F.pandas_udf("long")
    def _simhash(content: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(content.tolist(), features, k))

    return _simhash


def hamming(a: Column, b: Column) -> Column:
    """JVM-side Hamming distance between two int64 bit patterns."""
    return F.bit_count(a.bitwiseXOR(b))
