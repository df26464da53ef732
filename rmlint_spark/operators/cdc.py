"""Content-defined chunking (CDC) and chunk-level dedup analytics.

Storage-style deduplication — rmlint finds whole files with identical
content (lib/shredder.c's size->hash->confirm funnel); content-defined
chunking extends that to SUB-file granularity: split every document at
boundaries derived from a rolling hash of the content itself, so two
documents sharing a long region produce identical interior chunks even
when the region sits at DIFFERENT byte offsets (an inserted prefix
shifts every fixed-size block but only locally perturbs content-defined
boundaries — the resynchronization property that makes backup tools
like restic/borg and the FastCDC line of work effective). Public
recipe: Rabin-fingerprint chunking (Muthitacharoen et al., LBFS,
SOSP'01) with the gear-table byte mixing of FastCDC (Xia et al.,
USENIX ATC'16); this implementation is written from those papers'
published algorithms, not from any tool's source.

Engine shape (the 100 TB discipline):

- Chunking is MAP-SIDE ONLY: one Arrow pass per batch computes every
  boundary and chunk hash; document text never enters a shuffle. Only
  (doc_id, chunk_idx, start, length, chunk_sha) rows — fixed-width
  metadata — leave the stage, so the chunk relation shuffles hashes,
  never content (the same id-only rule as the LSH band join).
- The rolling-hash scan is vectorized across the WHOLE Arrow batch:
  all documents in a batch are concatenated into one byte buffer, the
  position-normalized window hash is computed for every offset in two
  cumulative passes (cumsum of gear-mixed polynomial terms, cumprod of
  inverse powers), and per-document slices are cut afterwards. The
  position normalization (multiply by p^-i mod 2^64) makes the window
  hash a pure function of window CONTENT, so document boundaries need
  no per-document restart — the only Python-level loop is the greedy
  min/max boundary walk over the SPARSE candidate list (~len/avg_size
  entries per document).
- Dedup accounting offers both lanes: exact distinct-chunk counts for
  correctness, and ``approx_count_distinct`` (Spark's built-in HLL++)
  for the 100 TB estimate path where an exact distinct over ~10^12
  chunk hashes is an avoidable shuffle.

Determinism: the gear table is derived from fixed sha256 strings and
the boundary rule is a pure function of the bytes, so chunk tables are
identical across runs, partitionings, and batch groupings (the
batch-concatenation trick is invisible to results — asserted by
tests/test_cdc.py::test_batching_invariance).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Odd multiplier (2^64 golden ratio) -> invertible mod 2^64, so the
# position normalization below is exact integer arithmetic.
_P = 0x9E3779B97F4A7C15
_PINV = pow(_P, -1, 1 << 64)

# Default concatenated-buffer cap for the vectorized hash pass (see
# cdc_chunks): bounds per-task temporary memory at ~50x this value.
_DEFAULT_BUF_CAP = 8 << 20

# 256-entry byte-mixing table (the FastCDC "gear" idea): each byte maps
# to a full-width pseudorandom word so short windows still fill all 64
# hash bits. Derived from fixed sha256 strings — no RNG state.
_GEAR = np.frombuffer(
    b"".join(
        hashlib.sha256(b"rmlint-spark-cdc-gear-%d" % i).digest()[:8] for i in range(256)
    ),
    dtype="<u8",
).copy()


def _window_hashes(buf: np.ndarray, window: int) -> np.ndarray:
    """Position-normalized polynomial window hash for every offset.

    Returns H of length ``len(buf) - window + 1`` where ``H[i]`` is a
    pure function of ``buf[i:i+window]``:

        H[i] = (sum_{j=0}^{w-1} GEAR[buf[i+j]] * P^j)  mod 2^64

    computed in O(n) via prefix sums: with terms[j] = GEAR[buf[j]]*P^j
    and prefix[i] = sum(terms[:i]), the windowed difference equals
    P^i * H[i], and multiplying by PINV^i (P odd -> invertible mod
    2^64) recovers H[i] exactly. All arithmetic is uint64 wraparound —
    i.e. exact mod-2^64 integers, no floats anywhere.
    """
    n = len(buf)
    if n < window:
        return np.empty(0, dtype=np.uint64)
    g = _GEAR[buf]
    pw = np.full(n, _P, dtype=np.uint64)
    pw[0] = 1
    np.cumprod(pw, out=pw)  # pw[i] = P^i mod 2^64
    m = n - window + 1
    pinv = np.full(m, _PINV, dtype=np.uint64)
    pinv[0] = 1
    np.cumprod(pinv, out=pinv)  # pinv[i] = P^-i mod 2^64
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(g * pw, out=prefix[1:])
    return (prefix[window:] - prefix[:-window]) * pinv


def _greedy_boundaries(
    n: int, cands: np.ndarray, min_size: int, max_size: int
) -> list[tuple[int, int]]:
    """Walk sparse candidate cut offsets into (start, end) chunks.

    Every chunk is ``min_size <= len <= max_size`` except the final
    remainder (which may be shorter than min_size — the tail is always
    emitted so chunks partition the document exactly). A cut is forced
    at ``start + max_size`` when no candidate lands in the admissible
    range — the standard CDC max-size escape; forced cuts are the only
    non-content-defined boundaries and resynchronize at the next
    candidate."""
    out: list[tuple[int, int]] = []
    start, ci, nc = 0, 0, len(cands)
    while start < n:
        if n - start <= min_size:
            end = n
        else:
            lo = start + min_size
            hi = min(start + max_size, n)
            while ci < nc and cands[ci] < lo:
                ci += 1
            if ci < nc and cands[ci] <= hi:
                end = int(cands[ci])
                ci += 1
            elif n - start <= max_size:
                end = n
            else:
                end = start + max_size
        out.append((start, end))
        start = end
    return out


def chunk_document(
    data: bytes, window: int, avg_bits: int, min_size: int, max_size: int
) -> list[tuple[int, int]]:
    """Single-document CDC (the unbatched reference path; the Spark
    operator uses the batch-concatenated form of the same arithmetic).
    A candidate cut falls AFTER any window whose hash has its low
    ``avg_bits`` bits zero — expected spacing 2^avg_bits bytes."""
    buf = np.frombuffer(data, dtype=np.uint8)
    n = len(buf)
    if n == 0:
        return []
    H = _window_hashes(buf, window)
    mask = np.uint64((1 << avg_bits) - 1)
    cands = np.nonzero((H & mask) == 0)[0] + window
    return _greedy_boundaries(n, cands, min_size, max_size)


def cdc_chunks(
    docs: DataFrame,
    *,
    window: int = 48,
    avg_bits: int = 13,
    min_size: int | None = None,
    max_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_type: str = "long",
    buf_cap: int | None = None,
) -> DataFrame:
    """Chunk every document; returns the chunk relation
    (id, chunk_idx int, start long, length long, chunk_sha string).
    ``id_type`` is the Spark SQL type of ``id_col`` (e.g. ``"string"``
    when the key is a content sha, as in the incremental chunk store).

    Defaults follow the FastCDC paper's shape: 8 KiB average
    (``avg_bits=13``), min = avg/4, max = avg*4. ``start``/``length``
    are byte offsets into the UTF-8 encoding of ``text_col``;
    ``chunk_sha`` is sha256 of the chunk bytes (the same content-
    identity rule as the exact funnel's digest stage).

    One ``mapInPandas`` stage, no shuffle: each Arrow batch is chunked
    by concatenating its documents into a single buffer, computing the
    position-normalized window hash once for the whole buffer (see
    ``_window_hashes`` — normalization makes the hash content-pure, so
    windows need no per-document restart; windows that would straddle
    a document boundary are simply excluded by the per-document
    slicing), then walking each document's sparse candidate list.
    Results are independent of batch composition (test-asserted)."""
    avg = 1 << avg_bits
    mn = avg // 4 if min_size is None else min_size
    mx = avg * 4 if max_size is None else max_size
    if window < 1:
        raise ValueError(f"need window >= 1, got {window}")
    if not (0 < mn <= avg <= mx):
        raise ValueError(f"need 0 < min({mn}) <= avg({avg}) <= max({mx})")
    w = window
    mask = np.uint64((1 << avg_bits) - 1)
    out_schema = (
        f"{id_col} {id_type}, chunk_idx int, start long, length long, chunk_sha string"
    )
    id_dtype = "int64" if id_type in ("long", "bigint", "int", "integer") else "object"

    # The vectorized pass materializes ~40-50 bytes of uint64
    # temporaries per input byte (gear terms, power/inverse-power
    # cumprods, prefix sums, the windowed difference), so the
    # concatenated buffer is capped: documents group into sub-batches
    # of at most ``buf_cap`` total bytes (a single larger document still
    # processes whole — per-task peak is then ~50x the LARGEST document,
    # not 50x the Arrow batch). Grouping is invisible to results
    # (position normalization makes the hash content-pure; the batching
    # invariance test pins it).
    cap = _DEFAULT_BUF_CAP if buf_cap is None else buf_cap

    def _sub_batches(ids, raw):
        cur_i, cur_r, cur_bytes = [], [], 0
        for did, data in zip(ids, raw):
            if cur_r and cur_bytes + len(data) > cap:
                yield cur_i, cur_r
                cur_i, cur_r, cur_bytes = [], [], 0
            cur_i.append(did)
            cur_r.append(data)
            cur_bytes += len(data)
        if cur_r:
            yield cur_i, cur_r

    def _chunk_batches(batches):
        for pdf in batches:
            all_ids = pdf[id_col].tolist()
            all_raw = [(t or "").encode("utf-8") for t in pdf[text_col].tolist()]
            if not all_raw:
                continue
            for ids, raw in _sub_batches(all_ids, all_raw):
                yield _chunk_group(ids, raw)

    def _chunk_group(ids, raw):
        buf = np.frombuffer(b"".join(raw), dtype=np.uint8)
        H = _window_hashes(buf, w)
        is_cand = (H & mask) == 0 if len(H) else np.empty(0, dtype=bool)
        rows_id, rows_ix, rows_st, rows_ln, rows_sha = [], [], [], [], []
        off = 0
        for did, data in zip(ids, raw):
            n = len(data)
            if n == 0:
                off += n
                continue
            if n >= w:
                # windows fully inside this document: global starts
                # off .. off + n - w
                local = np.nonzero(is_cand[off : off + n - w + 1])[0] + w
            else:
                local = np.empty(0, dtype=np.int64)
            for ix, (s, e) in enumerate(
                _greedy_boundaries(n, local, mn, mx)
            ):
                rows_id.append(did)
                rows_ix.append(ix)
                rows_st.append(s)
                rows_ln.append(e - s)
                rows_sha.append(hashlib.sha256(data[s:e]).hexdigest())
            off += n
        return pd.DataFrame(
            {
                id_col: pd.Series(rows_id, dtype=id_dtype),
                "chunk_idx": pd.Series(rows_ix, dtype="int32"),
                "start": pd.Series(rows_st, dtype="int64"),
                "length": pd.Series(rows_ln, dtype="int64"),
                "chunk_sha": pd.Series(rows_sha, dtype="object"),
            }
        )

    return docs.select(id_col, text_col).mapInPandas(_chunk_batches, schema=out_schema)


def chunk_dedup_stats(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-chunk-content rollup: (chunk_sha, n_copies, n_docs,
    chunk_bytes). Equal sha256 implies equal bytes implies equal
    length, so ``min(length)`` is exact. Shuffles (sha, id, length)
    rows only."""
    return chunks.groupBy("chunk_sha").agg(
        F.count("*").alias("n_copies"),
        F.countDistinct(id_col).alias("n_docs"),
        F.min("length").alias("chunk_bytes"),
    )


def dedup_ratio(chunks: DataFrame) -> DataFrame:
    """One-row storage-dedup summary: total vs distinct chunks/bytes,
    plus the HLL++ estimate lane (``approx_distinct_chunks``) — at
    10^12 chunks the estimate answers "is dedup worth a pass?" without
    the exact-distinct shuffle. ``dedup_ratio`` = unique_bytes /
    total_bytes (1.0 = nothing shared)."""
    per_sha = chunks.groupBy("chunk_sha").agg(
        F.count("*").alias("n"), F.min("length").alias("length")
    )
    exact = per_sha.agg(
        F.count("*").alias("distinct_chunks"),
        F.sum("length").alias("unique_bytes"),
        F.sum(F.col("n") * F.col("length")).alias("total_bytes"),
        F.sum("n").alias("total_chunks"),
    )
    approx = chunks.agg(
        F.approx_count_distinct("chunk_sha").alias("approx_distinct_chunks")
    )
    return exact.crossJoin(approx).select(
        "total_chunks",
        "distinct_chunks",
        "approx_distinct_chunks",
        "total_bytes",
        "unique_bytes",
        (F.col("unique_bytes") / F.col("total_bytes")).alias("dedup_ratio"),
    )


def weighted_dedup_ratio(
    chunks: DataFrame, file_counts: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level storage-dedup summary when the chunk relation is
    keyed by DISTINCT content (the incremental store's economy) but
    each content backs ``n_files`` real files: chunk occurrence counts
    weight by their content's file multiplicity, so ``total_bytes`` is
    the corpus's physical footprint and ``dedup_ratio`` the fraction a
    chunk store would actually keep — whole-file duplication and
    sub-file sharing accounted in one number.

    ``file_counts`` is (id_col, n_files) — e.g.
    ``IncrementalDedup.signatures(...).groupBy("checksum").count()``
    renamed, composed with ``IncrementalChunkDedup.chunk_store(...)``.
    The join key is per-content (≤ distinct contents, far below file
    count) and the weighted rollup shuffles only (chunk_sha, n,
    length) rows."""
    weighted = chunks.join(file_counts, id_col).select(
        "chunk_sha", "length", F.col("n_files").cast("long").alias("n_files")
    )
    per_sha = weighted.groupBy("chunk_sha").agg(
        F.sum("n_files").alias("n"), F.min("length").alias("length")
    )
    return per_sha.agg(
        F.sum("n").alias("total_chunks"),
        F.count("*").alias("distinct_chunks"),
        F.sum(F.col("n") * F.col("length")).alias("total_bytes"),
        F.sum("length").alias("unique_bytes"),
    ).select(
        "total_chunks",
        "distinct_chunks",
        "total_bytes",
        "unique_bytes",
        (F.col("unique_bytes") / F.col("total_bytes")).alias("dedup_ratio"),
    )
