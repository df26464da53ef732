"""Content-defined chunking (operators/cdc.py).

Covers the four properties that make CDC trustworthy at scale:
hash-arithmetic exactness (vectorized == naive O(n*w) reference),
partition/size invariants, batch-composition invariance (the
concatenated-buffer trick is invisible to results), and the
RESYNCHRONIZATION property — the whole point of content-defined
boundaries: an inserted prefix shifts every byte offset yet the
chunk stream realigns, so shared regions dedup at any offset.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest

from rmlint_spark.operators.cdc import (
    _GEAR,
    _P,
    _window_hashes,
    cdc_chunks,
    chunk_dedup_stats,
    chunk_document,
    dedup_ratio,
)

W, AVG_BITS, MIN, MAX = 16, 5, 16, 128  # small params for small texts


def _text(seed: int, n: int) -> str:
    rng = random.Random(seed)
    return "".join(rng.choice("abcdefghij klmnopqrstuvwxyz.") for _ in range(n))


def test_window_hash_matches_naive_reference():
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(400))
    buf = np.frombuffer(data, dtype=np.uint8)
    H = _window_hashes(buf, W)
    assert len(H) == len(data) - W + 1
    mod = 1 << 64
    for i in (0, 1, 17, 100, len(H) - 1):
        expect = sum(int(_GEAR[data[i + j]]) * pow(_P, j, mod) for j in range(W)) % mod
        assert int(H[i]) == expect, f"offset {i}"


def test_chunks_partition_and_respect_bounds():
    data = _text(3, 5000).encode()
    spans = chunk_document(data, W, AVG_BITS, MIN, MAX)
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for (s0, e0), (s1, _) in zip(spans, spans[1:]):
        assert e0 == s1
    for s, e in spans[:-1]:
        assert MIN <= e - s <= MAX
    s, e = spans[-1]
    assert 0 < e - s <= MAX
    # content-defined cutting actually fired (not all max-size escapes)
    assert len({e - s for s, e in spans}) > 1


def test_short_and_empty_documents():
    assert chunk_document(b"", W, AVG_BITS, MIN, MAX) == []
    assert chunk_document(b"tiny", W, AVG_BITS, MIN, MAX) == [(0, 4)]


def test_insertion_resynchronizes():
    base = _text(11, 4000).encode()
    shifted = _text(99, 137).encode() + base  # arbitrary-length prefix
    sha = lambda d, s, e: hashlib.sha256(d[s:e]).hexdigest()
    c1 = [sha(base, s, e) for s, e in chunk_document(base, W, AVG_BITS, MIN, MAX)]
    c2 = [sha(shifted, s, e) for s, e in chunk_document(shifted, W, AVG_BITS, MIN, MAX)]
    # common suffix of the two chunk-sha streams
    k = 0
    while k < min(len(c1), len(c2)) and c1[-1 - k] == c2[-1 - k]:
        k += 1
    # realigned for at least 80% of the base's chunks: every boundary
    # past the perturbation's resync horizon is identical
    assert k >= 0.8 * len(c1), (k, len(c1))
    resync_bytes = sum(
        e - s for s, e in chunk_document(base, W, AVG_BITS, MIN, MAX)[: len(c1) - k]
    )
    assert resync_bytes <= 4 * MAX  # perturbation stays local


def test_spark_matches_single_doc_path_and_batching_invariance(spark):
    docs = [(i, _text(i, 200 + 37 * i)) for i in range(25)] + [(98, ""), (99, "x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cdc_chunks(
        df, window=W, avg_bits=AVG_BITS, min_size=MIN, max_size=MAX
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.start, r.length, r.chunk_sha))
    for did, text in docs:
        data = text.encode()
        spans = chunk_document(data, W, AVG_BITS, MIN, MAX)
        expect = [
            (ix, s, e - s, hashlib.sha256(data[s:e]).hexdigest())
            for ix, (s, e) in enumerate(spans)
        ]
        assert sorted(got.get(did, [])) == expect, f"doc {did}"
    # repartitioning (different batch composition) changes nothing
    out2 = cdc_chunks(
        df.repartition(7), window=W, avg_bits=AVG_BITS, min_size=MIN, max_size=MAX
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_cross_doc_shared_region_dedups_at_different_offsets(spark):
    boiler = _text(555, 900)
    docs = [
        (1, _text(1, 300) + boiler + _text(2, 100)),
        (2, _text(3, 751) + boiler),  # same region, different offset
        (3, _text(4, 1200)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    chunks = cdc_chunks(df, window=W, avg_bits=AVG_BITS, min_size=MIN, max_size=MAX)
    stats = chunk_dedup_stats(chunks)
    shared = stats.filter("n_docs >= 2").collect()
    # interior chunks of the shared region are identical despite the
    # offset shift — several avg-size chunks fit in 900 bytes
    assert len(shared) >= 3, shared
    ratio = dedup_ratio(chunks).collect()[0]
    assert ratio.total_bytes == sum(len(t.encode()) for _, t in docs)
    assert ratio.unique_bytes < ratio.total_bytes
    assert ratio.total_chunks > ratio.distinct_chunks
    assert 0 < ratio.dedup_ratio < 1
    # HLL lane within its error bar
    assert abs(ratio.approx_distinct_chunks - ratio.distinct_chunks) <= max(
        3, 0.1 * ratio.distinct_chunks
    )


def test_chunk_stage_is_map_side(spark):
    df = spark.createDataFrame([(1, "abc" * 200)], "doc_id long, text string")
    plan = (
        cdc_chunks(df, window=W, avg_bits=AVG_BITS, min_size=MIN, max_size=MAX)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_invalid_size_ordering_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc_chunks(df, window=W, avg_bits=5, min_size=64, max_size=16)


# -- property-based coverage (pure kernel, no Spark) ------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.binary(min_size=0, max_size=3000),
    st.integers(4, 24),
    st.integers(3, 7),
)
def test_chunking_invariants_hold_for_any_input(data, window, avg_bits):
    mn = max(4, 1 << (avg_bits - 2))
    mx = 1 << (avg_bits + 2)
    spans = chunk_document(data, window, avg_bits, mn, mx)
    if not data:
        assert spans == []
        return
    # exact partition of the byte range, in order
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    assert all(e0 == s1 for (_, e0), (s1, _) in zip(spans, spans[1:]))
    # every chunk bounded above; all but the tail bounded below
    assert all(0 < e - s <= mx for s, e in spans)
    assert all(e - s >= mn for s, e in spans[:-1])
    # deterministic (same bytes -> same cuts)
    assert spans == chunk_document(data, window, avg_bits, mn, mx)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=50, max_size=1500), st.binary(min_size=0, max_size=200))
def test_shared_suffix_chunks_realign_eventually(base, prefix):
    # appending any prefix leaves the tail chunk identical once both
    # streams resync — weaker than the seeded 80% assertion above but
    # universally quantified: the FINAL chunk end always coincides,
    # and if both partitions contain a cut at the same content offset,
    # everything after it is byte-identical.
    w, ab = 8, 4
    mn, mx = 4, 64
    c1 = chunk_document(base, w, ab, mn, mx)
    c2 = chunk_document(prefix + base, w, ab, mn, mx)
    d = len(prefix)
    cuts1 = {e for _, e in c1}
    cuts2 = {e - d for _, e in c2 if e - d > 0}
    shared = sorted(cuts1 & cuts2)
    assert shared, "streams never realign even at the document end"
    first = shared[0]
    # after the first shared cut, the chunkings are identical
    tail1 = [(s, e) for s, e in c1 if s >= first]
    tail2 = [(s - d, e - d) for s, e in c2 if s - d >= first]
    assert tail1 == tail2


def test_buffer_cap_grouping_is_invisible(spark):
    """Forcing one-doc sub-batches via buf_cap
    changes nothing — the memory bound is pure batching policy."""

    docs = [(i, _text(100 + i, 300)) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string").coalesce(1)
    kw = dict(window=W, avg_bits=AVG_BITS, min_size=MIN, max_size=MAX)
    base = sorted(map(tuple, cdc_chunks(df, **kw).collect()))
    # 64 bytes is far below one document: every doc becomes its own
    # sub-batch, exercising the single-doc-over-cap branch
    capped = sorted(map(tuple, cdc_chunks(df, buf_cap=64, **kw).collect()))
    assert base == capped
