"""H.264 multi-reference P prediction: te(v) / ue(v) / CABAC-unary
ref_idx_l0 syntax, refIdx-keyed MV prediction (8.4.1.3.1), the
P_Skip ref-0 condition, flicker-corpus compression wins in both
entropy lanes, and the DPB-general L0 list (r5 s17: up to 16 active
references decode, the encoder subset emits up to 4).  Closes the
"multi-reference prediction" refusal of the video family.

Reference parity note: rmlint hashes media as opaque bytes
(lib/checksum.c); this lane serves the multimodal training-data
corpus — the same frames coded with 1 or 2 references decode to
equivalent pixels, so cross-container frame dedup spans
multi-reference streams too.
"""

from __future__ import annotations

import numpy as np
import pytest

from rmlint_spark.operators.flac import _BitReader, _BitWriter
from rmlint_spark.operators.h264 import decode_h264
from rmlint_spark.operators.h264_cabac_p import encode_h264_cabac_p
from rmlint_spark.operators.h264_inter import (
    InterPicture,
    _read_te1,
    _write_te1,
    encode_h264_p,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64)
                         - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _scenes(h: int = 48, w: int = 64):
    yy, xx = np.mgrid[0:h, 0:w]
    a = np.stack([(xx * 3 + yy * 2) % 256, (xx + yy * 4) % 256,
                  (xx * 2 + 128) % 256], -1).astype(np.uint8)
    b = np.stack([((255 - xx) * 2 + yy) % 256, (yy * 3) % 256,
                  (xx + yy) % 256], -1).astype(np.uint8)
    return a, b


def _flicker(n: int = 9):
    """Alternating scenes with slight per-pair evolution: frame t
    resembles t-2 far better than t-1 — the multi-ref use case."""
    a, b = _scenes()
    return [np.roll(a if i % 2 == 0 else b, i // 2, axis=1)
            for i in range(n)]


def test_te1_inversion_pinned():
    """te(v) with range 0..1 is one INVERTED bit (9.1.1)."""
    w = _BitWriter()
    _write_te1(w, 0)
    _write_te1(w, 1)
    w.pad_to_byte()
    assert w.bytes()[0] >> 6 == 0b10        # ref 0 -> '1', ref 1 -> '0'
    r = _BitReader(w.bytes())
    assert _read_te1(r) == 0
    assert _read_te1(r) == 1


def test_mv_pred_match_keyed_by_refidx():
    """8.4.1.3.1: the exactly-one-match shortcut counts only
    neighbors predicting from the SAME reference, while the median
    fallback uses every inter neighbor's motion."""
    flat = (np.zeros((48, 48), np.uint8), np.zeros((24, 24), np.uint8),
            np.zeros((24, 24), np.uint8))
    pic = InterPicture(np.zeros((48, 48), np.uint8),
                       np.zeros((24, 24), np.uint8),
                       np.zeros((24, 24), np.uint8), 3, 3, flat, flat)
    pic.n_ref0 = 2
    # A (left of MB 1,1) inter ref 1 mv (4,4); B (above) inter ref 0
    # mv (8,8); C (above-right) inter ref 0 mv (12,12)
    pic._commit_part(4, 0, 4, 4, (4, 4), ref=1)     # MB (1,0)
    pic._commit_part(0, 4, 4, 4, (8, 8), ref=0)     # MB (0,1)
    pic._commit_part(0, 8, 4, 4, (12, 12), ref=0)   # MB (0,2)
    # predicting for ref 1: exactly one neighbor (A) matches -> its mv
    assert pic._mv_pred(1, 1, ref=1) == (4, 4)
    # predicting for ref 0: two matches -> median over ALL inter mvs
    assert pic._mv_pred(1, 1, ref=0) == (8, 8)


def test_skip_condition_requires_ref0():
    """8.4.1.1: a zero-motion neighbor forces the zero skip MV only
    when it predicts from reference 0."""
    flat = (np.zeros((48, 48), np.uint8), np.zeros((24, 24), np.uint8),
            np.zeros((24, 24), np.uint8))
    pic = InterPicture(np.zeros((48, 48), np.uint8),
                       np.zeros((24, 24), np.uint8),
                       np.zeros((24, 24), np.uint8), 3, 3, flat, flat)
    pic.n_ref0 = 2
    # both neighbors inter, zero motion, but from ref 1
    pic._commit_part(4, 0, 4, 4, (0, 0), ref=1)     # A of MB (1,1)
    pic._commit_part(0, 4, 4, 4, (6, 2), ref=0)     # B of MB (1,1)
    # ref-1 zero neighbor does NOT trigger the zero override: the
    # median path runs (A=(0,0), B=(6,2), C from D fallback=(0,0))
    assert pic._skip_mv(1, 1) != (0, 0) or pic._mv_pred(1, 1) == (0, 0)
    # flip A to ref 0 zero motion -> forced zero
    pic._commit_part(4, 0, 4, 4, (0, 0), ref=0)
    assert pic._skip_mv(1, 1) == (0, 0)


@pytest.mark.parametrize("enc", [encode_h264_p, encode_h264_cabac_p],
                         ids=["cavlc", "cabac"])
def test_flicker_multiref_compression_win(enc):
    """Two references on the flicker corpus: >= 1.8x smaller stream
    at the same decoded quality, in both entropy lanes."""
    flick = _flicker()
    e1 = enc(flick, gop=9, qp=12, refs=1)
    e2 = enc(flick, gop=9, qp=12, refs=2)
    d1 = decode_h264(e1)[1]
    d2 = decode_h264(e2)[1]
    p1 = min(_psnr(a, b) for a, b in zip(flick, d1))
    p2 = min(_psnr(a, b) for a, b in zip(flick, d2))
    assert len(e2) * 1.8 <= len(e1)
    assert p2 >= p1 - 0.3 and p2 >= 28.0


def test_multiref_cross_entropy_pixel_identity():
    """Both entropy lanes make the same multi-ref decisions on the
    flicker corpus (no intra fallback fires), so decoded pixels are
    identical — the family's cross-entropy invariant extended."""
    flick = _flicker(7)
    e_cavlc = encode_h264_p(flick, gop=7, qp=12, refs=2)
    e_cabac = encode_h264_cabac_p(flick, gop=7, qp=12, refs=2)
    d1 = decode_h264(e_cavlc)[1]
    d2 = decode_h264(e_cabac)[1]
    assert all((a == b).all() for a, b in zip(d1, d2))


def test_multiref_with_partitions_and_gop_boundaries():
    """refs=2 composes with the partition lanes and IDR DPB flushes:
    a multi-segment stream (second GOP's first P has ONE reference)
    round-trips in both entropy lanes."""
    flick = _flicker(10)
    for enc in (encode_h264_p, encode_h264_cabac_p):
        e = enc(flick, gop=5, qp=12, refs=2, partitions=True)
        d = decode_h264(e)[1]
        assert len(d) == 10
        assert min(_psnr(a, b) for a, b in zip(flick, d)) >= 28.0


def test_multiref_with_weighted_prediction():
    """refs=2 + wp=True: the pred_weight_table carries one entry per
    active reference and each ref weights with its own entry — a
    fading flicker exercises both mechanisms at once."""
    flick = [np.clip(f.astype(np.float64) * (1 - 0.06 * i), 0,
                     255).astype(np.uint8)
             for i, f in enumerate(_flicker(8))]
    e = encode_h264_p(flick, gop=8, qp=12, refs=2, wp=True)
    e_plain = encode_h264_p(flick, gop=8, qp=12)
    d = decode_h264(e)[1]
    assert min(_psnr(a, b) for a, b in zip(flick, d)) >= 28.0
    assert len(e) < len(e_plain)


def _flicker3(n: int = 13):
    """Period-3 scene cycle with slight per-cycle evolution: frame t
    resembles t-3 far better than t-1 or t-2 — the refIdx-2 use case
    (needs a 3-deep DPB to win)."""
    a, b = _scenes()
    c = np.roll(a[..., [1, 2, 0]], 13, axis=0)  # smooth, far from a & b
    cyc = [a, b, c.astype(np.uint8)]
    return [np.roll(cyc[i % 3], i // 3, axis=1) for i in range(n)]


def test_ref_l0_syntax_regimes_pinned():
    """_write_ref_l0/_read_ref_l0 mirror te(v) (9.1.1): absent at 1
    active ref, one inverted bit at 2, plain ue(v) beyond — and an
    out-of-range index refuses at read."""
    from rmlint_spark.operators.h264 import _write_ue

    flat = (np.zeros((48, 48), np.uint8), np.zeros((24, 24), np.uint8),
            np.zeros((24, 24), np.uint8))
    pic = InterPicture(np.zeros((48, 48), np.uint8),
                       np.zeros((24, 24), np.uint8),
                       np.zeros((24, 24), np.uint8), 3, 3, flat, flat,
                       more=[flat, flat])
    for n_ref0, vals in ((1, [0]), (2, [0, 1]), (3, [0, 1, 2]),
                         (4, [3, 0, 2, 1])):
        pic.n_ref0 = n_ref0
        w = _BitWriter()
        for v in vals:
            pic._write_ref_l0(w, v)
        w.write(1, 1)                   # stop marker for n_ref0 == 1
        w.pad_to_byte()
        r = _BitReader(w.bytes())
        assert [pic._read_ref_l0(r) for _ in vals] == vals
    # ue(v) value at/above the active count refuses
    pic.n_ref0 = 3
    w = _BitWriter()
    _write_ue(w, 3)
    w.pad_to_byte()
    with pytest.raises(ValueError, match="beyond num_ref_idx"):
        pic._read_ref_l0(_BitReader(w.bytes()))


@pytest.mark.parametrize("enc", [encode_h264_p, encode_h264_cabac_p],
                         ids=["cavlc", "cabac"])
def test_period3_flicker_three_refs_win(enc):
    """Three references on the period-3 corpus: the ue(v)/unary bin-2
    syntax carries refIdx 2 and the stream shrinks >= 1.5x vs refs=2
    at the same decoded quality."""
    flick = _flicker3()
    e2 = enc(flick, gop=13, qp=12, refs=2)
    e3 = enc(flick, gop=13, qp=12, refs=3)
    d2 = decode_h264(e2)[1]
    d3 = decode_h264(e3)[1]
    p2 = min(_psnr(a, b) for a, b in zip(flick, d2))
    p3 = min(_psnr(a, b) for a, b in zip(flick, d3))
    assert len(e3) * 1.5 <= len(e2)
    assert p3 >= p2 - 0.3 and p3 >= 26.0


def test_four_refs_cross_entropy_pixel_identity():
    """refs=4 (the full encoder subset; DPB ramps 1->4 within the
    GOP): both entropy lanes decode pixel-identically, partitions
    composed in."""
    flick = _flicker3(9)
    e_cavlc = encode_h264_p(flick, gop=9, qp=12, refs=4,
                            partitions=True)
    e_cabac = encode_h264_cabac_p(flick, gop=9, qp=12, refs=4,
                                  partitions=True)
    d1 = decode_h264(e_cavlc)[1]
    d2 = decode_h264(e_cabac)[1]
    assert len(d1) == 9
    assert all((a == b).all() for a, b in zip(d1, d2))
    assert min(_psnr(a, b) for a, b in zip(flick, d1)) >= 26.0


def test_three_refs_with_weighted_prediction():
    """refs=3 + wp: pred_weight_table carries one entry per active
    reference (l0 + two l0x extras) and the fading period-3 corpus
    still clears the quality bar."""
    flick = [np.clip(f.astype(np.float64) * (1 - 0.05 * i), 0,
                     255).astype(np.uint8)
             for i, f in enumerate(_flicker3(8))]
    e = encode_h264_p(flick, gop=8, qp=12, refs=3, wp=True)
    d = decode_h264(e)[1]
    assert min(_psnr(a, b) for a, b in zip(flick, d)) >= 26.0


def test_refs_beyond_subset_refused():
    with pytest.raises(ValueError, match="refs must be 1..4"):
        encode_h264_p(_flicker(3), refs=5)
    with pytest.raises(ValueError, match="refs must be 1..4"):
        encode_h264_cabac_p(_flicker(3), refs=0)
    # a crafted P slice activating 17 L0 refs (7.4.3 caps frame
    # coding at 16) refuses at header parse
    from rmlint_spark.operators.h264 import (
        _escape_rbsp,
        _trailing_bits,
        _write_ue,
    )

    a, _ = _scenes(32, 32)
    base = encode_h264_p([a], qp=12)        # IDR only
    w = _BitWriter()
    _write_ue(w, 0)                 # first_mb
    _write_ue(w, 5)                 # slice_type P
    _write_ue(w, 0)                 # pps id
    w.write(1, 4)                   # frame_num
    w.write(1, 1)                   # num_ref_idx_active_override
    _write_ue(w, 16)                # l0_active_minus1 = 16 -> 17 refs
    _trailing_bits(w)
    payload = base + b"\x00\x00\x00\x01\x41" + _escape_rbsp(w.bytes())
    with pytest.raises(ValueError, match="out of the spec range"):
        decode_h264(payload)


def test_slice_activating_more_refs_than_decoded_refused():
    """A first-P slice claiming 2 active references when only the IDR
    exists must refuse rather than read a missing plane."""
    from rmlint_spark.operators.h264 import (
        _encode_pps,
        _encode_sps,
        _escape_rbsp,
        _trailing_bits,
        _write_se,
        _write_ue,
    )

    a, _ = _scenes(32, 32)
    base = encode_h264_p([a], qp=12)        # IDR only
    w = _BitWriter()
    _write_ue(w, 0)                 # first_mb
    _write_ue(w, 5)                 # slice_type P
    _write_ue(w, 0)                 # pps id
    w.write(1, 4)                   # frame_num
    w.write(1, 1)                   # override
    _write_ue(w, 1)                 # l0_active_minus1 = 1 -> 2 refs
    w.write(0, 1)                   # ref_pic_list_modification_l0
    w.write(0, 1)                   # adaptive_ref_pic_marking
    _write_se(w, 12 - 26)           # slice_qp_delta
    _write_ue(w, 1)                 # disable_deblocking_filter_idc (r5 s18)
    _write_ue(w, 0)                 # mb_skip_run = 0 (then stop bit)
    _trailing_bits(w)
    payload = base + b"\x00\x00\x00\x01\x41" + _escape_rbsp(w.bytes())
    with pytest.raises(ValueError, match="more references"):
        decode_h264(payload)
