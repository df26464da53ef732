"""H.264 CABAC B slices (operators/h264_cabac_b): arithmetic-entropy
bi-predictive GOPs — round-trip, cross-lane reconstruction identity,
compression vs the CAVLC B lane, skip behavior, refusals, fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from rmlint_spark.operators.h264 import _H264Layout, decode_h264
from rmlint_spark.operators.h264_b import encode_h264_b
from rmlint_spark.operators.h264_cabac_b import encode_h264_cabac_b


def _luma(fr: np.ndarray) -> np.ndarray:
    return 0.299 * fr[..., 0] + 0.587 * fr[..., 1] + 0.114 * fr[..., 2]


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((_luma(a) - _luma(b)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient_frames(n: int, h: int = 32, w: int = 48) -> list:
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.stack([(yy * 3 + xx * 2 + i * 7) % 256,
                      (yy * 2 + xx * 5 + i * 3) % 256,
                      (yy + xx + i * 11) % 256],
                     axis=-1).astype(np.uint8) for i in range(n)]


def test_cabac_b_roundtrip_and_order():
    frames = _gradient_frames(8)
    enc = encode_h264_cabac_b(frames, qp=8, bgroup=2, seg=8)
    lay = _H264Layout(enc)
    assert lay.kinds == ["I", "P", "B", "B", "P", "B", "B", "P"]
    _, dec = decode_h264(enc)
    for src, out in zip(frames, dec):
        assert _psnr(src, out) > 40.0


def test_cabac_b_reconstruction_identical_to_cavlc_b():
    """Both lanes share prediction/quantization and differ only in
    entropy coding, so decoded pixels must be IDENTICAL — the
    cross-entropy-mode invariant the P lanes already pin."""
    frames = _gradient_frames(7)
    _, dec_cavlc = decode_h264(encode_h264_b(frames, qp=12, bgroup=2,
                                             seg=7))
    _, dec_cabac = decode_h264(encode_h264_cabac_b(frames, qp=12,
                                                   bgroup=2, seg=7))
    for a, b in zip(dec_cavlc, dec_cabac):
        assert np.array_equal(a, b)


def test_cabac_b_smaller_than_cavlc_b():
    frames = _gradient_frames(8)
    cavlc = encode_h264_b(frames, qp=10, bgroup=2, seg=8)
    cabac = encode_h264_cabac_b(frames, qp=10, bgroup=2, seg=8)
    assert len(cabac) < len(cavlc)


def test_cabac_b_static_scene_skips():
    fr = _gradient_frames(1)[0]
    frames = [fr.copy() for _ in range(7)]
    enc = encode_h264_cabac_b(frames, qp=16, bgroup=2, seg=7)
    one = encode_h264_cabac_b(frames[:1], qp=16)
    # each of the six inter frames costs only its slice header plus
    # per-MB skip bins and end_of_slice terminates (~25 bytes here)
    assert len(enc) - len(one) < 6 * 40
    _, dec = decode_h264(enc)
    for out in dec:
        assert _psnr(fr, out) > 40.0


def test_cabac_b_mb_type_tree_complete():
    """The full Table 9-37 tree (incl. the r5 s17 partition family)
    and the Table 9-38 B sub_mb_type codes round-trip through the
    arithmetic engine: every legal value encodes then decodes back
    to itself (the two irregular short codes — mb_type 11 '111110'
    and B_8x8 '111111' — and the intra escape included)."""
    from rmlint_spark.operators.flac import _BitReader, _BitWriter
    from rmlint_spark.operators.h264_cabac import (CabacDecoder,
                                                   CabacEncoder)
    from rmlint_spark.operators.h264_cabac_b import CabacBInterPicture

    y = np.zeros((32, 32), dtype=np.uint8)
    u = np.zeros((16, 16), dtype=np.uint8)
    v = np.zeros((16, 16), dtype=np.uint8)
    zero = (np.zeros_like(y), np.zeros_like(u), np.zeros_like(v))
    col = (np.zeros((8, 8, 2), dtype=np.int64),
           np.ones((2, 2), dtype=np.int64))

    values = list(range(23)) + [-1]          # mb_types + intra escape
    pic = CabacBInterPicture(y.copy(), u.copy(), v.copy(), 2, 2,
                             zero, zero, col)
    pic.qp = 16
    w = _BitWriter()
    enc = CabacEncoder(w)
    for v_ in values:
        pic._enc_b_mb_type(enc, 0, 0, v_)
    for st in range(13):
        pic._enc_b_sub_type(enc, st)
    enc.terminate(1)
    w.pad_to_byte()

    pic2 = CabacBInterPicture(y.copy(), u.copy(), v.copy(), 2, 2,
                              zero, zero, col)
    pic2.qp = 16
    pic2.new_slice()
    dec = CabacDecoder(_BitReader(w.bytes()))
    got = [pic2._dec_b_mb_type(dec, 0, 0) for _ in values]
    got_sub = [pic2._dec_b_sub_type(dec) for _ in range(13)]
    assert got == values
    assert got_sub == list(range(13))


def test_cabac_b_bitflip_fuzz_bounded():
    frames = _gradient_frames(6)
    enc = bytearray(encode_h264_cabac_b(frames, qp=10, bgroup=2,
                                        seg=6))
    rng = np.random.default_rng(43)
    allowed = (ValueError, NotImplementedError)
    bad = 0
    for _ in range(120):
        mut = bytearray(enc)
        pos = int(rng.integers(5, len(mut)))
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_h264(bytes(mut))
        except allowed:
            bad += 1
    assert bad > 0
