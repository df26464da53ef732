"""H.264 B-slice codec (operators/h264_b): bi-predictive GOP
round-trips, POC display reordering, spatial-direct/B_Skip behavior,
random access, compression sanity, and the refusal boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from rmlint_spark.operators.h264 import (
    _encode_pps,
    _encode_sps,
    _escape_rbsp,
    _H264Layout,
    _trailing_bits,
    _write_se,
    _write_ue,
    decode_h264,
    parse_h264,
)
from rmlint_spark.operators.h264_b import encode_h264_b
from rmlint_spark.operators.flac import _BitWriter


def _luma(fr: np.ndarray) -> np.ndarray:
    return (0.299 * fr[..., 0] + 0.587 * fr[..., 1]
            + 0.114 * fr[..., 2])


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((_luma(a) - _luma(b)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient_frames(n: int, h: int = 32, w: int = 48) -> list:
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.stack([(yy * 3 + xx * 2 + i * 7) % 256,
                      (yy * 2 + xx * 5 + i * 3) % 256,
                      (yy + xx + i * 11) % 256],
                     axis=-1).astype(np.uint8) for i in range(n)]


def test_b_gop_roundtrip_and_display_order():
    frames = _gradient_frames(8)
    enc = encode_h264_b(frames, qp=8, bgroup=2, seg=8)
    info = parse_h264(enc)
    assert info["n_frames"] == 8 and info["width"] == 48
    _, dec = decode_h264(enc)
    assert len(dec) == 8
    # per-display-index PSNR: a reorder bug would pair moving frames
    # with the wrong source and crater the match
    for src, out in zip(frames, dec):
        assert _psnr(src, out) > 40.0


def test_decode_display_permutation_is_poc_order():
    frames = _gradient_frames(8)
    enc = encode_h264_b(frames, qp=8, bgroup=2, seg=8)
    lay = _H264Layout(enc)
    # anchors at display 0,3,6,7; decode order [0,3,1,2,6,4,5,7];
    # _display maps display index -> decode index
    assert lay.kinds == ["I", "P", "B", "B", "P", "B", "B", "P"]
    assert lay.is_ref == [True, True, False, False, True, False,
                          False, True]
    assert lay._display == [0, 2, 3, 1, 5, 6, 4, 7]


def test_static_scene_codes_as_skips():
    fr = _gradient_frames(1)[0]
    frames = [fr.copy() for _ in range(7)]
    enc_b = encode_h264_b(frames, qp=16, bgroup=2, seg=7)
    enc_one = encode_h264_b(frames[:1], qp=16)
    # six identical inter frames ride almost entirely on B_Skip /
    # P_Skip runs: the whole tail costs a tiny fraction of the IDR
    assert len(enc_b) - len(enc_one) < len(enc_one) // 4
    _, dec = decode_h264(enc_b)
    for out in dec:
        assert _psnr(fr, out) > 40.0


def test_crossfade_prefers_bi_prediction():
    """A crossfade frame is the average of its anchors — exactly what
    default bi-prediction reconstructs — so a B-coded crossfade must
    beat coding the same frames as a P-only chain."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    mid = ((a.astype(np.int64) + b.astype(np.int64) + 1) // 2).astype(
        np.uint8)
    frames = [a, mid, b]
    enc_bi = encode_h264_b(frames, qp=12, bgroup=1, seg=3)
    enc_p = encode_h264_b(frames, qp=12, bgroup=0, seg=3)
    assert len(enc_bi) < len(enc_p)
    _, dec = decode_h264(enc_bi)
    assert _psnr(mid, dec[1]) > 35.0


def test_multi_segment_closed_gops_random_access():
    frames = _gradient_frames(10)
    enc = encode_h264_b(frames, qp=8, bgroup=2, seg=5)
    lay = _H264Layout(enc)
    # two segments, each opening with an IDR; B never spans the IDR
    assert lay.kinds.count("I") == 2
    # random access into the middle of segment 2 must decode without
    # touching segment 1 and match the full sequential decode
    _, full = decode_h264(enc)
    lay2 = _H264Layout(enc)
    got = lay2.frame_at(8)
    assert np.array_equal(got, full[8])
    # the prefix walk stopped at the segment-2 IDR (decode index 5)
    assert min(lay2._cache) >= 5
    for i, src in enumerate(frames):
        assert _psnr(src, full[i]) > 40.0


def test_bgroup_zero_is_plain_p_gop():
    frames = _gradient_frames(5)
    enc = encode_h264_b(frames, qp=8, bgroup=0, seg=5)
    lay = _H264Layout(enc)
    assert lay.kinds == ["I", "P", "P", "P", "P"]
    _, dec = decode_h264(enc)
    for src, out in zip(frames, dec):
        assert _psnr(src, out) > 40.0


def _craft_b_slice_stream(pps_rbsp: bytes, direct_flag: int = 1,
                          sps_rbsp: bytes | None = None,
                          cabac: bool = False) -> bytes:
    w = _BitWriter()
    _write_ue(w, 0)                 # first_mb
    _write_ue(w, 6)                 # slice_type B
    _write_ue(w, 0)                 # pps id
    w.write(0, 4)                   # frame_num
    w.write(0, 8)                   # poc lsb
    w.write(direct_flag, 1)
    w.write(0, 1)                   # override
    w.write(0, 1)                   # list mod l0
    w.write(0, 1)                   # list mod l1
    if cabac:
        _write_ue(w, 0)             # cabac_init_idc
    _write_se(w, 0)                 # slice_qp_delta
    _write_ue(w, 1)                 # disable_deblocking_filter_idc (r5 s18)
    _trailing_bits(w)
    sps = sps_rbsp if sps_rbsp is not None else _encode_sps(
        2, 2, 32, 32, (25, 1), num_ref_frames=2, poc_type=0)
    return (b"\x00\x00\x00\x01\x67" + _escape_rbsp(sps)
            + b"\x00\x00\x00\x01\x68" + _escape_rbsp(pps_rbsp)
            + b"\x00\x00\x00\x01\x01" + _escape_rbsp(w.bytes()))


def test_temporal_direct_accepted_at_header_level():
    # temporal direct decodes since r5 s10 (h264_b._direct_mv_temporal):
    # the crafted ref-less stream must now fail on the MISSING
    # REFERENCES, not on the direct-mode flag
    payload = _craft_b_slice_stream(_encode_pps(), direct_flag=0)
    with pytest.raises(ValueError, match="past or future"):
        decode_h264(payload)


def test_cabac_b_slice_accepted_at_entropy_level():
    # CABAC B decodes since r5 s8 (h264_cabac_b.py): the crafted
    # ref-less stream must now fail on the MISSING REFERENCES, not on
    # the entropy mode
    payload = _craft_b_slice_stream(_encode_pps(entropy_coding=1),
                                    cabac=True)
    with pytest.raises(ValueError, match="past or future"):
        decode_h264(payload)


def test_b_picture_without_future_reference_refused():
    # a lone IDR followed by a B picture whose POC is PAST both
    # anchors: only one reference exists, no future anchor
    payload = _craft_b_slice_stream(_encode_pps())
    with pytest.raises(ValueError, match="past or future"):
        decode_h264(payload)


def test_b_invalid_sub_mb_type_refused():
    # mb_types 4..22 DECODE since the sub-16x16 B partition lanes
    # (r5 s17); the remaining grammar gate is Table 7-18's range —
    # a B_8x8 whose sub_mb_type exceeds 12 must refuse, not wrap
    from rmlint_spark.operators.h264_b import BInterPicture
    from rmlint_spark.operators.flac import _BitReader

    y = np.zeros((32, 32), dtype=np.uint8)
    u = np.zeros((16, 16), dtype=np.uint8)
    v = np.zeros((16, 16), dtype=np.uint8)
    zero = (np.zeros_like(y), np.zeros_like(u), np.zeros_like(v))
    # colocated grid at 4x4-block granularity (2x2 MBs = 8x8 blocks)
    col = (np.zeros((8, 8, 2), dtype=np.int64),
           np.ones((2, 2), dtype=np.int64))
    pic = BInterPicture(y, u, v, 2, 2, zero, zero, col)
    pic.qp = 16
    w = _BitWriter()
    _write_ue(w, 0)                 # mb_skip_run
    _write_ue(w, 22)                # B_8x8
    _write_ue(w, 13)                # sub_mb_type out of Table 7-18
    for _ in range(3):
        _write_ue(w, 0)             # remaining quadrants direct
    w.write(0xFFFF, 16)
    covered = np.zeros(4, dtype=bool)
    with pytest.raises(ValueError, match="sub_mb_type"):
        pic.decode_slice_b(_BitReader(w.bytes()), 0, covered)


def test_b_stream_bitflip_fuzz_bounded():
    """Seeded bit flips over a B stream must raise only the documented
    error types (or decode) — never crash outside the contract."""
    frames = _gradient_frames(6)
    enc = bytearray(encode_h264_b(frames, qp=10, bgroup=2, seg=6))
    rng = np.random.default_rng(42)
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
        # IndexError/struct errors etc. would propagate and fail
    assert bad > 0                  # the corpus does exercise refusals


def test_mp4_b_bridge_ctts_roundtrip():
    """codec='b'/'cabac_b' MP4s: samples in decode order, ctts carries
    the display reordering, and the extracted Annex-B decodes to the
    source frames in display order."""
    from rmlint_spark.operators.mp4 import (encode_mp4_avc,
                                            mp4_extract_avc,
                                            parse_mp4,
                                            sample_timestamps)

    frames = _gradient_frames(8)
    for codec in ("b", "cabac_b"):
        mp4 = encode_mp4_avc(frames, codec=codec, qp=8)
        # composition timestamps = display position (+1 frame shift,
        # unsigned v0 offsets) over decode order [0,3,1,2,6,4,5,7]
        ts = sample_timestamps(parse_mp4(mp4))
        assert ts == [40, 160, 80, 120, 280, 200, 240, 320]
        _, dec = decode_h264(mp4_extract_avc(mp4))
        for src, out in zip(frames, dec):
            assert _psnr(src, out) > 40.0


def test_mp4_b_bridge_sync_samples_are_idr_only():
    from rmlint_spark.operators.mp4 import encode_mp4_avc

    frames = _gradient_frames(10)
    mp4 = encode_mp4_avc(frames, codec="b", qp=8)
    # stss box: two segments (seg default 12 > 10 -> one IDR) — find
    # the box and check it lists exactly the IDR sample
    i = mp4.find(b"stss")
    assert i > 0
    import struct
    n = struct.unpack(">I", mp4[i + 8:i + 12])[0]
    sync = struct.unpack(f">{n}I", mp4[i + 12:i + 12 + 4 * n])
    assert sync == (1,)


def test_poc_lsb_wrap_long_segment():
    """A single 140-frame segment drives pic_order_cnt_lsb (8 bits,
    poc = 2*display) past its 256 wrap: the 8.2.1.1 msb/lsb walk must
    keep the derived POC monotone in display order, so frames past
    display 128 still land at the right positions."""
    frames = [np.full((16, 16, 3), (i * 13) % 256, dtype=np.uint8)
              for i in range(140)]
    enc = encode_h264_b(frames, qp=8, bgroup=2, seg=140)
    lay = _H264Layout(enc)
    assert lay.kinds.count("I") == 1
    assert max(lay.poc) == 278          # 2*139: msb accumulated past 256
    # display order recovered exactly: flat-color frames differ by 13
    # gray levels, far beyond the qp=8 reconstruction error
    _, dec = decode_h264(enc)
    assert len(dec) == 140
    for f, d in zip(frames, dec):
        assert abs(float(d[0, 0, 0]) - float(f[0, 0, 0])) < 8


# ------------------------------------------- temporal direct (r5 s10)

def _pan_frames(n: int = 9, h: int = 48, w: int = 64) -> list:
    yy, xx = np.mgrid[0:h, 0:w + 2 * n]
    big = np.stack([(xx * 5 + yy * 3) % 256, (xx * 2 + yy * 7) % 256,
                    (xx * 3 + yy) % 256], -1).astype(np.uint8)
    return [big[:, 2 * i:2 * i + w] for i in range(n)]


def test_temporal_direct_scaling_pinned():
    """The 8.4.1.2.3 MV scaling against hand-computed values:
    mvL0 = (DistScaleFactor * mvCol + 128) >> 8, mvL1 = mvL0 - mvCol,
    including the asymmetric-B and td=0 fallback cases."""
    from rmlint_spark.operators.h264_b import BInterPicture

    flat = (np.zeros((16, 16), np.uint8), np.zeros((8, 8), np.uint8),
            np.zeros((8, 8), np.uint8))
    col_mvs = np.zeros((4, 4, 2), np.int64)
    col_mvs[:, :] = (-12, 20)           # colocated anchor motion
    col = (col_mvs, np.full((1, 1), 2, np.int64))
    pic = BInterPicture(np.zeros((16, 16), np.uint8),
                        np.zeros((8, 8), np.uint8),
                        np.zeros((8, 8), np.uint8), 1, 1,
                        flat, flat, col)
    pic.direct_spatial = False
    # midpoint B: tb=2, td=4 -> DistScaleFactor = 128 -> exact halves
    pic.direct_tbtd = (2, 4)
    mv0, mv1, use0, use1, _, _ = pic._direct_mv(0, 0)
    assert (use0, use1) == (True, True)
    assert mv0 == ((128 * -12 + 128) >> 8, (128 * 20 + 128) >> 8)
    assert mv1 == (mv0[0] + 12, mv0[1] - 20)
    # asymmetric B (bgroup=2, first B): tb=2, td=6 -> dsf=85
    pic.direct_tbtd = (2, 6)
    mv0, mv1, _, _, _, _ = pic._direct_mv(0, 0)
    tx = (16384 + 3) // 6
    dsf = (2 * tx + 32) >> 6
    assert dsf == 85
    assert mv0 == ((dsf * -12 + 128) >> 8, (dsf * 20 + 128) >> 8)
    assert mv1 == (mv0[0] + 12, mv0[1] - 20)
    # degenerate anchors: td=0 -> mvL0 = mvCol, mvL1 = 0
    pic.direct_tbtd = (2, 0)
    mv0, mv1, _, _, _, _ = pic._direct_mv(0, 0)
    assert mv0 == (-12, 20) and mv1 == (0, 0)
    # intra colocated -> mvCol = 0
    pic2 = BInterPicture(np.zeros((16, 16), np.uint8),
                         np.zeros((8, 8), np.uint8),
                         np.zeros((8, 8), np.uint8), 1, 1,
                         flat, flat,
                         (np.zeros((4, 4, 2), np.int64),
                          np.ones((1, 1), np.int64)))
    pic2.direct_spatial = False
    pic2.direct_tbtd = (2, 4)
    mv0, mv1, use0, use1, _, _ = pic2._direct_mv(0, 0)
    assert mv0 == (0, 0) and mv1 == (0, 0) and use0 and use1


def test_temporal_direct_pan_roundtrip_both_lanes():
    """A constant-velocity pan round-trips under temporal direct at
    the same quality as spatial, with no larger B payload, in both
    entropy lanes (temporal direct predicts motion continuation
    where spatial direct's first-MB directZeroPrediction cannot)."""
    from rmlint_spark.operators.h264_cabac_b import encode_h264_cabac_b

    pan = _pan_frames()

    def b_nal_bytes(payload: bytes) -> int:
        total, i = 0, 0
        while True:
            j = payload.find(b"\x00\x00\x00\x01", i)
            if j < 0:
                break
            k = payload.find(b"\x00\x00\x00\x01", j + 4)
            end = k if k > 0 else len(payload)
            if payload[j + 4] & 0x1F == 1 and (payload[j + 4] >> 5) == 0:
                total += end - j        # non-reference slice = B
            i = j + 4
        return total

    for enc in (encode_h264_b, encode_h264_cabac_b):
        e_sp = enc(pan, qp=12, bgroup=1, seg=9, direct="spatial")
        e_tp = enc(pan, qp=12, bgroup=1, seg=9, direct="temporal")
        d_sp = decode_h264(e_sp)[1]
        d_tp = decode_h264(e_tp)[1]
        p_sp = min(_psnr(a, b) for a, b in zip(pan, d_sp))
        p_tp = min(_psnr(a, b) for a, b in zip(pan, d_tp))
        assert p_tp >= p_sp - 0.3 and p_tp >= 24.0
        assert b_nal_bytes(e_tp) <= b_nal_bytes(e_sp)


def test_temporal_direct_with_implicit_wp():
    """Temporal direct composes with implicit weighted bi-prediction
    (both are POC-distance machinery); a panning crossfade decodes
    through both at healthy quality."""
    pan = _pan_frames(7)
    faded = [np.clip(f.astype(np.float64) * (1 - 0.08 * i), 0, 255)
             .astype(np.uint8) for i, f in enumerate(pan)]
    enc = encode_h264_b(faded, qp=12, bgroup=2, seg=7,
                        direct="temporal", wp="implicit")
    dec = decode_h264(enc)[1]
    assert min(_psnr(a, b) for a, b in zip(faded, dec)) >= 24.0
