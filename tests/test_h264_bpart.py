"""Sub-16x16 B partitions (r5 s17): Table 7-14 mb_types 4..21
(16x8/8x16 with per-partition L0/L1/Bi modes), B_8x8 with the full
Table 7-18 sub_mb_type family, in BOTH entropy lanes.

Evidence lanes:
- split-motion corpus: ``partitions=True`` beats the 16x16-only B
  encoder at equal PSNR in both entropy modes, and the two modes stay
  pixel-identical (shared mode decisions);
- picture-level streams exercise the decode-only Table 7-18 sub-split
  family (8x4 / 4x8 / 4x4, Bi included) and pin the block-granular
  motion grid the derivation writes;
- composition with multi-reference lists; seeded bit-flip fuzz stays
  inside the documented error contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from rmlint_spark.operators.h264 import (
    _write_se,
    _write_ue,
    decode_h264,
)
from rmlint_spark.operators.h264_b import BInterPicture, encode_h264_b
from rmlint_spark.operators.h264_cabac_b import encode_h264_cabac_b
from rmlint_spark.operators.flac import _BitReader, _BitWriter


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _pan_frames(n: int = 7) -> list[np.ndarray]:
    """Anchors show the base crop; B frames pan 8-row bands in
    OPPOSITE directions — every macroblock holds a motion boundary,
    unreachable by whole-MB modes.  Smooth chroma so 4:2:0 keeps the
    PSNR signal meaningful; windowed crops, no wrap-around."""
    yy, xx = np.mgrid[0:64, 0:96]
    pano = np.stack([
        (np.sin(yy / 5.0) * 90 + np.cos(xx / 7.0) * 90 + 128),
        (np.sin((yy + xx) / 9.0) * 100 + 128),
        (np.cos((yy - xx) / 11.0) * 100 + 128),
    ], -1).clip(0, 255).astype(np.uint8)

    def crop(off: int) -> np.ndarray:
        fr = np.empty((32, 32, 3), np.uint8)
        for k in range(4):
            s = off if k % 2 == 0 else -off
            fr[k * 8:(k + 1) * 8] = \
                pano[16 + k * 8:16 + (k + 1) * 8, 32 + s:64 + s]
        return fr

    return [crop(0) if i % 2 == 0 else crop(3) for i in range(n)]


@pytest.mark.parametrize("enc", [encode_h264_b, encode_h264_cabac_b],
                         ids=["cavlc", "cabac"])
def test_b_partitions_win_on_split_motion(enc):
    frames = _pan_frames()
    plain = enc(frames, qp=14, bgroup=1, seg=7, search=6)
    parts = enc(frames, qp=14, bgroup=1, seg=7, search=6,
                partitions=True)
    _, dec_plain = decode_h264(plain)
    _, dec_parts = decode_h264(parts)
    p_plain = min(_psnr(f, d) for f, d in zip(frames, dec_plain))
    p_parts = min(_psnr(f, d) for f, d in zip(frames, dec_parts))
    assert p_parts >= p_plain - 0.5          # no quality regression
    assert p_parts > 33.0                    # the split motion decodes
    assert len(parts) < 0.85 * len(plain)    # and codes smaller


def test_b_partition_cross_entropy_pixel_identity():
    """Both lanes share _b_split_candidates, so partitioned encodes
    make identical mode decisions — decoded pixels must match
    exactly across entropy modes."""
    frames = _pan_frames()
    _, d1 = decode_h264(encode_h264_b(frames, qp=14, bgroup=1, seg=7,
                                      search=6, partitions=True))
    _, d2 = decode_h264(encode_h264_cabac_b(frames, qp=14, bgroup=1,
                                            seg=7, search=6,
                                            partitions=True))
    assert all((a == b).all() for a, b in zip(d1, d2))


def test_b_partitions_compose_with_multiref():
    """partitions=True with a two-deep L0 (refs=2): the partition
    ref_idx fields ride the te(v) one-bit regime and the stream
    still round-trips in both lanes."""
    frames = _pan_frames(9)
    for enc in (encode_h264_b, encode_h264_cabac_b):
        data = enc(frames, qp=14, bgroup=1, seg=9, search=6,
                   partitions=True, refs=2)
        _, dec = decode_h264(data)
        assert min(_psnr(f, d) for f, d in zip(frames, dec)) > 33.0


def _fresh_pic() -> BInterPicture:
    """3x1-MB B picture over two flat anchors that differ by a
    constant, so list choice is visible in the decoded pixels."""
    h, w = 16, 48
    y = np.zeros((h, w), dtype=np.uint8)
    u = np.zeros((h // 2, w // 2), dtype=np.uint8)
    v = np.zeros((h // 2, w // 2), dtype=np.uint8)
    ref0 = (np.full_like(y, 60), np.full_like(u, 60),
            np.full_like(v, 60))
    ref1 = (np.full_like(y, 180), np.full_like(u, 180),
            np.full_like(v, 180))
    col = (np.zeros((h // 4, w // 4, 2), dtype=np.int64),
           np.full((1, 3), 2, dtype=np.int64))
    pic = BInterPicture(y, u, v, 3, 1, ref0, ref1, col)
    pic.qp = 16
    return pic


def test_b8x8_full_table718_decodes_cavlc():
    """Picture-level stream with decode-only sub-splits: quadrants
    [B_L0_8x4, B_L0_4x8, B_Bi_8x8, B_Direct_8x8].  Pins the
    block-granular motion grid: distinct mvds land on the right 8x4 /
    4x8 block rectangles, the Bi quadrant predicts from both lists,
    and the direct quadrant derives directZeroPrediction (no usable
    neighbors at the slice border MB)."""
    pic = _fresh_pic()
    w = _BitWriter()
    _write_ue(w, 0)                     # mb_skip_run
    _write_ue(w, 22)                    # B_8x8
    for st in (4, 5, 3, 0):             # L0_8x4, L0_4x8, Bi_8x8, Direct
        _write_ue(w, st)
    # n_ref = 1 per list: no ref_idx fields.  mvd_l0: quadrant 0 has
    # two 8x4 parts, quadrant 1 two 4x8 parts, quadrant 2 one 8x8.
    mvd_l0 = [(4, 0), (8, 0), (12, 0), (16, 0), (20, 0)]
    for dx, dy in mvd_l0:
        _write_se(w, dx)
        _write_se(w, dy)
    _write_se(w, -4)                    # mvd_l1 for the Bi 8x8
    _write_se(w, 0)
    from rmlint_spark.operators.h264_cavlc import _CBP_TO_CODE
    _write_ue(w, _CBP_TO_CODE[0])       # coded_block_pattern = 0
    _write_ue(w, 2)                     # mb_skip_run: MBs 1..2 skip
    from rmlint_spark.operators.h264 import _trailing_bits
    _trailing_bits(w)                   # rbsp stop bit
    covered = np.zeros(3, dtype=bool)
    pic.decode_slice_b(_BitReader(w.bytes()), 0, covered)
    assert covered[0]
    # quadrant 0 (blocks [0:2, 0:2]): 8x4 split -> block row 0 carries
    # mvd 4, block row 1 carries the second part's mv (pred = first
    # part's mv by the A-neighbor rule after commit, + 8)
    assert int(pic.lmv4[0, 0, 0, 1]) == 4
    assert int(pic.lmv4[1, 0, 0, 1]) == int(pic.lmv4[0, 0, 0, 1]) + 8
    # quadrant 1 (blocks [0:2, 2:4]): 4x8 split -> block COLUMNS differ
    assert int(pic.lmv4[0, 2, 0, 1]) != int(pic.lmv4[0, 3, 0, 1])
    assert (pic.lmv4[0, 2, 0] == pic.lmv4[1, 2, 0]).all()
    # quadrant 2 (blocks [2:4, 0:2]): Bi 8x8 -> both lists in use
    assert pic.luse4[2, 0, 0] and pic.luse4[2, 0, 1]
    assert int(pic.lmv4[2, 0, 1, 1]) == -4
    # quadrant 3: direct with no usable neighbor lists at this border
    # pattern -> directZeroPrediction: both lists, zero motion
    assert pic.luse4[2, 2, 0] and pic.luse4[2, 2, 1]
    assert (pic.lmv4[2, 2] == 0).all()
    # Bi quadrant pixels average the two anchors (60/180 -> 120)
    assert abs(int(pic.y[8:16, 0:8].mean()) - 120) <= 1


def test_b8x8_full_table718_decodes_cabac():
    """The arithmetic twin: craft the same quadrant family through
    the encoder-side helpers in the decoder's exact syntax order and
    decode it back — pins _read_b_part_mvds' entry order and the
    Table 9-38 sub codes end-to-end."""
    from rmlint_spark.operators.h264_cabac import (CabacDecoder,
                                                   CabacEncoder)
    from rmlint_spark.operators.h264_cabac_b import (
        CabacBInterPicture,
        _enc_mvd_ueg3,
    )

    h, w_px = 16, 48
    y = np.zeros((h, w_px), dtype=np.uint8)
    u = np.zeros((h // 2, w_px // 2), dtype=np.uint8)
    v = np.zeros((h // 2, w_px // 2), dtype=np.uint8)
    ref0 = (np.full_like(y, 60), np.full_like(u, 60),
            np.full_like(v, 60))
    ref1 = (np.full_like(y, 180), np.full_like(u, 180),
            np.full_like(v, 180))
    col = (np.zeros((h // 4, w_px // 4, 2), dtype=np.int64),
           np.full((1, 3), 2, dtype=np.int64))

    def build() -> bytes:
        pic = CabacBInterPicture(y.copy(), u.copy(), v.copy(), 3, 1,
                                 ref0, ref1, col)
        pic.qp = 16
        pic.new_slice()
        bw = _BitWriter()
        enc = CabacEncoder(bw)
        cx = pic.cab
        enc.decision(cx.b_skip[pic._skip_inc(0, 0)], 0)
        pic._enc_b_mb_type(enc, 0, 0, 22)
        subs = (4, 5, 3, 0)
        for st in subs:
            pic._enc_b_sub_type(enc, st)
        # n_ref = 1 per list: no ref bins.  mvd_l0 entries in the
        # decoder's order (quadrants raster, sub-parts coding order),
        # then mvd_l1
        l0_entries = [(0, 0, 2, 1), (1, 0, 2, 1),     # q0 8x4 rects
                      (0, 2, 1, 2), (0, 3, 1, 2),     # q1 4x8 rects
                      (2, 0, 2, 2)]                   # q2 8x8
        l0_mvds = [(4, 0), (8, 0), (12, 0), (16, 0), (20, 0)]
        for (by, bx, w4, h4), (dx, dy) in zip(l0_entries, l0_mvds):
            _enc_mvd_ueg3(enc, cx.mvd[0],
                          pic._bmvd_inc(by, bx, 0, 0), dx)
            _enc_mvd_ueg3(enc, cx.mvd[1],
                          pic._bmvd_inc(by, bx, 0, 1), dy)
            pic._note_bmvd(by, bx, w4, h4, 0, (dx, dy))
        _enc_mvd_ueg3(enc, cx.mvd[0], pic._bmvd_inc(2, 0, 1, 0), -4)
        _enc_mvd_ueg3(enc, cx.mvd[1], pic._bmvd_inc(2, 0, 1, 1), 0)
        pic._note_bmvd(2, 0, 2, 2, 1, (-4, 0))
        pic._enc_cbp(enc, 0, 0, 0)          # CBP = 0
        enc.terminate(0)
        # two trailing skipped MBs keep the slice well-formed
        for addr in (1, 2):
            my, mx = divmod(addr, 3)
            enc.decision(cx.b_skip[pic._skip_inc(my, mx)], 1)
            pic._decode_skip_b(addr)
            pic._note_skip_b(addr)
            enc.terminate(1 if addr == 2 else 0)
        bw.pad_to_byte()
        return bw.bytes()

    data = build()
    pic = CabacBInterPicture(y.copy(), u.copy(), v.copy(), 3, 1,
                             ref0, ref1, col)
    pic.qp = 16
    pic.new_slice()
    dec = CabacDecoder(_BitReader(data))
    covered = np.zeros(3, dtype=bool)
    assert not dec.decision(pic.cab.b_skip[pic._skip_inc(0, 0)])
    pic._decode_b_mb(dec, 0)
    covered[0] = True
    assert int(pic.lmv4[0, 0, 0, 1]) == 4
    assert int(pic.lmv4[1, 0, 0, 1]) == int(pic.lmv4[0, 0, 0, 1]) + 8
    assert int(pic.lmv4[0, 2, 0, 1]) != int(pic.lmv4[0, 3, 0, 1])
    assert pic.luse4[2, 0, 0] and pic.luse4[2, 0, 1]
    assert int(pic.lmv4[2, 0, 1, 1]) == -4
    assert (pic.lmv4[2, 2] == 0).all()
    assert abs(int(pic.y[8:16, 0:8].mean()) - 120) <= 1


@pytest.mark.parametrize("enc", [encode_h264_b, encode_h264_cabac_b],
                         ids=["cavlc", "cabac"])
def test_b_partition_stream_bitflip_fuzz_bounded(enc):
    """Seeded bit flips over a partitioned B stream raise only the
    documented error types (or decode) — never crash outside the
    contract."""
    frames = _pan_frames()
    data = bytearray(enc(frames, qp=12, bgroup=1, seg=7, search=4,
                         partitions=True))
    rng = np.random.default_rng(1234)
    allowed = (ValueError, NotImplementedError)
    bad = 0
    for _ in range(100):
        mut = bytearray(data)
        pos = int(rng.integers(5, len(mut)))
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_h264(bytes(mut))
        except allowed:
            bad += 1
    assert bad > 0
