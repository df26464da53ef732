"""H.264 multi-reference B lists (r5 s17): per-list te(v)/ue(v) /
CABAC-unary ref_idx syntax, (list, refIdx)-keyed MV prediction, the
8.4.1.2.2 MinPositive spatial-direct refIdx derivation, the
occlusion-corpus compression win in both entropy lanes, and the
documented refusal pairings (temporal direct and implicit weights
stay single-ref-exact).  The decoder is DPB-general on BOTH lists;
the encoders emit a two-deep L0 (``refs=2``) and a single-entry L1,
with the L1 grammar exercised by picture-level roundtrips.

Reference parity note: rmlint hashes media as opaque bytes
(lib/checksum.c); this lane serves the multimodal training-data
corpus — the same frames coded with one- or two-deep L0 decode to
equivalent pixels, so cross-container frame dedup spans
multi-reference B streams too.
"""

from __future__ import annotations

import numpy as np
import pytest

from rmlint_spark.operators.flac import _BitReader, _BitWriter
from rmlint_spark.operators.h264 import decode_h264
from rmlint_spark.operators.h264_b import BInterPicture, encode_h264_b
from rmlint_spark.operators.h264_cabac_b import encode_h264_cabac_b


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64)
                         - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _scene(k: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Three smooth, mutually-distant gradient scenes."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([(xx * 3 + yy * 2) % 256, (xx + yy * 4) % 256,
                     (xx * 2 + 128) % 256], -1).astype(np.uint8)
    if k % 3 == 1:
        return base[:, ::-1, [1, 2, 0]]
    if k % 3 == 2:
        return np.roll(base[..., [2, 0, 1]], 17, axis=0)
    return base


def _occlusion(n_anchors: int = 6):
    """bgroup=1 corpus where each B frame's content matches the
    anchor TWO back (L0 refIdx 1), not the nearest past anchor or
    the future anchor: anchors cycle three scenes, every B frame
    carries the previous cycle step's scene.  A single-ref encoder
    must fall back to residual-heavy bi/mono modes; a two-deep L0
    finds a near-perfect reference."""
    frames = []
    for k in range(n_anchors):
        frames.append(np.roll(_scene(k), k // 3, axis=1))   # anchor
        if k < n_anchors - 1:
            # the first cycle has no older anchor yet; keep that B
            # referenced by its near anchor so neither lane's intra
            # escape fires (CABAC-B has one, CAVLC-B does not)
            frames.append(np.roll(_scene(max(k - 1, 0)), k // 3,
                                  axis=1))
    return frames


def _flat_pic(more0=0, more1=0) -> BInterPicture:
    flat = (np.zeros((48, 48), np.uint8),
            np.zeros((24, 24), np.uint8),
            np.zeros((24, 24), np.uint8))
    col = (np.zeros((12, 12, 2), np.int64), np.zeros((3, 3), np.int64))
    return BInterPicture(np.zeros((48, 48), np.uint8),
                         np.zeros((24, 24), np.uint8),
                         np.zeros((24, 24), np.uint8), 3, 3,
                         flat, flat, col,
                         more0=[flat] * more0, more1=[flat] * more1)


def test_mv_pred_b_keyed_by_list_and_refidx():
    """The exactly-one-match shortcut counts only neighbors
    predicting from the same (list, refIdx); the median fallback
    uses every neighbor on the list regardless of refIdx."""
    pic = _flat_pic(more0=1)
    pic.n_ref0 = 2
    # A: L0 ref 1 mv (4,4); B: L0 ref 0 mv (8,8); C: L0 ref 0 (12,12)
    pic._commit_b(3, (4, 4), (0, 0), True, False, ref0=1)   # MB (1,0)
    pic._commit_b(1, (8, 8), (0, 0), True, False, ref0=0)   # MB (0,1)
    pic._commit_b(2, (12, 12), (0, 0), True, False, ref0=0)  # MB (0,2)
    assert pic._mv_pred_b(1, 1, 0, ref=1) == (4, 4)
    assert pic._mv_pred_b(1, 1, 0, ref=0) == (8, 8)


def test_spatial_direct_minpositive_refidx():
    """8.4.1.2.2: the direct refIdx per list is the MinPositive over
    the neighbors, and colZeroFlag zeroes only a ref-0 list."""
    pic = _flat_pic(more0=1)
    pic.n_ref0 = 2
    # stationary INTER colocated MB -> colZeroFlag holds
    pic.col_state[...] = 2
    # neighbors of MB (1,1): A uses L0 ref 1 with motion, B uses L1
    pic._commit_b(3, (4, 8), (0, 0), True, False, ref0=1)   # A
    pic._commit_b(1, (0, 0), (6, 2), False, True, ref1=0)   # B
    mv0, mv1, use0, use1, ref0, ref1 = pic._direct_mv(1, 1)
    assert use0 and use1
    assert ref0 == 1 and ref1 == 0
    # L0's derived refIdx is 1 -> colZeroFlag does NOT zero it
    assert mv0 == (4, 8)
    # L1's derived refIdx is 0 -> zeroed by the stationary colocated
    assert mv1 == (0, 0)


@pytest.mark.parametrize("enc", [encode_h264_b, encode_h264_cabac_b],
                         ids=["cavlc", "cabac"])
def test_occlusion_two_deep_l0_win(enc):
    """Two-deep L0 on the occlusion corpus: >= 1.3x smaller stream at
    the same decoded quality, in both entropy lanes."""
    frames = _occlusion()
    e1 = enc(frames, bgroup=1, seg=len(frames), qp=12, refs=1)
    e2 = enc(frames, bgroup=1, seg=len(frames), qp=12, refs=2)
    d1 = decode_h264(e1)[1]
    d2 = decode_h264(e2)[1]
    p1 = min(_psnr(a, b) for a, b in zip(frames, d1))
    p2 = min(_psnr(a, b) for a, b in zip(frames, d2))
    assert len(e2) * 1.3 <= len(e1)
    assert p2 >= p1 - 0.3 and p2 >= 26.0


def test_multiref_b_cross_entropy_pixel_identity():
    """Both entropy lanes share _b_candidates, so refs=2 B encodes
    decode pixel-identically across CAVLC and CABAC."""
    frames = _occlusion(5)
    e_cavlc = encode_h264_b(frames, bgroup=1, seg=len(frames),
                            qp=12, refs=2)
    e_cabac = encode_h264_cabac_b(frames, bgroup=1, seg=len(frames),
                                  qp=12, refs=2)
    d1 = decode_h264(e_cavlc)[1]
    d2 = decode_h264(e_cabac)[1]
    assert len(d1) == len(frames)
    assert all((a == b).all() for a, b in zip(d1, d2))


def test_multiref_b_with_explicit_wp():
    """refs=2 + wp='explicit': the B pred_weight_table carries one
    entry per active L0 reference and a fading occlusion corpus
    still decodes at quality parity."""
    frames = [np.clip(f.astype(np.float64) * (1 - 0.04 * i), 0,
                      255).astype(np.uint8)
              for i, f in enumerate(_occlusion(5))]
    e = encode_h264_b(frames, bgroup=1, seg=len(frames), qp=12,
                      refs=2, wp="explicit")
    d = decode_h264(e)[1]
    assert min(_psnr(a, b) for a, b in zip(frames, d)) >= 26.0


def test_l1_grammar_picture_level_roundtrip():
    """The L1 multi-ref grammar (te(v) one-bit at 2 active refs)
    round-trips at picture level: an encoder picture with a two-deep
    L1 writes ref_idx_l1 fields a fresh decoder picture reads back
    to identical motion state.  The source is a per-MB checkerboard
    of the two L1 references so spatial direct (which propagates the
    neighbor's refIdx) never matches the content — every MB stays
    explicit and both te(v) branches (refIdx 0 and 1) are written."""
    rng = np.random.default_rng(7)
    far = tuple(rng.integers(0, 255, s, dtype=np.uint8).astype(
        np.uint8) for s in ((48, 48), (24, 24), (24, 24)))
    near = tuple((np.asarray(p) // 2).astype(np.uint8) for p in far)
    src_y = np.asarray(far[0]).copy()
    src_u, src_v = far[1].copy(), far[2].copy()
    for my in range(3):
        for mx in range(3):
            if (my + mx) % 2:               # this MB matches refIdx 0
                src_y[my*16:my*16+16, mx*16:mx*16+16] = \
                    near[0][my*16:my*16+16, mx*16:mx*16+16]
                src_u[my*8:my*8+8, mx*8:mx*8+8] = \
                    near[1][my*8:my*8+8, mx*8:mx*8+8]
                src_v[my*8:my*8+8, mx*8:mx*8+8] = \
                    near[2][my*8:my*8+8, mx*8:mx*8+8]
    flat = (np.zeros((48, 48), np.uint8), np.zeros((24, 24), np.uint8),
            np.zeros((24, 24), np.uint8))
    col = (np.zeros((12, 12, 2), np.int64),
           np.zeros((3, 3), np.int64))

    def mkpic():
        p = BInterPicture(np.zeros((48, 48), np.uint8),
                          np.zeros((24, 24), np.uint8),
                          np.zeros((24, 24), np.uint8), 3, 3,
                          flat, near, col, more1=[far])
        p.qp = 12
        p.n_ref1 = 2
        return p

    epic = mkpic()
    w = _BitWriter()
    skips = []
    for addr in range(9):
        skips.append(epic.encode_mb_b(w, addr, src_y, src_u, src_v, 2))
    w.write(1, 1)                           # stop bit so reads stay in range
    w.pad_to_byte()
    # both L1 te(v) branches must actually have been written by
    # explicit (non-skip) macroblocks
    explicit_refs = {int(epic.lref[my, mx, 1])
                     for my in range(3) for mx in range(3)
                     if not skips[my * 3 + mx]
                     and epic.luse[my, mx, 1]}
    assert explicit_refs == {0, 1}
    dpic = mkpic()
    r = _BitReader(w.bytes())
    from rmlint_spark.operators.h264 import _read_ue

    for addr in range(9):
        if skips[addr]:                     # caller folds B_Skip into
            dpic._decode_skip_b(addr)       # mb_skip_run; mirror it
            continue
        mb_type = _read_ue(r)
        dpic._decode_mb_b16(r, addr, mb_type)
    assert (dpic.lref == epic.lref).all()
    assert (dpic.lmv == epic.lmv).all()
    assert (dpic.y == epic.y).all()


def test_refusal_pairings():
    frames = _occlusion(4)
    for enc in (encode_h264_b, encode_h264_cabac_b):
        with pytest.raises(ValueError, match="temporal direct"):
            enc(frames, refs=2, direct="temporal")
        with pytest.raises(ValueError, match="implicit weights"):
            enc(frames, refs=2, wp="implicit")
        with pytest.raises(ValueError, match="refs must be 1 or 2"):
            enc(frames, refs=3)
