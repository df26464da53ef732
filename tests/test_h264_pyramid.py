"""Reference (pyramid) B pictures (r5 s17): a B picture with
nal_ref_idc != 0 enters the sliding-window DPB, exports its
8.4.1.2.3 L0-preferred motion grid, and later Bs predict from it.
The encoders emit one pyramid level behind ``pyramid=True``: each
anchor gap's middle B codes first as a reference, the leaves predict
from their nearest (anchor, mid) pair.

Closes the next-to-last video refusal; SP/SI slices remain.
"""

from __future__ import annotations

import numpy as np
import pytest

from rmlint_spark.operators.h264 import _H264Layout, decode_h264
from rmlint_spark.operators.h264_b import encode_h264_b
from rmlint_spark.operators.h264_cabac_b import encode_h264_cabac_b


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _pan(n: int = 9, step: int = 2) -> list[np.ndarray]:
    """Smooth panorama pan: every frame shifts ``step`` px — the
    leaf Bs' nearest references are 1-2 frames away under pyramid
    vs 1-3 under plain bgroup=3, so halving the prediction distance
    has something to win."""
    yy, xx = np.mgrid[0:64, 0:128]
    pano = np.stack([
        (np.sin(yy / 6.0) * 90 + np.cos(xx / 8.0) * 90 + 128),
        (np.sin((yy + 2 * xx) / 13.0) * 100 + 128),
        (np.cos((2 * yy - xx) / 17.0) * 100 + 128),
    ], -1).clip(0, 255).astype(np.uint8)
    return [pano[16:48, 8 + i * step:40 + i * step].copy()
            for i in range(n)]


@pytest.mark.parametrize("enc", [encode_h264_b, encode_h264_cabac_b],
                         ids=["cavlc", "cabac"])
def test_pyramid_roundtrip_display_order(enc):
    """A pyramid GOP decodes back in display order at good quality;
    the layout marks the mid Bs as reference pictures."""
    frames = _pan(9)
    data = enc(frames, qp=14, bgroup=3, seg=9, search=6, pyramid=True)
    lay = _H264Layout(data)
    # decode order per segment: IDR, anchor, mid-B(ref), leaves...
    assert "B" in lay.kinds
    ref_bs = [k for k, r in zip(lay.kinds, lay.is_ref)
              if k == "B" and r]
    nonref_bs = [k for k, r in zip(lay.kinds, lay.is_ref)
                 if k == "B" and not r]
    assert ref_bs and nonref_bs          # a real two-layer hierarchy
    _, dec = decode_h264(data)
    assert len(dec) == len(frames)
    assert min(_psnr(f, d) for f, d in zip(frames, dec)) > 33.0


def test_pyramid_beats_plain_on_decaying_correlation():
    """The pyramid's value regime: content whose temporal correlation
    decays with distance (evolving texture — each frame blends in
    fresh detail).  Plain bgroup=3 leaves predict across up to 3
    frames of decay; the pyramid halves every leaf's reference
    distance and must code smaller at equal quality.  (On a clean
    constant-velocity pan plain direct mode is already near-free and
    the pyramid's extra reference costs more than it saves — that is
    expected, the mode is opt-in.)  CAVLC lane; CABAC shares the
    mode decisions."""
    rng = np.random.default_rng(3)

    def blocky() -> np.ndarray:
        small = rng.integers(40, 216, (8, 8, 3))
        return np.kron(small, np.ones((4, 4, 1))).astype(np.float64)

    cur = blocky()
    frames = []
    for _ in range(13):
        frames.append(np.clip(cur, 0, 255).astype(np.uint8))
        cur = 0.75 * cur + 0.25 * blocky()
    plain = encode_h264_b(frames, qp=18, bgroup=3, seg=13, search=4)
    pyr = encode_h264_b(frames, qp=18, bgroup=3, seg=13, search=4,
                        pyramid=True)
    _, dp = decode_h264(plain)
    _, dq = decode_h264(pyr)
    p_plain = min(_psnr(f, d) for f, d in zip(frames, dp))
    p_pyr = min(_psnr(f, d) for f, d in zip(frames, dq))
    assert p_pyr >= p_plain - 0.5
    assert len(pyr) < 0.95 * len(plain)


def test_pyramid_cross_entropy_pixel_identity():
    frames = _pan(9)
    _, d1 = decode_h264(encode_h264_b(
        frames, qp=14, bgroup=3, seg=9, search=6, pyramid=True))
    _, d2 = decode_h264(encode_h264_cabac_b(
        frames, qp=14, bgroup=3, seg=9, search=6, pyramid=True))
    assert all((a == b).all() for a, b in zip(d1, d2))


def test_pyramid_composes_with_partitions_and_wp():
    """pyramid + partitions (leaves only — the mid B stays
    unpartitioned as the leaves' colocated source) + explicit WP
    still round-trips in both lanes."""
    frames = _pan(9)
    for enc in (encode_h264_b, encode_h264_cabac_b):
        data = enc(frames, qp=14, bgroup=3, seg=9, search=6,
                   pyramid=True, partitions=True, wp="explicit")
        _, dec = decode_h264(data)
        assert min(_psnr(f, d) for f, d in zip(frames, dec)) > 32.0


def test_pyramid_refuses_multiref():
    frames = _pan(9)
    for enc in (encode_h264_b, encode_h264_cabac_b):
        with pytest.raises(ValueError, match="pyramid"):
            enc(frames, qp=14, bgroup=3, seg=9, pyramid=True, refs=2)


def test_pyramid_random_access_decodes_single_frame():
    """frame_at on a leaf decodes only its GOP prefix (the honest
    random-access cost), and the leaf's references include the mid
    B — sampling must match the full decode."""
    frames = _pan(9)
    data = encode_h264_b(frames, qp=14, bgroup=3, seg=9, search=6,
                         pyramid=True)
    lay = _H264Layout(data)
    _, full = decode_h264(data)
    for idx in (1, 3, 7):
        assert (lay.frame_at(idx) == full[idx]).all()


@pytest.mark.parametrize("enc", [encode_h264_b, encode_h264_cabac_b],
                         ids=["cavlc", "cabac"])
def test_pyramid_stream_bitflip_fuzz_bounded(enc):
    frames = _pan(9)
    data = bytearray(enc(frames, qp=12, bgroup=3, seg=9, search=4,
                         pyramid=True))
    rng = np.random.default_rng(77)
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
