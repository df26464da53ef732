"""H.264 P-slice (inter) essence codec — pure numpy + stdlib.

Closes the inter half of the last video refusal ("inter P/B slices
only", VERDICT r4): P slices with P_Skip and P_L0_16x16 macroblocks
now encode and decode FOR REAL in the CAVLC lane —

- **quarter-pel luma motion compensation** (clause 8.4.2.2.1): the
  (1,-5,20,20,-5,1)/32 six-tap half-sample filter, the center
  position j computed from unrounded intermediate sums with the
  (x+512)>>10 second stage, and the Table 8-12 quarter-sample
  averages, with edge-replicated out-of-frame reference access
  (the spec's coordinate clipping);
- **eighth-pel chroma MC** (8.4.2.2.2): the normative bilinear
  ((8-dx)(8-dy)A + ...+32)>>6 kernel on the half-resolution planes;
- **motion-vector median prediction** (8.4.1.3): neighbor partitions
  A/B/C (D fallback when C is unavailable), the single-matching-
  reference shortcut, and the B-and-C-unavailable A-copy rule;
- **P_Skip reconstruction** (8.4.1.1): predicted-MV copy with the
  zero-MV override when a boundary or a stationary neighbor says so,
  and CAVLC ``mb_skip_run`` runs in slice_data (7.3.4);
- **inter residuals**: the same 4x4 integer transform, normative
  dequant and CAVLC nC-context residual coding the intra lane uses,
  on top of the motion-compensated prediction, CBP-gated per 8x8
  group (the coded_block_pattern me(v) mapping reuses this codec
  family's documented substitute ordering — see h264_cavlc.py
  deviation #1);
- **intra-in-P fallback**: mb_type >= 5 renames the whole I-slice
  macroblock table (Table 7-13), so scene cuts inside a P slice code
  as Intra_4x4 / Intra_16x16 / I_PCM through the existing intra
  paths.

The encoder (``encode_h264_p``) emits IDR/P GOPs with a
center-biased integer full search plus half- then quarter-pel
refinement, converts zero-residual predicted-MV macroblocks into
skips, falls back to intra on motion-search failure, and — like
every codec in this family — reconstructs in-loop through the SAME
dequant/IDCT/MC path the decoder runs, so encoder/decoder drift is
structurally impossible.

Since r5 s9 the 16x8 / 8x16 P partitions (mb_type 1/2) AND P_8x8
(mb_type 3/4) encode and decode too — since r5 s17 with the FULL
Table 7-17 sub_mb_type family (8x8 / 8x4 / 4x8 / 4x4 per 8x8
sub-macroblock): motion state lives on the spec's 4x4-block grid,
the two-partition shapes get the 8.4.1.3.2 directional predictor
(top->B, bottom->A, left->A, right->C) with the median fallback,
each (sub-)partition predicts from the previously committed ones,
and the encoder lets all splits compete with the whole-MB mode by
SAD + mvd-bits cost (opt-in ``partitions=`` flag; per-8x8-block
greedy sub_mb_type competition in :meth:`_search_sub_split`).
Refusal surface after this module: SP/SI slices (multi-reference
P prediction landed in r5 s13 and became DPB-general — te(v)/ue(v)
ref_idx, up to 16 active references, encoder subset 4 — in r5
s17).  CABAC-coded P slices decode too, via
h264_cabac_p.py composing this module's MotionMixin with the
arithmetic engine; CAVLC B slices via h264_b.py composing the
two-list machinery over this module's InterPicture.

Codec-lane status: per-asset decode inside ``mapInPandas``
(multimodal.py), NOT a Spark hot path — the same boundary as
jpeg.py / mpeg_audio.py / h264_cavlc.py.

Reference parity note: rmlint hashes media as opaque bytes
(lib/checksum.c); this module serves the training-data multimodal
lane: the same frames stored as an all-intra stream and as an
IDR+P GOP decode to identical pixels, so cross-container frame
dedup spans temporally-compressed video too.
"""

from __future__ import annotations

import numpy as np

from rmlint_spark.operators.flac import _BitReader, _BitWriter
from rmlint_spark.operators.h264_cavlc import (
    _BLK_GROUP,
    _BLK_XY,
    _CBP_FROM_CODE,
    _CBP_TO_CODE,
    _I_PCM_NC,
    CavlcPicture,
    _fdct4,
    _nc_for,
    _pred16x16,
    _quant4,
    _read_residual,
    _recon4,
    _scan_coeffs,
    _unscan_coeffs,
    _write_residual,
)

# P-slice mb_type table (7-13): 0 = P_L0_16x16; 1..4 are the smaller
# partitions (all decode); >= 5 renames the intra table.
_P_L0_16x16 = 0
_P_L0_L0_16x8 = 1
_P_L0_L0_8x16 = 2
_P_8x8 = 3
_P_8x8REF0 = 4          # identical with one reference (7.4.5)
_P_SUB_L0_8x8 = 0       # sub_mb_type (Table 7-17); 0..3 all decode
_P_INTRA_OFFSET = 5

# encoder bit-cost biases (SAD-scale heuristics, shared by BOTH
# entropy lanes so mode decisions — and pixels — match across them):
# per-sub_mb_type extra cost over plain 8x8 (extra mvd pairs + the
# longer sub_mb_type code), tried in this order
_SUB_BIAS = ((0, 0), (1, 110), (2, 110), (3, 330))


def _p_parts(mb_type: int, my: int, mx: int):
    """Partition geometry for the two-partition P macroblock types:
    (block-grid top-left by/bx, w4, h4, the 8.4.1.3.2 directional
    shape, luma rect (py, px, bh, bw), chroma rect (cy, cx, ch, cw))
    per partition, in coding order."""
    by, bx = my * 4, mx * 4
    py, px, cy, cx = my * 16, mx * 16, my * 8, mx * 8
    if mb_type == _P_L0_L0_16x8:
        return [
            (by, bx, 4, 2, "16x8_top",
             (py, px, 8, 16), (cy, cx, 4, 8)),
            (by + 2, bx, 4, 2, "16x8_bottom",
             (py + 8, px, 8, 16), (cy + 4, cx, 4, 8)),
        ]
    if mb_type in (_P_8x8, _P_8x8REF0):
        # four 8x8 sub-macroblocks, raster order; the plain median
        # predictor applies (no 8.4.1.3.2 directional shortcut)
        return [
            (by + 2 * (i // 2), bx + 2 * (i % 2), 2, 2, None,
             (py + 8 * (i // 2), px + 8 * (i % 2), 8, 8),
             (cy + 4 * (i // 2), cx + 4 * (i % 2), 4, 4))
            for i in range(4)
        ]
    return [
        (by, bx, 2, 4, "8x16_left",
         (py, px, 16, 8), (cy, cx, 8, 4)),
        (by, bx + 2, 2, 4, "8x16_right",
         (py, px + 8, 16, 8), (cy, cx + 4, 8, 4)),
    ]


# sub_mb_type (Table 7-17) -> list of (dy, dx, bh, bw) luma rects
# inside one 8x8 sub-macroblock, in sub-partition coding order
_SUB_RECTS = {
    0: ((0, 0, 8, 8),),                                  # P_L0_8x8
    1: ((0, 0, 4, 8), (4, 0, 4, 8)),                     # P_L0_8x4
    2: ((0, 0, 8, 4), (0, 4, 8, 4)),                     # P_L0_4x8
    3: ((0, 0, 4, 4), (0, 4, 4, 4),
        (4, 0, 4, 4), (4, 4, 4, 4)),                     # P_L0_4x4
}


def _sub_parts(i: int, sub_type: int, my: int, mx: int):
    """Sub-partition geometry (Table 7-17) for 8x8 sub-macroblock
    ``i`` (raster order) of MB (my, mx) under ``sub_type``
    (0 = 8x8, 1 = 8x4, 2 = 4x8, 3 = 4x4), same tuple layout as
    :func:`_p_parts`.  Sub-partitions use the plain median predictor
    (8.4.1.3 — the 8.4.1.3.2 directional shortcuts apply only to
    16x8/8x16 macroblock partitions, so shape is None)."""
    if sub_type not in _SUB_RECTS:
        raise ValueError(f"invalid P sub_mb_type {sub_type}")
    oy, ox = 8 * (i // 2), 8 * (i % 2)
    py0, px0 = my * 16 + oy, mx * 16 + ox
    by0, bx0 = my * 4 + oy // 4, mx * 4 + ox // 4
    cy0, cx0 = my * 8 + oy // 2, mx * 8 + ox // 2
    return [
        (by0 + dy // 4, bx0 + dx // 4, bw // 4, bh // 4, None,
         (py0 + dy, px0 + dx, bh, bw),
         (cy0 + dy // 2, cx0 + dx // 2, bh // 2, bw // 2))
        for dy, dx, bh, bw in _SUB_RECTS[sub_type]
    ]


def _sub_split_parts(subs: list[int], refs8: list[int],
                     my: int, mx: int):
    """Flattened (parts, per-part refs) for a P_8x8 macroblock whose
    four 8x8 sub-macroblocks carry ``subs`` sub_mb_types; ref_idx is
    per 8x8 sub-macroblock (7.3.5.2), so each sub-partition inherits
    its block's entry."""
    parts, refs = [], []
    for i, s in enumerate(subs):
        ps = _sub_parts(i, s, my, mx)
        parts.extend(ps)
        refs.extend([refs8[i]] * len(ps))
    return parts, refs


# motion vectors are bounded so a crafted stream cannot demand an
# absurd interpolation window (level limits bound real streams too)
_MV_LIMIT = 1 << 14


# ------------------------------------------------ sub-pel interpolation

def _filt6(a: np.ndarray, axis: int) -> np.ndarray:
    """Unrounded 6-tap (1,-5,20,20,-5,1) along ``axis``; output loses
    5 samples on that axis."""
    if axis == 1:
        return (a[:, :-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
                + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])
    return (a[:-5] - 5 * a[1:-4] + 20 * a[2:-3]
            + 20 * a[3:-2] - 5 * a[4:-1] + a[5:])


def _interp_luma(ref: np.ndarray, py: int, px: int, bh: int, bw: int,
                 mvy: int, mvx: int) -> np.ndarray:
    """Quarter-pel luma prediction block (clause 8.4.2.2.1): returns
    an int64 (bh, bw) block already clipped to 0..255.  Out-of-frame
    integer coordinates clip to the frame edge (the spec's
    Clip3-on-coordinates rule, i.e. edge replication)."""
    if not (-_MV_LIMIT <= mvy <= _MV_LIMIT and -_MV_LIMIT <= mvx <= _MV_LIMIT):
        raise ValueError("H.264 motion vector exceeds decoder bound")
    h, w = ref.shape
    iy, fy = py + (mvy >> 2), mvy & 3
    ix, fx = px + (mvx >> 2), mvx & 3
    # window with the 6-tap apron plus one extra row/col so shifted
    # (next-integer / next-half) samples exist for quarter averages
    rows = np.clip(np.arange(iy - 2, iy + bh + 4), 0, h - 1)
    cols = np.clip(np.arange(ix - 2, ix + bw + 4), 0, w - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)        # (bh+6, bw+6)
    g = win[2:3 + bh, 2:3 + bw]                           # (bh+1, bw+1)
    if fy == 0 and fx == 0:
        return g[:bh, :bw]
    # half-pel b (horizontal) and h (vertical) on the extended grid
    tb = _filt6(win, 1)                                   # (bh+6, bw+1)
    b = np.clip((tb[2:3 + bh] + 16) >> 5, 0, 255)         # (bh+1, bw+1)
    tv = _filt6(win, 0)                                   # (bh+1, bw+6)
    hh = np.clip((tv[:, 2:3 + bw] + 16) >> 5, 0, 255)     # (bh+1, bw+1)
    # center j from UNROUNDED vertical sums, second-stage >> 10
    j = np.clip((_filt6(tv, 1) + 512) >> 10, 0, 255)      # (bh+1, bw+1)
    g0, b0, h0, j0 = g[:bh, :bw], b[:bh, :bw], hh[:bh, :bw], j[:bh, :bw]
    gr, gd = g[:bh, 1:1 + bw], g[1:1 + bh, :bw]           # next int right/down
    m0 = hh[:bh, 1:1 + bw]                                # h shifted right
    s0 = b[1:1 + bh, :bw]                                 # b shifted down
    table = {
        (0, 1): (g0, b0), (0, 2): (b0, None), (0, 3): (b0, gr),
        (1, 0): (g0, h0), (2, 0): (h0, None), (3, 0): (h0, gd),
        (2, 2): (j0, None),
        (1, 2): (b0, j0), (2, 1): (h0, j0),
        (2, 3): (j0, m0), (3, 2): (j0, s0),
        (1, 1): (b0, h0), (1, 3): (b0, m0),
        (3, 1): (h0, s0), (3, 3): (m0, s0),
    }
    x, y2 = table[(fy, fx)]
    return x if y2 is None else (x + y2 + 1) >> 1


def _interp_chroma(ref: np.ndarray, py: int, px: int, bh: int, bw: int,
                   mvy: int, mvx: int) -> np.ndarray:
    """Eighth-pel bilinear chroma prediction (8.4.2.2.2) on the
    half-resolution plane; ``mv`` stays in luma quarter units, which
    ARE chroma eighth units."""
    h, w = ref.shape
    iy, dy = py + (mvy >> 3), mvy & 7
    ix, dx = px + (mvx >> 3), mvx & 7
    rows = np.clip(np.arange(iy, iy + bh + 1), 0, h - 1)
    cols = np.clip(np.arange(ix, ix + bw + 1), 0, w - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)
    a = win[:bh, :bw]
    b = win[:bh, 1:]
    c = win[1:, :bw]
    d = win[1:, 1:]
    return ((8 - dx) * (8 - dy) * a + dx * (8 - dy) * b
            + (8 - dx) * dy * c + dx * dy * d + 32) >> 6


# ------------------------------------------------------ picture state

class MotionMixin:
    """The entropy-independent inter machinery a P picture needs:
    reference planes, a per-macroblock motion-vector grid, the
    decoded/intra/inter state grid that drives MV-prediction
    availability, motion compensation / search, and residual
    quantization + reconstruction.  The CAVLC lane (InterPicture
    below) and the CABAC lane (h264_cabac_p.CabacInterPicture) both
    mix this in over their entropy-layer picture class."""

    def _init_motion(
            self,
            ref: tuple[np.ndarray, np.ndarray, np.ndarray],
            ref1: tuple[np.ndarray, np.ndarray, np.ndarray] | None
            = None,
            more: list[tuple[np.ndarray, np.ndarray, np.ndarray]]
            | None = None) -> None:
        # L0 reference list, most recent first (8.2.4.2.1 descending
        # PicNum): refs[0] is the immediate reference, refs[1] the one
        # before it, ``more`` the still-older DPB entries backing
        # refIdx 2.. (r5 s17 lifts the former 2-reference cap)
        self.refs = [ref] + ([ref1] if ref1 is not None else []) \
            + list(more or [])
        self.ref_y, self.ref_u, self.ref_v = ref
        # active references for the CURRENT slice (header-set; skip
        # and single-ref streams keep 1)
        self.n_ref0 = 1
        mb_h, mb_w = self.mb_h, self.mb_w
        # motion state lives at the spec's 4x4-block granularity since
        # the 16x8/8x16 partition lanes (r5 s9): mv4 holds (mvy, mvx)
        # per block, dec4 is 0 = not yet decoded, 1 = intra / I_PCM,
        # 2 = inter; mb_state keeps the per-MB view the B lanes and
        # the colocated export need
        self.mv4 = np.zeros((mb_h * 4, mb_w * 4, 2), dtype=np.int64)
        self.dec4 = np.zeros((mb_h * 4, mb_w * 4), dtype=np.int64)
        # per-4x4-block L0 reference index (multi-ref MV prediction
        # and the CABAC ref_idx contexts read neighbors from it)
        self.ref4 = np.zeros((mb_h * 4, mb_w * 4), dtype=np.int64)
        self.mb_state = np.zeros((mb_h, mb_w), dtype=np.int64)
        self._mc_chroma: dict[str, np.ndarray] | None = None
        # weighted prediction (8.4.2.3.3): set per slice from the
        # header's pred_weight_table (or the implicit 8.4.2.3.1
        # derivation); None = default prediction
        self.wp: dict | None = None

    # CavlcPicture hook: while an inter MB is being coded, chroma
    # prediction is the motion-compensated block, not intra DC
    def _chroma_pred(self, key: str, plane: np.ndarray, my: int,
                     mx: int) -> np.ndarray:
        if self._mc_chroma is not None:
            return self._mc_chroma[key]
        return super()._chroma_pred(key, plane, my, mx)

    def note_intra(self, addr: int) -> None:
        my, mx = divmod(addr, self.mb_w)
        self.mb_state[my, mx] = 1
        self.dec4[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 1
        self.mv4[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 0
        self.ref4[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 0

    # ---- motion-vector prediction (8.4.1.3) ----

    def _nb4(self, by: int, bx: int):
        """(available, is_inter, mv, ref) of 4x4 block (by, bx)."""
        if not (0 <= by < self.mb_h * 4 and 0 <= bx < self.mb_w * 4):
            return False, False, (0, 0), 0
        st = int(self.dec4[by, bx])
        if st == 0:
            return False, False, (0, 0), 0
        return True, st == 2, (int(self.mv4[by, bx, 0]),
                               int(self.mv4[by, bx, 1])), \
            int(self.ref4[by, bx])

    def _mv_pred_part(self, by: int, bx: int, w4: int, h4: int,
                      shape: str | None = None,
                      ref: int = 0) -> tuple[int, int]:
        """Median MV predictor (8.4.1.3) for the partition whose
        top-left 4x4 block is (by, bx) spanning w4 x h4 blocks,
        predicting from reference ``ref``.  ``shape`` selects the
        8.4.1.3.2 directional shortcuts: '16x8_top' -> B,
        '16x8_bottom' -> A, '8x16_left' -> A, '8x16_right' -> C —
        applied when that neighbor predicts from the SAME reference,
        else the median rule runs.  Per 8.4.1.3.1 the exactly-one-
        match shortcut is keyed by refIdx equality, while the median
        uses every inter neighbor's motion regardless of refIdx."""
        a = self._nb4(by, bx - 1)
        b = self._nb4(by - 1, bx)
        c = self._nb4(by - 1, bx + w4)
        if not c[0]:
            c = self._nb4(by - 1, bx - 1)            # D fallback
        directional = {"16x8_top": b, "16x8_bottom": a,
                       "8x16_left": a, "8x16_right": c}.get(shape)
        if (directional is not None and directional[0]
                and directional[1] and directional[3] == ref):
            return directional[2]
        if a[0] and not b[0] and not c[0]:
            return a[2]                              # 8.4.1.3.1 rule 1
        matches = [n for n in (a, b, c)
                   if n[0] and n[1] and n[3] == ref]
        if len(matches) == 1:
            return matches[0][2]
        mvy = sorted(n[2][0] if n[1] else 0 for n in (a, b, c))[1]
        mvx = sorted(n[2][1] if n[1] else 0 for n in (a, b, c))[1]
        return mvy, mvx

    def _mv_pred(self, my: int, mx: int, ref: int = 0) -> tuple[int, int]:
        return self._mv_pred_part(my * 4, mx * 4, 4, 4, ref=ref)

    def _skip_mv(self, my: int, mx: int) -> tuple[int, int]:
        """P_Skip motion (8.4.1.1): zero when a slice/picture boundary
        or a stationary REF-0 neighbor says so, else the median
        predictor for reference 0."""
        a = self._nb4(my * 4, mx * 4 - 1)
        b = self._nb4(my * 4 - 1, mx * 4)
        if not a[0] or not b[0]:
            return 0, 0
        if ((a[1] and a[3] == 0 and a[2] == (0, 0))
                or (b[1] and b[3] == 0 and b[2] == (0, 0))):
            return 0, 0
        return self._mv_pred(my, mx)

    # ---- weighted-prediction application (8.4.2.3.3) ----

    @staticmethod
    def _wp_plane(pred: np.ndarray, w: int, o: int,
                  logwd: int) -> np.ndarray:
        """Explicit mono weighting of one plane, clipped to Clip1."""
        if logwd >= 1:
            out = ((pred * w + (1 << (logwd - 1))) >> logwd) + o
        else:
            out = pred * w + o
        return np.clip(out, 0, 255)

    def _wp_entry(self, lst: str, ref: int) -> tuple:
        """Explicit-WP weights for reference ``ref`` of list ``lst``:
        entry 0 lives in wp[lst], entries for higher refIdx in
        wp[lst + 'x'] (pred_weight_table carries one per active
        reference)."""
        wp = self.wp
        if ref == 0:
            return wp[lst]
        extras = wp.get(lst + "x", [])
        if ref - 1 >= len(extras):
            raise ValueError(
                "H.264 weighted prediction table has no entry for "
                f"refIdx {ref}")
        return extras[ref - 1]

    def _wp_mono(self, preds, lst: str = "l0", ref: int = 0):
        """Apply list-X explicit weights to a (y, u, v) prediction
        triple; implicit weights never apply to mono predictions
        (8.4.2.3), and None means default prediction."""
        wp = self.wp
        if wp is None or wp.get("implicit"):
            return preds
        w_y, o_y, w_u, o_u, w_v, o_v = self._wp_entry(lst, ref)
        p_y, p_u, p_v = preds
        return (self._wp_plane(p_y, w_y, o_y, wp["logwd_y"]),
                self._wp_plane(p_u, w_u, o_u, wp["logwd_c"]),
                self._wp_plane(p_v, w_v, o_v, wp["logwd_c"]))

    def _search_ref_y(self, ref: int = 0) -> np.ndarray:
        """Reference luma plane for motion search: when explicit WP is
        active the weighted plane ranks candidates the way the
        decoder's weighted prediction will (weighting and the
        interpolation filter are both affine, so weighting the plane
        first is the cheap per-slice approximation)."""
        wp = self.wp
        plane = self.refs[ref][0]
        if wp is None or wp.get("implicit"):
            return plane
        cache = getattr(self, "_wp_ref_cache", None)
        if cache is None:
            cache = self._wp_ref_cache = {}
        if ref not in cache:
            w_y, o_y = self._wp_entry("l0", ref)[:2]
            cache[ref] = self._wp_plane(
                plane.astype(np.int64), w_y, o_y,
                wp["logwd_y"]).astype(np.uint8)
        return cache[ref]

    def _mc_pred(self, my: int, mx: int, mv: tuple[int, int],
                 ref: int = 0):
        mvy, mvx = mv
        ry, ru, rv = self.refs[ref]
        pred_y = _interp_luma(ry, my * 16, mx * 16, 16, 16,
                              mvy, mvx)
        pred_u = _interp_chroma(ru, my * 8, mx * 8, 8, 8,
                                mvy, mvx)
        pred_v = _interp_chroma(rv, my * 8, mx * 8, 8, 8,
                                mvy, mvx)
        return self._wp_mono((pred_y, pred_u, pred_v), ref=ref)

    def _commit_part(self, by: int, bx: int, w4: int, h4: int,
                     mv: tuple[int, int], ref: int = 0) -> None:
        """Record one partition's motion at block granularity (the
        second partition of an MB predicts from the first, so this
        runs per partition, before the MB-level commit)."""
        self.mv4[by:by + h4, bx:bx + w4] = mv
        self.dec4[by:by + h4, bx:bx + w4] = 2
        self.ref4[by:by + h4, bx:bx + w4] = ref

    def _finish_inter_mb(self, addr: int) -> None:
        my, mx = divmod(addr, self.mb_w)
        self.mb_state[my, mx] = 2
        # later intra MBs predict mode DC from inter neighbors (8.3.1)
        self.modes[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 2

    def _commit_inter(self, addr: int, mv: tuple[int, int],
                      ref: int = 0) -> None:
        my, mx = divmod(addr, self.mb_w)
        self._commit_part(my * 4, mx * 4, 4, 4, mv, ref)
        self._finish_inter_mb(addr)

    def _mc_pred_split(self, my: int, mx: int, mb_type: int, mvs,
                       refs=None, parts=None):
        """Assembled MB prediction from per-partition MVs (and
        per-partition L0 references; weighting runs per partition so
        mixed-reference macroblocks weight each region with its own
        table entry — pointwise, so identical to whole-MB weighting
        in the uniform case).  ``parts`` overrides the
        :func:`_p_parts` geometry for sub-8x8 split macroblocks."""
        pred_y = np.zeros((16, 16), dtype=np.int64)
        pred_u = np.zeros((8, 8), dtype=np.int64)
        pred_v = np.zeros((8, 8), dtype=np.int64)
        if parts is None:
            parts = _p_parts(mb_type, my, mx)
        if refs is None:
            refs = [0] * len(parts)
        for part, mv, ref in zip(parts, mvs, refs):
            _, _, _, _, _, (py, px, bh, bw), (cy, cx, ch, cw) = part
            ry, ru, rv = self.refs[ref]
            piece = self._wp_mono(
                (_interp_luma(ry, py, px, bh, bw, mv[0], mv[1]),
                 _interp_chroma(ru, cy, cx, ch, cw, mv[0], mv[1]),
                 _interp_chroma(rv, cy, cx, ch, cw, mv[0], mv[1])),
                ref=ref)
            oy, ox = py - my * 16, px - mx * 16
            pred_y[oy:oy + bh, ox:ox + bw] = piece[0]
            ou, ov = cy - my * 8, cx - mx * 8
            pred_u[ou:ou + ch, ov:ov + cw] = piece[1]
            pred_v[ou:ou + ch, ov:ov + cw] = piece[2]
        return pred_y, pred_u, pred_v

    # ---- decode side ----

    def _decode_skip(self, addr: int) -> None:
        my, mx = divmod(addr, self.mb_w)
        mv = self._skip_mv(my, mx)
        pred_y, pred_u, pred_v = self._mc_pred(my, mx, mv)
        self.y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
            pred_y.astype(np.uint8)
        self.u[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
            pred_u.astype(np.uint8)
        self.v[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
            pred_v.astype(np.uint8)
        self.nc_y[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 0
        self.nc_u[my * 2:(my + 1) * 2, mx * 2:(mx + 1) * 2] = 0
        self.nc_v[my * 2:(my + 1) * 2, mx * 2:(mx + 1) * 2] = 0
        self._commit_inter(addr, mv)

    def _search_rect(self, src: np.ndarray, py: int, px: int,
                     bh: int, bw: int, rng: int,
                     ref_y: np.ndarray, mvp: tuple[int, int],
                     ) -> tuple[tuple[int, int], int]:
        """Center-biased integer full search over an arbitrary
        partition rectangle, then half- and quarter-pel refinement
        through the SAME interpolator the decoder runs.  Cost = SAD +
        a small mvd-bits bias so near-predictor vectors (and
        therefore skips) win ties."""
        cy, cx = mvp[0] >> 2, mvp[1] >> 2      # integer-pel center
        h, w = ref_y.shape
        best: tuple[int, tuple[int, int]] | None = None
        for dy in range(-rng, rng + 1):
            for dx in range(-rng, rng + 1):
                ivy, ivx = cy + dy, cx + dx
                rows = np.clip(np.arange(py + ivy, py + ivy + bh), 0, h - 1)
                cols = np.clip(np.arange(px + ivx, px + ivx + bw), 0, w - 1)
                cand = ref_y[np.ix_(rows, cols)].astype(np.int64)
                mv = (ivy * 4, ivx * 4)
                cost = int(np.abs(src - cand).sum()) + 2 * (
                    abs(mv[0] - mvp[0]) + abs(mv[1] - mvp[1]))
                if best is None or cost < best[0]:
                    best = (cost, mv)
        for step in (2, 1):                     # half then quarter
            base = best[1]
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    if dy == 0 and dx == 0:
                        continue
                    mv = (base[0] + dy, base[1] + dx)
                    cand = _interp_luma(ref_y, py, px, bh, bw,
                                        mv[0], mv[1])
                    cost = int(np.abs(src - cand).sum()) + 2 * (
                        abs(mv[0] - mvp[0]) + abs(mv[1] - mvp[1]))
                    if cost < best[0]:
                        best = (cost, mv)
        return best[1], best[0]

    def _motion_search(self, src: np.ndarray, my: int, mx: int,
                       rng: int, ref_y: np.ndarray | None = None,
                       mvp: tuple[int, int] | None = None,
                       ) -> tuple[tuple[int, int], int]:
        """Whole-MB (16x16) search; ``ref_y`` and ``mvp`` default to
        the single-list P state — the B lane passes its per-list
        plane and predictor."""
        if ref_y is None:
            ref_y = self._search_ref_y()
        if mvp is None:
            mvp = self._mv_pred(my, mx)
        return self._search_rect(src, my * 16, mx * 16, 16, 16, rng,
                                 ref_y, mvp)

    def _search_split(self, y_src: np.ndarray, my: int, mx: int,
                      mb_type: int, rng: int):
        """Search both partitions of a 16x8/8x16 split.  The second
        partition's predictor depends on the first's committed motion,
        so the first partition is committed tentatively to the block
        grids and rolled back.  Returns (mvs, mvps, total_cost)."""
        parts = _p_parts(mb_type, my, mx)
        saved = []
        mvs, mvps, total = [], [], 0
        try:
            for by, bx, w4, h4, shape, (py, px, bh, bw), _ in parts:
                src = y_src[py:py + bh, px:px + bw].astype(np.int64)
                mvp = self._mv_pred_part(by, bx, w4, h4, shape)
                mv, cost = self._search_rect(src, py, px, bh, bw,
                                             rng, self._search_ref_y(),
                                             mvp)
                saved.append((by, bx, w4, h4,
                              self.mv4[by:by + h4, bx:bx + w4].copy(),
                              self.dec4[by:by + h4, bx:bx + w4].copy(),
                              self.ref4[by:by + h4, bx:bx + w4].copy()))
                self._commit_part(by, bx, w4, h4, mv)
                mvs.append(mv)
                mvps.append(mvp)
                total += cost
        finally:
            for by, bx, w4, h4, mv4s, dec4s, ref4s in reversed(saved):
                self.mv4[by:by + h4, bx:bx + w4] = mv4s
                self.dec4[by:by + h4, bx:bx + w4] = dec4s
                self.ref4[by:by + h4, bx:bx + w4] = ref4s
        return mvs, mvps, total

    def _search_sub_split(self, y_src: np.ndarray, my: int, mx: int,
                          rng: int):
        """Greedy per-8x8-block sub_mb_type competition for P_8x8:
        each 8x8 sub-macroblock tries all of Table 7-17 (8x8 / 8x4 /
        4x8 / 4x4), sub-MVs searched in coding order with tentative
        commits so later predictors see earlier motion; the
        SAD+bit-bias winner is committed and the next block searched
        against it.  Both entropy lanes call this, so mode decisions
        (and therefore pixels) stay identical across CAVLC/CABAC.
        Returns (subs, parts, mvs, mvps, cost); every tentative
        commit is rolled back before returning."""
        saved_all = []
        subs: list[int] = []
        parts_all, mvs_all, mvps_all = [], [], []
        total = 0
        ref_y = self._search_ref_y()
        try:
            for i in range(4):
                best = None
                for st, bias in _SUB_BIAS:
                    ps = _sub_parts(i, st, my, mx)
                    saved, mvs, mvps, cost = [], [], [], bias
                    for by, bx, w4, h4, shape, (py, px, bh, bw), _ in ps:
                        src = y_src[py:py + bh,
                                    px:px + bw].astype(np.int64)
                        mvp = self._mv_pred_part(by, bx, w4, h4, shape)
                        mv, c = self._search_rect(src, py, px, bh, bw,
                                                  rng, ref_y, mvp)
                        saved.append((
                            by, bx, w4, h4,
                            self.mv4[by:by + h4, bx:bx + w4].copy(),
                            self.dec4[by:by + h4, bx:bx + w4].copy(),
                            self.ref4[by:by + h4, bx:bx + w4].copy()))
                        self._commit_part(by, bx, w4, h4, mv)
                        mvs.append(mv)
                        mvps.append(mvp)
                        cost += c
                    for by, bx, w4, h4, m4, d4, r4 in reversed(saved):
                        self.mv4[by:by + h4, bx:bx + w4] = m4
                        self.dec4[by:by + h4, bx:bx + w4] = d4
                        self.ref4[by:by + h4, bx:bx + w4] = r4
                    if best is None or cost < best[0]:
                        best = (cost, st, ps, mvs, mvps)
                cost, st, ps, mvs, mvps = best
                # commit the winner (from the same base state the
                # candidate was searched in, so its mvps stay valid)
                for (by, bx, w4, h4, _, _, _), mv in zip(ps, mvs):
                    saved_all.append((
                        by, bx, w4, h4,
                        self.mv4[by:by + h4, bx:bx + w4].copy(),
                        self.dec4[by:by + h4, bx:bx + w4].copy(),
                        self.ref4[by:by + h4, bx:bx + w4].copy()))
                    self._commit_part(by, bx, w4, h4, mv)
                subs.append(st)
                parts_all.extend(ps)
                mvs_all.extend(mvs)
                mvps_all.extend(mvps)
                total += cost
        finally:
            for by, bx, w4, h4, m4, d4, r4 in reversed(saved_all):
                self.mv4[by:by + h4, bx:bx + w4] = m4
                self.dec4[by:by + h4, bx:bx + w4] = d4
                self.ref4[by:by + h4, bx:bx + w4] = r4
        return subs, parts_all, mvs_all, mvps_all, total

    def _quantize_inter(self, addr: int, mv: tuple[int, int],
                        y_src: np.ndarray, u_src: np.ndarray,
                        v_src: np.ndarray, preds=None,
                        ref: int = 0):
        """Transform+quantize the MC residual; returns everything the
        writer and the reconstructor need.  ``preds`` overrides the
        single-list motion compensation (the B lane passes its
        combined uni/bi prediction)."""
        my, mx = divmod(addr, self.mb_w)
        pred_y, pred_u, pred_v = (preds if preds is not None
                                  else self._mc_pred(my, mx, mv, ref))
        src = y_src[my * 16:(my + 1) * 16,
                    mx * 16:(mx + 1) * 16].astype(np.int64)
        resid = src - pred_y
        luma_q = []
        cbp = 0
        for blk in range(16):
            bx, by = _BLK_XY[blk]
            q = _quant4(_fdct4(resid[by * 4:by * 4 + 4,
                                     bx * 4:bx * 4 + 4]), self.qp)
            if q.any():
                cbp |= 1 << _BLK_GROUP[blk]
            luma_q.append(q)
        self._mc_chroma = {"u": pred_u, "v": pred_v}
        try:
            dc_q, ac_q, cbp_chroma = self._chroma_quantize(
                my, mx, u_src, v_src)
        finally:
            self._mc_chroma = None
        cbp |= cbp_chroma << 4
        return pred_y, pred_u, pred_v, luma_q, dc_q, ac_q, cbp

    def _recon_inter(self, addr: int, pred_y, pred_u, pred_v,
                     luma_q, dc_q, ac_q, cbp) -> None:
        my, mx = divmod(addr, self.mb_w)
        for blk in range(16):
            bx, by = _BLK_XY[blk]
            gy, gx = my * 4 + by, mx * 4 + bx
            q = (luma_q[blk] if cbp & (1 << _BLK_GROUP[blk])
                 else np.zeros((4, 4), dtype=np.int64))
            self.y[gy * 4:gy * 4 + 4, gx * 4:gx * 4 + 4] = _recon4(
                pred_y[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4], q, self.qp)
        dc_eff, ac_eff = self._chroma_effective(dc_q, ac_q, cbp >> 4)
        self._mc_chroma = {"u": pred_u, "v": pred_v}
        try:
            self._chroma_recon(my, mx, dc_eff, ac_eff)
        finally:
            self._mc_chroma = None

    def _read_inter_residual(self, r: _BitReader, addr: int,
                             pred_y, pred_u, pred_v) -> None:
        """coded_block_pattern + residual decode + reconstruction
        over a motion-compensated prediction — the entropy tail every
        non-skip inter macroblock shares (P_L0_16x16 and all four
        B 16x16 modes)."""
        from rmlint_spark.operators.h264 import _read_se, _read_ue

        my, mx = divmod(addr, self.mb_w)
        cbp_code = _read_ue(r)
        if cbp_code > 47:
            raise ValueError("H.264 coded_block_pattern out of range")
        cbp = _CBP_FROM_CODE[cbp_code]
        if cbp:
            self.qp += _read_se(r)
            if not 0 <= self.qp <= 51:
                raise ValueError("H.264 mb_qp_delta drives QP out of range")
        for blk in range(16):
            bx, by = _BLK_XY[blk]
            gy, gx = my * 4 + by, mx * 4 + bx
            if cbp & (1 << _BLK_GROUP[blk]):
                nc = _nc_for(self.nc_y, gy, gx)
                vals = _read_residual(r, nc, 16)
                self.nc_y[gy, gx] = sum(1 for vv in vals if vv)
                q = _unscan_coeffs(vals)
            else:
                self.nc_y[gy, gx] = 0
                q = np.zeros((4, 4), dtype=np.int64)
            self.y[gy * 4:gy * 4 + 4, gx * 4:gx * 4 + 4] = _recon4(
                pred_y[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4], q, self.qp)
        dc_q, ac_q = self._chroma_read(r, cbp >> 4, my, mx)
        self._mc_chroma = {"u": pred_u, "v": pred_v}
        try:
            self._chroma_recon(my, mx, dc_q, ac_q)
        finally:
            self._mc_chroma = None

    def _write_inter_residual(self, w: _BitWriter, addr: int,
                              pred_y, pred_u, pred_v,
                              luma_q, dc_q, ac_q, cbp) -> None:
        """The write-side twin of :meth:`_read_inter_residual`:
        CBP, luma/chroma residual entropy, in-loop reconstruction."""
        from rmlint_spark.operators.h264 import _write_se, _write_ue

        my, mx = divmod(addr, self.mb_w)
        _write_ue(w, _CBP_TO_CODE[cbp])
        if cbp:
            _write_se(w, 0)                 # mb_qp_delta
        for blk in range(16):
            bx, by = _BLK_XY[blk]
            gy, gx = my * 4 + by, mx * 4 + bx
            if cbp & (1 << _BLK_GROUP[blk]):
                nc = _nc_for(self.nc_y, gy, gx)
                self.nc_y[gy, gx] = _write_residual(
                    w, _scan_coeffs(luma_q[blk]), nc)
            else:
                self.nc_y[gy, gx] = 0
        self._mc_chroma = {"u": pred_u, "v": pred_v}
        try:
            self._chroma_write(w, dc_q, ac_q, cbp >> 4, my, mx)
        finally:
            self._mc_chroma = None
        self._recon_inter(addr, pred_y, pred_u, pred_v,
                          luma_q, dc_q, ac_q, cbp)

def _read_te1(r: _BitReader) -> int:
    """te(v) with range 0..1 (9.1.1): one bit, INVERTED."""
    return 1 - r.read(1)


def _write_te1(w: _BitWriter, v: int) -> None:
    w.write(1 - v, 1)


class InterPicture(MotionMixin, CavlcPicture):
    """CavlcPicture plus MotionMixin: the CAVLC-entropy P lane.
    I-slice macroblocks inside the same picture run through the
    inherited intra paths."""

    def __init__(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                 mb_w: int, mb_h: int,
                 ref: tuple[np.ndarray, np.ndarray, np.ndarray],
                 ref1: tuple[np.ndarray, np.ndarray, np.ndarray] | None
                 = None,
                 more: list[tuple[np.ndarray, np.ndarray,
                                  np.ndarray]] | None = None) -> None:
        CavlcPicture.__init__(self, y, u, v, mb_w, mb_h)
        self._init_motion(ref, ref1, more)

    def decode_ipcm(self, r: _BitReader, addr: int) -> None:
        """I_PCM raw samples (also reachable from P slices as
        mb_type 30); mirrors the I-slice inline path in h264.py."""
        while r.bitpos:
            if r.read(1):
                raise ValueError("nonzero pcm_alignment bit")
        if r.bytepos + 384 > len(r.data):
            raise ValueError("truncated I_PCM macroblock")
        my, mx = divmod(addr, self.mb_w)
        raw = np.frombuffer(r.data, dtype=np.uint8, count=384,
                            offset=r.bytepos)
        r.bytepos += 384
        self.y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
            raw[:256].reshape(16, 16)
        self.u[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
            raw[256:320].reshape(8, 8)
        self.v[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
            raw[320:].reshape(8, 8)
        self.mark_ipcm(addr)

    def decode_slice_p(self, r: _BitReader, first_mb: int,
                       covered: np.ndarray) -> None:
        """slice_data() for a CAVLC P slice (7.3.4): alternating
        mb_skip_run / macroblock_layer until the rbsp stop bit."""
        from rmlint_spark.operators.h264 import (_more_rbsp_data,
                                                 _read_ue)

        total = self.mb_w * self.mb_h
        addr = first_mb
        while _more_rbsp_data(r):
            skip_run = _read_ue(r)
            for _ in range(skip_run):
                if addr >= total:
                    raise ValueError("H.264 mb_skip_run overruns "
                                     "the picture")
                self._decode_skip(addr)
                self.note_qp(addr)
                covered[addr] = True
                addr += 1
            if not _more_rbsp_data(r):
                break
            if addr >= total:
                raise ValueError("H.264 slice data overruns the picture")
            mb_type = _read_ue(r)
            my, mx = divmod(addr, self.mb_w)
            if mb_type == _P_L0_16x16:
                self.decode_mb_p16(r, addr)
            elif mb_type in (_P_L0_L0_16x8, _P_L0_L0_8x16):
                self.decode_mb_p2(r, addr, mb_type)
            elif mb_type in (_P_8x8, _P_8x8REF0):
                self.decode_mb_p8x8(r, addr, mb_type)
            else:
                it = mb_type - _P_INTRA_OFFSET
                if it == 25:
                    self.decode_ipcm(r, addr)
                elif it == 0:
                    self.decode_mb(r, addr)
                elif it <= 24:
                    self.decode_mb16(r, addr, it)
                else:
                    raise ValueError(f"invalid P-slice mb_type {mb_type}")
                # intra MBs are AVAILABLE-but-not-inter to later MV
                # prediction (8.4.1.3: mvLXN = 0, refIdxLXN = -1) —
                # the same semantics the CABAC lane records, so both
                # entropy lanes derive identical predictors
                self.note_intra(addr)
            self.note_qp(addr)
            covered[addr] = True
            addr += 1

    # ---- encode side ----

    def _read_ref_idx(self, r: _BitReader, n_act: int) -> int:
        """ref_idx_lX for an active count, te(v) per 9.1.1: absent
        (0) when one reference is active, one INVERTED bit when
        exactly two are, plain ue(v) beyond that."""
        if n_act <= 1:
            return 0
        if n_act == 2:
            return _read_te1(r)
        from rmlint_spark.operators.h264 import _read_ue

        v = _read_ue(r)
        if v >= n_act:
            raise ValueError(
                "H.264 ref_idx beyond num_ref_idx_lX_active")
        return v

    def _write_ref_idx(self, w: _BitWriter, ref: int,
                       n_act: int) -> None:
        """Encode-side twin of :meth:`_read_ref_idx` (same te(v)
        regimes keyed on the list's active count)."""
        if n_act <= 1:
            return
        if n_act == 2:
            _write_te1(w, ref)
            return
        from rmlint_spark.operators.h264 import _write_ue

        _write_ue(w, ref)

    def _read_ref_l0(self, r: _BitReader) -> int:
        return self._read_ref_idx(r, self.n_ref0)

    def _write_ref_l0(self, w: _BitWriter, ref: int) -> None:
        self._write_ref_idx(w, ref, self.n_ref0)

    def decode_mb_p16(self, r: _BitReader, addr: int) -> None:
        """P_L0_16x16: ref_idx_l0 (if >1 active), mvd pair, CBP,
        residual over the MC block."""
        from rmlint_spark.operators.h264 import _read_se, _read_ue

        my, mx = divmod(addr, self.mb_w)
        ref = self._read_ref_l0(r)
        mvd_x = _read_se(r)                 # compIdx 0 = horizontal
        mvd_y = _read_se(r)
        mvp = self._mv_pred(my, mx, ref)
        mv = (mvp[0] + mvd_y, mvp[1] + mvd_x)
        pred_y, pred_u, pred_v = self._mc_pred(my, mx, mv, ref)
        self._read_inter_residual(r, addr, pred_y, pred_u, pred_v)
        self._commit_inter(addr, mv, ref)

    def decode_mb_p2(self, r: _BitReader, addr: int,
                     mb_type: int) -> None:
        """P_L0_L0_16x8 / P_L0_L0_8x16: per-partition ref_idx_l0
        first (7.3.5.1 syntax order), then two mvd pairs in partition
        order (the second partition's predictor sees the first's
        committed motion), then one CBP + residual over the assembled
        prediction."""
        from rmlint_spark.operators.h264 import _read_se

        my, mx = divmod(addr, self.mb_w)
        parts = _p_parts(mb_type, my, mx)
        refs = [self._read_ref_l0(r) for _ in parts]
        mvs = []
        for (by, bx, w4, h4, shape, _, _), ref in zip(parts, refs):
            mvd_x = _read_se(r)             # compIdx 0 = horizontal
            mvd_y = _read_se(r)
            p = self._mv_pred_part(by, bx, w4, h4, shape, ref)
            mv = (p[0] + mvd_y, p[1] + mvd_x)
            self._commit_part(by, bx, w4, h4, mv, ref)
            mvs.append(mv)
        pred_y, pred_u, pred_v = self._mc_pred_split(my, mx, mb_type,
                                                     mvs, refs)
        self._read_inter_residual(r, addr, pred_y, pred_u, pred_v)
        self._finish_inter_mb(addr)

    def decode_mb_p8x8(self, r: _BitReader, addr: int,
                       mb_type: int) -> None:
        """P_8x8 / P_8x8ref0 (7.3.5.2): four sub_mb_type codes — ALL
        of Table 7-17 decodes (8x8, 8x4, 4x8, 4x4) — then ref_idx_l0
        per 8x8 sub-macroblock (P_8x8 only — P_8x8ref0 pins every
        reference to 0 with no syntax), then one mvd pair per
        sub-partition in coding order (each predicting from the
        already committed ones), then one CBP + residual."""
        from rmlint_spark.operators.h264 import _read_se, _read_ue

        my, mx = divmod(addr, self.mb_w)
        subs = [_read_ue(r) for _ in range(4)]
        if mb_type == _P_8x8REF0:
            refs8 = [0] * 4
        else:
            refs8 = [self._read_ref_l0(r) for _ in range(4)]
        parts, refs = _sub_split_parts(subs, refs8, my, mx)
        mvs = []
        for (by, bx, w4, h4, shape, _, _), ref in zip(parts, refs):
            mvd_x = _read_se(r)
            mvd_y = _read_se(r)
            p = self._mv_pred_part(by, bx, w4, h4, shape, ref)
            mv = (p[0] + mvd_y, p[1] + mvd_x)
            self._commit_part(by, bx, w4, h4, mv, ref)
            mvs.append(mv)
        pred_y, pred_u, pred_v = self._mc_pred_split(my, mx, mb_type,
                                                     mvs, refs,
                                                     parts=parts)
        self._read_inter_residual(r, addr, pred_y, pred_u, pred_v)
        self._finish_inter_mb(addr)


    def encode_mb_p(self, w: _BitWriter, addr: int, y_src: np.ndarray,
                    u_src: np.ndarray, v_src: np.ndarray,
                    search: int, partitions: bool = False) -> bool:
        """Encode one P-slice macroblock; returns True when the MB
        became a P_Skip (the caller then folds it into mb_skip_run
        instead of emitting a layer).  With ``partitions`` the
        16x8/8x16 splits compete with the whole-MB mode by SAD +
        mvd-bits cost."""
        from rmlint_spark.operators.h264 import _write_se, _write_ue

        my, mx = divmod(addr, self.mb_w)
        py, px = my * 16, mx * 16
        src = y_src[py:py + 16, px:px + 16].astype(np.int64)
        mv, inter_cost = self._motion_search(src, my, mx, search)
        ref = 0
        # every older active reference competes for the whole-MB mode
        # (a small per-index bias covers the extra ref_idx bits)
        for ridx in range(1, min(self.n_ref0, len(self.refs))):
            mv1, cost1 = self._motion_search(
                src, my, mx, search, ref_y=self._search_ref_y(ridx),
                mvp=self._mv_pred(my, mx, ridx))
            if cost1 + 16 + 8 * (ridx - 1) < inter_cost:
                ref, mv = ridx, mv1
                inter_cost = cost1 + 16 + 8 * (ridx - 1)
        split_best = None
        if partitions:
            for t in (_P_L0_L0_16x8, _P_L0_L0_8x16):
                mvs, mvps, cost = self._search_split(y_src, my, mx,
                                                     t, search)
                cost += 96              # bit-cost bias: extra mvd pair
                if split_best is None or cost < split_best[0]:
                    split_best = (cost, t, mvs, mvps, None, None)
            # P_8x8 with per-block sub_mb_type competition (the
            # all-8x8 pattern degenerates to the former plain-P_8x8
            # candidate at the same cost)
            subs, sparts, mvs, mvps, cost = self._search_sub_split(
                y_src, my, mx, search)
            cost += 320                 # four sub codes + mvd baseline
            if cost < split_best[0]:
                split_best = (cost, _P_8x8, mvs, mvps, subs, sparts)
        if split_best is not None and split_best[0] < inter_cost:
            cost, t, mvs, mvps, subs, sparts = split_best
            if t == _P_8x8 and self.n_ref0 > 1:
                _write_ue(w, _P_8x8REF0)    # all refs 0, no te(v) bits
            else:
                _write_ue(w, t)
            parts = sparts if t == _P_8x8 else _p_parts(t, my, mx)
            if t == _P_8x8:
                for st in subs:
                    _write_ue(w, st)
            elif self.n_ref0 > 1:
                for _ in parts:
                    self._write_ref_l0(w, 0)  # partitions search ref 0
            for (by, bx, w4, h4, _, _, _), pmv, pmvp in zip(
                    parts, mvs, mvps):
                _write_se(w, pmv[1] - pmvp[1])
                _write_se(w, pmv[0] - pmvp[0])
                self._commit_part(by, bx, w4, h4, pmv)
            preds = self._mc_pred_split(my, mx, t, mvs, parts=parts)
            (pred_y, pred_u, pred_v, luma_q, dc_q, ac_q,
             cbp) = self._quantize_inter(addr, mvs[0], y_src, u_src,
                                         v_src, preds=preds)
            self._write_inter_residual(w, addr, pred_y, pred_u,
                                       pred_v, luma_q, dc_q, ac_q,
                                       cbp)
            self._finish_inter_mb(addr)
            return False
        # intra fallback when motion search fails badly (scene cut):
        # estimate via the best whole-MB intra prediction
        intra_best = None
        for mode in (0, 1, 2, 3):
            if (mode == 0 and my == 0) or (mode == 1 and mx == 0):
                continue
            if mode == 3 and (my == 0 or mx == 0):
                continue
            pred = _pred16x16(self.y, py, px, mode,
                              has_top=my > 0, has_left=mx > 0)
            sad = int(np.abs(src - pred).sum())
            if intra_best is None or sad < intra_best:
                intra_best = sad
        if intra_best is not None and inter_cost > 2 * intra_best + 512:
            self.mb_type_offset = _P_INTRA_OFFSET
            try:
                self.encode_mb(w, addr, y_src, u_src, v_src)
            finally:
                self.mb_type_offset = 0
            self.note_intra(addr)       # available-not-inter (8.4.1.3)
            return False
        (pred_y, pred_u, pred_v, luma_q, dc_q, ac_q,
         cbp) = self._quantize_inter(addr, mv, y_src, u_src, v_src,
                                     ref=ref)
        if cbp == 0 and ref == 0 and mv == self._skip_mv(my, mx):
            self._decode_skip(addr)             # recon == decoder's skip
            return True
        mvp = self._mv_pred(my, mx, ref)
        _write_ue(w, _P_L0_16x16)
        self._write_ref_l0(w, ref)
        _write_se(w, mv[1] - mvp[1])            # mvd horizontal first
        _write_se(w, mv[0] - mvp[0])
        self._write_inter_residual(w, addr, pred_y, pred_u, pred_v,
                                   luma_q, dc_q, ac_q, cbp)
        self._commit_inter(addr, mv, ref)
        return False


# --------------------------------------------------------- top level

def _estimate_wp_plane(src: np.ndarray, ref: np.ndarray,
                       logwd: int) -> tuple[int, int]:
    """Least-squares (weight, offset) fit of ``src ~ w/2^logwd * ref
    + o`` over one plane, clamped to the pred_weight_table se(v)
    range.  Degenerate (flat) references fall back to a pure offset."""
    s = src.astype(np.float64)
    rf = ref.astype(np.float64)
    var = rf.var()
    if var > 1e-3:
        slope = ((s * rf).mean() - s.mean() * rf.mean()) / var
    else:
        slope = 1.0
    w = max(-128, min(127, int(round(slope * (1 << logwd)))))
    o = max(-128, min(127,
                      int(round(s.mean() - w * rf.mean() / (1 << logwd)))))
    return w, o


def _estimate_wp(planes: tuple[np.ndarray, np.ndarray, np.ndarray],
                 ref: tuple[np.ndarray, np.ndarray, np.ndarray],
                 logwd: int = 6) -> dict:
    """Per-plane explicit-WP estimate of a (y, u, v) source against a
    reconstructed reference — the standard fade/brightness model a
    conforming encoder derives before writing pred_weight_table."""
    w_y, o_y = _estimate_wp_plane(planes[0], ref[0], logwd)
    w_u, o_u = _estimate_wp_plane(planes[1], ref[1], logwd)
    w_v, o_v = _estimate_wp_plane(planes[2], ref[2], logwd)
    return {"logwd_y": logwd, "logwd_c": logwd,
            "l0": (w_y, o_y, w_u, o_u, w_v, o_v)}


def _estimate_wp_bi(planes: tuple[np.ndarray, np.ndarray, np.ndarray],
                    ref0: tuple[np.ndarray, np.ndarray, np.ndarray],
                    ref1: tuple[np.ndarray, np.ndarray, np.ndarray],
                    logwd: int = 6) -> dict:
    """Joint two-reference least-squares explicit-B weights: fit
    ``src ~ (w0 p0 + w1 p1) / 2^(logwd+1) + (o0 + o1) / 2`` per plane
    — the 8.4.2.3.3 *bi* formula, NOT two independent mono fits
    (whose weights the bi combiner would halve).  The offset is split
    evenly across the lists."""
    l0, l1 = [], []
    for src, r0, r1 in zip(planes, ref0, ref1):
        s = src.astype(np.float64).ravel()
        a = np.stack([r0.astype(np.float64).ravel(),
                      r1.astype(np.float64).ravel(),
                      np.ones_like(s)], axis=1)
        coef, *_ = np.linalg.lstsq(a, s, rcond=None)
        den = 1 << (logwd + 1)
        w0 = max(-128, min(127, int(round(coef[0] * den))))
        w1 = max(-128, min(127, int(round(coef[1] * den))))
        o = max(-128, min(127, int(round(coef[2]))))
        l0 += [w0, o]
        l1 += [w1, o]
    return {"logwd_y": logwd, "logwd_c": logwd,
            "l0": tuple(l0), "l1": tuple(l1)}


def encode_h264_p(frames: list[np.ndarray],
                  fps: tuple[int, int] = (25, 1),
                  qp: int = 20,
                  gop: int = 8,
                  search: int = 4,
                  partitions: bool = False,
                  wp: bool = False,
                  refs: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB frames -> Annex-B H.264 with IDR+P GOPs
    (IPPP..., a new IDR every ``gop`` frames) and CAVLC entropy.
    Lossy at ``qp``; self-consistent with
    :func:`rmlint_spark.operators.h264.decode_h264` (the documented
    VLC-table deviations of h264_cavlc.py apply here too).  With
    ``wp`` the PPS sets weighted_pred_flag and every P slice carries
    a least-squares pred_weight_table (7.3.3.2) fitted per plane —
    the fade/brightness model of 8.4.2.3.3 explicit weighting.

    ``refs >= 2`` enables multi-reference prediction: P slices
    override num_ref_idx_l0_active to however many references the
    DPB holds (up to ``refs``, encoder subset cap 4), whole-MB modes
    compete across all of them (te(v) ref_idx_l0 syntax — ue(v) once
    more than two are active) — the flicker/occlusion mode where an
    older frame beats t-1."""
    from rmlint_spark.operators.h264 import (
        _START4,
        _encode_pps,
        _encode_sps,
        _escape_rbsp,
        _pad_to_mb,
        _rgb_to_yuv420,
        _trailing_bits,
        _write_pred_weight_table,
        _write_deblock,
        _write_se,
        _write_ue,
    )
    if not frames:
        raise ValueError("need at least one frame")
    if not 0 <= qp <= 29:
        raise ValueError("qp outside the implemented 0..29 subset")
    if gop < 1:
        raise ValueError("gop must be >= 1")
    if not 1 <= refs <= 4:
        raise ValueError("refs must be 1..4 (the implemented subset)")
    h, w = np.asarray(frames[0]).shape[:2]
    mb_w, mb_h = -(-w // 16), -(-h // 16)
    out = bytearray()
    out += _START4 + b"\x67" + _escape_rbsp(
        _encode_sps(mb_w, mb_h, w, h, fps, num_ref_frames=refs))
    out += _START4 + b"\x68" + _escape_rbsp(
        _encode_pps(weighted_pred=1 if wp else 0))
    prev: list[tuple] = []                  # recon refs, newest first
    for i, fr in enumerate(frames):
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        y, u, v = _rgb_to_yuv420(fr)
        y, u, v = _pad_to_mb(y, 16), _pad_to_mb(u, 8), _pad_to_mb(v, 8)
        is_idr = (i % gop == 0) or not prev
        n_ref0 = min(refs, len(prev)) if not is_idr else 0
        pic = InterPicture(
            np.zeros_like(y), np.zeros_like(u), np.zeros_like(v),
            mb_w, mb_h,
            prev[0] if prev else (np.zeros_like(y), np.zeros_like(u),
                                  np.zeros_like(v)),
            prev[1] if len(prev) > 1 else None,
            more=prev[2:])
        pic.qp = qp
        pic.n_ref0 = max(n_ref0, 1)
        if wp and not is_idr:
            pic.wp = _estimate_wp((y, u, v), prev[0])
            if n_ref0 > 1:
                pic.wp["l0x"] = [_estimate_wp((y, u, v), pr)["l0"]
                                 for pr in prev[1:n_ref0]]
        bw = _BitWriter()
        _write_ue(bw, 0)                    # first_mb_in_slice
        _write_ue(bw, 7 if is_idr else 5)   # slice_type: I / P (all)
        _write_ue(bw, 0)                    # pic_parameter_set_id
        bw.write(i % gop % 16, 4)           # frame_num (0 at each IDR)
        if is_idr:
            _write_ue(bw, i % 2)            # idr_pic_id
            bw.write(0, 1)                  # no_output_of_prior_pics
            bw.write(0, 1)                  # long_term_reference_flag
        else:
            if n_ref0 > 1:                  # num_ref_idx_active_override
                bw.write(1, 1)
                _write_ue(bw, n_ref0 - 1)   # num_ref_idx_l0_active_minus1
            else:
                bw.write(0, 1)
            bw.write(0, 1)                  # ref_pic_list_modification_l0
            if wp:                          # pred_weight_table (7.3.3)
                _write_pred_weight_table(bw, pic.wp, is_b=False,
                                         n_l0=max(n_ref0, 1))
            bw.write(0, 1)                  # adaptive_ref_pic_marking
        _write_se(bw, qp - 26)              # slice_qp_delta
        _write_deblock(bw)                  # explicit idc 1: filter off
        if is_idr:
            for addr in range(mb_w * mb_h):
                pic.encode_mb(bw, addr, y, u, v)
                pic.note_intra(addr)
        else:
            skip_run = 0
            for addr in range(mb_w * mb_h):
                probe = _BitWriter()
                if pic.encode_mb_p(probe, addr, y, u, v, search,
                                   partitions=partitions):
                    skip_run += 1
                    continue
                _write_ue(bw, skip_run)
                skip_run = 0
                bw.write(int.from_bytes(probe.buf, "big")
                         if probe.buf else 0, 8 * len(probe.buf))
                if probe.nbits:
                    bw.write(probe.acc, probe.nbits)
            if skip_run:
                _write_ue(bw, skip_run)
        _trailing_bits(bw)
        out += _START4 + (b"\x65" if is_idr else b"\x41") + \
            _escape_rbsp(bw.bytes())
        if is_idr:
            prev = []                       # IDR flushes the DPB
        prev.insert(0, (pic.y, pic.u, pic.v))
        del prev[refs:]
    return bytes(out)


__all__ = ["InterPicture", "encode_h264_p"]
