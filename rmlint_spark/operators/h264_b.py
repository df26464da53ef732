"""H.264 B-slice (bi-predictive) essence codec — pure numpy + stdlib.

Closes the last slice-type refusal of the video family: B slices with
B_Skip / B_Direct_16x16 / B_L0_16x16 / B_L1_16x16 / B_Bi_16x16
macroblocks (Table 7-14) now encode and decode FOR REAL in the CAVLC
lane, on top of the P machinery of h264_inter.py —

- **two reference lists**: L0 = the nearest past anchor, L1 = the
  nearest future anchor by PicOrderCnt (the 8.2.4.2.3 default
  initialization specialized to one reference per list); decode order
  emits each future anchor before its B group, and _H264Layout
  displays pictures in POC order;
- **default bi-prediction** (8.4.2.3.2, weighted_bipred_idc == 0):
  ``(predL0 + predL1 + 1) >> 1`` on luma and chroma, each list's
  prediction produced by the SAME quarter/eighth-pel interpolators
  the P lane uses;
- **per-list median MV prediction** (8.4.1.3): the P rule applied
  per reference list — a neighbor "matches" only when it predicts
  from the same list;
- **spatial direct mode** (8.4.1.2.2, the subset our single-ref
  lists make exact): refIdxLX = MinPositive over the A/B/C
  neighbors, directZeroPrediction when both lists come up empty,
  and the colZeroFlag stationarity test against the COLOCATED
  macroblock of RefPicList1[0] (the future anchor exports its motion
  grid for exactly this);
- **B_Skip** and **B_Direct_16x16**: spatial-direct motion, without /
  with coded residual, B_Skip carried by the same CAVLC
  ``mb_skip_run`` runs P uses (7.3.4);
- **intra-in-B**: mb_type >= 23 renames the whole I-slice table.

The encoder (``encode_h264_b``) emits closed segments
``IDR B..B P B..B P ... P`` — a B group never spans an IDR, so random
access starts at the segment IDR — choosing per macroblock among
direct / L0 / L1 / bi / intra by SAD + mvd-bits cost, converting
zero-residual direct macroblocks into skips, and reconstructing
in-loop through the decoder's own prediction path (the family's
drift-impossible discipline).

Weighted (bi-)prediction is supported since r5 s10: explicit
per-slice pred_weight_tables (wp="explicit", joint two-reference
least-squares fitting against the 8.4.2.3.3 bi formula) and implicit
POC-distance weights (wp="implicit", 8.4.2.3.1 — the crossfade
mode).  Temporal direct mode too (direct="temporal", 8.4.1.2.3:
colocated motion scaled by the POC-distance ratio — the
constant-velocity mode).  Both reference lists are DPB-general since
r5 s17 (multi-reference decode up to 16 active refs per list; the
GOP encoder emits a two-deep L0 via ``refs=2``, and picture-level
encodes exercise the two-deep L1 grammar).  Sub-16x16 B partitions
decode and encode since r5 s17 too: the full Table 7-14 16x8/8x16
family (per-partition L0/L1/Bi modes, mb_types 4..21) and B_8x8
with the COMPLETE Table 7-18 sub_mb_type set (B_Direct_8x8 and
L0/L1/Bi at 8x8/8x4/4x8/4x4) — per-list motion state lives at the
spec's 4x4-block granularity; the encoder emits 16x8/8x16 and the
8x8-level B_8x8 subset behind ``partitions=True``.  Reference
(pyramid) B pictures code since r5 s17 too: ``pyramid=True`` makes
each gap's middle B a reference picture (nal_ref_idc = 1, DPB
entry, dec_ref_pic_marking in its header, L0-preferred motion
export) and the leaf Bs predict from their nearest anchor/mid pair
— halving the temporal prediction distance.  Refusal surface after
this module: SP/SI slices.
CABAC-coded B slices decode too, via
h264_cabac_b.py composing this module's BiMotionMixin with the
arithmetic engine.

Codec-lane status: per-asset decode inside ``mapInPandas``
(multimodal.py), NOT a Spark hot path — the same boundary as the
rest of the codec family.

Reference parity note: rmlint hashes media as opaque bytes
(lib/checksum.c); this module serves the training-data multimodal
lane: the same frames stored all-intra, as an IDR+P GOP, or as a
B-pyramid-free IDR/P/B GOP decode to identical pixels, so
cross-container frame dedup spans bi-predicted video too.
"""

from __future__ import annotations

import numpy as np

from rmlint_spark.operators.flac import _BitReader, _BitWriter
from rmlint_spark.operators.h264_inter import (
    InterPicture,
    _interp_chroma,
    _interp_luma,
)

# B-slice mb_type table (7-14): the 16x16 modes, the partitioned
# family (4..21 = 16x8/8x16 with per-partition prediction modes,
# 22 = B_8x8 with Table 7-18 sub_mb_types) and the intra rename
_B_DIRECT_16x16 = 0
_B_L0_16x16 = 1
_B_L1_16x16 = 2
_B_BI_16x16 = 3
_B_8x8 = 22
_B_INTRA_OFFSET = 23

# Table 7-14 partitioned B mb_types: (mb_type - 4) >> 1 indexes the
# (partition 0, partition 1) prediction-mode pair; even mb_type is
# the 16x8 split, odd the 8x16 split
_B_PART_MODES = (
    ("l0", "l0"), ("l1", "l1"), ("l0", "l1"), ("l1", "l0"),
    ("l0", "bi"), ("l1", "bi"), ("bi", "l0"), ("bi", "l1"),
    ("bi", "bi"),
)

# Table 7-18 B sub_mb_types: prediction mode + _SUB_RECTS shape key
# (0 = 8x8, 1 = 8x4, 2 = 4x8, 3 = 4x4); sub_mb_type 0 = B_Direct_8x8
_B_SUB_MODES = {
    1: ("l0", 0), 2: ("l1", 0), 3: ("bi", 0),
    4: ("l0", 1), 5: ("l0", 2), 6: ("l1", 1), 7: ("l1", 2),
    8: ("bi", 1), 9: ("bi", 2),
    10: ("l0", 3), 11: ("l1", 3), 12: ("bi", 3),
}


def _mode_uses(mode: str) -> tuple[bool, bool]:
    """(use0, use1) for a Table 7-14/7-18 prediction mode name."""
    return mode != "l1", mode != "l0"


def _b_part_geometry(mb_type: int, my: int, mx: int):
    """(partition list, per-partition mode pair) for the two-partition
    B mb_types 4..21 — geometry shared with the P lane's 16x8/8x16
    splits (h264_inter._p_parts)."""
    from rmlint_spark.operators.h264_inter import _p_parts

    shape_t = 1 if (mb_type - 4) % 2 == 0 else 2
    return (_p_parts(shape_t, my, mx),
            _B_PART_MODES[(mb_type - 4) >> 1])


class BiMotionMixin:
    """The entropy-independent two-list machinery a B picture needs:
    the second reference, per-list motion state, per-list median MV
    prediction, spatial direct derivation, combined (bi-)prediction
    and the B skip reconstruction.  The CAVLC lane (BInterPicture
    below) and the CABAC lane (h264_cabac_b.CabacBInterPicture) both
    mix this in over their entropy-layer inter picture class —
    the same composition pattern as h264_inter.MotionMixin."""

    def _init_bimotion(
            self,
            ref1: tuple[np.ndarray, np.ndarray, np.ndarray],
            col: tuple[np.ndarray, np.ndarray],
            more1: list[tuple[np.ndarray, np.ndarray, np.ndarray]]
            | None = None) -> None:
        # L1 reference list, nearest future anchor first (8.2.4.2.4
        # ascending POC past the current picture); ``more1`` holds the
        # farther future anchors backing refIdx 1.. (r5 s17 makes
        # both B lists DPB-general; L0 rides MotionMixin.refs)
        self.refs1 = [ref1] + list(more1 or [])
        self.n_ref1 = 1
        self.ref1_y, self.ref1_u, self.ref1_v = ref1
        self.col_mvs, self.col_state = col
        # direct-mode selection: spatial (8.4.1.2.2, the default) or
        # temporal (8.4.1.2.3, needs the POC distances tb/td of the
        # current picture against its two anchors)
        self.direct_spatial = True
        self.direct_tbtd = (0, 0)
        mb_h, mb_w = self.mb_h, self.mb_w
        # per-list motion state at the spec's 4x4-block granularity
        # (since the sub-16x16 B partition lanes, r5 s17):
        # lmv4[by, bx, lst] = (mvy, mvx), luse4[by, bx, lst] = the
        # block predicts from list lst, lref4[by, bx, lst] = its
        # refIdx, ldec4 = 0 undecoded / 1 intra / 2 inter.  The
        # MB-granular names stay as strided views onto each MB's
        # top-left block (unpartitioned MBs fill the region
        # uniformly, so the views read the whole-MB value).
        self.lmv4 = np.zeros((mb_h * 4, mb_w * 4, 2, 2), dtype=np.int64)
        self.luse4 = np.zeros((mb_h * 4, mb_w * 4, 2), dtype=bool)
        self.lref4 = np.zeros((mb_h * 4, mb_w * 4, 2), dtype=np.int64)
        self.ldec4 = np.zeros((mb_h * 4, mb_w * 4), dtype=np.int64)
        self.lmv = self.lmv4[::4, ::4]
        self.luse = self.luse4[::4, ::4]
        self.lref = self.lref4[::4, ::4]

    # ---- per-list neighbors and MV prediction (8.4.1.3) ----

    def _nb4_b(self, by: int, bx: int, lst: int):
        """(available, uses-this-list, mv, refIdx) of 4x4 block
        (by, bx) — the partition-granular neighbor the spec's
        derivations read."""
        if not (0 <= by < self.mb_h * 4 and 0 <= bx < self.mb_w * 4):
            return False, False, (0, 0), -1
        st = int(self.ldec4[by, bx])
        if st == 0:
            return False, False, (0, 0), -1
        uses = st == 2 and bool(self.luse4[by, bx, lst])
        return True, uses, (int(self.lmv4[by, bx, lst, 0]),
                            int(self.lmv4[by, bx, lst, 1])), \
            (int(self.lref4[by, bx, lst]) if uses else -1)

    def _mv_pred_b_part(self, by: int, bx: int, w4: int, h4: int,
                        lst: int, ref: int = 0,
                        shape: str | None = None) -> tuple[int, int]:
        """Median MV predictor per list (8.4.1.3) for the partition
        whose top-left 4x4 block is (by, bx) spanning w4 x h4 blocks.
        ``shape`` selects the 8.4.1.3.2 directional shortcuts
        ('16x8_top' -> B, '16x8_bottom' -> A, '8x16_left' -> A,
        '8x16_right' -> C), applied when that neighbor predicts from
        the SAME (list, refIdx); the exactly-one-match shortcut is
        keyed by (list, refIdx) equality, while the median uses every
        neighbor predicting from this list regardless of refIdx —
        the same split as the P lane."""
        a = self._nb4_b(by, bx - 1, lst)
        b = self._nb4_b(by - 1, bx, lst)
        c = self._nb4_b(by - 1, bx + w4, lst)
        if not c[0]:
            c = self._nb4_b(by - 1, bx - 1, lst)        # D fallback
        directional = {"16x8_top": b, "16x8_bottom": a,
                       "8x16_left": a, "8x16_right": c}.get(shape)
        if (directional is not None and directional[0]
                and directional[1] and directional[3] == ref):
            return directional[2]
        if a[0] and not b[0] and not c[0]:
            return a[2]                                 # 8.4.1.3.1 rule 1
        matches = [n for n in (a, b, c) if n[0] and n[1]
                   and n[3] == ref]
        if len(matches) == 1:
            return matches[0][2]
        mvy = sorted(n[2][0] if n[1] else 0 for n in (a, b, c))[1]
        mvx = sorted(n[2][1] if n[1] else 0 for n in (a, b, c))[1]
        return mvy, mvx

    def _mv_pred_b(self, my: int, mx: int, lst: int,
                   ref: int = 0) -> tuple[int, int]:
        return self._mv_pred_b_part(my * 4, mx * 4, 4, 4, lst, ref)

    # ---- spatial direct derivation (8.4.1.2.2) ----

    def _col_mv(self, my: int, mx: int) -> tuple[int, int]:
        """Motion of the colocated macroblock in RefPicList1[0] —
        zero when it is intra (8.4.1.2.3 / colZeroFlag input).  A
        PARTITIONED colocated MB (mixed MVs) would make the per-8x8
        direct_8x8_inference corners diverge from this whole-MB
        derivation, so it refuses instead of silently deviating —
        our own encoder keeps B-stream anchors unpartitioned."""
        col_blk = self.col_mvs[my * 4:(my + 1) * 4,
                               mx * 4:(mx + 1) * 4]
        if int(self.col_state[my, mx]) == 2 and not (
                col_blk == col_blk[0, 0]).all():
            raise ValueError(
                "H.264 direct mode over a partitioned colocated "
                "macroblock is not in the implemented subset")
        if int(self.col_state[my, mx]) != 2:
            return 0, 0
        return int(col_blk[0, 0, 0]), int(col_blk[0, 0, 1])

    def _direct_mv(self, my: int, mx: int):
        """Returns (mv0, mv1, use0, use1, ref0, ref1) for B_Skip /
        B_Direct: spatial (8.4.1.2.2) or temporal (8.4.1.2.3)
        derivation per the slice header's
        direct_spatial_mv_pred_flag."""
        if not self.direct_spatial:
            return self._direct_mv_temporal(my, mx)
        by, bx = my * 4, mx * 4
        use = []
        refidx = []
        for lst in (0, 1):
            a = self._nb4_b(by, bx - 1, lst)
            b = self._nb4_b(by - 1, bx, lst)
            c = self._nb4_b(by - 1, bx + 4, lst)
            if not c[0]:
                c = self._nb4_b(by - 1, bx - 1, lst)
            # refIdxLX = MinPositive over the neighbors' refIdx in
            # this list (8.4.1.2.2; unavailable / intra / other-list
            # neighbors contribute -1)
            cand = [n[3] for n in (a, b, c) if n[3] >= 0]
            use.append(bool(cand))
            refidx.append(min(cand) if cand else 0)
        use0, use1 = use
        ref0, ref1 = refidx
        if not use0 and not use1:
            # directZeroPredictionFlag: both lists, refIdx 0, zero mv
            return (0, 0), (0, 0), True, True, 0, 0
        # colZeroFlag: the colocated MB of RefPicList1[0] is inter
        # (refIdxCol == 0 by construction) with |mv| <= 1 quarter-pel
        # (_col_mv also surfaces the partitioned-colocated refusal);
        # per 8.4.1.2.2 it zeroes only the list whose derived refIdx
        # is 0
        cmvy, cmvx = self._col_mv(my, mx)
        col_zero = (int(self.col_state[my, mx]) == 2
                    and abs(cmvy) <= 1 and abs(cmvx) <= 1)
        mv0 = (0, 0)
        mv1 = (0, 0)
        if use0 and not (col_zero and ref0 == 0):
            mv0 = self._mv_pred_b(my, mx, 0, ref0)
        if use1 and not (col_zero and ref1 == 0):
            mv1 = self._mv_pred_b(my, mx, 1, ref1)
        return mv0, mv1, use0, use1, ref0, ref1

    def _direct_mv_temporal(self, my: int, mx: int):
        """Temporal direct (8.4.1.2.3): scale the colocated motion by
        the POC-distance ratio — mvL0 = (DistScaleFactor * mvCol +
        128) >> 8, mvL1 = mvL0 - mvCol; both lists always predict
        from refIdx 0 (the single-ref-per-list subset this mode is
        exact for; multi-ref slices refuse temporal direct at the
        header).  With td == 0 (degenerate anchors) mvL0 = mvCol,
        mvL1 = 0."""
        cmvy, cmvx = self._col_mv(my, mx)
        tb, td = self.direct_tbtd
        tb = max(-128, min(127, tb))
        td = max(-128, min(127, td))
        if td == 0:
            return (cmvy, cmvx), (0, 0), True, True, 0, 0
        tx = (16384 + abs(td) // 2) // td
        dsf = max(-1024, min(1023, (tb * tx + 32) >> 6))
        mv0 = ((dsf * cmvy + 128) >> 8, (dsf * cmvx + 128) >> 8)
        mv1 = (mv0[0] - cmvy, mv0[1] - cmvx)
        return mv0, mv1, True, True, 0, 0

    # ---- prediction ----

    def _ref_planes(self, lst: int, ref: int = 0):
        if lst == 0:
            return self.refs[ref]
        return self.refs1[ref]

    def _search_ref_list(self, lst: int, ref: int = 0) -> np.ndarray:
        """Luma search plane for reference ``ref`` of list ``lst``:
        weighted under explicit WP (so candidate ranking matches the
        decoder's weighted prediction), raw otherwise — implicit
        weights never apply to mono predictions, and the bi candidate
        is scored through :meth:`_pred_b` which weights for real."""
        wp = self.wp
        ry = self._ref_planes(lst, ref)[0]
        if wp is None or wp.get("implicit"):
            return ry
        cache = getattr(self, "_wp_bref_cache", None)
        if cache is None:
            cache = self._wp_bref_cache = {}
        if (lst, ref) not in cache:
            vals = self._wp_entry("l0" if lst == 0 else "l1", ref)
            cache[(lst, ref)] = self._wp_plane(
                ry.astype(np.int64), vals[0], vals[1],
                wp["logwd_y"]).astype(np.uint8)
        return cache[(lst, ref)]

    def _mc_pred_rect(self, lrect, crect, mv: tuple[int, int],
                      lst: int, ref: int = 0):
        """Mono prediction of one list over arbitrary luma/chroma
        rects ((py, px, bh, bw) / (cy, cx, ch, cw)) — the partition-
        general form of the whole-MB prediction."""
        ry, ru, rv = self._ref_planes(lst, ref)
        py, px, bh, bw = lrect
        cy, cx, ch, cw = crect
        mvy, mvx = mv
        return (_interp_luma(ry, py, px, bh, bw, mvy, mvx),
                _interp_chroma(ru, cy, cx, ch, cw, mvy, mvx),
                _interp_chroma(rv, cy, cx, ch, cw, mvy, mvx))

    def _mc_pred_list(self, my: int, mx: int, mv: tuple[int, int],
                      lst: int, ref: int = 0):
        return self._mc_pred_rect((my * 16, mx * 16, 16, 16),
                                  (my * 8, mx * 8, 8, 8), mv, lst, ref)

    def _pred_b(self, my: int, mx: int, mv0, mv1, use0: bool,
                use1: bool, ref0: int = 0, ref1: int = 0):
        return self._pred_b_rect((my * 16, mx * 16, 16, 16),
                                 (my * 8, mx * 8, 8, 8), mv0, mv1,
                                 use0, use1, ref0, ref1)

    def _pred_b_rect(self, lrect, crect, mv0, mv1, use0: bool,
                     use1: bool, ref0: int = 0, ref1: int = 0):
        """Combined (possibly bi-) prediction over arbitrary rects:
        the default rounded average when both lists predict
        (8.4.2.3.2), or the weighted combination (8.4.2.3.3) when the
        slice carries explicit weights / the PPS selects implicit
        mode.  Implicit weights apply only to bi-predicted blocks;
        explicit weights apply to mono predictions too (via
        :meth:`_wp_mono`); explicit entries are looked up per
        (list, refIdx).  Weighting is pointwise, so per-partition
        application equals whole-MB application on uniform MBs."""
        wp = self.wp
        if use0 and use1:
            p0 = self._mc_pred_rect(lrect, crect, mv0, 0, ref0)
            p1 = self._mc_pred_rect(lrect, crect, mv1, 1, ref1)
            if wp is None:
                return tuple((a + b + 1) >> 1 for a, b in zip(p0, p1))
            lg = (wp["logwd_y"], wp["logwd_c"], wp["logwd_c"])
            e0 = (wp["l0"] if wp.get("implicit")
                  else self._wp_entry("l0", ref0))
            e1 = (wp["l1"] if wp.get("implicit")
                  else self._wp_entry("l1", ref1))
            out = []
            for i, (a, b) in enumerate(zip(p0, p1)):
                w0, o0 = e0[2 * i], e0[2 * i + 1]
                w1, o1 = e1[2 * i], e1[2 * i + 1]
                out.append(np.clip(
                    ((a * w0 + b * w1 + (1 << lg[i])) >> (lg[i] + 1))
                    + ((o0 + o1 + 1) >> 1), 0, 255))
            return tuple(out)
        if use0:
            return self._wp_mono(
                self._mc_pred_rect(lrect, crect, mv0, 0, ref0),
                "l0", ref0)
        return self._wp_mono(
            self._mc_pred_rect(lrect, crect, mv1, 1, ref1),
            "l1", ref1)

    def _pred_b_split(self, my: int, mx: int, parts, infos):
        """Assembled MB prediction from per-partition two-list motion;
        ``infos`` carries (mv0, mv1, use0, use1, ref0, ref1) per
        partition in the same order as ``parts``."""
        pred_y = np.zeros((16, 16), dtype=np.int64)
        pred_u = np.zeros((8, 8), dtype=np.int64)
        pred_v = np.zeros((8, 8), dtype=np.int64)
        for part, (mv0, mv1, use0, use1, ref0, ref1) in zip(parts,
                                                            infos):
            _, _, _, _, _, (py, px, bh, bw), (cy, cx, ch, cw) = part
            piece = self._pred_b_rect((py, px, bh, bw),
                                      (cy, cx, ch, cw), mv0, mv1,
                                      use0, use1, ref0, ref1)
            oy, ox = py - my * 16, px - mx * 16
            pred_y[oy:oy + bh, ox:ox + bw] = piece[0]
            ou, ov = cy - my * 8, cx - mx * 8
            pred_u[ou:ou + ch, ov:ov + cw] = piece[1]
            pred_v[ou:ou + ch, ov:ov + cw] = piece[2]
        return pred_y, pred_u, pred_v

    def _commit_b_part(self, by: int, bx: int, w4: int, h4: int,
                       mv0, mv1, use0: bool, use1: bool,
                       ref0: int = 0, ref1: int = 0) -> None:
        """Record one partition's two-list motion at block
        granularity (later partitions of the same MB predict from
        earlier ones, so this runs per partition)."""
        self.lmv4[by:by + h4, bx:bx + w4, 0] = mv0
        self.lmv4[by:by + h4, bx:bx + w4, 1] = mv1
        self.luse4[by:by + h4, bx:bx + w4, 0] = use0
        self.luse4[by:by + h4, bx:bx + w4, 1] = use1
        self.lref4[by:by + h4, bx:bx + w4, 0] = ref0 if use0 else 0
        self.lref4[by:by + h4, bx:bx + w4, 1] = ref1 if use1 else 0
        self.ldec4[by:by + h4, bx:bx + w4] = 2

    def _finish_b_mb(self, addr: int) -> None:
        my, mx = divmod(addr, self.mb_w)
        self.mb_state[my, mx] = 2
        # later intra MBs predict mode DC from inter neighbors (8.3.1)
        self.modes[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 2

    def _note_intra_b(self, addr: int) -> None:
        """Mark an intra-coded MB in the per-list block grids:
        available-but-not-inter to later MV prediction (8.4.1.3)."""
        my, mx = divmod(addr, self.mb_w)
        self.ldec4[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 1
        self.luse4[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = False

    def _commit_b(self, addr: int, mv0, mv1, use0: bool,
                  use1: bool, ref0: int = 0, ref1: int = 0) -> None:
        my, mx = divmod(addr, self.mb_w)
        self._commit_b_part(my * 4, mx * 4, 4, 4, mv0, mv1,
                            use0, use1, ref0, ref1)
        self._finish_b_mb(addr)

    # ---- encode-side mode competition (shared by both lanes) ----

    def _b_candidates(self, src: np.ndarray, my: int, mx: int,
                      search: int):
        """Mode competition for one B macroblock: direct, the best
        per-reference L0 and L1 mono candidates (older references
        carry the P lane's ref_idx bit bias: +16 for refIdx 1, +8
        per further step), and the bi combination of the two mono
        winners.  BOTH entropy lanes call this, so CAVLC and CABAC
        encodes make identical decisions and stay pixel-identical.
        Returns (cost, mode, mv0, mv1, use0, use1, ref0, ref1,
        mvp0, mvp1) with each mvp derived for the chosen refIdx."""
        d_mv0, d_mv1, d_use0, d_use1, d_r0, d_r1 = \
            self._direct_mv(my, mx)
        d_pred = self._pred_b(my, mx, d_mv0, d_mv1, d_use0, d_use1,
                              d_r0, d_r1)
        cands = [(int(np.abs(src - d_pred[0]).sum()),
                  _B_DIRECT_16x16, d_mv0, d_mv1, d_use0, d_use1,
                  d_r0, d_r1, (0, 0), (0, 0))]
        monos = []
        for lst, n_act, pool in ((0, self.n_ref0, self.refs),
                                 (1, self.n_ref1, self.refs1)):
            best = None
            for ref in range(min(n_act, len(pool))):
                mvp = self._mv_pred_b(my, mx, lst, ref)
                mv, cost = self._motion_search(
                    src, my, mx, search,
                    ref_y=self._search_ref_list(lst, ref), mvp=mvp)
                if ref:
                    cost += 16 + 8 * (ref - 1)
                if best is None or cost < best[0]:
                    best = (cost, mv, ref, mvp)
            monos.append(best)
        l0, l1 = monos
        cands.append((l0[0], _B_L0_16x16, l0[1], (0, 0), True, False,
                      l0[2], 0, l0[3], (0, 0)))
        cands.append((l1[0], _B_L1_16x16, (0, 0), l1[1], False, True,
                      0, l1[2], (0, 0), l1[3]))
        bi = self._pred_b(my, mx, l0[1], l1[1], True, True,
                          l0[2], l1[2])
        bi_cost = int(np.abs(src - bi[0]).sum()) + 2 * (
            abs(l0[1][0] - l0[3][0]) + abs(l0[1][1] - l0[3][1])
            + abs(l1[1][0] - l1[3][0]) + abs(l1[1][1] - l1[3][1])) \
            + (16 + 8 * (l0[2] - 1) if l0[2] else 0) \
            + (16 + 8 * (l1[2] - 1) if l1[2] else 0)
        cands.append((bi_cost, _B_BI_16x16, l0[1], l1[1], True, True,
                      l0[2], l1[2], l0[3], l1[3]))
        return min(cands)

    # ---- sub-16x16 partitions: shared derive + search machinery ----

    def _derive_b_parts(self, parts, shapes, uses, refs, mvds):
        """Per-partition two-list motion derivation in coding order:
        each partition's predictor sees every earlier partition's
        committed block-grid motion (mvd values were already read —
        they are plain numbers, so bit order and derivation order are
        independent).  Returns the (mv0, mv1, use0, use1, ref0, ref1)
        info list matching ``parts``."""
        infos = []
        for (by, bx, w4, h4, _, _, _), shape, (use0, use1), \
                (r0, r1), (d0, d1) in zip(parts, shapes, uses, refs,
                                          mvds):
            mv0 = mv1 = (0, 0)
            if use0:
                p = self._mv_pred_b_part(by, bx, w4, h4, 0, r0, shape)
                mv0 = (p[0] + d0[0], p[1] + d0[1])
            if use1:
                p = self._mv_pred_b_part(by, bx, w4, h4, 1, r1, shape)
                mv1 = (p[0] + d1[0], p[1] + d1[1])
            self._commit_b_part(by, bx, w4, h4, mv0, mv1, use0, use1,
                                r0 if use0 else 0, r1 if use1 else 0)
            infos.append((mv0, mv1, use0, use1,
                          r0 if use0 else 0, r1 if use1 else 0))
        return infos

    def _save_b_region(self, by: int, bx: int, w4: int, h4: int):
        return (by, bx, w4, h4,
                self.lmv4[by:by + h4, bx:bx + w4].copy(),
                self.luse4[by:by + h4, bx:bx + w4].copy(),
                self.lref4[by:by + h4, bx:bx + w4].copy(),
                self.ldec4[by:by + h4, bx:bx + w4].copy())

    def _restore_b_regions(self, saved) -> None:
        for by, bx, w4, h4, m4, u4, r4, d4 in reversed(saved):
            self.lmv4[by:by + h4, bx:bx + w4] = m4
            self.luse4[by:by + h4, bx:bx + w4] = u4
            self.lref4[by:by + h4, bx:bx + w4] = r4
            self.ldec4[by:by + h4, bx:bx + w4] = d4

    def _b_search_part(self, y_src: np.ndarray, part, search: int):
        """Mode competition for one B partition: the best of L0 / L1
        (ref 0 each — partitions search reference 0, like the P
        lane) and their bi combination, costed by SAD + mvd-bit
        bias.  Returns (cost, mode, info, mvp0, mvp1) where info is
        the (mv0, mv1, use0, use1, ref0, ref1) commit tuple."""
        by, bx, w4, h4, shape, (py, px, bh, bw), crect = part
        src = y_src[py:py + bh, px:px + bw].astype(np.int64)
        monos = []
        for lst in (0, 1):
            mvp = self._mv_pred_b_part(by, bx, w4, h4, lst, 0, shape)
            mv, cost = self._search_rect(
                src, py, px, bh, bw, search,
                self._search_ref_list(lst, 0), mvp)
            monos.append((mv, mvp, cost))
        (mv0, mvp0, c0), (mv1, mvp1, c1) = monos
        cands = [
            (c0, "l0", (mv0, (0, 0), True, False, 0, 0)),
            (c1, "l1", ((0, 0), mv1, False, True, 0, 0)),
        ]
        bi = self._pred_b_rect((py, px, bh, bw), crect, mv0, mv1,
                               True, True, 0, 0)
        bi_cost = int(np.abs(src - bi[0]).sum()) + 2 * (
            abs(mv0[0] - mvp0[0]) + abs(mv0[1] - mvp0[1])
            + abs(mv1[0] - mvp1[0]) + abs(mv1[1] - mvp1[1])) + 32
        cands.append((bi_cost, "bi", (mv0, mv1, True, True, 0, 0)))
        cost, mode, info = min(cands, key=lambda c: c[0])
        return cost, mode, info, mvp0, mvp1

    def _b_search_split(self, y_src: np.ndarray, my: int, mx: int,
                        shape_t: int, search: int):
        """Search both partitions of a B 16x8/8x16 split, each
        partition choosing its own L0/L1/Bi mode (tentative commits
        so the second predictor sees the first's motion; all commits
        rolled back).  Returns (mb_type, parts, infos, mvps, cost)."""
        from rmlint_spark.operators.h264_inter import _p_parts

        parts = _p_parts(shape_t, my, mx)
        saved, modes, infos, mvps = [], [], [], []
        total = 0
        try:
            for part in parts:
                by, bx, w4, h4 = part[0], part[1], part[2], part[3]
                cost, mode, info, mvp0, mvp1 = self._b_search_part(
                    y_src, part, search)
                saved.append(self._save_b_region(by, bx, w4, h4))
                self._commit_b_part(by, bx, w4, h4, *info)
                modes.append(mode)
                infos.append(info)
                mvps.append((mvp0, mvp1))
                total += cost
        finally:
            self._restore_b_regions(saved)
        mb_type = 4 + 2 * _B_PART_MODES.index(tuple(modes)) \
            + (0 if shape_t == 1 else 1)
        return mb_type, parts, infos, mvps, total

    def _b_search_8x8(self, y_src: np.ndarray, my: int, mx: int,
                      search: int):
        """Greedy per-quadrant competition for B_8x8: each 8x8
        sub-macroblock picks the best of B_Direct_8x8 / B_L0_8x8 /
        B_L1_8x8 / B_Bi_8x8 (the encoder's emitted Table 7-18
        subset; the DECODER accepts the full table incl. 8x4/4x8/4x4
        splits).  Returns (subs, parts, infos, mvps, cost)."""
        from rmlint_spark.operators.h264_inter import _sub_parts

        d_info = self._direct_mv(my, mx)
        saved, subs, parts, infos, mvps = [], [], [], [], []
        total = 0
        try:
            for i in range(4):
                part = _sub_parts(i, 0, my, mx)[0]
                by, bx, w4, h4, _, (py, px, bh, bw), crect = part
                src = y_src[py:py + bh, px:px + bw].astype(np.int64)
                d_pred = self._pred_b_rect((py, px, bh, bw), crect,
                                           *d_info)
                cands = [(int(np.abs(src - d_pred[0]).sum()), 0,
                          d_info, (0, 0), (0, 0))]
                cost, mode, info, mvp0, mvp1 = self._b_search_part(
                    y_src, part, search)
                st = {"l0": 1, "l1": 2, "bi": 3}[mode]
                cands.append((cost + 24, st, info, mvp0, mvp1))
                cost, st, info, mvp0, mvp1 = min(cands,
                                                 key=lambda c: c[0])
                saved.append(self._save_b_region(by, bx, w4, h4))
                self._commit_b_part(by, bx, w4, h4, *info)
                subs.append(st)
                parts.append(part)
                infos.append(info)
                mvps.append((mvp0, mvp1))
                total += cost
        finally:
            self._restore_b_regions(saved)
        return subs, parts, infos, mvps, total

    def _b_split_candidates(self, y_src: np.ndarray, my: int,
                            mx: int, search: int):
        """The partitioned-mode competition both entropy lanes share
        (so their mode decisions — and pixels — stay identical):
        16x8, 8x16 and B_8x8, each with the P lane's bit-cost
        biases.  Returns (cost, mb_type, subs, parts, infos, mvps)
        or None when direct derivation refuses (partitioned
        colocated under spatial direct never happens with our own
        encoder's unpartitioned anchors)."""
        best = None
        for shape_t in (1, 2):
            mb_type, parts, infos, mvps, cost = self._b_search_split(
                y_src, my, mx, shape_t, search)
            cost += 96              # bit-cost bias: extra mvd pairs
            if best is None or cost < best[0]:
                best = (cost, mb_type, None, parts, infos, mvps)
        subs, parts, infos, mvps, cost = self._b_search_8x8(
            y_src, my, mx, search)
        cost += 320                 # four sub codes + mvd baseline
        if cost < best[0]:
            best = (cost, _B_8x8, subs, parts, infos, mvps)
        return best

    # ---- decode ----

    def _decode_skip_b(self, addr: int) -> None:
        my, mx = divmod(addr, self.mb_w)
        mv0, mv1, use0, use1, ref0, ref1 = self._direct_mv(my, mx)
        pred_y, pred_u, pred_v = self._pred_b(my, mx, mv0, mv1,
                                              use0, use1, ref0, ref1)
        self.y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
            pred_y.astype(np.uint8)
        self.u[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
            pred_u.astype(np.uint8)
        self.v[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
            pred_v.astype(np.uint8)
        self.nc_y[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 0
        self.nc_u[my * 2:(my + 1) * 2, mx * 2:(mx + 1) * 2] = 0
        self.nc_v[my * 2:(my + 1) * 2, mx * 2:(mx + 1) * 2] = 0
        self._commit_b(addr, mv0, mv1, use0, use1, ref0, ref1)


class BInterPicture(BiMotionMixin, InterPicture):
    """InterPicture plus BiMotionMixin: the CAVLC-entropy B lane."""

    def __init__(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                 mb_w: int, mb_h: int,
                 ref0: tuple[np.ndarray, np.ndarray, np.ndarray],
                 ref1: tuple[np.ndarray, np.ndarray, np.ndarray],
                 col: tuple[np.ndarray, np.ndarray],
                 more0: list[tuple[np.ndarray, np.ndarray,
                                   np.ndarray]] | None = None,
                 more1: list[tuple[np.ndarray, np.ndarray,
                                   np.ndarray]] | None = None) -> None:
        InterPicture.__init__(self, y, u, v, mb_w, mb_h, ref0,
                              more=more0)
        self._init_bimotion(ref1, col, more1)

    def _decode_mb_b16(self, r: _BitReader, addr: int,
                       mb_type: int) -> None:
        from rmlint_spark.operators.h264 import _read_se

        my, mx = divmod(addr, self.mb_w)
        ref0 = ref1 = 0
        if mb_type == _B_DIRECT_16x16:
            mv0, mv1, use0, use1, ref0, ref1 = self._direct_mv(my, mx)
        else:
            use0 = mb_type in (_B_L0_16x16, _B_BI_16x16)
            use1 = mb_type in (_B_L1_16x16, _B_BI_16x16)
            mv0 = mv1 = (0, 0)
            # mb_pred syntax order (7.3.5.1): every ref_idx field of
            # both lists first, then the mvd pairs
            if use0:
                ref0 = self._read_ref_idx(r, self.n_ref0)
            if use1:
                ref1 = self._read_ref_idx(r, self.n_ref1)
            if use0:
                mvd_x = _read_se(r)         # compIdx 0 = horizontal
                mvd_y = _read_se(r)
                p = self._mv_pred_b(my, mx, 0, ref0)
                mv0 = (p[0] + mvd_y, p[1] + mvd_x)
            if use1:
                mvd_x = _read_se(r)
                mvd_y = _read_se(r)
                p = self._mv_pred_b(my, mx, 1, ref1)
                mv1 = (p[0] + mvd_y, p[1] + mvd_x)
        pred_y, pred_u, pred_v = self._pred_b(my, mx, mv0, mv1,
                                              use0, use1, ref0, ref1)
        self._read_inter_residual(r, addr, pred_y, pred_u, pred_v)
        self._commit_b(addr, mv0, mv1, use0, use1, ref0, ref1)

    def _decode_mb_b2(self, r: _BitReader, addr: int,
                      mb_type: int) -> None:
        """Partitioned B macroblock (Table 7-14, 16x8/8x16): mb_pred
        syntax order (7.3.5.1) is all ref_idx_l0 fields, all
        ref_idx_l1, all mvd_l0 pairs, all mvd_l1 — then per-partition
        derivation in coding order, one CBP + residual over the
        assembled prediction."""
        from rmlint_spark.operators.h264 import _read_se

        my, mx = divmod(addr, self.mb_w)
        parts, modes = _b_part_geometry(mb_type, my, mx)
        uses = [_mode_uses(m) for m in modes]
        shapes = [p[4] for p in parts]
        refs = [[0, 0] for _ in parts]
        for lst, n_act in ((0, self.n_ref0), (1, self.n_ref1)):
            for i, u in enumerate(uses):
                if u[lst]:
                    refs[i][lst] = self._read_ref_idx(r, n_act)
        mvds = [[(0, 0), (0, 0)] for _ in parts]
        for lst in (0, 1):
            for i, u in enumerate(uses):
                if u[lst]:
                    mvd_x = _read_se(r)     # compIdx 0 = horizontal
                    mvd_y = _read_se(r)
                    mvds[i][lst] = (mvd_y, mvd_x)
        infos = self._derive_b_parts(parts, shapes, uses, refs, mvds)
        pred_y, pred_u, pred_v = self._pred_b_split(my, mx, parts,
                                                    infos)
        self._read_inter_residual(r, addr, pred_y, pred_u, pred_v)
        self._finish_b_mb(addr)

    def _decode_mb_b8x8(self, r: _BitReader, addr: int) -> None:
        """B_8x8 (7.3.5.2): four Table 7-18 sub_mb_type codes — the
        FULL table decodes (direct / L0 / L1 / Bi at 8x8, 8x4, 4x8,
        4x4) — then ref_idx_l0 per non-direct 8x8 using L0, then
        ref_idx_l1, then mvd_l0 per sub-partition in coding order,
        then mvd_l1.  B_Direct_8x8 applies the MB-level spatial /
        temporal derivation to its quadrant (exact in our subset:
        the refIdx derivation reads MB neighbors and the colocated
        MB is uniform — partitioned colocated refuses)."""
        from rmlint_spark.operators.h264 import _read_se, _read_ue
        from rmlint_spark.operators.h264_inter import _sub_parts

        my, mx = divmod(addr, self.mb_w)
        subs = [_read_ue(r) for _ in range(4)]
        for s in subs:
            if s > 12:
                raise ValueError(f"invalid B sub_mb_type {s}")
        refs8 = [[0, 0] for _ in range(4)]
        for lst, n_act in ((0, self.n_ref0), (1, self.n_ref1)):
            for i, s in enumerate(subs):
                if s and _mode_uses(_B_SUB_MODES[s][0])[lst]:
                    refs8[i][lst] = self._read_ref_idx(r, n_act)
        mvds: dict[tuple[int, int, int], tuple[int, int]] = {}
        for lst in (0, 1):
            for i, s in enumerate(subs):
                if not s or not _mode_uses(_B_SUB_MODES[s][0])[lst]:
                    continue
                for j in range(len(_sub_parts(
                        i, _B_SUB_MODES[s][1], my, mx))):
                    mvd_x = _read_se(r)
                    mvd_y = _read_se(r)
                    mvds[(i, j, lst)] = (mvd_y, mvd_x)
        d_info = None
        parts_all, infos_all = [], []
        for i, s in enumerate(subs):
            if s == 0:                       # B_Direct_8x8
                if d_info is None:
                    d_info = self._direct_mv(my, mx)
                part = _sub_parts(i, 0, my, mx)[0]
                by, bx, w4, h4 = part[0], part[1], part[2], part[3]
                self._commit_b_part(by, bx, w4, h4, *d_info)
                parts_all.append(part)
                infos_all.append(d_info)
                continue
            mode, shape_key = _B_SUB_MODES[s]
            use0, use1 = _mode_uses(mode)
            r0, r1 = refs8[i]
            ps = _sub_parts(i, shape_key, my, mx)
            infos_all.extend(self._derive_b_parts(
                ps, [None] * len(ps), [(use0, use1)] * len(ps),
                [(r0, r1)] * len(ps),
                [(mvds.get((i, j, 0), (0, 0)),
                  mvds.get((i, j, 1), (0, 0)))
                 for j in range(len(ps))]))
            parts_all.extend(ps)
        pred_y, pred_u, pred_v = self._pred_b_split(my, mx, parts_all,
                                                    infos_all)
        self._read_inter_residual(r, addr, pred_y, pred_u, pred_v)
        self._finish_b_mb(addr)

    def decode_slice_b(self, r: _BitReader, first_mb: int,
                       covered: np.ndarray) -> None:
        """slice_data() for a CAVLC B slice (7.3.4): alternating
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
                self._decode_skip_b(addr)
                self.note_qp(addr)
                covered[addr] = True
                addr += 1
            if not _more_rbsp_data(r):
                break
            if addr >= total:
                raise ValueError("H.264 slice data overruns the picture")
            mb_type = _read_ue(r)
            my, mx = divmod(addr, self.mb_w)
            if mb_type <= _B_BI_16x16:
                self._decode_mb_b16(r, addr, mb_type)
            elif mb_type < _B_8x8:
                self._decode_mb_b2(r, addr, mb_type)
            elif mb_type == _B_8x8:
                self._decode_mb_b8x8(r, addr)
            else:
                it = mb_type - _B_INTRA_OFFSET
                if it == 25:
                    self.decode_ipcm(r, addr)
                elif it == 0:
                    self.decode_mb(r, addr)
                elif it <= 24:
                    self.decode_mb16(r, addr, it)
                else:
                    raise ValueError(f"invalid B-slice mb_type {mb_type}")
                self.mb_state[my, mx] = 1
                self._note_intra_b(addr)
            self.note_qp(addr)
            covered[addr] = True
            addr += 1

    # ---- encode ----

    def _encode_b_split(self, w: _BitWriter, addr: int, split,
                        y_src: np.ndarray, u_src: np.ndarray,
                        v_src: np.ndarray) -> None:
        """Emit one partitioned B macroblock (16x8/8x16/B_8x8) in
        7.3.5 syntax order: mb_type, sub_mb_types (B_8x8), ref_idx
        fields of both lists, mvd_l0 pairs, mvd_l1 pairs, residual."""
        from rmlint_spark.operators.h264 import _write_se, _write_ue

        my, mx = divmod(addr, self.mb_w)
        _, mb_type, subs, parts, infos, mvps = split
        _write_ue(w, mb_type)
        if subs is not None:
            for st in subs:
                _write_ue(w, st)
        # ref_idx fields: all l0 then all l1 (partitions search ref 0;
        # B_Direct_8x8 sub-macroblocks carry no ref/mvd syntax)
        for lst, n_act in ((0, self.n_ref0), (1, self.n_ref1)):
            for i, info in enumerate(infos):
                if subs is not None and subs[i] == 0:
                    continue
                if info[2 + lst]:
                    self._write_ref_idx(w, 0, n_act)
        for lst in (0, 1):
            for i, (info, mvp2) in enumerate(zip(infos, mvps)):
                if subs is not None and subs[i] == 0:
                    continue
                if info[2 + lst]:
                    mv, mvp = info[lst], mvp2[lst]
                    _write_se(w, mv[1] - mvp[1])
                    _write_se(w, mv[0] - mvp[0])
        for part, info in zip(parts, infos):
            self._commit_b_part(part[0], part[1], part[2], part[3],
                                *info)
        preds = self._pred_b_split(my, mx, parts, infos)
        (pred_y, pred_u, pred_v, luma_q, dc_q, ac_q,
         cbp) = self._quantize_inter(addr, infos[0][0], y_src, u_src,
                                     v_src, preds=preds)
        self._write_inter_residual(w, addr, pred_y, pred_u, pred_v,
                                   luma_q, dc_q, ac_q, cbp)
        self._finish_b_mb(addr)

    def encode_mb_b(self, w: _BitWriter, addr: int, y_src: np.ndarray,
                    u_src: np.ndarray, v_src: np.ndarray,
                    search: int, partitions: bool = False) -> bool:
        """Encode one B-slice macroblock; returns True when it became
        a B_Skip (folded into mb_skip_run by the caller).  With
        ``partitions`` the 16x8/8x16/B_8x8 splits compete with the
        whole-MB modes by SAD + mvd-bits cost."""
        from rmlint_spark.operators.h264 import _write_se, _write_ue

        my, mx = divmod(addr, self.mb_w)
        py, px = my * 16, mx * 16
        src = y_src[py:py + 16, px:px + 16].astype(np.int64)
        best = self._b_candidates(src, my, mx, search)
        cost, mode, cmv0, cmv1, use0, use1, ref0, ref1, mvp0, mvp1 \
            = best
        if partitions:
            split = self._b_split_candidates(y_src, my, mx, search)
            if split[0] < cost:
                self._encode_b_split(w, addr, split, y_src, u_src,
                                     v_src)
                return False
        preds = self._pred_b(my, mx, cmv0, cmv1, use0, use1,
                             ref0, ref1)
        (pred_y, pred_u, pred_v, luma_q, dc_q, ac_q,
         cbp) = self._quantize_inter(addr, cmv0, y_src, u_src, v_src,
                                     preds=preds)
        if mode == _B_DIRECT_16x16 and cbp == 0:
            self._decode_skip_b(addr)       # recon == decoder's skip
            return True
        _write_ue(w, mode)
        if mode != _B_DIRECT_16x16:
            # 7.3.5.1 order: ref_idx fields of both lists, then mvds
            if use0:
                self._write_ref_idx(w, ref0, self.n_ref0)
            if use1:
                self._write_ref_idx(w, ref1, self.n_ref1)
            if use0:
                _write_se(w, cmv0[1] - mvp0[1])
                _write_se(w, cmv0[0] - mvp0[0])
            if use1:
                _write_se(w, cmv1[1] - mvp1[1])
                _write_se(w, cmv1[0] - mvp1[0])
        self._write_inter_residual(w, addr, pred_y, pred_u, pred_v,
                                   luma_q, dc_q, ac_q, cbp)
        self._commit_b(addr, cmv0, cmv1, use0, use1, ref0, ref1)
        return False


# --------------------------------------------------------- top level

def encode_h264_b(frames: list[np.ndarray],
                  fps: tuple[int, int] = (25, 1),
                  qp: int = 20,
                  bgroup: int = 2,
                  seg: int = 12,
                  search: int = 4,
                  wp: str | None = None,
                  direct: str = "spatial",
                  refs: int = 1,
                  partitions: bool = False,
                  pyramid: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB frames -> Annex-B H.264 with closed
    IDR/P/B segments and CAVLC entropy.  Display structure per
    ``seg``-frame segment: anchors every ``bgroup + 1`` frames (plus
    the segment's last frame), ``bgroup`` B frames between consecutive
    anchors; decode order emits each anchor before its B group and no
    B group spans an IDR.  POC type 0 (pic_order_cnt_lsb) carries the
    display order.  Lossy at ``qp``; self-consistent with
    :func:`rmlint_spark.operators.h264.decode_h264`.

    ``wp`` selects weighted bi-prediction: ``"implicit"`` sets
    weighted_bipred_idc = 2 (POC-distance weights, 8.4.2.3.1 — the
    crossfade mode, no header bits); ``"explicit"`` sets idc = 1 and
    fits per-list least-squares pred_weight_tables per B slice.

    ``direct`` selects the B_Skip/B_Direct motion derivation:
    ``"spatial"`` (8.4.1.2.2, the default) or ``"temporal"``
    (8.4.1.2.3 — colocated motion scaled by POC distances, the
    constant-velocity-pan mode).

    ``refs = 2`` makes L0 two-deep for B AND P slices (the anchor
    before the previous anchor backs refIdx 1 — the occlusion mode
    where content hidden in the near anchor is visible in the older
    one); requires ``direct="spatial"`` and excludes ``wp=
    "implicit"`` (both derivations are exact only for single-ref
    lists; the decoder enforces the same pairing).

    ``partitions`` lets B macroblocks split below 16x16: the
    16x8/8x16 pairs and B_8x8 (direct/L0/L1/Bi quadrants) compete
    with the whole-MB modes.  Anchor P slices stay unpartitioned so
    spatial direct's colocated derivation remains exact (the decoder
    refuses partitioned colocated MBs).

    ``pyramid`` enables one level of hierarchical B coding: the
    middle B of each anchor gap is coded FIRST as a REFERENCE B
    picture (nal_ref_idc = 1, it enters the DPB and exports its
    L0-preferred motion grid), and the remaining Bs of the gap
    predict from their nearest (anchor, mid-B) pair — halving the
    temporal prediction distance.  Requires ``refs = 1`` (the leaf
    list derivation is exact for single-entry lists)."""
    from rmlint_spark.operators.h264 import (
        _START4,
        _encode_pps,
        _encode_sps,
        _escape_rbsp,
        _implicit_wp,
        _pad_to_mb,
        _rgb_to_yuv420,
        _trailing_bits,
        _write_pred_weight_table,
        _write_deblock,
        _write_se,
        _write_ue,
    )
    from rmlint_spark.operators.h264_inter import _estimate_wp_bi

    if wp not in (None, "implicit", "explicit"):
        raise ValueError("wp must be None, 'implicit' or 'explicit'")
    if direct not in ("spatial", "temporal"):
        raise ValueError("direct must be 'spatial' or 'temporal'")
    if refs not in (1, 2):
        raise ValueError("refs must be 1 or 2 (the implemented "
                         "B-encoder subset)")
    if refs > 1 and direct == "temporal":
        raise ValueError("temporal direct is exact only for "
                         "single-reference lists; use direct="
                         "'spatial' with refs=2")
    if refs > 1 and wp == "implicit":
        raise ValueError("implicit weights are derived per anchor "
                         "pair; refs=2 requires wp=None or "
                         "'explicit'")
    if pyramid and refs != 1:
        raise ValueError("pyramid B coding requires refs=1 (leaf "
                         "reference lists are single-entry)")
    bipred_idc = {"implicit": 2, "explicit": 1, None: 0}[wp]
    direct_flag = 1 if direct == "spatial" else 0
    if not frames:
        raise ValueError("need at least one frame")
    if not 0 <= qp <= 29:
        raise ValueError("qp outside the implemented 0..29 subset")
    if bgroup < 0 or seg < 1:
        raise ValueError("bgroup must be >= 0 and seg >= 1")
    h, w = np.asarray(frames[0]).shape[:2]
    mb_w, mb_h = -(-w // 16), -(-h // 16)
    planes = []
    for fr in frames:
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        y, u, v = _rgb_to_yuv420(fr)
        planes.append((_pad_to_mb(y, 16), _pad_to_mb(u, 8),
                       _pad_to_mb(v, 8)))
    out = bytearray()
    out += _START4 + b"\x67" + _escape_rbsp(
        _encode_sps(mb_w, mb_h, w, h, fps,
                    num_ref_frames=4 if pyramid else refs + 1,
                    poc_type=0))
    out += _START4 + b"\x68" + _escape_rbsp(
        _encode_pps(weighted_bipred_idc=bipred_idc))

    def header(bw: _BitWriter, slice_type: int, frame_num: int,
               poc_lsb: int, is_idr: bool, idr_id: int,
               slice_wp: dict | None = None, n_l0: int = 1,
               n_l1: int = 1, ref_b: bool = False) -> None:
        _write_ue(bw, 0)                    # first_mb_in_slice
        _write_ue(bw, slice_type)
        _write_ue(bw, 0)                    # pic_parameter_set_id
        bw.write(frame_num & 15, 4)
        if is_idr:
            _write_ue(bw, idr_id)
        bw.write(poc_lsb & 255, 8)          # pic_order_cnt_lsb
        if slice_type == 6:                 # B
            bw.write(direct_flag, 1)        # direct_spatial_mv_pred
            if n_l0 > 1 or n_l1 > 1:        # num_ref_idx_active_override
                bw.write(1, 1)
                _write_ue(bw, n_l0 - 1)
                _write_ue(bw, n_l1 - 1)
            else:
                bw.write(0, 1)
            bw.write(0, 1)                  # ref_pic_list_modification_l0
            bw.write(0, 1)                  # ref_pic_list_modification_l1
            if bipred_idc == 1:             # pred_weight_table (7.3.3)
                _write_pred_weight_table(bw, slice_wp, is_b=True,
                                         n_l0=n_l0, n_l1=n_l1)
        elif slice_type == 5:               # P
            if n_l0 > 1:                    # num_ref_idx_active_override
                bw.write(1, 1)
                _write_ue(bw, n_l0 - 1)
            else:
                bw.write(0, 1)
            bw.write(0, 1)                  # ref_pic_list_modification_l0
        if is_idr:
            bw.write(0, 2)                  # no_output / long_term flags
        elif slice_type == 5 or ref_b:
            bw.write(0, 1)                  # adaptive_ref_pic_marking
        _write_se(bw, qp - 26)              # slice_qp_delta
        _write_deblock(bw)                  # explicit idc 1: filter off

    def inter_slice_body(bw: _BitWriter, pic, encode_one) -> None:
        skip_run = 0
        for addr in range(mb_w * mb_h):
            probe = _BitWriter()
            if encode_one(probe, addr):
                skip_run += 1
                continue
            _write_ue(bw, skip_run)
            skip_run = 0
            if probe.buf:
                bw.write(int.from_bytes(probe.buf, "big"),
                         8 * len(probe.buf))
            if probe.nbits:
                bw.write(probe.acc, probe.nbits)
        if skip_run:
            _write_ue(bw, skip_run)

    n = len(frames)
    frame_num = 0
    idr_id = 0
    for s0 in range(0, n, seg):
        s1 = min(s0 + seg, n)               # segment [s0, s1)
        anchors = list(range(s0, s1, bgroup + 1))
        if anchors[-1] != s1 - 1:
            anchors.append(s1 - 1)
        # decode order: IDR anchor, then per gap (next anchor, B...);
        # ``past`` holds reconstructed anchors newest-first — entry 0
        # is the previous anchor, entry 1 (refs=2) the one before it.
        # ``dec_refs`` tracks ALL reference recons decode-order
        # newest-first (pyramid: the previous gap's mid B outranks
        # the previous anchor in the decoder's 8.2.4.2.1 list, so a
        # pyramid P anchor's refIdx 0 IS that mid B — temporally the
        # closest reference)
        past: list[tuple] = []              # [(planes, mvinfo), ...]
        dec_refs: list = []                 # [planes, ...]
        for j, disp in enumerate(anchors):
            y, u, v = planes[disp]
            is_idr = j == 0
            bw = _BitWriter()
            if is_idr:
                frame_num = 0
                pic = None
                # intra anchor through the CAVLC intra machinery
                from rmlint_spark.operators.h264_cavlc import \
                    CavlcPicture

                pic = InterPicture(
                    np.zeros_like(y), np.zeros_like(u),
                    np.zeros_like(v), mb_w, mb_h,
                    (np.zeros_like(y), np.zeros_like(u),
                     np.zeros_like(v)))
                pic.qp = qp
                header(bw, 7, frame_num, 2 * (disp - s0), True, idr_id)
                idr_id = (idr_id + 1) % 2
                for addr in range(mb_w * mb_h):
                    pic.encode_mb(bw, addr, y, u, v)
                    pic.note_intra(addr)
                nal = b"\x65"
            else:
                n_l0 = min(refs, len(past))
                ref0_plane = (dec_refs[0] if pyramid and dec_refs
                              else past[0][0])
                pic = InterPicture(
                    np.zeros_like(y), np.zeros_like(u),
                    np.zeros_like(v), mb_w, mb_h, ref0_plane,
                    past[1][0] if n_l0 > 1 else None)
                pic.qp = qp
                pic.n_ref0 = n_l0
                header(bw, 5, frame_num, 2 * (disp - s0), False, 0,
                       n_l0=n_l0)
                inter_slice_body(
                    bw, pic,
                    lambda pb, addr: pic.encode_mb_p(pb, addr, y, u,
                                                     v, search))
                nal = b"\x41"
            _trailing_bits(bw)
            out += _START4 + nal + _escape_rbsp(bw.bytes())
            frame_num = (frame_num + 1) % 16
            cur_anchor = ((pic.y, pic.u, pic.v),
                          (pic.mv4.copy(), pic.mb_state.copy()))
            if is_idr:
                dec_refs = []               # IDR flushes the DPB
            dec_refs.insert(0, cur_anchor[0])
            del dec_refs[4:]
            # B frames between the previous and this anchor, decode
            # order AFTER this anchor.  Plain mode: every B predicts
            # from the two anchors, display order.  Pyramid mode: the
            # gap's MIDDLE B codes first as a REFERENCE B (it enters
            # the DPB), then the remaining Bs predict from their
            # nearest (anchor, mid) pair.
            if past:
                prev_disp = anchors[j - 1]
                n_l0 = min(refs, len(past))
                gap = list(range(prev_disp + 1, disp))
                mid = gap[len(gap) // 2] if pyramid and len(gap) >= 2 \
                    else None
                order = ([mid] + [g for g in gap if g != mid]
                         if mid is not None else gap)
                prev_poc = 2 * (prev_disp - s0)
                cur_poc = 2 * (disp - s0)
                mid_rec = None              # (planes, col, poc)
                for bdisp in order:
                    by, bu, bv = planes[bdisp]
                    ref_b = bdisp == mid
                    if mid is None or ref_b:
                        l0p, l0poc = past[0][0], prev_poc
                        l1p, l1col, l1poc = (cur_anchor[0],
                                             cur_anchor[1], cur_poc)
                    elif bdisp < mid:
                        l0p, l0poc = past[0][0], prev_poc
                        l1p, l1col, l1poc = mid_rec
                    else:
                        l0p, l0poc = mid_rec[0], mid_rec[2]
                        l1p, l1col, l1poc = (cur_anchor[0],
                                             cur_anchor[1], cur_poc)
                    bpic = BInterPicture(
                        np.zeros_like(by), np.zeros_like(bu),
                        np.zeros_like(bv), mb_w, mb_h,
                        l0p, l1p, l1col,
                        more0=[p[0] for p in past[1:n_l0]])
                    bpic.qp = qp
                    bpic.n_ref0 = n_l0
                    bpic.direct_spatial = direct == "spatial"
                    bpoc = 2 * (bdisp - s0)
                    bpic.direct_tbtd = (bpoc - l0poc, l1poc - l0poc)
                    if wp == "implicit":
                        bpic.wp = _implicit_wp(bpoc, l0poc, l1poc)
                    elif wp == "explicit":
                        bpic.wp = _estimate_wp_bi(
                            (by, bu, bv), l0p, l1p)
                        if n_l0 > 1:
                            from rmlint_spark.operators.h264_inter \
                                import _estimate_wp

                            bpic.wp["l0x"] = [
                                _estimate_wp((by, bu, bv),
                                             p[0])["l0"]
                                for p in past[1:n_l0]]
                    bw = _BitWriter()
                    header(bw, 6, frame_num, bpoc,
                           False, 0, slice_wp=bpic.wp, n_l0=n_l0,
                           ref_b=ref_b)
                    inter_slice_body(
                        bw, bpic,
                        lambda pb, addr: bpic.encode_mb_b(
                            pb, addr, by, bu, bv, search,
                            # the mid B is the leaves' colocated
                            # source: keep it unpartitioned, like the
                            # anchors (the decoder refuses direct over
                            # partitioned colocated MBs)
                            partitions=partitions and not ref_b))
                    _trailing_bits(bw)
                    # ref_idc 1 for the pyramid's reference B
                    nal = b"\x21" if ref_b else b"\x01"
                    out += _START4 + nal + _escape_rbsp(bw.bytes())
                    frame_num = (frame_num + 1) % 16 if ref_b \
                        else frame_num
                    if ref_b:
                        # export the decoder's 8.4.1.2.3 L0-preferred
                        # colocated grid for the leaf Bs
                        col_mv = np.where(
                            bpic.luse4[:, :, 0:1],
                            bpic.lmv4[:, :, 0, :],
                            bpic.lmv4[:, :, 1, :]).astype(np.int64)
                        mid_rec = ((bpic.y, bpic.u, bpic.v),
                                   (col_mv, bpic.mb_state.copy()),
                                   bpoc)
                        dec_refs.insert(0, mid_rec[0])
                        del dec_refs[4:]
            past.insert(0, cur_anchor)
            del past[refs:]
    return bytes(out)


__all__ = ["BInterPicture", "encode_h264_b"]
