"""H.264 CABAC B-slice essence codec — pure numpy + stdlib.

Closes the CABAC half of the B refusal: B slices decode and encode
under arithmetic entropy too, composing the clause-9.3 engine
(h264_cabac.py) with the two-list machinery (h264_b.BiMotionMixin)
exactly the way h264_cabac_p.py composed it with MotionMixin:

- **mb_skip_flag** for B (9.3.3.1.1.1): its own 3-context set (spec
  offsets 24..26), neighbor increment from non-skipped coded
  neighbors; a skipped B macroblock reconstructs through spatial
  direct, like the CAVLC lane;
- **B mb_type** (Table 9-37, COMPLETE since r5 s17): '0' =
  B_Direct_16x16, '100' / '101' = B_L0_16x16 / B_L1_16x16, '110' +
  3 bins = mb_types 3..10, '111' + 3 bins resolving the intra
  escape ('111101'), mb_type 11 ('111110'), B_8x8 ('111111') and —
  with one more bin — mb_types 12..21; bin0's context increment
  counts neighbors that are coded and NOT direct/skipped
  (9.3.3.1.1.3).  B_8x8 carries four Table 9-38 sub_mb_type codes
  (the full 13-value B half decodes: direct / L0 / L1 / Bi at
  8x8 / 8x4 / 4x8 / 4x4);
- **mvd_l0 / mvd_l1 UEG3** (9.3.2.3): the same truncated-unary +
  k=3 Exp-Golomb machinery as the P lane, context increments from
  PER-LIST neighbor |mvd| grids, context variables shared between
  the lists (as in the spec);
- **inter residuals / CBP / qp_delta / end_of_slice_flag**: the
  exact P-lane code paths, inherited from CabacInterPicture.

Context numbering note: deviation #2 of this engine (equiprobable
init, documented slot renumbering — see h264_cabac.py) extends here:
b_pre slots are bin0-inc 0..2 / bin1 / bin2 / bins>=3, and the
intra-in-B suffix reuses the I-slice context set.  Binarization
shapes, grammar, neighbor-increment rules and the arithmetic engine
follow clause 9.3; encoder and decoder share every table, so the
pair is self-consistent by construction.

The refusal surface for video after this module: SP/SI slices
(P and B multi-ref are DPB-general, sub-16x16 partitions decode in
both slice types, and reference/pyramid B pictures code via
``pyramid=True``, all since r5 s17; weighted prediction — explicit
and implicit — and temporal direct decode since r5 s10; the header,
pred_weight_table included, stays Exp-Golomb under CABAC).

Codec-lane status: per-asset decode inside ``mapInPandas``
(multimodal.py), NOT a Spark hot path — the same boundary as the
rest of this codec family.

Reference parity note: rmlint hashes media as opaque bytes
(lib/checksum.c); this module serves the training-data multimodal
lane (cross-container / cross-entropy-mode frame dedup).
"""

from __future__ import annotations

import numpy as np

from rmlint_spark.operators.flac import _BitReader, _BitWriter
from rmlint_spark.operators.h264_b import BiMotionMixin
from rmlint_spark.operators.h264_cabac import (
    CabacDecoder,
    CabacEncoder,
)
from rmlint_spark.operators.h264_cabac_p import (
    CabacInterPicture,
    _dec_egk,
    _enc_egk,
)
from rmlint_spark.operators.h264_cavlc import _pred16x16

_UCOFF_MVD = 9                         # UEG3 prefix cutoff (9.3.2.3)

_B_DIRECT_16x16 = 0
_B_L0_16x16 = 1
_B_L1_16x16 = 2
_B_BI_16x16 = 3
_B_8x8 = 22


def _enc_mvd_ueg3(enc: CabacEncoder, cx, inc: int, v: int) -> None:
    """UEG3 mvd binarization with the caller-supplied bin-0 context
    increment (the B lane derives it from per-list neighbor grids)."""
    a = abs(v)
    prefix = min(a, _UCOFF_MVD)
    if prefix == 0:
        enc.decision(cx[inc], 0)
    else:
        enc.decision(cx[inc], 1)
        for k in range(1, prefix):
            enc.decision(cx[3 + min(k - 1, 3)], 1)
        if prefix < _UCOFF_MVD:
            enc.decision(cx[3 + min(prefix - 1, 3)], 0)
    if a >= _UCOFF_MVD:
        _enc_egk(enc, a - _UCOFF_MVD, 3)
    if a:
        enc.bypass(1 if v < 0 else 0)


def _dec_mvd_ueg3(dec: CabacDecoder, cx, inc: int) -> int:
    if not dec.decision(cx[inc]):
        return 0
    a = 1
    while a < _UCOFF_MVD and dec.decision(cx[3 + min(a - 1, 3)]):
        a += 1
    if a == _UCOFF_MVD:
        a += _dec_egk(dec, 3)
    return -a if dec.bypass() else a


class CabacBInterPicture(BiMotionMixin, CabacInterPicture):
    """CabacInterPicture plus BiMotionMixin: the CABAC-entropy B
    lane.  Intra macroblocks inside a B slice reuse the inherited
    I-slice CABAC paths; per-list grids back the mvd context
    increments and the direct-flag neighbor rule."""

    def __init__(self, y, u, v, mb_w: int, mb_h: int,
                 ref0: tuple[np.ndarray, np.ndarray, np.ndarray],
                 ref1: tuple[np.ndarray, np.ndarray, np.ndarray],
                 col: tuple[np.ndarray, np.ndarray],
                 more0: list[tuple[np.ndarray, np.ndarray,
                                   np.ndarray]] | None = None,
                 more1: list[tuple[np.ndarray, np.ndarray,
                                   np.ndarray]] | None = None) -> None:
        CabacInterPicture.__init__(self, y, u, v, mb_w, mb_h, ref0,
                                   more=more0)
        self._init_bimotion(ref1, col, more1)
        # per-list per-component |mvd| for the context increments, at
        # the spec's 4x4-block (partition) granularity since the
        # sub-16x16 B lanes (r5 s17)
        self.bmvd4 = np.zeros((mb_h * 4, mb_w * 4, 2, 2),
                              dtype=np.int64)
        # 1 = this coded MB is B_Skip or B_Direct (9.3.3.1.1.3)
        self.bdirect = np.zeros((mb_h, mb_w), dtype=np.int64)

    # ---- context increments ----

    def _btype_inc(self, my: int, mx: int) -> int:
        """bin-0 ctxIdxInc for B mb_type: an available neighbor that
        is coded and NOT skip/direct adds 1."""
        def term(ny: int, nx: int) -> int:
            if not (0 <= ny < self.mb_h and 0 <= nx < self.mb_w):
                return 0
            if int(self.skipped[ny, nx]) == -1:     # undecoded
                return 0
            if int(self.skipped[ny, nx]) == 1:      # B_Skip
                return 0
            return 0 if int(self.bdirect[ny, nx]) else 1
        return term(my, mx - 1) + term(my - 1, mx)

    def _bmvd_inc(self, by: int, bx: int, lst: int, comp: int) -> int:
        """bin-0 ctxIdxInc from the neighbor |mvd| sum (9.3.3.1.1.7)
        at 4x4-block (partition) granularity, per list."""
        a = abs(int(self.bmvd4[by, bx - 1, lst, comp])) if bx > 0 else 0
        b = abs(int(self.bmvd4[by - 1, bx, lst, comp])) if by > 0 else 0
        s = a + b
        return 0 if s < 3 else (1 if s <= 32 else 2)

    def _note_bmvd(self, by: int, bx: int, w4: int, h4: int,
                   lst: int, mvd: tuple[int, int]) -> None:
        self.bmvd4[by:by + h4, bx:bx + w4, lst] = mvd

    def _bref_inc(self, by: int, bx: int, lst: int) -> int:
        """ref_idx_lX bin-0 ctxIdxInc (9.3.3.1.1.6) per list:
        condTermFlagN is 1 when the neighbor partition predicts from
        this list with refIdx > 0; inc = condTermA + 2 * condTermB."""
        def cond(ny: int, nx: int) -> int:
            if ny < 0 or nx < 0:
                return 0
            return 1 if (int(self.ldec4[ny, nx]) == 2
                         and bool(self.luse4[ny, nx, lst])
                         and int(self.lref4[ny, nx, lst]) > 0) else 0

        return cond(by, bx - 1) + 2 * cond(by - 1, bx)

    def _dec_ref_b(self, dec: CabacDecoder, by: int, bx: int,
                   lst: int, n_act: int) -> int:
        """Unary ref_idx_lX (Table 9-34; both lists share the spec's
        ctxIdxOffset-54 context set): bin 0 by neighbors, bin 1 inc
        4, later bins inc 5 — terminated by a 0 bin."""
        if n_act <= 1:
            return 0
        cx = self.cab.ref_idx
        if not dec.decision(cx[self._bref_inc(by, bx, lst)]):
            return 0
        v = 1
        while dec.decision(cx[4 if v == 1 else 5]):
            v += 1
            if v >= n_act:
                raise ValueError(
                    "H.264 CABAC ref_idx beyond "
                    "num_ref_idx_lX_active")
        return v

    def _enc_ref_b(self, enc: CabacEncoder, by: int, bx: int,
                   lst: int, ref: int, n_act: int) -> None:
        if n_act <= 1:
            return
        cx = self.cab.ref_idx
        enc.decision(cx[self._bref_inc(by, bx, lst)],
                     1 if ref > 0 else 0)
        k = 1
        while k <= ref:
            enc.decision(cx[4 if k == 1 else 5],
                         1 if ref > k else 0)
            k += 1

    def _note_skip_b(self, addr: int) -> None:
        my, mx = divmod(addr, self.mb_w)
        self.skipped[my, mx] = 1
        self.bdirect[my, mx] = 1
        self.bmvd4[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 0
        self.mbt[my, mx] = 3
        self.dc_cbf[my, mx] = 0
        self.cdc_u[my, mx] = 0
        self.cdc_v[my, mx] = 0
        self.cbp8[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
        self.cbp_c[my, mx] = 0

    def _note_inter_b(self, addr: int, mvds, direct: bool) -> None:
        """``mvds`` is the whole-MB (lst, comp) |mvd| fill, or None
        when the partition paths already noted per-part mvds."""
        my, mx = divmod(addr, self.mb_w)
        self.skipped[my, mx] = 0
        self.bdirect[my, mx] = 1 if direct else 0
        if mvds is not None:
            self.bmvd4[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = mvds
        self.mbt[my, mx] = 3
        self.dc_cbf[my, mx] = 0

    def note_intra(self, addr: int) -> None:
        super().note_intra(addr)
        my, mx = divmod(addr, self.mb_w)
        self.bdirect[my, mx] = 0
        self.bmvd4[my * 4:(my + 1) * 4, mx * 4:(mx + 1) * 4] = 0
        self._note_intra_b(addr)

    # ---- mb_type tree (Table 9-37, complete) ----

    def _dec_b_mb_type(self, dec: CabacDecoder, my: int,
                       mx: int) -> int:
        """Full Table 9-37: returns 0..3 for the 16x16 modes, 4..21
        for the 16x8/8x16 partitions, 22 for B_8x8, or -1 for the
        intra escape ('111101')."""
        cx = self.cab.b_pre
        if not dec.decision(cx[self._btype_inc(my, mx)]):
            return _B_DIRECT_16x16
        if not dec.decision(cx[3]):                 # '10x'
            return (_B_L1_16x16 if dec.decision(cx[4])
                    else _B_L0_16x16)
        if not dec.decision(cx[4]):                 # '110' + 3 bins
            bits = 0
            for _ in range(3):
                bits = (bits << 1) | dec.decision(cx[5])
            return _B_BI_16x16 + bits               # 3..10
        # '111' prefix + 3 bins: '101' = intra escape, '110' =
        # mb_type 11, '111' = B_8x8, else one more bin -> 12..21
        bits = 0
        for _ in range(3):
            bits = (bits << 1) | dec.decision(cx[5])
        if bits == 0b101:
            return -1
        if bits == 0b110:
            return 11
        if bits == 0b111:
            return _B_8x8
        return 12 + 2 * bits + dec.decision(cx[5])  # 12..21

    def _enc_b_mb_type(self, enc: CabacEncoder, my: int, mx: int,
                       mode: int) -> None:
        cx = self.cab.b_pre
        inc = self._btype_inc(my, mx)
        if mode == _B_DIRECT_16x16:
            enc.decision(cx[inc], 0)
            return
        enc.decision(cx[inc], 1)
        if mode in (_B_L0_16x16, _B_L1_16x16):
            enc.decision(cx[3], 0)
            enc.decision(cx[4], 1 if mode == _B_L1_16x16 else 0)
            return
        if _B_BI_16x16 <= mode <= 10:               # '110' + 3 bins
            enc.decision(cx[3], 1)
            enc.decision(cx[4], 0)
            bits = mode - _B_BI_16x16
            for i in (2, 1, 0):
                enc.decision(cx[5], (bits >> i) & 1)
            return
        enc.decision(cx[3], 1)
        enc.decision(cx[4], 1)
        if mode == -1:                              # intra '111101'
            bits, extra = 0b101, None
        elif mode == 11:
            bits, extra = 0b110, None
        elif mode == _B_8x8:
            bits, extra = 0b111, None
        else:                                       # 12..21
            bits, extra = (mode - 12) >> 1, (mode - 12) & 1
        for i in (2, 1, 0):
            enc.decision(cx[5], (bits >> i) & 1)
        if extra is not None:
            enc.decision(cx[5], extra)

    # ---- sub_mb_type (Table 9-38, B half: 13 codes) ----

    def _dec_b_sub_type(self, dec: CabacDecoder) -> int:
        cx = self.cab.b_sub
        if not dec.decision(cx[0]):
            return 0                                # B_Direct_8x8
        if not dec.decision(cx[1]):
            return 1 + dec.decision(cx[2])          # '10x'
        if not dec.decision(cx[2]):                 # '110' + 2 bins
            return 3 + 2 * dec.decision(cx[3]) + dec.decision(cx[3])
        if not dec.decision(cx[3]):                 # '1110' + 2 bins
            return 7 + 2 * dec.decision(cx[3]) + dec.decision(cx[3])
        return 11 + dec.decision(cx[3])             # '1111x'

    def _enc_b_sub_type(self, enc: CabacEncoder, st: int) -> None:
        cx = self.cab.b_sub
        if st == 0:
            enc.decision(cx[0], 0)
            return
        enc.decision(cx[0], 1)
        if st <= 2:
            enc.decision(cx[1], 0)
            enc.decision(cx[2], st - 1)
            return
        enc.decision(cx[1], 1)
        if st <= 6:
            enc.decision(cx[2], 0)
            enc.decision(cx[3], (st - 3) >> 1)
            enc.decision(cx[3], (st - 3) & 1)
            return
        enc.decision(cx[2], 1)
        if st <= 10:
            enc.decision(cx[3], 0)
            enc.decision(cx[3], (st - 7) >> 1)
            enc.decision(cx[3], (st - 7) & 1)
            return
        enc.decision(cx[3], 1)
        enc.decision(cx[3], st - 11)

    # ---- decode side ----

    def _decode_b_mb(self, dec: CabacDecoder, addr: int) -> None:
        my, mx = divmod(addr, self.mb_w)
        mode = self._dec_b_mb_type(dec, my, mx)
        if mode == -1:                              # intra-in-B
            self.decode_mb_cabac(dec, addr)
            self.note_intra(addr)
            return
        if 4 <= mode < _B_8x8:
            self._decode_b2_cabac(dec, addr, mode)
            return
        if mode == _B_8x8:
            self._decode_b8x8_cabac(dec, addr)
            return
        by4, bx4 = my * 4, mx * 4
        mvds = np.zeros((2, 2), dtype=np.int64)
        ref0 = ref1 = 0
        if mode == _B_DIRECT_16x16:
            mv0, mv1, use0, use1, ref0, ref1 = self._direct_mv(my, mx)
        else:
            use0 = mode in (_B_L0_16x16, _B_BI_16x16)
            use1 = mode in (_B_L1_16x16, _B_BI_16x16)
            mv0 = mv1 = (0, 0)
            cx = self.cab.mvd
            # mb_pred order (7.3.5.1): ref_idx fields of both lists
            # first, then the mvd pairs
            if use0:
                ref0 = self._dec_ref_b(dec, by4, bx4, 0, self.n_ref0)
            if use1:
                ref1 = self._dec_ref_b(dec, by4, bx4, 1, self.n_ref1)
            if use0:
                dx = _dec_mvd_ueg3(dec, cx[0],
                                   self._bmvd_inc(by4, bx4, 0, 0))
                dy = _dec_mvd_ueg3(dec, cx[1],
                                   self._bmvd_inc(by4, bx4, 0, 1))
                p = self._mv_pred_b(my, mx, 0, ref0)
                mv0 = (p[0] + dy, p[1] + dx)
                mvds[0] = (dx, dy)
            if use1:
                dx = _dec_mvd_ueg3(dec, cx[0],
                                   self._bmvd_inc(by4, bx4, 1, 0))
                dy = _dec_mvd_ueg3(dec, cx[1],
                                   self._bmvd_inc(by4, bx4, 1, 1))
                p = self._mv_pred_b(my, mx, 1, ref1)
                mv1 = (p[0] + dy, p[1] + dx)
                mvds[1] = (dx, dy)
        pred_y, pred_u, pred_v = self._pred_b(my, mx, mv0, mv1,
                                              use0, use1, ref0, ref1)
        self._read_inter_residual_cabac(dec, addr, pred_y, pred_u,
                                        pred_v)
        self._note_inter_b(addr, mvds, mode == _B_DIRECT_16x16)
        self._commit_b(addr, mv0, mv1, use0, use1, ref0, ref1)

    def _read_b_part_mvds(self, dec: CabacDecoder, entries):
        """Read mvd pairs in 7.3.5 syntax order (all L0, then all
        L1), noting each into the block grid so later increments see
        earlier mvds — the encoder mirrors this order exactly.
        ``entries`` is [(key, lst, by, bx, w4, h4), ...] already in
        syntax order; returns {key: (mvd_y, mvd_x)}."""
        cx = self.cab.mvd
        out = {}
        for key, lst, by, bx, w4, h4 in entries:
            dx = _dec_mvd_ueg3(dec, cx[0],
                               self._bmvd_inc(by, bx, lst, 0))
            dy = _dec_mvd_ueg3(dec, cx[1],
                               self._bmvd_inc(by, bx, lst, 1))
            out[key] = (dy, dx)
            self._note_bmvd(by, bx, w4, h4, lst, (dx, dy))
        return out

    def _decode_b2_cabac(self, dec: CabacDecoder, addr: int,
                         mb_type: int) -> None:
        """Partitioned B macroblock (16x8/8x16) under CABAC: the
        CAVLC lane's syntax order with arithmetic ref_idx/mvd bins."""
        from rmlint_spark.operators.h264_b import (
            _b_part_geometry,
            _mode_uses,
        )

        my, mx = divmod(addr, self.mb_w)
        parts, modes = _b_part_geometry(mb_type, my, mx)
        uses = [_mode_uses(m) for m in modes]
        shapes = [p[4] for p in parts]
        refs = [[0, 0] for _ in parts]
        for lst, n_act in ((0, self.n_ref0), (1, self.n_ref1)):
            for i, u in enumerate(uses):
                if u[lst]:
                    refs[i][lst] = self._dec_ref_b(
                        dec, parts[i][0], parts[i][1], lst, n_act)
        entries = [((i, lst), lst, parts[i][0], parts[i][1],
                    parts[i][2], parts[i][3])
                   for lst in (0, 1)
                   for i, u in enumerate(uses) if u[lst]]
        got = self._read_b_part_mvds(dec, entries)
        mvds = [[got.get((i, 0), (0, 0)), got.get((i, 1), (0, 0))]
                for i in range(len(parts))]
        infos = self._derive_b_parts(parts, shapes, uses, refs, mvds)
        pred_y, pred_u, pred_v = self._pred_b_split(my, mx, parts,
                                                    infos)
        self._read_inter_residual_cabac(dec, addr, pred_y, pred_u,
                                        pred_v)
        self._note_inter_b(addr, None, False)
        self._finish_b_mb(addr)

    def _decode_b8x8_cabac(self, dec: CabacDecoder,
                           addr: int) -> None:
        """B_8x8 under CABAC: four Table 9-38 sub_mb_type codes (the
        FULL B half decodes), then ref_idx/mvd fields in 7.3.5.2
        order, then the shared derivation."""
        from rmlint_spark.operators.h264_b import (
            _B_SUB_MODES,
            _mode_uses,
        )
        from rmlint_spark.operators.h264_inter import _sub_parts

        my, mx = divmod(addr, self.mb_w)
        subs = [self._dec_b_sub_type(dec) for _ in range(4)]
        refs8 = [[0, 0] for _ in range(4)]
        for lst, n_act in ((0, self.n_ref0), (1, self.n_ref1)):
            for i, s in enumerate(subs):
                if s and _mode_uses(_B_SUB_MODES[s][0])[lst]:
                    ps = _sub_parts(i, _B_SUB_MODES[s][1], my, mx)
                    refs8[i][lst] = self._dec_ref_b(
                        dec, ps[0][0], ps[0][1], lst, n_act)
        entries = []
        for lst in (0, 1):
            for i, s in enumerate(subs):
                if not s or not _mode_uses(_B_SUB_MODES[s][0])[lst]:
                    continue
                for j, p in enumerate(_sub_parts(
                        i, _B_SUB_MODES[s][1], my, mx)):
                    entries.append(((i, j, lst), lst, p[0], p[1],
                                    p[2], p[3]))
        got = self._read_b_part_mvds(dec, entries)
        d_info = None
        parts_all, infos_all = [], []
        for i, s in enumerate(subs):
            if s == 0:                       # B_Direct_8x8
                if d_info is None:
                    d_info = self._direct_mv(my, mx)
                part = _sub_parts(i, 0, my, mx)[0]
                self._commit_b_part(part[0], part[1], part[2],
                                    part[3], *d_info)
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
                [(got.get((i, j, 0), (0, 0)),
                  got.get((i, j, 1), (0, 0)))
                 for j in range(len(ps))]))
            parts_all.extend(ps)
        pred_y, pred_u, pred_v = self._pred_b_split(my, mx, parts_all,
                                                    infos_all)
        self._read_inter_residual_cabac(dec, addr, pred_y, pred_u,
                                        pred_v)
        self._note_inter_b(addr, None, False)
        self._finish_b_mb(addr)

    def _read_inter_residual_cabac(self, dec: CabacDecoder, addr: int,
                                   pred_y, pred_u, pred_v) -> None:
        """CBP + CABAC residual + reconstruction over an inter
        prediction — the shared tail of the P and B arithmetic
        lanes (mirrors MotionMixin._read_inter_residual)."""
        from rmlint_spark.operators.h264_cabac import _dec_residual
        from rmlint_spark.operators.h264_cavlc import (
            _BLK_GROUP,
            _BLK_XY,
            _recon4,
            _unscan_coeffs,
        )

        my, mx = divmod(addr, self.mb_w)
        cx = self.cab
        cbp = self._dec_cbp(dec, my, mx)
        if cbp:
            self.qp += self._dec_qp_delta(dec)
            if not 0 <= self.qp <= 51:
                raise ValueError("CABAC mb_qp_delta drives QP out of range")
        for blk in range(16):
            bx, by = _BLK_XY[blk]
            gy, gx = my * 4 + by, mx * 4 + bx
            if cbp & (1 << _BLK_GROUP[blk]):
                inc = self._nc_inc(self.nc_y, gy, gx)
                vals = _dec_residual(dec, cx, 2, 16, inc)
                self.nc_y[gy, gx] = sum(1 for v in vals if v)
                q = _unscan_coeffs(vals)
            else:
                self.nc_y[gy, gx] = 0
                q = np.zeros((4, 4), dtype=np.int64)
            self.y[gy * 4:gy * 4 + 4, gx * 4:gx * 4 + 4] = _recon4(
                pred_y[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4], q, self.qp)
        dc_q, ac_q = self._chroma_read_cabac(dec, cbp >> 4, my, mx)
        self._mc_chroma = {"u": pred_u, "v": pred_v}
        try:
            self._chroma_recon(my, mx, dc_q, ac_q)
        finally:
            self._mc_chroma = None

    def decode_slice_b(self, r: _BitReader, first_mb: int,
                       covered: np.ndarray) -> None:
        """slice_data() for a CABAC B slice (7.3.4): alignment, engine
        init, then mb_skip_flag + macroblock_layer + end_of_slice_flag
        per macroblock."""
        while r.bitpos:
            if not r.read(1):
                raise ValueError("cabac_alignment_one_bit must be 1")
        self.new_slice()
        dec = CabacDecoder(r)
        addr = first_mb
        total = self.mb_w * self.mb_h
        while True:
            if addr >= total:
                raise ValueError("H.264 CABAC B slice overruns the picture")
            my, mx = divmod(addr, self.mb_w)
            if dec.decision(self.cab.b_skip[self._skip_inc(my, mx)]):
                self._decode_skip_b(addr)
                self._note_skip_b(addr)
            else:
                self._decode_b_mb(dec, addr)
            self.note_qp(addr)
            covered[addr] = True
            addr += 1
            if dec.terminate():              # end_of_slice_flag
                break

    # ---- encode side ----

    def _encode_b_split_cabac(self, enc: CabacEncoder, addr: int,
                              split, y_src: np.ndarray,
                              u_src: np.ndarray,
                              v_src: np.ndarray) -> None:
        """Emit one partitioned B macroblock under CABAC in 7.3.5
        syntax order — the arithmetic twin of
        h264_b.BInterPicture._encode_b_split."""
        cx = self.cab
        my, mx = divmod(addr, self.mb_w)
        _, mb_type, subs, parts, infos, mvps = split
        enc.decision(cx.b_skip[self._skip_inc(my, mx)], 0)
        self._enc_b_mb_type(enc, my, mx, mb_type)
        if subs is not None:
            for st in subs:
                self._enc_b_sub_type(enc, st)
        for lst, n_act in ((0, self.n_ref0), (1, self.n_ref1)):
            for i, info in enumerate(infos):
                if subs is not None and subs[i] == 0:
                    continue
                if info[2 + lst]:
                    self._enc_ref_b(enc, parts[i][0], parts[i][1],
                                    lst, 0, n_act)
        for lst in (0, 1):
            for i, (info, mvp2) in enumerate(zip(infos, mvps)):
                if subs is not None and subs[i] == 0:
                    continue
                if info[2 + lst]:
                    by, bx, w4, h4 = (parts[i][0], parts[i][1],
                                      parts[i][2], parts[i][3])
                    mv, mvp = info[lst], mvp2[lst]
                    dx, dy = mv[1] - mvp[1], mv[0] - mvp[0]
                    _enc_mvd_ueg3(enc, cx.mvd[0],
                                  self._bmvd_inc(by, bx, lst, 0), dx)
                    _enc_mvd_ueg3(enc, cx.mvd[1],
                                  self._bmvd_inc(by, bx, lst, 1), dy)
                    self._note_bmvd(by, bx, w4, h4, lst, (dx, dy))
        for part, info in zip(parts, infos):
            self._commit_b_part(part[0], part[1], part[2], part[3],
                                *info)
        preds = self._pred_b_split(my, mx, parts, infos)
        (pred_y, pred_u, pred_v, luma_q, dc_q, ac_q,
         cbp) = self._quantize_inter(addr, infos[0][0], y_src, u_src,
                                     v_src, preds=preds)
        self._write_inter_residual_cabac(enc, addr, pred_y, pred_u,
                                         pred_v, luma_q, dc_q, ac_q,
                                         cbp)
        self._note_inter_b(addr, None, False)
        self._finish_b_mb(addr)

    def encode_mb_b(self, enc: CabacEncoder, addr: int,
                    y_src: np.ndarray, u_src: np.ndarray,
                    v_src: np.ndarray, search: int,
                    partitions: bool = False) -> None:
        cx = self.cab
        my, mx = divmod(addr, self.mb_w)
        py, px = my * 16, mx * 16
        src = y_src[py:py + 16, px:px + 16].astype(np.int64)
        (cost, mode, cmv0, cmv1, use0, use1, ref0, ref1, mvp0,
         mvp1) = self._b_candidates(src, my, mx, search)
        if partitions:
            split = self._b_split_candidates(y_src, my, mx, search)
            if split[0] < cost:
                self._encode_b_split_cabac(enc, addr, split, y_src,
                                           u_src, v_src)
                return
        # intra fallback (scene cut inside a B slice)
        intra_best = None
        for pm in (0, 1, 2, 3):
            if (pm == 0 and my == 0) or (pm == 1 and mx == 0):
                continue
            if pm == 3 and (my == 0 or mx == 0):
                continue
            pred = _pred16x16(self.y, py, px, pm,
                              has_top=my > 0, has_left=mx > 0)
            sad = int(np.abs(src - pred).sum())
            if intra_best is None or sad < intra_best:
                intra_best = sad
        if intra_best is not None and cost > 2 * intra_best + 512:
            enc.decision(cx.b_skip[self._skip_inc(my, mx)], 0)
            self._enc_b_mb_type(enc, my, mx, -1)
            self.encode_mb(enc, addr, y_src, u_src, v_src)
            self.note_intra(addr)
            return
        preds = self._pred_b(my, mx, cmv0, cmv1, use0, use1,
                             ref0, ref1)
        (pred_y, pred_u, pred_v, luma_q, dc_q, ac_q,
         cbp) = self._quantize_inter(addr, cmv0, y_src, u_src, v_src,
                                     preds=preds)
        if mode == _B_DIRECT_16x16 and cbp == 0:
            enc.decision(cx.b_skip[self._skip_inc(my, mx)], 1)
            self._decode_skip_b(addr)       # recon == decoder's skip
            self._note_skip_b(addr)
            return
        enc.decision(cx.b_skip[self._skip_inc(my, mx)], 0)
        self._enc_b_mb_type(enc, my, mx, mode)
        by4, bx4 = my * 4, mx * 4
        mvds = np.zeros((2, 2), dtype=np.int64)
        if mode != _B_DIRECT_16x16:
            # 7.3.5.1 order: ref_idx fields of both lists, then mvds
            if use0:
                self._enc_ref_b(enc, by4, bx4, 0, ref0, self.n_ref0)
            if use1:
                self._enc_ref_b(enc, by4, bx4, 1, ref1, self.n_ref1)
            if use0:
                dx, dy = cmv0[1] - mvp0[1], cmv0[0] - mvp0[0]
                _enc_mvd_ueg3(enc, cx.mvd[0],
                              self._bmvd_inc(by4, bx4, 0, 0), dx)
                _enc_mvd_ueg3(enc, cx.mvd[1],
                              self._bmvd_inc(by4, bx4, 0, 1), dy)
                mvds[0] = (dx, dy)
            if use1:
                dx, dy = cmv1[1] - mvp1[1], cmv1[0] - mvp1[0]
                _enc_mvd_ueg3(enc, cx.mvd[0],
                              self._bmvd_inc(by4, bx4, 1, 0), dx)
                _enc_mvd_ueg3(enc, cx.mvd[1],
                              self._bmvd_inc(by4, bx4, 1, 1), dy)
                mvds[1] = (dx, dy)
        self._write_inter_residual_cabac(enc, addr, pred_y, pred_u,
                                         pred_v, luma_q, dc_q, ac_q,
                                         cbp)
        self._note_inter_b(addr, mvds, mode == _B_DIRECT_16x16)
        self._commit_b(addr, cmv0, cmv1, use0, use1, ref0, ref1)

    def _write_inter_residual_cabac(self, enc: CabacEncoder, addr: int,
                                    pred_y, pred_u, pred_v,
                                    luma_q, dc_q, ac_q, cbp) -> None:
        from rmlint_spark.operators.h264_cabac import _enc_residual
        from rmlint_spark.operators.h264_cavlc import (
            _BLK_GROUP,
            _BLK_XY,
            _scan_coeffs,
        )

        my, mx = divmod(addr, self.mb_w)
        cx = self.cab
        self._enc_cbp(enc, my, mx, cbp)
        if cbp:
            self._enc_qp_delta(enc, 0)
        for blk in range(16):
            bx, by = _BLK_XY[blk]
            gy, gx = my * 4 + by, mx * 4 + bx
            if cbp & (1 << _BLK_GROUP[blk]):
                inc = self._nc_inc(self.nc_y, gy, gx)
                self.nc_y[gy, gx] = _enc_residual(
                    enc, cx, 2, _scan_coeffs(luma_q[blk]), inc)
            else:
                self.nc_y[gy, gx] = 0
        self._chroma_write_cabac(enc, dc_q, ac_q, cbp >> 4, my, mx)
        self._recon_inter(addr, pred_y, pred_u, pred_v,
                          luma_q, dc_q, ac_q, cbp)


# --------------------------------------------------------- top level

def encode_h264_cabac_b(frames: list[np.ndarray],
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
    IDR/P/B segments under CABAC entropy (the B twin of
    h264_b.encode_h264_b; same segment/POC structure and the same
    ``wp`` modes — the slice header, pred_weight_table included,
    stays Exp-Golomb under CABAC; ``refs = 2`` makes L0 two-deep
    for B and P slices, mirroring encode_h264_b's subset rules)."""
    from rmlint_spark.operators.h264 import (
        _START4,
        _encode_pps,
        _encode_sps,
        _escape_rbsp,
        _implicit_wp,
        _pad_to_mb,
        _rgb_to_yuv420,
        _write_pred_weight_table,
        _write_deblock,
        _write_se,
        _write_ue,
    )
    from rmlint_spark.operators.h264_inter import _estimate_wp_bi

    if not frames:
        raise ValueError("need at least one frame")
    if not 0 <= qp <= 29:
        raise ValueError("qp outside the implemented 0..29 subset")
    if bgroup < 0 or seg < 1:
        raise ValueError("bgroup must be >= 0 and seg >= 1")
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
    h, w_px = np.asarray(frames[0]).shape[:2]
    mb_w, mb_h = -(-w_px // 16), -(-h // 16)
    planes = []
    for fr in frames:
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.shape[:2] != (h, w_px):
            raise ValueError("all frames must share dimensions")
        y, u, v = _rgb_to_yuv420(fr)
        planes.append((_pad_to_mb(y, 16), _pad_to_mb(u, 8),
                       _pad_to_mb(v, 8)))
    out = bytearray()
    out += _START4 + b"\x67" + _escape_rbsp(
        _encode_sps(mb_w, mb_h, w_px, h, fps,
                    num_ref_frames=4 if pyramid else refs + 1,
                    poc_type=0))
    out += _START4 + b"\x68" + _escape_rbsp(
        _encode_pps(entropy_coding=1, weighted_bipred_idc=bipred_idc))

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
        if slice_type != 7:
            _write_ue(bw, 0)                # cabac_init_idc
        _write_se(bw, qp - 26)              # slice_qp_delta
        _write_deblock(bw)                  # explicit idc 1: filter off
        while bw.nbits % 8:                 # cabac_alignment_one_bit
            bw.write(1, 1)

    n = len(frames)
    frame_num = 0
    idr_id = 0
    n_mbs = mb_w * mb_h
    for s0 in range(0, n, seg):
        s1 = min(s0 + seg, n)
        anchors = list(range(s0, s1, bgroup + 1))
        if anchors[-1] != s1 - 1:
            anchors.append(s1 - 1)
        past: list[tuple] = []              # recon anchors, newest first
        # all reference recons decode-order newest-first: a pyramid P
        # anchor's refIdx 0 is the previous gap's mid B (8.2.4.2.1)
        dec_refs: list = []
        for j, disp in enumerate(anchors):
            y, u, v = planes[disp]
            is_idr = j == 0
            bw = _BitWriter()
            if is_idr:
                frame_num = 0
                pic = CabacInterPicture(
                    np.zeros_like(y), np.zeros_like(u),
                    np.zeros_like(v), mb_w, mb_h,
                    (np.zeros_like(y), np.zeros_like(u),
                     np.zeros_like(v)))
                pic.qp = qp
                header(bw, 7, frame_num, 2 * (disp - s0), True, idr_id)
                idr_id = (idr_id + 1) % 2
                enc = CabacEncoder(bw)
                for addr in range(n_mbs):
                    pic.encode_mb(enc, addr, y, u, v)
                    pic.note_intra(addr)
                    enc.terminate(1 if addr == n_mbs - 1 else 0)
                nal = b"\x65"
            else:
                n_l0 = min(refs, len(past))
                ref0_plane = (dec_refs[0] if pyramid and dec_refs
                              else past[0][0])
                pic = CabacInterPicture(
                    np.zeros_like(y), np.zeros_like(u),
                    np.zeros_like(v), mb_w, mb_h, ref0_plane,
                    past[1][0] if n_l0 > 1 else None)
                pic.qp = qp
                pic.n_ref0 = n_l0
                header(bw, 5, frame_num, 2 * (disp - s0), False, 0,
                       n_l0=n_l0)
                enc = CabacEncoder(bw)
                for addr in range(n_mbs):
                    pic.encode_mb_p(enc, addr, y, u, v, search)
                    enc.terminate(1 if addr == n_mbs - 1 else 0)
                nal = b"\x41"
            bw.pad_to_byte()
            out += _START4 + nal + _escape_rbsp(bw.bytes())
            frame_num = (frame_num + 1) % 16
            cur_anchor = ((pic.y, pic.u, pic.v),
                          (pic.mv4.copy(), pic.mb_state.copy()))
            if is_idr:
                dec_refs = []               # IDR flushes the DPB
            dec_refs.insert(0, cur_anchor[0])
            del dec_refs[4:]
            # plain mode: every gap B predicts from the two anchors;
            # pyramid mode: the middle B codes first as a REFERENCE B
            # and the remaining Bs predict from their nearest
            # (anchor, mid) pair — mirrors h264_b.encode_h264_b
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
                    bpic = CabacBInterPicture(
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
                    enc = CabacEncoder(bw)
                    for addr in range(n_mbs):
                        bpic.encode_mb_b(
                            enc, addr, by, bu, bv, search,
                            # mid B is the leaves' colocated source:
                            # keep it unpartitioned, like the anchors
                            partitions=partitions and not ref_b)
                        enc.terminate(1 if addr == n_mbs - 1 else 0)
                    bw.pad_to_byte()
                    nal = b"\x21" if ref_b else b"\x01"
                    out += _START4 + nal + _escape_rbsp(bw.bytes())
                    frame_num = (frame_num + 1) % 16 if ref_b \
                        else frame_num
                    if ref_b:
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


__all__ = ["CabacBInterPicture", "encode_h264_cabac_b"]
