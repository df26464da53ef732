"""Baseline JPEG (ITU T.81 SOF0) codec in pure numpy + stdlib.

Real entropy decode: Huffman tables from DHT, byte-unstuffed scan
segments, per-MCU block decode with DC prediction and restart-marker
resets, dequantization, inverse zigzag, IDCT as an 8x8 orthonormal
DCT-basis matmul, chroma upsampling for any (h, v) sampling factors,
JFIF YCbCr->RGB. The encoder (for tests and deterministic thumbnail
output) emits baseline JPEGs with the Annex K quantization and Huffman
tables at a quality scale, 4:4:4 or 4:2:0, optional restart intervals.

Unsupported (raise ValueError, so callers degrade to opaque bytes):
progressive (SOF2), arithmetic coding, 12-bit precision, hierarchical.
This is a correctness-first decoder — per-symbol Huffman decoding is a
Python loop, sized for test assets and honest feature extraction, not
a media pipeline hot path.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

# Untrusted-input guard: a crafted SOF claiming 65535x65535 would
# allocate ~12 GB of component planes before any entropy data is
# read. 64M pixels bounds the decode at ~200 MB while covering any
# plausible training-data asset; larger headers raise ValueError and
# the caller degrades to opaque bytes.
MAX_PIXELS = 1 << 26

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)

# ITU T.81 Annex K.1/K.2 quantization tables (natural order)
_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
_QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# ITU T.81 Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: coef = D @ block @ D.T, block = D.T @ coef @ D
_D8 = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol for the T.81 canonical assignment."""
    table, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) for the encoder."""
    return {v: (c, l) for (l, c), v in _canonical_codes(bits, vals).items()}


# ------------------------------------------------------------- decoder

class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, seg: bytes):
        self.bits = np.unpackbits(np.frombuffer(seg, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("JPEG entropy data exhausted")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received bits to a signed coefficient."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded scan, splitting at RST markers.
    Returns (segments, offset of the terminating marker's 0xFF)."""
    segs, cur, pos = [], bytearray(), start
    while pos < len(data):
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= len(data):
            raise ValueError("JPEG scan ends mid-marker")
        m = data[pos + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker terminates the scan
            segs.append(bytes(cur))
            return segs, pos
    raise ValueError("JPEG scan missing terminating marker")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (grayscale replicated)."""
    if not payload or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before any SOS
            raise ValueError("JPEG has no scan")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT")
                zz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = zz  # stored in zigzag order
                qtables[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                htables[(tc, th)] = _canonical_codes(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            if h == 0 or w == 0:
                raise ValueError(f"invalid JPEG dimensions {w}x{h}")
            if h * w > MAX_PIXELS:
                raise ValueError(f"JPEG dimensions {w}x{h} exceed decoder bound")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0xF
                # T.81 B.2.2: Hi/Vi are 1..4; a crafted 0 nibble would
                # otherwise surface as ZeroDivisionError at vmax // vs
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"invalid JPEG sampling factors {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0/SOF1) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scomp = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scomp[cs] = (tt >> 4, tt & 0xF)  # (dc table, ac table)
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scomp, qtables, htables,
                restart_interval,
            )
        # APPn/COM/others: skip
        pos += 2 + seglen
    raise ValueError("JPEG missing SOS")


def _decode_scan(payload, start, frame, scomp, qtables, htables, dri):
    h, w, comps = frame
    if not comps or any(cid not in scomp for cid, *_ in comps):
        raise ValueError("JPEG scan/frame component mismatch")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax == 0 or vmax == 0:
        raise ValueError("invalid JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    segs, _end = _split_scan(payload, start)
    planes = []
    for cid, hs, vs, tq in comps:
        if tq not in qtables:
            raise ValueError(f"JPEG references missing quant table {tq}")
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64))

    seg_i = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(comps)
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:  # restart boundary
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_i])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            dc_t, ac_t = scomp[cid]
            if (0, dc_t) not in htables or (1, ac_t) not in htables:
                raise ValueError("JPEG references missing Huffman table")
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    s = reader.huff(htables[(0, dc_t)])
                    preds[ci] += _extend(reader.read(s), s)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.huff(htables[(1, ac_t)])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run overflows block")
                        zz[k] = _extend(reader.read(s), s)
                        k += 1
                    coef = (zz * qtables[tq])[_UNZIGZAG].reshape(8, 8)
                    block = _D8.T @ coef @ _D8 + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    out = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(up[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(out) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out)}")
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encoder

def _encode_gray(y: np.ndarray, h: int, w: int, ql: np.ndarray,
                 restart_interval: int = 0) -> bytes:
    """Single-component (luma) baseline JPEG — exercises the decoder's
    1-component scan path; grayscale decode replicates to RGB."""
    mcux, mcuy = -(-w // 8), -(-h // 8)
    plane = np.pad(
        y, ((0, mcuy * 8 - h), (0, mcux * 8 - w)), mode="edge"
    ) - 128.0
    dc_l = _encode_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _encode_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    chunks, bw, pred, rst = [], _BitWriter(), 0, 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.pad()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            bw = _BitWriter()
            pred = 0
        my, mx = divmod(m, mcux)
        block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
        zz = np.round((_D8 @ block @ _D8.T).reshape(64) / ql).astype(np.int64)[_ZIGZAG]
        pred = _encode_block(bw, zz, pred, dc_l, ac_l)
    bw.pad()
    chunks.append(bytes(bw.out))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in ql[_ZIGZAG]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    return out + b"".join(chunks) + b"\xff\xd9"


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def pad(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table (public formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(bw, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0, grayscale: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF JPEG. ``subsample`` picks
    4:2:0 (2x2 mean-pooled chroma) over the default 4:4:4;
    ``restart_interval`` > 0 emits RSTn markers every that many MCUs;
    ``grayscale`` emits a single-component (luma-only) scan."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    f = arr.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
    cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]

    ql = _scaled_quant(_QUANT_LUM, quality)
    qc = _scaled_quant(_QUANT_CHROM, quality)

    if grayscale:
        return _encode_gray(y, h, w, ql, restart_interval)
    if subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        he, we = h + (h & 1), w + (w & 1)  # pad to even before pooling
        cb = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
        cr = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
        cb = cb.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for (hs, vs), plane in zip(samp, (y, cb, cr)):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        planes.append(padded - 128.0)

    dc_l, ac_l = _encode_codes(_DC_LUM_BITS, _DC_LUM_VALS), _encode_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c, ac_c = _encode_codes(_DC_CHROM_BITS, _DC_CHROM_VALS), _encode_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)
    tables = [(ql, dc_l, ac_l), (qc, dc_c, ac_c), (qc, dc_c, ac_c)]

    chunks = []
    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.pad()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            bw = _BitWriter()
            preds = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci, ((hs, vs), plane, (q, dcc, acc)) in enumerate(zip(samp, planes, tables)):
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    block = plane[y0 : y0 + 8, x0 : x0 + 8]
                    coef = _D8 @ block @ _D8.T
                    zz = np.round(coef.reshape(64) / q).astype(np.int64)[_ZIGZAG]
                    preds[ci] = _encode_block(bw, zz, preds[ci], dcc, acc)
    bw.pad()
    chunks.append(bytes(bw.out))
    scan = b"".join(chunks)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(v) for v in q[_ZIGZAG]))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof_comps = b"".join(
        bytes([cid + 1, (hs << 4) | vs, 0 if cid == 0 else 1])
        for cid, (hs, vs) in enumerate(samp)
    )
    sos_comps = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11]) for cid in range(3)
    )
    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += dqt(0, ql) + dqt(1, qc)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
    out += dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    out += dht(0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS)
    out += dht(1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS)
    out += seg(0xDA, bytes([3]) + sos_comps + b"\x00\x3f\x00")
    return out + scan + b"\xff\xd9"  # EOI
