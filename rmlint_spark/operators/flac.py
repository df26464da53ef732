"""FLAC and MP3 audio container parsing, pure stdlib + numpy.

FLAC here is a real codec for mono 16-bit streams: STREAMINFO and the
frame grammar (sync code, UTF-8 coded frame number, CRC-8 header
check, CRC-16 frame check) parse for real, and all four subframe
types decode — VERBATIM, CONSTANT, FIXED (orders 0-4) and LPC
(arbitrary order, quantized integer coefficients), including
partitioned Rice residuals with escape codes and wasted-bits shifts.
Multi-channel streams raise ``ValueError`` so callers degrade to the
metadata path — the same honest-subset policy the JPEG decoder takes
for progressive scans.  :func:`encode_flac` emits verbatim or
fixed-order-2 Rice frames, so encode→decode roundtrips losslessly and
cross-container duplicate detection (the same PCM pool encoded as
WAV, AIFF and FLAC) works on decoded bytes.

MP3 is metadata-only (an MPEG audio frame-header walk: ID3v2 skip,
bitrate/samplerate tables, Xing/Info VBR header detection).  Full MP3
audio decode needs a polyphase filterbank and stays honestly out of
scope; the WALK is real, which is all ``probe_audio`` needs.

Format grammar is public spec material: RFC 9639 (FLAC) and ISO/IEC
11172-3 (MPEG-1 audio).  The reference tool treats audio files as
opaque byte streams (lib/hasher.c reads raw blocks); typed audio
metadata is part of this engine's training-pipeline surface instead.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ------------------------------------------------------------- CRC

# FLAC frame-header CRC-8 (poly x^8+x^2+x+1 = 0x07, init 0)
_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

# FLAC frame CRC-16 (poly x^16+x^15+x^2+1 = 0x8005, init 0)
_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC8_TABLE[c ^ byte]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC16_TABLE[((c >> 8) ^ byte) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            if self.bytepos >= len(self.data):
                raise ValueError("bitstream truncated")
            bit = (self.data[self.bytepos] >> (7 - self.bitpos)) & 1
            v = (v << 1) | bit
            self.bitpos += 1
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return v

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


# ------------------------------------------------- FLAC STREAMINFO

_FLAC_MAGIC = b"fLaC"


def flac_streaminfo(payload: bytes) -> dict:
    """Parse the mandatory STREAMINFO metadata block: (min/max block
    size, min/max frame size, sample rate, channels, bits/sample,
    total samples, MD5 of the unencoded audio).  Raises ``ValueError``
    on anything that is not a structurally valid FLAC stream head."""
    if len(payload) < 42 or payload[:4] != _FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    btype = payload[4] & 0x7F
    (blen,) = struct.unpack(">I", b"\x00" + payload[5:8])
    if btype != 0 or blen != 34:
        raise ValueError("FLAC stream must start with a 34-byte STREAMINFO")
    b = payload[8:42]
    min_bs, max_bs = struct.unpack(">HH", b[:4])
    min_fs = int.from_bytes(b[4:7], "big")
    max_fs = int.from_bytes(b[7:10], "big")
    packed = int.from_bytes(b[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC STREAMINFO sample rate is 0")
    return {
        "min_block_size": min_bs,
        "max_block_size": max_bs,
        "min_frame_size": min_fs,
        "max_frame_size": max_fs,
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bits,
        "total_samples": total,
        "audio_md5": b[18:34].hex(),
        "duration_ms": int(total * 1000 // rate) if total else 0,
    }


def _utf8_coded(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of the frame number."""
    if n < 0x80:
        return bytes([n])
    out, prefixes = [], {1: 0xC0, 2: 0xE0, 3: 0xF0, 4: 0xF8, 5: 0xFC}
    cont = 0
    while True:
        cont += 1
        out.append(0x80 | (n & 0x3F))
        n >>= 6
        if n < (0x40 >> cont):
            out.append(prefixes[cont] | n)
            return bytes(reversed(out))


def _read_utf8_coded(r: "_BitReader") -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    ones = 0
    while (first << ones) & 0x80:
        ones += 1
    if ones < 2 or ones > 7:
        raise ValueError("invalid FLAC UTF-8 coded number")
    v = first & (0x7F >> ones)
    for _ in range(ones - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


# sample-rate codes with an exact table entry (others use end-of-header fields)
_RATE_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_RATE_FROM_CODE = {v: k for k, v in _RATE_CODES.items()}


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _write_rice_block(w: "_BitWriter", residuals: list[int]) -> None:
    """Single-partition Rice coding (method 00, partition order 0):
    param from the mean zigzagged magnitude, unary quotient + k LSBs."""
    zz = [_zigzag(v) for v in residuals]
    mean = (sum(zz) // max(len(zz), 1)) or 1
    k = min(mean.bit_length() - 1, 14) if mean > 1 else 0
    w.write(0b00, 2)                    # 4-bit rice params
    w.write(0, 4)                       # partition order 0
    w.write(k, 4)
    for u in zz:
        q = u >> k
        w.write(0, q)                   # unary quotient: q zeros...
        w.write(1, 1)                   # ...then the stop bit
        w.write(u & ((1 << k) - 1), k)


def encode_flac(samples: np.ndarray, rate: int = 16000,
                block_size: int = 4096, predictor: str = "verbatim") -> bytes:
    """int16 mono samples -> FLAC bytes.  ``predictor='verbatim'``
    stores raw samples; ``'fixed2'`` uses the order-2 fixed predictor
    with Rice-coded residuals (real FLAC compression — smaller than
    the WAV for correlated signals), exercising the same decode path
    a real encoder's fixed frames take; ``'lpc2'`` writes the same
    order-2 predictor through the LPC subframe grammar (quantized
    coefficients [2, -1], shift 0) to exercise the LPC decode path."""
    if predictor not in ("verbatim", "fixed2", "lpc2"):
        raise ValueError(f"unknown FLAC predictor {predictor!r}")
    s = np.asarray(samples, dtype=np.int16)
    if rate not in _RATE_CODES:
        raise ValueError(f"unsupported FLAC sample rate {rate}")
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    packed = (rate << 44) | (0 << 41) | ((16 - 1) << 36) | len(s)
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
        + packed.to_bytes(8, "big") + md5
    )
    out = bytearray(_FLAC_MAGIC)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    for fno, start in enumerate(range(0, len(s), block_size)):
        blk = s[start : start + block_size]
        w = _BitWriter()
        w.write(0b11111111111110, 14)      # sync
        w.write(0, 1)                       # reserved
        w.write(0, 1)                       # fixed-blocksize stream
        w.write(0b0111, 4)                  # blocksize: 16-bit field at end
        w.write(_RATE_CODES[rate], 4)
        w.write(0, 4)                       # channel assignment: mono
        w.write(0b100, 3)                   # sample size: 16 bits
        w.write(0, 1)                       # reserved
        hdr = w.bytes() + _utf8_coded(fno) + struct.pack(">H", len(blk) - 1)
        hdr += bytes([_crc8(hdr)])
        body = _BitWriter()
        body.write(0, 1)                    # subframe pad bit
        if predictor in ("fixed2", "lpc2") and len(blk) > 2:
            if predictor == "fixed2":
                body.write(0b001010, 6)     # FIXED, order 2
                body.write(0, 1)            # no wasted bits
            else:
                body.write(0b100001, 6)     # LPC, order 2 (1xxxxx, order-1)
                body.write(0, 1)            # no wasted bits
            vals = blk.astype(np.int64)
            for v in vals[:2].tolist():     # warmup samples
                body.write(int(v) & 0xFFFF, 16)
            if predictor == "lpc2":
                body.write(4 - 1, 4)        # coefficient precision 4 bits
                body.write(0, 5)            # shift 0
                body.write(2 & 0xF, 4)      # coefs [2, -1] -> same
                body.write(-1 & 0xF, 4)     # predictor as fixed order 2
            res = (vals[2:] - 2 * vals[1:-1] + vals[:-2]).tolist()
            _write_rice_block(body, res)
        else:
            body.write(0b000001, 6)         # VERBATIM
            body.write(0, 1)                # no wasted bits
            for v in blk.tolist():
                body.write(int(v) & 0xFFFF, 16)
        body.pad_to_byte()
        frame = hdr + body.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


_BLOCKSIZE_FROM_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                        8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                        13: 8192, 14: 16384, 15: 32768}
_BITS_FROM_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients by order: pred = sum(c[j] * s[i-1-j])
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _read_rice_residuals(r: "_BitReader", blocksize: int, order: int) -> list[int]:
    """Partitioned Rice residual decode (both 4- and 5-bit parameter
    methods, escape code -> raw n-bit two's complement)."""
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved FLAC residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    n_parts = 1 << po
    if blocksize % n_parts or (blocksize >> po) <= order and po:
        raise ValueError("invalid FLAC rice partition order")
    out: list[int] = []
    for part in range(n_parts):
        n = (blocksize >> po) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            out.extend(_signed(r.read(raw), raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = 0
                while r.read(1) == 0:
                    q += 1
                    if q > 1 << 20:
                        raise ValueError("runaway FLAC unary quotient")
                u = (q << k) | r.read(k)
                out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return out


def _predict(warmup: list[int], residuals: list[int],
             coefs: list[int], shift: int) -> list[int]:
    s = list(warmup)
    for res in residuals:
        acc = sum(c * s[-1 - j] for j, c in enumerate(coefs))
        s.append(res + (acc >> shift))
    return s


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """FLAC -> (sample_rate, int16 samples).  All four subframe types
    decode (VERBATIM, CONSTANT, FIXED orders 0-4, LPC with partitioned
    Rice residuals); CRC-8 (header) and CRC-16 (frame) are verified.
    Only multi-channel or non-16-bit streams raise ``ValueError`` so
    the caller can degrade to metadata-only handling."""
    info = flac_streaminfo(payload)
    if info["channels"] != 1 or info["bits_per_sample"] != 16:
        raise ValueError("FLAC subset decoder handles mono 16-bit only")
    # skip metadata blocks
    pos = 4
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        last = payload[pos] & 0x80
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        pos += 4 + blen
        if last:
            break
    chunks: list[np.ndarray] = []
    while pos < len(payload):
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        r.read(1)                           # reserved
        r.read(1)                           # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan = r.read(4)
        size_code = r.read(3)
        r.read(1)                           # reserved
        if chan != 0:
            raise ValueError("FLAC subset decoder handles mono only")
        _read_utf8_coded(r)
        if bs_code == 0b0110:
            blocksize = r.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_FROM_CODE:
            blocksize = _BLOCKSIZE_FROM_CODE[bs_code]
        else:
            raise ValueError(f"invalid FLAC blocksize code {bs_code}")
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code not in _RATE_FROM_CODE and rate_code != 0:
            raise ValueError(f"invalid FLAC sample-rate code {rate_code}")
        bits = _BITS_FROM_CODE.get(size_code, info["bits_per_sample"])
        if bits != 16:
            raise ValueError("FLAC subset decoder handles 16-bit only")
        hdr_end = r.bytepos + (1 if r.bitpos else 0)
        if _crc8(payload[pos:hdr_end]) != payload[hdr_end]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        r = _BitReader(payload, hdr_end + 1)
        r.read(1)                           # subframe pad bit
        stype = r.read(6)
        wasted = 0
        if r.read(1):                       # wasted-bits flag: unary k-1
            wasted = 1
            while r.read(1) == 0:
                wasted += 1
                if wasted > 15:
                    raise ValueError("runaway FLAC wasted-bits count")
        eff = bits - wasted                 # effective sample width
        if stype == 0b000000:               # CONSTANT
            blk = [_signed(r.read(eff), eff)] * blocksize
        elif stype == 0b000001:             # VERBATIM
            blk = [_signed(r.read(eff), eff) for _ in range(blocksize)]
        elif stype >> 3 == 0b001 and stype & 0x7 <= 4:  # FIXED order 0-4
            order = stype & 0x7
            warm = [_signed(r.read(eff), eff) for _ in range(order)]
            res = _read_rice_residuals(r, blocksize, order)
            blk = _predict(warm, res, _FIXED_COEFS[order], 0)
        elif stype >> 5 == 1:               # LPC, order 1-32
            order = (stype & 0x1F) + 1
            warm = [_signed(r.read(eff), eff) for _ in range(order)]
            prec = r.read(4)
            if prec == 0xF:
                raise ValueError("invalid FLAC LPC coefficient precision")
            prec += 1
            shift = _signed(r.read(5), 5)
            if shift < 0:
                raise ValueError("negative FLAC LPC shift")
            coefs = [_signed(r.read(prec), prec) for _ in range(order)]
            res = _read_rice_residuals(r, blocksize, order)
            blk = _predict(warm, res, coefs, shift)
        else:
            raise ValueError(f"reserved FLAC subframe type {stype:#08b}")
        if wasted:
            blk = [v << wasted for v in blk]
        blk = np.array(blk, dtype=np.int64)
        if blk.size and (blk.max() > 32767 or blk.min() < -32768):
            raise ValueError("FLAC decoded sample out of 16-bit range")
        blk = blk.astype(np.int16)
        r.align()
        crc_pos = r.bytepos
        if crc_pos + 2 > len(payload):
            raise ValueError("FLAC frame CRC truncated")
        (want,) = struct.unpack(">H", payload[crc_pos : crc_pos + 2])
        if _crc16(payload[pos:crc_pos]) != want:
            raise ValueError("FLAC frame CRC-16 mismatch")
        chunks.append(blk)
        pos = crc_pos + 2
    samples = np.concatenate(chunks) if chunks else np.array([], dtype=np.int16)
    if info["total_samples"] and len(samples) != info["total_samples"]:
        raise ValueError("FLAC sample count disagrees with STREAMINFO")
    if hashlib.md5(samples.astype("<i2").tobytes()).hexdigest() != info["audio_md5"]:
        raise ValueError("FLAC audio MD5 mismatch")
    return info["sample_rate"], samples


# ------------------------------------------------------------- MP3

# bitrate (kbps) tables, index 1..14; index 0 = free format, 15 = bad
_MP3_BITRATES = {
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {1: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              25: [11025, 12000, 8000]}
_SAMPLES_PER_FRAME = {(1, 3): 1152, (2, 3): 576, (25, 3): 576}


def _id3v2_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none) — the size
    field is 4 syncsafe (7-bit) bytes."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):
        return 0
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    return 10 + size


def encode_mp3_stub(n_frames: int, bitrate_kbps: int = 128,
                    rate: int = 44100, id3_bytes: int = 0,
                    version: int = 1) -> bytes:
    """Structurally valid MPEG-1/2 Layer III frame sequence with
    ZEROED audio payloads — a metadata-walk fixture generator.  The
    frame headers are spec-exact.  Since r5 the MPEG-1 variant also
    *decodes* for real (all-zero side info is a legal silent frame;
    mpeg_audio.encode_layer3 is the full entropy encoder); MPEG-2
    variants remain metadata-only."""
    if version not in (1, 2):
        raise ValueError(f"unsupported MPEG version {version}")
    vtab = _MP3_BITRATES[(version, 3)]
    if bitrate_kbps not in vtab[1:]:
        raise ValueError(f"invalid MPEG-{version} L3 bitrate {bitrate_kbps}")
    if rate not in _MP3_RATES[version]:
        raise ValueError(f"invalid MPEG-{version} sample rate {rate}")
    out = bytearray(b"ID3" + bytes([4, 0, 0]) +
                    bytes([(id3_bytes >> 21) & 0x7F, (id3_bytes >> 14) & 0x7F,
                           (id3_bytes >> 7) & 0x7F, id3_bytes & 0x7F]) +
                    b"\x00" * id3_bytes) if id3_bytes else bytearray()
    br_idx = vtab.index(bitrate_kbps)
    sr_idx = _MP3_RATES[version].index(rate)
    ver_bits = 0b11 if version == 1 else 0b10
    spf = _SAMPLES_PER_FRAME[(version, 3)]
    for _ in range(n_frames):
        hdr = (0xFFF << 20) | (ver_bits << 19) | (0b01 << 17) | (1 << 16)  # L3, no CRC
        hdr |= (br_idx << 12) | (sr_idx << 10) | (0 << 9)              # no padding
        hdr |= 0b11 << 6                                               # mono
        flen = spf // 8 * bitrate_kbps * 1000 // rate
        out += hdr.to_bytes(4, "big") + b"\x00" * (flen - 4)
    return bytes(out)


def mp3_metadata(payload: bytes) -> dict:
    """MPEG audio frame-header walk: skips a leading ID3v2 tag, then
    parses each frame header (version, layer, bitrate, sample rate,
    padding) to step exact frame lengths.  All three layers walk:
    Layer I uses the 4-byte-slot length formula, Layers II/III the
    byte formula (Layer I/II essence additionally *decodes* via
    operators/mpeg_audio.py — all three layers since r5, Layer III
    via Huffman + reservoir + IMDCT).  Returns frame count, summed
    duration, mean
    bitrate, layer, VBR flag (bitrate varies across frames or a
    Xing/Info tag is present).  Raises ``ValueError`` if no valid
    frame sync is found where one is required."""
    pos = _id3v2_size(payload)
    has_id3 = pos > 0
    n, dur_ms, bitrates, rate_out, channels = 0, 0.0, set(), None, None
    kbps_sum, xing, layer_out = 0, False, None
    while pos + 4 <= len(payload):
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        if (hdr >> 21) & 0x7FF != 0x7FF:
            if n == 0:
                raise ValueError("no MPEG frame sync at stream start")
            break  # trailing tag (e.g. ID3v1) — stop cleanly
        ver_bits = (hdr >> 19) & 0x3
        version = {0b11: 1, 0b10: 2, 0b00: 25}.get(ver_bits)
        layer = {0b01: 3, 0b10: 2, 0b11: 1}.get((hdr >> 17) & 0x3)
        if version is None or layer is None:
            raise ValueError("unsupported MPEG version/layer")
        if layer != 3 and version == 25:
            raise ValueError("MPEG-2.5 is Layer III only")
        if layer_out is not None and layer != layer_out:
            raise ValueError("MPEG layer changes mid-stream")
        br_idx = (hdr >> 12) & 0xF
        sr_idx = (hdr >> 10) & 0x3
        padding = (hdr >> 9) & 0x1
        mode = (hdr >> 6) & 0x3
        if layer == 3:
            vtab = _MP3_BITRATES[(min(version, 2), 3)]
        elif version == 2 and layer == 1:
            from rmlint_spark.operators.mpeg_audio import BITRATES_V2_L1

            vtab = BITRATES_V2_L1
        elif version == 2:                       # LSF Layer II = L3 table
            vtab = _MP3_BITRATES[(2, 3)]
        else:
            from rmlint_spark.operators.mpeg_audio import BITRATES

            vtab = BITRATES[layer]
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-format/invalid MP3 frame header")
        kbps = vtab[br_idx]
        rate = _MP3_RATES[version][sr_idx]
        spf = {1: 384, 2: 1152}.get(layer) or _SAMPLES_PER_FRAME[(version, 3)]
        if layer == 1:
            flen = (12 * kbps * 1000 // rate + padding) * 4
        else:
            flen = spf // 8 * kbps * 1000 // rate + padding
        if flen <= 4 or pos + flen > len(payload):
            break  # final truncated frame: count what fully fits
        if layer == 3:
            side_info = (32 if mode != 0b11 else 17) if version == 1 else \
                        (17 if mode != 0b11 else 9)
            tag_off = pos + 4 + side_info
            if n == 0 and payload[tag_off : tag_off + 4] in (b"Xing", b"Info"):
                xing = True
        layer_out = layer
        bitrates.add(kbps)
        kbps_sum += kbps
        rate_out, channels = rate, (1 if mode == 0b11 else 2)
        dur_ms += spf * 1000.0 / rate
        n += 1
        pos += flen
    if n == 0:
        raise ValueError("no complete MPEG audio frame")
    return {
        "n_frames": n,
        "duration_ms": int(round(dur_ms)),
        "sample_rate": rate_out,
        "channels": channels,
        "bitrate_kbps": int(round(kbps_sum / n)),
        "vbr": xing or len(bitrates) > 1,
        "id3v2": has_id3,
        "layer": layer_out,
    }
