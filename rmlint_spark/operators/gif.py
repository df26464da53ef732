"""GIF87a/89a codec in pure Python + numpy (LZW entropy coding).

Real decode: logical screen + global/local color tables, variable-
width LZW with clear/EOI handling and 4095-entry dictionary cap,
4-pass interlace, and multi-frame animation compositing (graphic
control extensions: per-frame delay, transparency index, disposal
none/leave/restore-background). The encoder (for tests) palettizes an
RGB image (<=256 distinct colors), LZW-compresses, and can emit
multi-frame animations with delays.

Decode errors raise ValueError so callers degrade to opaque bytes.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


# -------------------------------------------------------------- decode

class _LZWReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8), bitorder="little"
        )
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("GIF LZW data exhausted")
        v = 0
        for i, b in enumerate(self.bits[self.pos : self.pos + n]):
            v |= int(b) << i
        self.pos += n
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"invalid GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LZWReader(data)
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev = None
    while len(out) < n_pixels:
        code = r.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("GIF LZW starts with unknown code")
        elif code in table:
            entry = table[code]
        elif code == len(table) + 2:  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        if prev is not None and len(table) + 2 < 4096:
            table[len(table) + 2] = prev + entry[:1]
            if len(table) + 2 == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW underruns raster")
    return bytes(out[:n_pixels])


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data, next)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated in sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(payload):
            raise ValueError("GIF truncated sub-block")
        chunks.append(payload[pos : pos + n])
        pos += n


def _color_table(payload: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    if pos + 3 * n > len(payload):
        raise ValueError("GIF truncated color table")
    return (
        np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3),
        pos + 3 * n,
    )


def decode_gif(payload: bytes) -> tuple[list[int], list[np.ndarray]]:
    """GIF -> (per-frame delays in ms, [(h, w, 3) uint8 RGB frames]).
    Static GIFs return one frame with delay 0. Materializes every
    frame; `iter_gif_frames` streams them one at a time (compositing
    is inherently sequential, but only one canvas stays live)."""
    delays, frames = [], []
    for delay, frame in iter_gif_frames(payload):
        delays.append(delay)
        frames.append(frame)
    return delays, frames


def gif_metadata(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, duration_ms) from a structural walk —
    validates block framing but skips LZW decode entirely, so probing
    a video-sized GIF costs O(bytes), not O(pixels)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    if w == 0 or h == 0:
        raise ValueError(f"invalid GIF dimensions {w}x{h}")
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    n_frames = duration = delay_ms = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            if n_frames == 0:
                raise ValueError("GIF has no image data")
            return w, h, n_frames, duration
        if b == 0x21:
            if pos + 2 > len(payload):
                raise ValueError("GIF truncated extension")
            label = payload[pos + 1]
            body, pos = _sub_blocks(payload, pos + 2)
            if label == 0xF9 and len(body) >= 4:
                delay_ms = struct.unpack("<H", body[1:3])[0] * 10
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        if pos + 10 > len(payload):
            raise ValueError("GIF truncated image descriptor")
        iflags = payload[pos + 9]
        pos += 10
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 7))
        if pos >= len(payload):
            raise ValueError("GIF truncated before LZW data")
        _data, pos = _sub_blocks(payload, pos + 1)
        n_frames += 1
        duration += delay_ms
        delay_ms = 0
    raise ValueError("GIF missing trailer")


def iter_gif_frames(payload: bytes):
    """Yield (delay_ms, (h, w, 3) uint8 RGB) per animation frame."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    if w == 0 or h == 0:
        raise ValueError(f"invalid GIF dimensions {w}x{h}")
    # untrusted-input guard: 65535x65535 would allocate ~12 GB canvases
    if w * h > (1 << 26):
        raise ValueError(f"GIF dimensions {w}x{h} exceed decoder bound")
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(payload, pos, 2 << (flags & 7))
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    bg_canvas = canvas.copy()
    n_frames = 0
    transparent = None
    delay_ms = 0
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            if n_frames == 0:
                raise ValueError("GIF has no image data")
            return
        if b == 0x21:  # extension
            if pos + 2 > len(payload):
                raise ValueError("GIF truncated extension")
            label = payload[pos + 1]
            body, pos = _sub_blocks(payload, pos + 2)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                packed, delay_cs, tidx = struct.unpack("<BHB", body[:4])
                disposal = (packed >> 2) & 7
                transparent = tidx if packed & 1 else None
                delay_ms = delay_cs * 10
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        # image descriptor
        if pos + 10 > len(payload):
            raise ValueError("GIF truncated image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        if iw == 0 or ih == 0 or ix + iw > w or iy + ih > h:
            raise ValueError("GIF frame rect outside logical screen")
        table = gct
        if iflags & 0x80:
            table, pos = _color_table(payload, pos, 2 << (iflags & 7))
        if table is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("GIF truncated before LZW data")
        min_code = payload[pos]
        data, pos = _sub_blocks(payload, pos + 1)
        idx = np.frombuffer(
            _lzw_decode(data, min_code, iw * ih), dtype=np.uint8
        ).copy()
        if iflags & 0x40:  # 4-pass interlace: stream rows -> display rows
            order = [
                y for start, step in _INTERLACE_PASSES for y in range(start, ih, step)
            ]
            dst = np.empty((ih, iw), dtype=np.uint8)
            dst[np.array(order)] = idx.reshape(ih, iw)
            idx = dst
        else:
            idx = idx.reshape(ih, iw)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index outside color table")
        region = canvas[iy : iy + ih, ix : ix + iw]
        rgb = table[idx]
        if transparent is not None:
            mask = idx != transparent
            region = np.where(mask[:, :, None], rgb, region)
        else:
            region = rgb
        composed = canvas.copy()
        composed[iy : iy + ih, ix : ix + iw] = region
        yield delay_ms, composed
        n_frames += 1
        if disposal == 2:  # restore to background
            canvas = bg_canvas.copy()
        else:  # none / leave in place
            canvas = composed
        transparent = None
        delay_ms = 0
        disposal = 0
    raise ValueError("GIF missing trailer")


# -------------------------------------------------------------- encode

class _LZWWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.acc |= code << self.nbits  # LSB-first packing
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LZWWriter()
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    cur = b""
    for byte in indices:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        bw.write(table[cur], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dictionary full: clear and restart
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        cur = bytes([byte])
    if cur:
        bw.write(table[cur], width)
    bw.write(eoi, width)
    return bw.flush()


def _blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delays_ms: list[int] | None = None,
) -> bytes:
    """(h, w, 3) uint8 frame(s) -> GIF89a. All frames together must use
    <= 256 distinct colors (tests use synthetic palettes; a production
    encoder would quantize)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif needs <=256 colors, got {len(palette)}")
    depth = max((len(palette) - 1).bit_length(), 1)
    table_size = 1 << depth
    gct = np.zeros((table_size, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += gct.tobytes()
    min_code = max(depth, 2)
    offset = 0
    for fi, fr in enumerate(frames):
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        if delays_ms is not None:
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", 0, delays_ms[fi] // 10, 0
            ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        idx = inverse[offset : offset + h * w].astype(np.uint8).tobytes()
        offset += h * w
        out.append(min_code)
        out += _blocks(_lzw_encode(idx, min_code))
    out += b"\x3b"
    return bytes(out)
