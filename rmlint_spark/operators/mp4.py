"""ISO Base Media File Format (MP4/MOV) container parsing, pure stdlib.

This is container-level METADATA extraction — the real half of what a
training-data pipeline wants from video assets: duration, per-track
dimensions, codec fourcc, and exact per-sample (frame) timestamps from
the ``stts`` table. Frame PIXEL decode would need an H.264/H.265
decoder (not in this container) and stays honestly stubbed upstream;
frame *timing* from an MP4 is real via :func:`sample_timestamps`.

Box grammar (public spec, ISO/IEC 14496-12): 4-byte big-endian size +
4-byte type; size==1 -> 64-bit largesize follows; size==0 -> to EOF.
Container boxes (moov/trak/mdia/minf/stbl) nest children directly.
"""

from __future__ import annotations

import struct

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta", b"dinf",
}


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} overruns container")
        yield btype, body, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing garbage after last MP4 box")


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """Yield (body_start, body_end) of every box matching the path."""
    for btype, b0, b1 in _boxes(data, start, end):
        if btype != path[0]:
            continue
        if len(path) == 1:
            yield b0, b1
        elif btype in _CONTAINERS:
            yield from _find(data, b0, b1, path[1:])


def _fullbox(data: bytes, b0: int) -> tuple[int, int]:
    """(version, flags) of a full box; body fields start at b0+4."""
    if b0 + 4 > len(data):
        raise ValueError("truncated MP4 full box")
    return data[b0], int.from_bytes(data[b0 + 1 : b0 + 4], "big")


def parse_mp4(payload: bytes) -> dict:
    """Parse an MP4/MOV payload into typed metadata:

    ``{"brand", "duration_ms", "timescale", "tracks": [{"kind",
    "codec", "width", "height", "duration_ms", "timescale",
    "n_samples", "sample_deltas"}]}``

    ``sample_deltas`` is the run-length-expanded ``stts`` table (per
    sample duration in track timescale units) — the ground truth for
    frame timestamps.
    """
    if len(payload) < 12:
        raise ValueError("not an MP4 payload")
    top = list(_boxes(payload, 0, len(payload)))
    types = [t for t, _, _ in top]
    if b"ftyp" not in types or b"moov" not in types:
        raise ValueError("MP4 missing ftyp/moov")
    out: dict = {"tracks": []}
    for btype, b0, b1 in top:
        if btype == b"ftyp":
            out["brand"] = payload[b0 : b0 + 4].decode("latin-1")
        elif btype == b"moov":
            _parse_moov(payload, b0, b1, out)
    if "duration_ms" not in out:
        raise ValueError("MP4 moov missing mvhd")
    return out


def _parse_moov(data: bytes, start: int, end: int, out: dict):
    for btype, b0, b1 in _boxes(data, start, end):
        if btype == b"mvhd":
            ver, _ = _fullbox(data, b0)
            if ver == 1:
                ts, dur = struct.unpack(">IQ", data[b0 + 20 : b0 + 32])
            else:
                ts, dur = struct.unpack(">II", data[b0 + 12 : b0 + 20])
            if ts == 0:
                raise ValueError("MP4 mvhd timescale is zero")
            out["timescale"] = ts
            out["duration_ms"] = dur * 1000 // ts
        elif btype == b"trak":
            out["tracks"].append(_parse_trak(data, b0, b1))


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    tr: dict = {"kind": "unknown", "codec": None, "width": None, "height": None}
    for b0, b1 in _find(data, start, end, [b"tkhd"]):
        ver, _ = _fullbox(data, b0)
        # width/height are the last two 16.16 fixed-point fields
        w, h = struct.unpack(">II", data[b1 - 8 : b1])
        if w and h:
            tr["width"], tr["height"] = w >> 16, h >> 16
    for b0, b1 in _find(data, start, end, [b"mdia", b"mdhd"]):
        ver, _ = _fullbox(data, b0)
        if ver == 1:
            ts, dur = struct.unpack(">IQ", data[b0 + 20 : b0 + 32])
        else:
            ts, dur = struct.unpack(">II", data[b0 + 12 : b0 + 20])
        if ts == 0:
            raise ValueError("MP4 mdhd timescale is zero")
        tr["timescale"] = ts
        tr["duration_ms"] = dur * 1000 // ts
    for b0, b1 in _find(data, start, end, [b"mdia", b"hdlr"]):
        handler = data[b0 + 8 : b0 + 12]
        tr["kind"] = {b"vide": "video", b"soun": "audio", b"text": "text"}.get(
            handler, handler.decode("latin-1", "replace")
        )
    for b0, b1 in _find(data, start, end, [b"mdia", b"minf", b"stbl", b"stsd"]):
        _fullbox(data, b0)
        (n_entries,) = struct.unpack(">I", data[b0 + 4 : b0 + 8])
        if n_entries >= 1 and b0 + 16 <= b1:
            tr["codec"] = data[b0 + 12 : b0 + 16].decode("latin-1")
    for b0, b1 in _find(data, start, end, [b"mdia", b"minf", b"stbl", b"stts"]):
        _fullbox(data, b0)
        (n_entries,) = struct.unpack(">I", data[b0 + 4 : b0 + 8])
        if b0 + 8 + 8 * n_entries > b1:
            raise ValueError("truncated MP4 stts")
        deltas, total = [], 0
        for i in range(n_entries):
            cnt, delta = struct.unpack(
                ">II", data[b0 + 8 + 8 * i : b0 + 16 + 8 * i]
            )
            total += cnt
            # untrusted-input guard: a single crafted run (cnt up to
            # 2^32) would expand to a multi-GB list
            if total > (1 << 24):
                raise ValueError("MP4 stts sample count exceeds decoder bound")
            deltas.extend([delta] * cnt)
        tr["n_samples"] = len(deltas)
        tr["sample_deltas"] = deltas
    return tr


def sample_timestamps(meta: dict, kind: str = "video") -> list[int]:
    """Per-sample presentation timestamps in ms for the first track of
    ``kind``, from its run-length stts table: t[i] = sum(deltas[:i])."""
    for tr in meta["tracks"]:
        if tr["kind"] == kind and "sample_deltas" in tr:
            ts = tr["timescale"]
            out, acc = [], 0
            for d in tr["sample_deltas"]:
                out.append(acc * 1000 // ts)
                acc += d
            return out
    raise ValueError(f"MP4 has no {kind} track with an stts table")


# ------------------------------------------------------------- encoder

def encode_mp4_skeleton(
    width: int = 640,
    height: int = 360,
    fps: tuple[int, int] = (30, 1),
    n_frames: int = 90,
    codec: str = "avc1",
    audio: bool = False,
) -> bytes:
    """Build a minimal structurally-valid MP4 (ftyp + moov with one
    video track; no mdat — metadata only, the way a crawler snapshot
    or a stripped sidecar looks). Deterministic; for tests and the
    metadata-extraction plumbing."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    def full(btype: bytes, ver: int, flags: int, body: bytes) -> bytes:
        return box(btype, bytes([ver]) + flags.to_bytes(3, "big") + body)

    timescale = fps[0] * 1000
    delta = fps[1] * 1000
    dur = n_frames * delta

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2),
    )
    tkhd = full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, dur) + b"\x00" * 8
        + struct.pack(">hhhH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0))
    hdlr = full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00")
    stsd = full(
        b"stsd", 0, 0,
        struct.pack(">I", 1)
        + box(codec.encode("latin-1"),
              b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
              + struct.pack(">HH", width, height) + b"\x00" * 50),
    )
    stts = full(b"stts", 0, 0, struct.pack(">III", 1, n_frames, delta))
    stbl = box(b"stbl", stsd + stts
               + full(b"stsc", 0, 0, struct.pack(">I", 0))
               + full(b"stsz", 0, 0, struct.pack(">III", 0, 0, 0))
               + full(b"stco", 0, 0, struct.pack(">I", 0)))
    minf = box(b"minf", box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
               + box(b"dinf", full(b"dref", 0, 0, struct.pack(">I", 1)
                                   + full(b"url ", 0, 1, b"")))
               + stbl)
    trak = box(b"trak", tkhd + box(b"mdia", mdhd + hdlr + minf))
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov
