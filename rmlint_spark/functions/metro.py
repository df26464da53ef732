"""MetroHash128 (variants 1 and 2) and the 256-bit composition —
pure-Python ports of the public MIT-licensed algorithm (J. Andrew
Rogers, github.com/jandrewrogers/MetroHash), covering the reference's
``metro`` / ``metro256`` checksum types (enum lib/checksum.c:815-851,
interfaces lib/checksum.c:215-245).

Semantics matched to the reference's streaming digester: seedless
init (equivalent to upstream seed 0 — v0 = -k0*k3, v1 = k1*k2,
v2 = k0*k2, v3 = -k1*k3 mod 2^64), 32-byte bulk rounds, and the
variant-specific finalization ladder over the <32-byte tail. The
256-bit type is the variant-1 and variant-2 digests concatenated
(metrohash256 in the reference's vendored library). Test vectors are
pinned from the reference implementation compiled standalone.

Per-value block chaining is inherently sequential, so like
``functions/murmur.py`` this is a config-compatibility algorithm, not
a throughput path — the engine's hot hashes stay JVM-native
(sha2/xxhash64) or hashlib-C (blake2b).
"""

from __future__ import annotations

_M = (1 << 64) - 1

# (k0, k1, k2, k3), pre-mix rotations, tail rotations, final rotations
_VARIANTS = {
    1: {
        "k": (0xC83A91E1, 0x8648DBDB, 0x7BDEC03B, 0x2F5870A5),
        "premix": (26, 26, 26, 30),
        "t16": (33, 17),  # per-8-byte rotate, cross rotate
        "t8": (33, 20),
        "t4": (33, 18),
        "t2": (33, 24),
        "t1": (33, 24),
        "final": (13, 37, 13, 37),
        # final-round multipliers: variant 1 reuses k0,k1 then k2,k3
        "final_k": (0, 1, 2, 3),
    },
    2: {
        "k": (0xEE783E2F, 0xAD07C493, 0x797A90BB, 0x2E4B2E1B),
        "premix": (33, 33, 33, 33),
        "t16": (29, 29),
        "t8": (29, 29),
        "t4": (29, 25),
        "t2": (29, 30),
        "t1": (29, 18),
        "final": (33, 33, 33, 33),
        "final_k": (0, 1, 2, 3),
    },
}


def _rotr(x: int, r: int) -> int:
    return ((x >> r) | (x << (64 - r))) & _M


def metro128(data: bytes, variant: int = 1) -> bytes:
    """16-byte digest (v0 ‖ v1, little-endian), byte-identical to the
    reference's ``metro`` digester output for the same bytes."""
    p = _VARIANTS[variant]
    k0, k1, k2, k3 = p["k"]

    v0 = (-k0 * k3) & _M
    v1 = (k1 * k2) & _M
    v2 = (k0 * k2) & _M
    v3 = (-k1 * k3) & _M

    bulk_end = len(data) - (len(data) % 32)
    for off in range(0, bulk_end, 32):
        d = data[off : off + 32]
        v0 = (v0 + int.from_bytes(d[0:8], "little") * k0) & _M
        v0 = (_rotr(v0, 29) + v2) & _M
        v1 = (v1 + int.from_bytes(d[8:16], "little") * k1) & _M
        v1 = (_rotr(v1, 29) + v3) & _M
        v2 = (v2 + int.from_bytes(d[16:24], "little") * k2) & _M
        v2 = (_rotr(v2, 29) + v0) & _M
        v3 = (v3 + int.from_bytes(d[24:32], "little") * k3) & _M
        v3 = (_rotr(v3, 29) + v1) & _M

    r0, r1, r2, r3 = p["premix"]
    v2 ^= (_rotr(((v0 + v3) * k0 + v1) & _M, r0) * k1) & _M
    v3 ^= (_rotr(((v1 + v2) * k1 + v0) & _M, r1) * k0) & _M
    v0 ^= (_rotr(((v0 + v2) * k0 + v3) & _M, r2) * k1) & _M
    v1 ^= (_rotr(((v1 + v3) * k1 + v2) & _M, r3) * k0) & _M

    tail = data[bulk_end:]
    pos = 0
    rem = len(tail)

    if rem >= 16:
        rot, cross = p["t16"]
        v0 = (v0 + int.from_bytes(tail[pos : pos + 8], "little") * k2) & _M
        pos += 8
        v0 = (_rotr(v0, rot) * k3) & _M
        v1 = (v1 + int.from_bytes(tail[pos : pos + 8], "little") * k2) & _M
        pos += 8
        v1 = (_rotr(v1, rot) * k3) & _M
        v0 ^= (_rotr((v0 * k2 + v1) & _M, cross) * k1) & _M
        v1 ^= (_rotr((v1 * k3 + v0) & _M, cross) * k0) & _M
        rem -= 16

    if rem >= 8:
        rot, cross = p["t8"]
        v0 = (v0 + int.from_bytes(tail[pos : pos + 8], "little") * k2) & _M
        pos += 8
        v0 = (_rotr(v0, rot) * k3) & _M
        v0 ^= (_rotr((v0 * k2 + v1) & _M, cross) * k1) & _M
        rem -= 8

    if rem >= 4:
        rot, cross = p["t4"]
        v1 = (v1 + int.from_bytes(tail[pos : pos + 4], "little") * k2) & _M
        pos += 4
        v1 = (_rotr(v1, rot) * k3) & _M
        v1 ^= (_rotr((v1 * k3 + v0) & _M, cross) * k0) & _M
        rem -= 4

    if rem >= 2:
        rot, cross = p["t2"]
        v0 = (v0 + int.from_bytes(tail[pos : pos + 2], "little") * k2) & _M
        pos += 2
        v0 = (_rotr(v0, rot) * k3) & _M
        v0 ^= (_rotr((v0 * k2 + v1) & _M, cross) * k1) & _M
        rem -= 2

    if rem >= 1:
        rot, cross = p["t1"]
        v1 = (v1 + tail[pos] * k2) & _M
        v1 = (_rotr(v1, rot) * k3) & _M
        v1 ^= (_rotr((v1 * k3 + v0) & _M, cross) * k0) & _M

    f0, f1, f2, f3 = p["final"]
    ka, kb, kc, kd = (p["k"][i] for i in p["final_k"])
    v0 = (v0 + _rotr((v0 * ka + v1) & _M, f0)) & _M
    v1 = (v1 + _rotr((v1 * kb + v0) & _M, f1)) & _M
    v0 = (v0 + _rotr((v0 * kc + v1) & _M, f2)) & _M
    v1 = (v1 + _rotr((v1 * kd + v0) & _M, f3)) & _M

    return v0.to_bytes(8, "little") + v1.to_bytes(8, "little")


def metro256(data: bytes) -> bytes:
    """32-byte digest: the variant-1 and variant-2 128-bit digests
    concatenated (the reference's ``metro256`` type)."""
    return metro128(data, 1) + metro128(data, 2)


# --------------------------------------------------------------- crc variants
# The reference's metrocrc / metrocrc256 types (registered when the
# host has SSE4.2, lib/checksum.c:247-276) replace the bulk-round and
# small-tail mixing with CRC32-C accumulation (_mm_crc32_u64). The
# instruction is just the Castagnoli CRC over the 8 little-endian
# bytes of the operand with the register's low 32 bits as the running
# remainder — bit-exactly reproducible in software.

_CRC32C_POLY = 0x82F63B78
_CRC32C_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def _crc32c_u64(crc: int, value: int) -> int:
    """_mm_crc32_u64: CRC-32C accumulate over the 8 LE bytes of
    ``value`` starting from crc's low 32 bits (no pre/post inversion)."""
    c = crc & 0xFFFFFFFF
    for _ in range(8):
        c = _CRC32C_TABLE[(c ^ (value & 0xFF)) & 0xFF] ^ (c >> 8)
        value >>= 8
    return c


# (premix rots, >=16 (rot, cross), >=8 (rot, cross), tail crosses for
# >=4/>=2/>=1, final rots) — from the crc steal ladders
_CRC_PARAMS = {
    1: {"premix": (34, 37, 34, 37), "t16": (34, 30), "t8": (36, 23),
        "x4": 19, "x2": 13, "x1": 17, "final": (11, 26)},
    2: {"premix": (12, 19, 12, 19), "t16": (41, 10), "t8": (34, 22),
        "x4": 14, "x2": 15, "x1": 18, "final": (15, 27)},
}


def metrocrc128(data: bytes, variant: int = 1) -> bytes:
    """16-byte digest of the reference's CRC-hardware metro variant
    (metrohash128crc_1/2), byte-identical to the SSE4.2 path."""
    k0, k1, k2, k3 = _VARIANTS[variant]["k"]
    p = _CRC_PARAMS[variant]

    v = [(-k0 * k3) & _M, (k1 * k2) & _M, (k0 * k2) & _M, (-k1 * k3) & _M]
    bulk_end = len(data) - (len(data) % 32)
    for off in range(0, bulk_end, 32):
        d = data[off : off + 32]
        for i in range(4):
            v[i] ^= _crc32c_u64(v[i], int.from_bytes(d[8 * i : 8 * i + 8], "little"))
    v0, v1, v2, v3 = v

    r0, r1, r2, r3 = p["premix"]
    v2 ^= (_rotr(((v0 + v3) * k0 + v1) & _M, r0) * k1) & _M
    v3 ^= (_rotr(((v1 + v2) * k1 + v0) & _M, r1) * k0) & _M
    v0 ^= (_rotr(((v0 + v2) * k0 + v3) & _M, r2) * k1) & _M
    v1 ^= (_rotr(((v1 + v3) * k1 + v2) & _M, r3) * k0) & _M

    tail = data[bulk_end:]
    pos, rem = 0, len(tail)
    if rem >= 16:
        rot, cross = p["t16"]
        v0 = (v0 + int.from_bytes(tail[pos : pos + 8], "little") * k2) & _M
        pos += 8
        v0 = (_rotr(v0, rot) * k3) & _M
        v1 = (v1 + int.from_bytes(tail[pos : pos + 8], "little") * k2) & _M
        pos += 8
        v1 = (_rotr(v1, rot) * k3) & _M
        v0 ^= (_rotr((v0 * k2 + v1) & _M, cross) * k1) & _M
        v1 ^= (_rotr((v1 * k3 + v0) & _M, cross) * k0) & _M
        rem -= 16
    if rem >= 8:
        rot, cross = p["t8"]
        v0 = (v0 + int.from_bytes(tail[pos : pos + 8], "little") * k2) & _M
        pos += 8
        v0 = (_rotr(v0, rot) * k3) & _M
        v0 ^= (_rotr((v0 * k2 + v1) & _M, cross) * k1) & _M
        rem -= 8
    if rem >= 4:
        v1 ^= _crc32c_u64(v0, int.from_bytes(tail[pos : pos + 4], "little"))
        pos += 4
        v1 ^= (_rotr((v1 * k3 + v0) & _M, p["x4"]) * k0) & _M
        rem -= 4
    if rem >= 2:
        v0 ^= _crc32c_u64(v1, int.from_bytes(tail[pos : pos + 2], "little"))
        pos += 2
        v0 ^= (_rotr((v0 * k2 + v1) & _M, p["x2"]) * k1) & _M
        rem -= 2
    if rem >= 1:
        v1 ^= _crc32c_u64(v0, tail[pos])
        v1 ^= (_rotr((v1 * k3 + v0) & _M, p["x1"]) * k0) & _M

    fa, fb = p["final"]
    v0 = (v0 + _rotr((v0 * k0 + v1) & _M, fa)) & _M
    v1 = (v1 + _rotr((v1 * k1 + v0) & _M, fb)) & _M
    v0 = (v0 + _rotr((v0 * k0 + v1) & _M, fa)) & _M
    v1 = (v1 + _rotr((v1 * k1 + v0) & _M, fb)) & _M
    return v0.to_bytes(8, "little") + v1.to_bytes(8, "little")


def metrocrc256(data: bytes) -> bytes:
    """32-byte digest: both crc-variant digests concatenated
    (metrohash256crc)."""
    return metrocrc128(data, 1) + metrocrc128(data, 2)
