"""blake2sp / blake2bp — the parallel BLAKE2 variants in the
reference's checksum family (lib/checksum.c:610-612,835-836; vendored
reference code lib/checksums/blake2/blake2sp-ref.c, blake2bp-ref.c —
CC0/OpenSSL/Apache-2.0 tri-license; spec: Aumasson, Neves,
Wilcox-O'Hearn, Winnerlein, "BLAKE2: simpler, smaller, fast as MD5",
2013, §2.2 parallel modes).

Composed from CPython's hashlib BLAKE2 tree parameters instead of a
hand port: blake2sp is 8 blake2s leaves fed 64-byte blocks
round-robin (fanout 8, depth 2, node_offset i, inner_size 32, leaf 7
last_node) under a node_depth-1 last_node root; blake2bp is the same
shape with 4 blake2b lanes and 128-byte blocks. Byte-identical to the
reference binaries — vectors pinned in tests/test_hashes.py from the
vendored implementation compiled standalone.

hashlib's BLAKE2 core is C, so despite the Python composition this
digests at native speed over Arrow batches like the other
_HASHLIB-family algorithms; the lane split costs one extra pass of
slicing per value.
"""

from __future__ import annotations

import hashlib


def _parallel_blake2(data: bytes, ctor, lanes: int, block: int, out: int) -> bytes:
    leaves = [
        ctor(
            digest_size=out,
            fanout=lanes,
            depth=2,
            leaf_size=0,
            node_offset=i,
            node_depth=0,
            inner_size=out,
            last_node=(i == lanes - 1),
        )
        for i in range(lanes)
    ]
    stripe = lanes * block
    for i in range(lanes):
        leaves[i].update(
            b"".join(data[j : j + block] for j in range(i * block, len(data), stripe))
        )
    root = ctor(
        digest_size=out,
        fanout=lanes,
        depth=2,
        leaf_size=0,
        node_offset=0,
        node_depth=1,
        inner_size=out,
        last_node=True,
    )
    for leaf in leaves:
        root.update(leaf.digest())
    return root.digest()


def blake2sp(data: bytes) -> bytes:
    """32-byte blake2sp digest (8-lane blake2s)."""
    return _parallel_blake2(data, hashlib.blake2s, 8, 64, 32)


def blake2bp(data: bytes) -> bytes:
    """64-byte blake2bp digest (4-lane blake2b)."""
    return _parallel_blake2(data, hashlib.blake2b, 4, 128, 64)
