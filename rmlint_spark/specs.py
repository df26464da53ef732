"""Size/number spec-string parsing (X6).

Reference: rmlint's ``--size RANGE`` / ``--clamp-*`` argument grammar
(rm_cmd_size_range / rm_cmd_parse_clamp_option, lib/cmdline.c:120-214):
numbers with binary/decimal unit suffixes, open or closed ranges
("100", "10K", "1M-1G", "-512M", "0.3" as a factor for clamps).
"""

from __future__ import annotations

import re

_UNITS = {
    "": 1,
    # 'b' is 512-byte blocks in the reference grammar
    # (SIZE_FORMAT_TABLE, lib/cmdline.c:247); 'c' is single bytes.
    "b": 512, "c": 1,
    "k": 10**3, "m": 10**6, "g": 10**9, "t": 10**12, "p": 10**15,
    "kb": 2**10, "mb": 2**20, "gb": 2**30, "tb": 2**40, "pb": 2**50,
    # rmlint also accepts KiB-style
    "kib": 2**10, "mib": 2**20, "gib": 2**30, "tib": 2**40, "pib": 2**50,
}

_NUM = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]*)\s*$")


def parse_size(spec: str) -> int:
    """'10K' -> 10000, '4MB' -> 4194304, '512' -> 512."""
    m = _NUM.match(spec)
    if not m:
        raise ValueError(f"bad size spec {spec!r}")
    num, unit = float(m.group(1)), m.group(2).lower()
    if unit not in _UNITS:
        raise ValueError(f"unknown size unit {unit!r} in {spec!r}")
    return int(num * _UNITS[unit])


def parse_size_range(spec: str) -> tuple[int, int | None]:
    """rmlint --size grammar: 'MIN-MAX', 'MIN-', '-MAX', or 'N'
    (exact). Returns (min_size, max_size|None)."""
    if "-" in spec:
        lo_s, hi_s = spec.split("-", 1)
        lo = parse_size(lo_s) if lo_s.strip() else 0
        hi = parse_size(hi_s) if hi_s.strip() else None
        if hi is not None and hi < lo:
            raise ValueError(f"empty size range {spec!r}")
        return lo, hi
    n = parse_size(spec)
    return n, n


def parse_clamp(spec: str) -> int | float:
    """--clamp-low/--clamp-top value: '0.3' / '30%' (fraction of file
    size) or an absolute size spec ('4K'). Factor range is [0, 1]
    inclusive and a trailing '%' divides by 100, both mirroring
    rm_cmd_parse_clamp_factor (lib/cmdline.c:574-596)."""
    s = spec.strip()
    if s.endswith("%"):
        f = float(s[:-1]) / 100.0
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"clamp factor out of range: {spec!r}")
        return f
    # a unitless decimal is a factor (reference: a '.' in the value
    # selects factor mode)
    if re.match(r"^\d*\.\d+$", s):
        f = float(s)
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"clamp factor out of range: {spec!r}")
        return f
    return parse_size(s)
