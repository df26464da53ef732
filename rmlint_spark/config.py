"""Engine configuration.

Reference analog: ``RmCfg`` (lib/cfg.h, defaults lib/cfg.c:39-108) —
the single config struct every stage reads. Ours is two small frozen
dataclasses; ``config_hash`` keys checkpoint invalidation (reference
analog: replay re-validates cached results against live state,
lib/replay.c:777-860).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class SignatureConfig:
    """Signature/shingle parameters — the config that the recall>=0.99
    check pins (reference analog: hash algorithm selection ``-a``,
    lib/cmdline.c:1412)."""

    # exact funnel
    prefix_len: int = 16384       # gen-0 read = 4 pages ~ 16kB (lib/shredder.c:52,272-275)
    # MinHash / LSH
    shingle_k: int = 5            # token shingle width
    num_perm: int = 128           # MinHash permutations
    bands: int = 32               # LSH bands (rows per band = num_perm // bands)
    minhash_seed: int = 42
    # SimHash
    simhash_bits: int = 64
    simhash_blocks: int = 4       # Hamming-ball candidate blocks (pigeonhole)
    simhash_max_hamming: int = 3
    # substring lint
    substr_window: int = 64       # rolling-hash shingle length (chars)
    substr_stride: int = 32

    @property
    def rows_per_band(self) -> int:
        assert self.num_perm % self.bands == 0
        return self.num_perm // self.bands


@dataclass(frozen=True)
class EngineConfig:
    """Pipeline behavior knobs (filters, ranking, skew handling)."""

    sig: SignatureConfig = field(default_factory=SignatureConfig)
    # filters (lib/traverse.c:160-173 size limits; lib/cfg.c:47-49 defaults)
    min_size: int = 1             # skip empty files from the dup path by default
    max_size: int | None = None
    keep_hidden: bool = False     # lib/traverse.c:325-338
    # ranking criteria for original selection; subset of rmlint's
    # -S [dlamprxDLAMPRX] (lib/cfg.c:65 default "pOma"). We support a
    # string of single-char criteria evaluated in order:
    #   p: preferred first   a: alphabetic path   l: shortest basename
    #   d: shallowest depth  m: oldest commit     M: newest commit
    rank_criteria: str = "pa"
    # skew handling
    salt_buckets: int = 64        # sub-keys for pathological groups
    max_bucket_width: int = 2000  # LSH bucket cap before salting/escalation
    # near-dup verification threshold (estimated Jaccard)
    jaccard_threshold: float = 0.7
    # byte-confirm ("paranoid" analog, lib/shredder.c:218-258)
    byte_confirm: bool = True

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT = EngineConfig()
