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
    # digest selection (-a, lib/checksum.c:815-851; default sha256 is
    # the per-row invariant vs the reference): sha224/sha256/sha384/
    # sha512/md5/xxhash64
    checksum_algo: str = "sha256"
    # byte-range clamp (--clamp-low/--clamp-top, lib/file.c:40-88):
    # int = absolute offset, float in [0,1) = size factor, None = edge.
    # Hashing (and the grouping size) operate on content[start:end).
    clamp_start: int | float | None = None
    clamp_end: int | float | None = None
    # Fold the full digest into the same content scan as the prefix
    # signature (ONE corpus pass for the whole funnel instead of two;
    # qualification still runs staged on the narrow relation, so the
    # surviving clusters are identical). Costs digesting rows the
    # prefix stage would have pruned — the right trade when the
    # dup-candidate fraction is high or scans are bandwidth-bound
    # (columnar sources); keep False to digest only prefix-stage
    # survivors, mirroring the reference's incremental-read economy
    # (lib/shredder.c:218-275).
    fuse_full_digest: bool = False
    # MinHash / LSH
    shingle_k: int = 5            # token shingle width
    num_perm: int = 128           # MinHash permutations
    bands: int = 32               # LSH bands (rows per band = num_perm // bands)
    minhash_seed: int = 42
    # SimHash
    simhash_bits: int = 64
    simhash_blocks: int = 4       # Hamming-ball candidate blocks (pigeonhole)
    simhash_max_hamming: int = 3
    # SimHash FEATURE granularity: "shingle" (default) votes with
    # k-token shingle hashes (the Manku/Charikar web-dedup variant);
    # "token" votes with single-token hashes. Token features make
    # same-vocabulary corpora pile into block buckets (token-frequency
    # profiles nearly identical at low Jaccard): measured on the
    # collision corpus class, 1600 docs produced 200k block-bucket
    # candidate pairs under token features vs 82 under shingle
    # features — the pileup killed at the source instead of capped
    # after the fact. Trade-off: token features catch token-multiset-
    # preserving reorderings (sorted imports, moved lines) that
    # k-shingles miss; select per corpus.
    simhash_features: str = "shingle"
    # MinHash stop-shingle filter: shingles whose document frequency
    # exceeds this fraction of (sampled) distinct contents are dropped
    # before signature minima — boilerplate (license headers, shared
    # templates) stops flooding LSH bands, and estimated Jaccard
    # becomes similarity over signal shingles. 0.0 disables (exact
    # reference-compatible signatures).
    #
    # Decision rule (measured round 5, scripts/stop_shingle_ab.py at
    # 4000 planted docs, full pipeline, jaccard_threshold 0.7):
    # - clean corpus, 0.3 vs off: literally identical output — 978
    #   candidates, near recall 1.0 at BOTH settings (no shingle
    #   clears df 0.3 without boilerplate, so the filter is a no-op).
    # - same corpus + a shared 120-token license header on every doc:
    #   candidates 604,427 -> 980 (617x), signal recall (pairs whose
    #   BODY is near-dup) 1.0, header-inclusive recall 0.9965 — the
    #   0.35% are pairs similar ONLY via the header, excluded by
    #   design.
    # Hence: production pipelines (scripts/pipeline_job.py) default to
    # 0.3; this library default stays 0.0 so signatures stay
    # reference-exact and DuckDB-oracle-reproducible. Enable 0.3 for
    # any corpus that may carry shared headers/templates; keep 0.0
    # only when signature bit-compatibility with an external MinHash
    # implementation matters.
    stop_shingle_df: float = 0.0
    stop_shingle_sample: int = 20000  # max distinct contents sampled for df
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
    # --partial-hidden (lib/treemerge.c:877-879,963-966): hidden files
    # are excluded from plain duplicate reports but still count inside
    # duplicate DIRECTORIES (treemerge sees them)
    partial_hidden: bool = False
    # ranking criteria for original selection — rmlint's
    # -S [dlamprxho / DLAMPRXHO] surface incl. r<regex>/x<regex>
    # (lib/preprocess.c:304-356,388-427); default matches the
    # reference default "pOma" (lib/cfg.c:65). See operators/rank.py.
    rank_criteria: str = "pOma"
    # R6 matching criteria (lib/preprocess.c:67-90, rm_file_cmp):
    # extra gen-0 group-key components — files only qualify as twins
    # when the enabled keys agree (ASCII-case-insensitively in the
    # reference; full lower() here).
    match_basename: bool = False           # -b / --match-basename
    match_with_extension: bool = False     # -e / --match-with-extension
    match_without_extension: bool = False  # -i / --match-without-extension
    # skew handling
    # sub-keys for pathological groups: drives the two-phase salted
    # directory rollup (treemerge.ancestor_rollup(salt_buckets=...)) —
    # bounds per-task state for million-file directories
    salt_buckets: int = 64
    max_bucket_width: int = 2000  # LSH bucket cap before salting/escalation
    # Oversized-bucket ESCALATION (SURVEY §7.4; reference precedent:
    # shredder generations split big groups with a cheap extra read,
    # lib/shredder.c:47-60). Instead of report-and-drop, members of an
    # over-cap LSH bucket re-bucket on a doubled signature-slice key
    # per level until the slice covers the whole signature (or the
    # level budget runs out); only buckets still over the cap at the
    # final level are dropped (and reported with their level).
    lsh_escalate_levels: int = 8  # max doubling levels (full-sig bound wins)
    # Escalated levels use a tighter cap (effective = min with the
    # level-0 cap) for the same reason as simhash_escalate_cap: a WIDE
    # bucket that still agrees on a long minima prefix is a shared-
    # vocabulary pileup, not a near-dup family — families are small
    # after representative bundling.
    lsh_escalate_cap: int = 256
    # SimHash escalation: one level — over-cap block buckets re-key on
    # (block, partner-block) agreement for every partner, recovering
    # any pair that agrees on >= 2 of the 4 blocks. Pairs whose 3
    # differing bits hit 3 distinct blocks stay unrecoverable
    # (documented residual; visible via the oversized report).
    simhash_escalate: bool = True
    # Escalated (2-block) buckets get a much TIGHTER cap than level 0
    # (effective cap = min of the two): on same-vocabulary corpora even
    # 32-bit agreement is weak, so wide 2-block buckets are frequency-
    # profile pileups whose pairs all die at the Jaccard gate — A/B on
    # the 400k corpus measured +615 s (3.2x pipeline) at the level-0
    # cap with ZERO recovered edges, vs genuine near-dup families which
    # are small after representative bundling.
    simhash_escalate_cap: int = 32
    # SimHash blocks get a much tighter cap: a 16-bit block is a far
    # weaker filter than a 32-perm LSH band, so same-vocabulary corpora
    # (token-frequency profiles nearly identical at low Jaccard) land
    # thousands of rows in one block value and the pair join goes
    # quadratic — measured 896k post-hamming candidates on a 400k-row
    # corpus at cap=2000, almost all later killed by the Jaccard gate.
    # Buckets over the cap go to the oversized report (same discipline).
    simhash_max_bucket_width: int = 256
    # near-dup verification threshold (estimated Jaccard)
    jaccard_threshold: float = 0.7
    # byte-confirm ("paranoid" analog, lib/shredder.c:218-258)
    byte_confirm: bool = True

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT = EngineConfig()
