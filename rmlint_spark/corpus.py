"""Deterministic synthetic source-code corpus with planted duplicates.

This is the test-fixture analog of the reference's pytest tree builders
(``create_file``/``create_link``, reference tests/utils.py:334-354): every
scenario class its suite constructs on a filesystem, translated to the
table world of BASELINE.json ``input_hint`` —
``files(repo, path, commit, lang, content)``.

Planted scenario classes (FIXTURES.md §1):

- ``exact``     clone groups, identical content across repos
                (reference tests/test_types/test_duplicate.py:60-65)
- ``near``      token-level edits, graded planted Jaccard
                (north-star MinHash/SimHash target)
- ``nearmiss``  same length, last byte flipped — must NOT cluster
                (reference tests/test_types/test_duplicate.py:15-49)
- ``collision`` pathological same-length bucket of distinct files
                (reference tests/test_robustness/test_collisions.py:14-25)
- ``vendored``  whole subtree cloned into a second repo
                (reference tests/test_options/test_merge_directories.py)
- ``empty``     content = "" (reference tests/test_types/test_empty_files.py)
- ``pathdouble``literal duplicate (repo,path,commit) rows
                (reference tests/test_robustness/test_path_doubles.py)
- ``unique``    filler, with giant-repo skew (repo0000 holds ~40%)

Determinism: every field derives from the row id via hashes or a
seeded-by-value numpy RNG inside the generator UDF, so output is
independent of partitioning / parallelism (required by the metamorphic
tests, SURVEY.md §5.2). The per-row loop in the generator UDF is
fixture-only code — engine operators never do per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB = np.array(
    """def return if else for while import class self None True False lambda
yield try except raise with open print range len str int float list dict set
tuple map filter zip enumerate sorted reversed sum min max abs hash id type
isinstance super static void const struct public private switch case break
continue goto sizeof typedef union enum extern inline register volatile
value table index query batch merge""".split()
)
# fixed-width vocab for the same-length collision bucket
VOCAB5 = np.array([w for w in VOCAB.tolist() if len(w) == 5])

LANGS = [
    ("python", "py"),
    ("c", "c"),
    ("javascript", "js"),
    ("java", "java"),
    ("markdown", "md"),
    ("text", "txt"),
]

# planted Jaccard grades for near-dup groups -> token edit fraction.
# Calibration: for k=5 token shingles and random-position replacement
# fraction f, P(shingle survives) ~ (1-f)^5 and pairwise shingle
# Jaccard J ~ p/(2-p) with p = (1-f)^5, so f = 1 - (2J/(1+J))^(1/5).
# Short docs round edits up to >=1, so realized J can sit below the
# nominal band — tests therefore measure recall against the TRUE
# shingle Jaccard, and the band is a planting knob, not ground truth.
GRADES = [(0.95, 0.005), (0.90, 0.011), (0.80, 0.023), (0.70, 0.038)]


def _rng(*keys: int) -> np.random.RandomState:
    mix = 0x9E3779B9
    for k in keys:
        mix = (mix * 1000003 + int(k) + 0x7F4A7C15) & 0x7FFFFFFF
    return np.random.RandomState(mix)


def _canonical_tokens(gid: int, ntok: int) -> np.ndarray:
    return _rng(gid, 0).choice(VOCAB, size=ntok)


def _gen_one(kind: str, gid: int, variant: int, ntok: int) -> str:
    if kind == "empty":
        return ""
    if kind == "collision":
        # distinct content, identical byte length across the whole bucket
        return " ".join(_rng(gid, 7).choice(VOCAB5, size=ntok))
    toks = _canonical_tokens(gid, ntok)
    if kind == "near" and variant > 0:
        _, frac = GRADES[gid % len(GRADES)]
        edits = max(1, int(round(ntok * frac)))
        r = _rng(gid, variant)
        pos = r.choice(ntok, size=min(edits, ntok), replace=False)
        toks = toks.copy()
        toks[pos] = r.choice(VOCAB, size=len(pos))
    text = " ".join(toks)
    if kind == "nearmiss" and variant > 0:
        # flip the LAST byte only: same size, same 16k-prefix when content
        # is longer than the prefix stage — stresses the funnel's final
        # sha/byte-confirm stage (reference test_duplicate.py:15-49).
        last = text[-1]
        text = text[:-1] + ("X" if last != "X" else "Y")
    return text


_GEN_SCHEMA = T.StringType()


@F.pandas_udf(_GEN_SCHEMA)
def _gen_content(kind: pd.Series, gid: pd.Series, variant: pd.Series, ntok: pd.Series) -> pd.Series:
    out = [
        _gen_one(k, g, v, n)
        for k, g, v, n in zip(kind.tolist(), gid.tolist(), variant.tolist(), ntok.tolist())
    ]
    return pd.Series(out)


def generate_corpus(
    spark: SparkSession,
    n_rows: int = 2000,
    seed: int = 42,
    min_tokens: int = 40,
    max_tokens: int = 400,
) -> tuple[DataFrame, DataFrame]:
    """Return ``(files, truth)``.

    ``files``: exactly the ``input_hint`` schema
    (repo, path, commit, lang, content).

    ``truth``: (repo, path, commit, scenario, near_group_id,
    jaccard_band) — the planted structure, never visible to the engine.
    Exact-duplicate ground truth is NOT stored here; tests recompute it
    with an independent hashlib/DuckDB oracle (reference analog:
    tests/test_speed/verify.py:23-44).
    """
    n = int(n_rows)
    ids = spark.range(n).withColumn("h", F.abs(F.xxhash64(F.col("id"), F.lit(seed))))

    b = {
        "exact_end": int(n * 0.15),
        "near_end": int(n * 0.30),
        "nearmiss_end": int(n * 0.35),
        "collision_end": int(n * 0.40),
        "vendored_end": int(n * 0.44),
        "empty_end": int(n * 0.45),  # 1% empties
    }
    # boundaries: [0,15%) exact | [15,30%) near | [30,35%) nearmiss |
    # [35,40%) collision | [40,44%) vendored | [44,45%) empty | rest unique
    c_id = F.col("id")
    scenario = (
        F.when(c_id < b["exact_end"], F.lit("exact"))
        .when(c_id < b["near_end"], F.lit("near"))
        .when(c_id < b["nearmiss_end"], F.lit("nearmiss"))
        .when(c_id < b["collision_end"], F.lit("collision"))
        .when(c_id < b["vendored_end"], F.lit("vendored"))
        .when(c_id < b["empty_end"], F.lit("empty"))
        .otherwise(F.lit("unique"))
    )
    df = ids.withColumn("scenario", scenario)

    # group id + member index per scenario
    gid = (
        F.when(F.col("scenario") == "exact", F.floor(c_id / 4))
        .when(F.col("scenario") == "near", F.floor(c_id / 4) + 1_000_000)
        .when(F.col("scenario") == "nearmiss", F.floor(c_id / 2) + 2_000_000)
        .when(F.col("scenario") == "collision", F.lit(3_000_000))  # one giant bucket
        .when(F.col("scenario") == "vendored", F.floor(c_id / 8) + 4_000_000)
        .otherwise(c_id + 10_000_000)
    )
    member = (
        F.when(F.col("scenario") == "exact", c_id % 4)
        .when(F.col("scenario") == "near", c_id % 4)
        .when(F.col("scenario") == "nearmiss", c_id % 2)
        .when(F.col("scenario") == "vendored", c_id % 8)
        .otherwise(F.lit(0))
    )
    df = df.withColumn("gid", gid).withColumn("member", member)

    # content-seed key: identical within exact groups / vendored file slots;
    # per-row for collision & unique rows
    seed_key = (
        F.when(F.col("scenario") == "collision", c_id)
        .when(F.col("scenario") == "vendored", F.col("gid") * 8 + (c_id % 4))
        .otherwise(F.col("gid"))
    )
    variant = (
        F.when(F.col("scenario") == "near", F.col("member"))
        .when(F.col("scenario") == "nearmiss", F.col("member"))
        .otherwise(F.lit(0))
    )
    ntok = (
        F.when(F.col("scenario") == "collision", F.lit(80))
        .otherwise(F.lit(min_tokens) + F.pmod(F.abs(F.xxhash64(seed_key)), F.lit(max_tokens - min_tokens)))
    )
    df = (
        df.withColumn("seed_key", seed_key)
        .withColumn("variant", variant)
        .withColumn("ntok", ntok.cast("int"))
    )

    # repo: exact/near groups span repos; vendored pairs use two coordinated
    # repos; filler rows are skewed (repo0000 holds ~40% — the giant-repo
    # skew scenario the north rule requires we defuse).
    repo = (
        F.when(
            F.col("scenario").isin("exact", "near", "nearmiss"),
            F.format_string("repo%04d", F.pmod(F.col("gid") * 7 + F.col("member"), F.lit(40))),
        )
        .when(
            F.col("scenario") == "vendored",
            F.format_string("repo%04d", F.pmod(F.col("gid") * 3 + F.floor(F.col("member") / 4), F.lit(40))),
        )
        .otherwise(
            F.when(F.pmod(F.col("h"), F.lit(100)) < 40, F.lit("repo0000")).otherwise(
                F.format_string("repo%04d", 1 + F.pmod(F.col("h"), F.lit(39)))
            )
        )
    )
    df = df.withColumn("repo", repo)

    lang_idx = F.pmod(F.col("seed_key"), F.lit(len(LANGS)))
    lang = F.element_at(F.array(*[F.lit(l) for l, _ in LANGS]), lang_idx.cast("int") + 1)
    ext = F.element_at(F.array(*[F.lit(e) for _, e in LANGS]), lang_idx.cast("int") + 1)
    df = df.withColumn("lang", lang).withColumn("ext", ext)

    # path: unique per row except vendored (same relative path, two repos);
    # a sprinkle of dot-dirs for the hidden filter (lib/traverse.c:325-338)
    hidden = F.when(F.pmod(c_id, F.lit(23)) == 0, F.lit(".hidden/")).otherwise(F.lit(""))
    path = (
        F.when(
            F.col("scenario") == "vendored",
            F.format_string("vendor/tree%d/f%d.", F.col("gid"), c_id % 4),
        ).otherwise(
            F.concat(
                hidden,
                F.format_string("src/d%02d/m%d.", F.pmod(F.col("h"), F.lit(20)), c_id),
            )
        )
    )
    df = df.withColumn("path", F.concat(path, F.col("ext")))
    df = df.withColumn(
        "commit", F.substring(F.sha2(F.concat(F.lit("c"), F.col("seed_key").cast("string")), 256), 1, 8)
    )

    df = df.withColumn(
        "content", _gen_content(F.col("scenario"), F.col("seed_key"), F.col("variant"), F.col("ntok"))
    )

    # planted path doubles: literal duplicate rows for ids = 0 mod 97
    # in the unique range (lib/preprocess.c:496-512 analog)
    doubles = df.filter((F.col("scenario") == "unique") & (F.pmod(c_id, F.lit(97)) == 0)).withColumn(
        "scenario", F.lit("pathdouble")
    )
    full = df.unionByName(doubles)

    jaccard = (
        F.when(F.col("scenario") == "exact", F.lit(1.0))
        .when(
            F.col("scenario") == "near",
            F.element_at(F.array(*[F.lit(g) for g, _ in GRADES]), (F.pmod(F.col("gid"), F.lit(len(GRADES)))).cast("int") + 1),
        )
        .otherwise(F.lit(None).cast("double"))
    )
    near_group = F.when(
        F.col("scenario").isin("exact", "near"), F.col("gid")
    ).otherwise(F.lit(None).cast("long"))

    truth = full.select(
        "repo",
        "path",
        "commit",
        "scenario",
        near_group.alias("near_group_id"),
        jaccard.alias("jaccard_band"),
    )
    files = full.select("repo", "path", "commit", "lang", "content")
    return files, truth
