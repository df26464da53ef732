"""Type-2 clone detection (operators/clone2): normalization unit
semantics, Spark<->DuckDB byte parity of the regex chain (the oracle
safety property), and planted renamed-clone recovery with the width
cap acting as the structural-boilerplate filter."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rmlint_spark.operators.clone2 import (
    normalize_code,
    normalize_code_sql,
    type2_clone_pairs,
)


def _norm_one(spark, s: str) -> str:
    return (
        spark.range(1)
        .select(normalize_code(F.lit(s)).alias("n"))
        .collect()[0]["n"]
    )


# ------------------------------------------------- unit semantics

def test_comments_and_literals_fold(spark):
    src = (
        'int n = 42; /* block\ncomment */ char *s = "hi\\"x";\n'
        "float f = 1.5e3; // trailing\n# py comment\n'c'"
    )
    out = _norm_one(spark, src)
    assert out == 'int id = 0; char *id = "0"; float id = 0; \'0\''


def test_keywords_survive_identifiers_blind(spark):
    src = "for (i = 0; i < n; i++) { total += weights[i]; }"
    out = _norm_one(spark, src)
    assert out == "for (id = 0; id < id; id++) { id += id[id]; }"


def test_type2_rename_is_invariant(spark):
    a = "def load(path, limit):\n    # reads\n    rows = open(path)[:limit]\n    return rows\n"
    b = 'def fetch(fn, cap):\n    # grabs the rows\n    items = open(fn)[:cap]\n    return items\n'
    assert _norm_one(spark, a) == _norm_one(spark, b)


def test_type3_structure_change_differs(spark):
    a = "def f(x):\n    return x + 1\n"
    b = "def f(x):\n    y = x + 1\n    return y\n"
    c = "def f(x):\n    while x:\n        x -= 1\n    return x\n"
    na, nb, nc = (_norm_one(spark, s) for s in (a, b, c))
    assert len({na, nb, nc}) == 3


def test_keyword_marker_unambiguous(spark):
    # tokens that look like the 0-prefixed protection marker in the
    # source must not be resurrected as keywords
    out = _norm_one(spark, "x = 0 if y else z; q = a0if; r = 0.5if")
    assert out == "id = 0 if id else id; id = id; id = 0"


# ------------------------------------------------- oracle parity

PARITY_BATTERY = [
    "",
    "plain words only",
    'int n = 42; /* c */ s = "lit\\" esc"; // line\nnext',
    "# python comment\nfor k, v in items.items():\n    acc[k] = v * 2\n",
    "while (a /* inline */ < 0x1F) { b -= 3.14; } /* tail",
    "'quoted' + 'with \\' escape' + unterminated '",
    "a_b c9 _x 0if if0 0 9z if-else do,while",
    "tabs\tand\nnewlines\r\nand  runs   of spaces",
    "nested /* a /* not really nested */ b */ rest",
    "string with // inside \"// not a comment\" after",
]


def test_spark_duckdb_normalization_parity(spark):
    """The oracle replays normalize_code via normalize_code_sql; the
    two regex engines (Java util.regex vs RE2) must agree byte-for-
    byte on every rewrite in the chain."""
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(PARITY_BATTERY)], "i int, t string"
    )
    got_spark = {
        r["i"]: r["n"]
        for r in sdf.select("i", normalize_code("t").alias("n")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(PARITY_BATTERY):
        got_duck = con.execute(
            f"SELECT {normalize_code_sql('?')} ", [s]
        ).fetchone()[0]
        assert got_spark[i] == got_duck, f"case {i}: {s!r}"


# ------------------------------------------------- planted clones

def _code(fn: str, v: str, w: str, ops: str, tag: str) -> str:
    o = list(ops)
    return (
        f"def {fn}(alpha, beta, gamma):\n"
        f"    # {tag}\n"
        f"    {v} = alpha {o[0]} beta {o[1]} gamma {o[2]} alpha {o[3]} beta {o[4]} gamma\n"
        f"    {w} = {v} {o[3]} alpha {o[1]} gamma {o[4]} beta {o[0]} alpha {o[2]} gamma\n"
        f"    return {w}\n"
    )


def test_planted_type2_family_recovered(spark):
    # family A: three renamed copies (type-2); family B: same skeleton
    # length but a DISJOINT operator alphabet (content fingerprints are
    # position-free, so families sharing even one operator share its
    # local grams — the cap absorbs that at corpus scale, but a clean
    # negative control needs disjoint alphabets); 40 boilerplate docs
    # sharing one identical skeleton to exercise the width cap
    rows = [
        (0, _code("load_rows", "acc", "out", "+-*/%", "first copy")),
        (1, _code("fetch_all", "tot", "res", "+-*/%", "renamed fork")),
        (2, _code("grab_em", "sum_", "ret", "+-*/%", "third rename")),
        (3, _code("other_fn", "val", "fin", "&|^<>", "different family")),
        (4, _code("other_g", "vv", "ff", "&|^<>", "different family 2")),
    ]
    rows += [
        (10 + j, _code(f"boiler_{j}", "x", "y", "/////", f"boiler {j}"))
        for j in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # min_shared=2 is the MOSS match gate: winnowing SELECTION is
    # neighborhood-dependent, so a boilerplate gram can be selected in
    # only a few docs (width under the cap) and leak a single shared
    # fp across families; requiring two shared fps kills those
    # boundary artifacts while renamed copies share their whole
    # selected set (n_shared ~ 27 here)
    pairs, dropped = type2_clone_pairs(
        docs, k=12, w=4, max_bucket_width=16, min_shared=2
    )
    got = {
        (r["id_a"], r["id_b"]) for r in pairs.collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= got
    assert (3, 4) in got
    # no cross-family pair between the two op-structures
    assert not any(a in (0, 1, 2) and b in (3, 4) for a, b in got)
    # the 40-doc boilerplate family is wider than the cap: its
    # fingerprints land in the dropped report, not the pair join
    assert dropped.count() > 0
    assert not any(a >= 10 or b >= 10 for a, b in got)


def test_normalization_is_single_stage_jvm(spark):
    """normalize_code must stay a pure projection: no exchange, no
    Python evaluation in the plan."""
    docs = spark.createDataFrame([(1, "def f(x): return x")], "doc_id long, text string")
    plan = (
        docs.select(normalize_code("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_spark_duckdb_normalization_parity_fuzz(spark):
    """Seeded random battery over a hostile alphabet (quotes,
    backslashes, comment openers, keywords, digits, newlines,
    unicode, vertical tab, DEL): Java regex and RE2 must agree
    byte-for-byte on the whole chain, not just the curated cases.
    This battery CAUGHT two real divergences during development
    (Java's Unicode-aware \\b; Java's \\s including \\x0b) — both now
    neutralized inside the chain itself (non-ASCII -> DEL fold,
    explicit whitespace class)."""
    import numpy as np

    rng = np.random.default_rng(20260818)
    atoms = (
        list("abcdefghijklmnopqrstuvwxyzABCXYZ0123456789")
        + list(" \t\n\r\x0b\x0c\x7f_+-*/%&|^<>=(){}[];:,.#'\"\\!?~@$`")
        + ["if", "else", "for", "while", "return", "def", "0if",
           "if0", "/*", "*/", "//", "\\\"", "\\'", '"lit"', "'c'",
           "0x1F", "1.5e3", "id", "é", "中", "\U0001f600"]
    )
    cases = []
    for _ in range(1500):
        n = int(rng.integers(0, 40))
        cases.append("".join(str(atoms[i]) for i in
                             rng.integers(0, len(atoms), n)))
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i long, t string"
    )
    got_spark = {
        r["i"]: r["n"]
        for r in sdf.select("i", normalize_code("t").alias("n")).collect()
    }
    con = duckdb.connect()
    expr = normalize_code_sql("t")
    con.execute("CREATE TABLE c(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)",
                    list(enumerate(cases)))
    for i, n in con.execute(f"SELECT i, {expr} FROM c").fetchall():
        assert got_spark[i] == n, f"case {i}: {cases[i]!r}"
