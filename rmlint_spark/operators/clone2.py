"""Type-2 code-clone detection: identifier-blind normalization +
winnowing fingerprints.

A *type-2 clone* is a copied code fragment whose identifiers, literal
values, comments and layout were changed but whose syntactic structure
was not (the standard taxonomy of Bellon et al. 2007; the "blind
renaming" normalization of NiCad, Roy & Cordy 2008).  The raw-text
winnowing lane (operators/winnow.py) finds only type-1 (verbatim)
clones; this module adds the normalization pass that folds away
exactly the type-2 edit classes, then reuses the same winnow +
width-cap + shared-fp machinery on the normalized text.

The normalization is a fixed chain of plain regular-expression
rewrites, deliberately restricted to syntax that Java's regex engine
(Spark's `regexp_replace`) and RE2 (DuckDB's) interpret identically —
no lookaround, no lazy quantifiers, no `\\s` (explicit whitespace
classes instead: Java's `\\s` includes `\\x0b`, RE2's does not), and
non-ASCII folded to an inert DEL before any `\\b` runs (Java's `\\b`
is Unicode-aware, RE2's is ASCII-only; both divergences were caught
by the seeded cross-engine fuzz in tests/test_clone2.py) — so the
whole lane stays pure JVM expression code AND is replayable verbatim
by the SQL oracle:

1. block comments  ``/* ... */``            -> one space
2. line comments   ``// ...`` and ``# ...`` -> one space
3. string literals ``"..."`` / ``'...'``    -> ``"0"`` / ``'0'``
   (backslash escapes respected, newlines terminate; the digit
   placeholder is immune to the later identifier rename)
4. numeric literals ``\\b\\d[\\w.]*``       -> ``0``
   (covers ints, floats, hex, exponents, suffixed forms)
5. keyword protection: a fixed cross-language keyword set is rewritten
   ``kw`` -> ``0kw`` — the leading digit removes the word boundary in
   front of the letters, hiding the token from step 6.  Digits cannot
   start a real identifier, and step 4 already folded every real
   leading-digit token to ``0``, so the marker is unambiguous.
6. blind renaming: every remaining identifier
   ``\\b[A-Za-z_][A-Za-z0-9_]*\\b`` -> ``id``
7. keyword restore ``\\b0kw\\b`` -> ``kw``, then whitespace collapse
   (non-ASCII chars were folded to DEL between steps 3 and 4).

What survives is precisely the structural skeleton — keywords,
punctuation, operators, arity, statement order — so two fragments are
type-2 clones iff their normalized texts share long substrings, which
the winnow guarantee (any common substring of length >= k + w - 1
shares a fingerprint) converts into shared fingerprints.  Boilerplate
skeleton fragments common to MANY documents pile into wide fingerprint
buckets and are removed by the standard width cap, which therefore
doubles as the structural-boilerplate filter; the cap's dropped
relation keeps that visible (never lose silently —
tests/test_robustness precedent, reference lib/shredder.c funnel
philosophy: group first, confirm membership second).

Reference analog: the substring-lint / shredder candidate machinery
(lib/treemerge.c, lib/shredder.c:2050-2130) finds byte-identical
content; type-2 normalization is the code-payload generalization the
north rule's source-code corpus needs (renamed forks of the same
file are the dominant near-dup class in public code corpora).

Scale shape: normalization is a per-row JVM projection (zero shuffle,
whole-stage codegen); the pair stage inherits winnow's id-only
shuffles and width cap, so nothing here widens at 100 TB beyond the
already-audited winnow lane.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed cross-language keyword set (C / Java / Python / JS core —
# enough that control-flow structure distinguishes fragments; an
# identifier accidentally named like a keyword in another language is
# simply preserved, which only makes the normalization MORE
# conservative).  Kept sorted and joined once so the Spark and DuckDB
# pattern strings are character-identical.
KEYWORDS: tuple[str, ...] = tuple(sorted([
    "and", "as", "assert", "break", "case", "char", "class", "const",
    "continue", "def", "do", "double", "elif", "else", "enum",
    "except", "extern", "finally", "float", "for", "from", "function",
    "goto", "if", "import", "in", "int", "lambda", "let", "long",
    "new", "none", "not", "null", "or", "pass", "private", "public",
    "raise", "return", "short", "signed", "sizeof", "static", "str",
    "struct", "switch", "this", "try", "typedef", "union", "unsigned",
    "var", "void", "volatile", "while", "with", "yield",
]))

_KW_ALT = "|".join(KEYWORDS)

# (pattern, spark_replacement, duckdb_replacement) — the pattern string
# is shared verbatim; only the group-reference syntax differs ($1 vs
# \1).  Order matters and is part of the contract (see module doc).
_STEPS: tuple[tuple[str, str, str], ...] = (
    (r"/\*([^*]|\*+[^*/])*\*+/", " ", " "),
    (r"//[^\n]*", " ", " "),
    (r"#[^\n]*", " ", " "),
    (r'"([^"\\\n]|\\.)*"', '"0"', '"0"'),
    (r"'([^'\\\n]|\\.)*'", "'0'", "'0'"),
    # non-ASCII folds to an inert DEL byte: Java's \b is
    # Unicode-aware while RE2's is ASCII-only, so any non-ASCII char
    # adjacent to a token would make the engines disagree about the
    # boundary (found by the seeded cross-engine fuzz).  String
    # literals and comments — where corpus unicode actually lives —
    # were already folded above, so this only touches non-ASCII
    # identifiers/garbage, deterministically on both engines.
    (r"[^\x00-\x7f]", "\x7f", "\x7f"),
    (r"\b\d[\w.]*", "0", "0"),
    (rf"\b({_KW_ALT})\b", "0$1", r"0\1"),
    (r"\b[A-Za-z_][A-Za-z0-9_]*\b", "id", "id"),
    (rf"\b0({_KW_ALT})\b", "$1", r"\1"),
    # explicit class, not \s: Java's \s includes \x0b, RE2's does
    # not — the explicit list behaves identically in both engines
    (r"[ \t\n\x0b\f\r]+", " ", " "),
)


def normalize_code(col: Column | str) -> Column:
    """Normalized structural skeleton of a code string (see module
    doc): comments stripped, literals folded, identifiers blind-renamed
    to ``id`` with keywords preserved, whitespace collapsed.  Pure JVM
    `regexp_replace` chain — no UDF, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep, _ in _STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


def normalize_code_sql(expr: str) -> str:
    """The identical normalization as a DuckDB SQL expression over
    ``expr`` — used by the oracle to replay the lane byte-for-byte.
    Single quotes in patterns are SQL-doubled."""
    c = expr
    for pat, _, rep in _STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        c = f"regexp_replace({c}, '{p}', '{r}', 'g')"
    return f"trim({c})"


def type2_clone_pairs(
    docs: DataFrame,
    k: int = 20,
    w: int = 8,
    max_bucket_width: int = 16,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Type-2 clone candidate pairs: winnow the NORMALIZED text and
    join on shared fingerprints.  Returns the standard
    ``(pairs, dropped)`` contract — pairs is (id_a, id_b, n_shared),
    dropped the over-cap (structural-boilerplate) fingerprints."""
    from rmlint_spark.operators.winnow import (
        shared_fingerprint_pairs,
        winnow_fingerprints,
    )

    norm = docs.select(
        F.col(id_col), normalize_code(text_col).alias(text_col)
    )
    fps = winnow_fingerprints(norm, k=k, w=w, text_col=text_col, id_col=id_col)
    pairs, dropped = shared_fingerprint_pairs(
        fps, max_bucket_width=max_bucket_width, id_col=id_col
    )
    return pairs.filter(F.col("n_shared") >= min_shared), dropped
