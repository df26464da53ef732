"""Text-analysis column expressions (training-data pipeline ops).

All JVM-side (`pyspark.sql.functions` compositions — no Python UDFs):
token counting, punctuation/stopword quality ratios, a marker-word
language-ID heuristic, and document fingerprinting. These are the
"documents table" operator family the engine exposes alongside the
dedup core; each has a matching ANSI-SQL oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny marker-word sets per language for the n-gram/marker heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["la", "el", "que"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def occurrences(col: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal substring —
    length-difference trick, portable to any SQL engine."""
    n = len(needle)
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / n).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace token count (single-space tokenization)."""
    return F.when(F.length(col) == 0, F.lit(0)).otherwise(
        F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit(""))) + 1
    ).cast("long")


# GPT-2-style pre-tokenizer arms (contractions, space-prefixed letter
# runs, digit runs, punctuation runs), non-capturing so the whole match
# is the token. Expressible identically in Java regex (Spark) and RE2
# (DuckDB) — both support \p{L}/\p{N} — so the count is oracle-exact.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2 pre-tokenizer regex
    (the unit LLM-pipeline budgets are denominated in, approximated
    without a merges table). JVM-side regexp_extract_all."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


def word_occurrences(col: Column, word: str) -> Column:
    """Occurrences of a whole token (pad-and-search)."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return occurrences(padded, f" {word} ")


def punct_ratio(col: Column) -> Column:
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[\.,;:!\?]", ""))
    return (punct / F.greatest(F.length(col), F.lit(1))).cast("double")


def stopword_ratio(col: Column) -> Column:
    total = token_count(col)
    stop = None
    for w in STOPWORDS:
        c = word_occurrences(col, w)
        stop = c if stop is None else stop + c
    return (stop / F.greatest(total, F.lit(1))).cast("double")


def lang_id(col: Column) -> Column:
    """Marker-word language guess: first language (in fixed en, es, de,
    fr priority order) whose marker count is maximal and > 0; 'und'
    otherwise. A cascaded CASE so the identical rule is expressible as
    the ANSI-SQL oracle."""
    s = {lang: sum_cols([word_occurrences(col, w) for w in ws]) for lang, ws in LANG_MARKERS.items()}
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] > 0), F.lit("en"))
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] > 0), F.lit("es"))
        .when((s["de"] >= s["fr"]) & (s["de"] > 0), F.lit("de"))
        .when(s["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def fingerprint(col: Column) -> Column:
    """Normalized document fingerprint: lowercase, collapse whitespace,
    sha256 — the cheap "same modulo formatting" key."""
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    return F.sha2(norm, 256)


def quality_score(col: Column) -> Column:
    """Composite 0..1 quality heuristic: long enough, not
    punctuation-heavy, reasonable stopword density."""
    len_score = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 10)
    stop_score = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return ((len_score + punct_pen + stop_score) / 3).cast("double")


def dup_line_fraction(col: Column) -> Column:
    """Fraction of non-blank lines that are repeats of an earlier line
    — the classic boilerplate/spam signal from published pretraining
    quality rules (duplicate-line filters). Pure JVM higher-order
    functions; 0.0 for documents with no non-blank lines."""
    lines = F.filter(F.split(col, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n = F.size(lines)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n
    ).otherwise(F.lit(0.0))


def uniq_word_fraction(col: Column) -> Column:
    """Distinct-word fraction (low = heavy word repetition)."""
    words = F.filter(F.split(col, " "), lambda x: F.length(x) > 0)
    n = F.size(words)
    return F.when(
        n > 0, F.size(F.array_distinct(words)).cast("double") / n
    ).otherwise(F.lit(0.0))
