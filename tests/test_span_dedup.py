"""Exact substring span dedup (ExactSubstr removal transform).

Semantics oracle: Lee et al. 2022 §4.1 — every duplicated span of
length >= window is removed from all but its globally-first
occurrence; text outside duplicated spans is untouched.
"""

from __future__ import annotations

from rmlint_spark.operators.span_dedup import (
    excise,
    merge_spans,
    removal_spans,
    span_dedup,
)

# 65 chars — longer than the 50-char window, so its interior windows
# duplicate wherever the block appears
BOILER = "The quick brown fox jumps over the lazy dog repeatedly and often."
assert len(BOILER) == 65


def docs_df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_keeper_untouched_dup_excised(spark):
    # prefixes end with DIFFERENT characters (':' vs '-') so the
    # maximal shared span is exactly BOILER — a shared boundary char
    # would correctly extend the excised span (ExactSubstr is maximal)
    rows = [
        (1, "UNIQUE-PREFIX-ONE saying:" + BOILER),
        (2, "a different lead-in before the shared block-" + BOILER),
        (3, "no duplication in this document at all, nothing is shared here"),
    ]
    clean, merged = span_dedup(docs_df(spark, rows), window=50)
    got = {r["doc_id"]: r for r in clean.collect()}
    # keeper (lowest doc_id) keeps its copy byte-for-byte
    assert got[1]["clean_text"] == rows[0][1] and got[1]["n_spans"] == 0
    # non-keeper loses exactly the duplicated block
    assert got[2]["clean_text"] == "a different lead-in before the shared block-"
    assert got[2]["n_spans"] == 1
    assert got[2]["removed_chars"] == len(BOILER)
    # untouched doc passes through
    assert got[3]["clean_text"] == rows[2][1] and got[3]["removed_chars"] == 0
    # merged spans: one span, in doc 2 only
    (m,) = merged.collect()
    assert m["doc_id"] == 2 and m["end"] - m["start"] == len(BOILER)


def test_self_repeat_within_doc(spark):
    rows = [(7, BOILER + " -- interlude text -- " + BOILER)]
    clean, _ = span_dedup(docs_df(spark, rows), window=50)
    (r,) = clean.collect()
    # first occurrence kept, second excised
    assert r["clean_text"] == BOILER + " -- interlude text -- "
    assert r["removed_chars"] == len(BOILER)


def test_three_way_dup_keeps_one_copy(spark):
    # boundary char differs per doc (#5 / #9 / #11 -> '5','9','1')
    rows = [(i, f"doc number {i} distinct preamble #{i}" + BOILER) for i in (5, 9, 11)]
    clean, _ = span_dedup(docs_df(spark, rows), window=50)
    got = {r["doc_id"]: r for r in clean.collect()}
    assert BOILER in got[5]["clean_text"]
    assert BOILER not in got[9]["clean_text"]
    assert BOILER not in got[11]["clean_text"]
    # total corpus retains exactly one copy's worth of the block
    assert sum(r["removed_chars"] for r in got.values()) == 2 * len(BOILER)


def test_short_docs_emit_no_windows(spark):
    rows = [(1, "short"), (2, "short"), (3, "x" * 49), (4, "x" * 49)]
    spans = removal_spans(docs_df(spark, rows), window=50)
    assert spans.count() == 0


def test_merge_spans_islands(spark):
    spans = spark.createDataFrame(
        [(1, 0, 10), (1, 5, 15), (1, 15, 20), (1, 30, 40), (2, 2, 4)],
        ["doc_id", "start", "end"],
    )
    got = {
        (r["doc_id"], r["start"], r["end"]) for r in merge_spans(spans).collect()
    }
    # [0,10)+[5,15)+[15,20) chain into [0,20); [30,40) separate
    assert got == {(1, 0, 20), (1, 30, 40), (2, 2, 4)}


def test_excise_edge_spans(spark):
    docs = docs_df(spark, [(1, "abcdefghij")])
    spans = spark.createDataFrame(
        [(1, 0, 3), (1, 8, 10)], ["doc_id", "start", "end"]
    )
    (r,) = excise(docs, spans).collect()
    assert r["clean_text"] == "defgh"
    assert r["n_spans"] == 2 and r["removed_chars"] == 5


def test_full_doc_dup_excised_to_empty(spark):
    text = BOILER + " padded out to make the document reasonably long here."
    clean, _ = span_dedup(docs_df(spark, [(1, text), (2, text)]), window=50)
    got = {r["doc_id"]: r for r in clean.collect()}
    assert got[1]["clean_text"] == text
    assert got[2]["clean_text"] == "" and got[2]["removed_chars"] == len(text)


def test_no_pair_join_in_plan(spark):
    """The scale property: a window shared by w docs emits w rows, not
    w^2 — the plan must contain no join of the occurrence relation
    with itself (the groupBy keeper agg replaces it)."""
    rows = [(i, f"{i} lead-in :: " + BOILER) for i in range(20)]
    spans = removal_spans(docs_df(spark, rows), window=50)
    plan = spans._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("join") <= 1  # exactly the occ->dup h-join
