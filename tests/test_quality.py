"""Planted-edge-case tests for the document-quality queries
(gopher_rules, c4_lines) and SemDeDup semantic dedup.

The queries read ``documents.parquet`` from an sf_dir, so each test
writes a tiny planted corpus to tmp_path and calls the driver query on
it — the same surface the correctness gate exercises."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
)
entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry)


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "src", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to town "
    "with a friend that may have seen it be fast of late "
) * 3  # ~60 words, all rules satisfied


def test_gopher_rules_each_rule_fails_independently(spark, tmp_path):
    texts = [
        GOOD,                                        # 0: passes
        "short text only",                           # 1: < 50 words
        GOOD + " ###" * 20,                          # 2: symbol ratio > 0.1
        "\n".join(["- " + GOOD[:20]] * 10),          # 3: 100% bullet lines (also <50 words)
        GOOD.replace("the", "xx").replace("and", "yy")
        .replace("to", "zz").replace("of", "qq")
        .replace("that", "rr").replace("with", "ss")
        .replace("have", "tt").replace("be", "uu"),  # 4: zero stopwords
        " ".join(["a"] * 60),                        # 5: mean word len < 3
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = {r["doc_id"]: r.asDict() for r in entry.q_gopher_rules(spark, sf).collect()}
    assert got[0]["gopher_pass"] == 1
    assert got[1]["gopher_pass"] == 0 and got[1]["n_words"] < 50
    assert got[2]["gopher_pass"] == 0 and got[2]["symbol_word_ratio"] > 0.1
    assert got[3]["gopher_pass"] == 0 and got[3]["bullet_line_frac"] == 1.0
    assert got[4]["gopher_pass"] == 0 and got[4]["n_stop"] < 2
    assert got[5]["gopher_pass"] == 0 and got[5]["mean_word_len"] < 3.0
    # empty-ish doc divides nothing by zero
    sf2 = _write_docs(spark, tmp_path, [""])
    row = entry.q_gopher_rules(spark, sf2).collect()[0]
    assert row["n_words"] == 0 and row["gopher_pass"] == 0


def test_c4_lines_keep_and_page_rules(spark, tmp_path):
    keep1 = "this line has five good words."
    keep2 = "another line that also keeps going fine!"
    keep3 = "a third keeper sentence ends with a question mark?"
    texts = [
        # 0: three kept lines -> page kept
        "\n".join([keep1, keep2, keep3, "no punct line here", "too short."]),
        # 1: javascript line dropped -> only 2 kept -> page dropped
        "\n".join([keep1, keep2, "enable javascript to view this page."]),
        # 2: lorem ipsum poisons the page even with 3 kept lines
        "\n".join([keep1, keep2, keep3, "lorem ipsum dolor sit amet."]),
        # 3: curly brace poisons the page
        "\n".join([keep1, keep2, keep3, "function f() { return 1; }"]),
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = {r["doc_id"]: r.asDict() for r in entry.q_c4_lines(spark, sf).collect()}
    assert got[0]["page_kept"] == 1 and got[0]["n_kept"] == 3
    assert got[1]["page_kept"] == 0 and got[1]["n_kept"] == 2
    assert got[2]["page_kept"] == 0 and got[2]["n_kept"] == 4
    assert got[3]["page_kept"] == 0
    # the kept fingerprint is the sha of the rejoined kept lines
    import hashlib

    want = hashlib.sha256("\n".join([keep1, keep2, keep3]).encode()).hexdigest()
    assert got[0]["kept_sha"] == want


def test_semdedup_min_id_survivor(spark):
    from rmlint_spark.operators.ann import semdedup

    # two cells; cell 0 holds an identical pair (0,1) and an unrelated
    # orthogonal vector 2; cell 1 holds a near-pair (3,4) and a far 5
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
            (4, [0.0, 0.1, 1.0]),
            (5, [0.0, -1.0, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    assigns = spark.createDataFrame(
        [(i, i // 3, True) for i in range(6)],
        "vec_id long, centroid_id int, is_home boolean",
    )
    res, dropped = semdedup(emb, tau=0.9, assignments=assigns)
    assert dropped.count() == 0
    out = {r["vec_id"]: r for r in res.collect()}
    assert out[0]["is_kept"] == 1       # min id of the dup pair survives
    assert out[1]["is_kept"] == 0       # cos(0,1)=1 >= 0.9 -> removed
    assert out[2]["is_kept"] == 1       # orthogonal: kept
    assert out[3]["is_kept"] == 1       # cos(3,4)=0.995 -> 3 kept,
    assert out[4]["is_kept"] == 0       #                   4 removed
    assert out[5]["is_kept"] == 1
    # cross-cell near-dups are NOT compared (coarse-quantizer contract)
    assigns2 = spark.createDataFrame(
        [(0, 0, True), (1, 1, True)],
        "vec_id long, centroid_id int, is_home boolean",
    )
    out2, _ = semdedup(emb.filter(F.col("vec_id") < 2), tau=0.9, assignments=assigns2)
    assert all(r["is_kept"] == 1 for r in out2.collect())


def test_semdedup_hot_cell_capped_and_reported(spark):
    """judge r4: semdedup was the only candidate-pair stage without the
    cap + dropped-report discipline. A degenerate hot cell (here: 60
    identical embeddings, the exact input semantic dedup is pointed
    at) must be EXCLUDED from pairwise scoring — members keep, the
    cell shows up in the dropped report — while normal cells still
    dedup."""
    from rmlint_spark.operators.ann import semdedup

    hot = [(i, [1.0, 0.0, 0.0]) for i in range(60)]          # cell 0: oversized
    cold = [(100, [0.0, 1.0, 0.0]), (101, [0.0, 1.0, 0.0]),  # cell 1: dup pair
            (102, [0.0, 0.0, 1.0])]                          #         + loner
    emb = spark.createDataFrame(hot + cold, "vec_id long, embedding array<double>")
    assigns = spark.createDataFrame(
        [(i, 0, True) for i, _ in hot] + [(i, 1, True) for i, _ in cold],
        "vec_id long, centroid_id int, is_home boolean",
    )
    res, dropped = semdedup(emb, tau=0.9, assignments=assigns, max_cell_width=50)
    d = dropped.collect()
    assert [(r["centroid_id"], r["width"]) for r in d] == [(0, 60)]
    out = {r["vec_id"]: r["is_kept"] for r in res.collect()}
    assert all(out[i] == 1 for i in range(60))   # capped cell: nothing removed
    assert out[100] == 1 and out[101] == 0       # normal cell still dedups
    assert out[102] == 1


def test_pii_scrub_planted_and_edge_cases(spark, tmp_path):
    texts = [
        # doc 0 (0%7==0): planted email from doc_id, plus an inline one
        "reach me at alice.smith+tag@mail.example.org today",
        # doc 1: phone variants — dashed and dotted match, spaced does not
        "call 555-123-4567 or 555.123.4567 but not 555 123 4567",
        # doc 2: IP literal; a version string 1.2.3 must NOT match
        "server at 192.168.10.20 runs v1.2.3 of the daemon",
        # doc 3: clean text is untouched (sha equals sha of text+planting)
        "nothing sensitive in this line at all",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = {r["doc_id"]: r.asDict() for r in entry.q_pii_scrub(spark, sf).collect()}
    # doc 0: inline email + the planted 'user0@example.com' (0 % 7 == 0)
    assert got[0]["n_emails"] == 2
    assert got[1]["n_phones"] == 2 and got[1]["n_emails"] == 0
    assert got[2]["n_ips"] == 1
    assert got[3]["n_emails"] == got[3]["n_phones"] == got[3]["n_ips"] == 0
    # the fingerprint is of the REDACTED text, planting included
    import hashlib

    scrubbed3 = texts[3]  # doc 3: no planting (3 % 7/11/13 != 0), no matches
    assert got[3]["scrubbed_sha"] == hashlib.sha256(scrubbed3.encode()).hexdigest()
    # doc 0 trips every planting rule (0 % n == 0 for all n)
    scrubbed0 = "reach me at <EMAIL> today contact: <EMAIL> call <PHONE> from <IP>"
    assert got[0]["scrubbed_sha"] == hashlib.sha256(scrubbed0.encode()).hexdigest()
    assert got[0]["n_phones"] == 1 and got[0]["n_ips"] == 1


def test_paragraph_dedup_planted_boilerplate(spark, tmp_path):
    shared = "this exact paragraph appears in several documents verbatim."
    texts = [
        f"unique opening zero.\n\n{shared}\n\nunique tail zero.",
        f"unique opening one.\n\n{shared}",
        "totally unrelated document with just one paragraph.",
        f"{shared}\n\nanother unique paragraph here.",
        # same paragraph twice in ONE doc: counts occurrences, but a
        # single-doc repeat alone must not appear (n_docs >= 2 filter)
        "solo repeat.\n\nsolo repeat.",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = entry.q_paragraph_dedup(spark, sf).collect()
    import hashlib

    want_sha = hashlib.sha256(shared.encode()).hexdigest()
    got = {r["para_sha"]: r for r in rows}
    # planted boilerplate from doc_id (0 % 5 == 0) adds the newsletter
    # paragraph to doc 0 only -> single-doc, filtered out
    assert want_sha in got
    r = got[want_sha]
    assert r["n_occurrences"] == 3 and r["n_docs"] == 3 and r["first_doc"] == 0
    assert r["para_len"] == len(shared)
    solo_sha = hashlib.sha256(b"solo repeat.").hexdigest()
    assert solo_sha not in got


def test_paragraph_dedup_shuffle_carries_no_text(spark):
    import io
    from contextlib import redirect_stdout

    df = entry.q_paragraph_dedup(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and ("para#" in ln or "text#" in ln)
    ]
    assert not bad, bad
