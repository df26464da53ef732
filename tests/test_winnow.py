"""Winnowing fingerprint tests: hand-computed selection, the
published match guarantee (shared substring of length >= k + w - 1
=> shared fingerprint), and the capped pair-join contract."""

from __future__ import annotations

import hashlib

from rmlint_spark.operators.winnow import shared_fingerprint_pairs, winnow_fingerprints


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _expected_fps(text, k, w):
    h = [
        hashlib.sha256(text[i : i + k].encode()).hexdigest()[:8]
        for i in range(len(text) - k + 1)
    ]
    return {min(h[j : j + w]) for j in range(len(h) - w + 1)}


def test_winnow_matches_reference_implementation(spark):
    text = "the quick brown fox jumps over the lazy dog"
    got = {
        r["fp"]
        for r in winnow_fingerprints(_docs(spark, [text]), k=8, w=4).collect()
    }
    assert got == _expected_fps(text, 8, 4)


def test_winnow_short_doc_contributes_nothing(spark):
    # k + w - 1 = 11: a 10-char doc has no complete window
    out = winnow_fingerprints(_docs(spark, ["0123456789", "0123456789a"]), k=8, w=4)
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_winnow_guarantee_shared_long_substring(spark):
    # two otherwise-different docs sharing a >= k+w-1 char substring
    # MUST share at least one fingerprint (Schleimer et al., Thm 1)
    shared = "zqxjvwkfzqxjv"  # 13 >= 11 chars
    a = "aaaa bbbb cccc " + shared + " dddd eeee"
    b = "1111 2222 " + shared + " 3333 4444 5555"
    fps = winnow_fingerprints(_docs(spark, [a, b]), k=8, w=4)
    pairs, dropped = shared_fingerprint_pairs(fps)
    got = pairs.collect()
    assert dropped.count() == 0
    assert len(got) == 1
    assert (got[0]["id_a"], got[0]["id_b"]) == (0, 1) and got[0]["n_shared"] >= 1


def test_shared_pairs_cap_reports_dropped(spark):
    # 5 identical docs -> every fingerprint bucket has width 5 > cap 4
    fps = winnow_fingerprints(_docs(spark, ["the same exact text here"] * 5), k=8, w=4)
    pairs, dropped = shared_fingerprint_pairs(fps, max_bucket_width=4)
    assert pairs.count() == 0
    assert dropped.count() > 0 and dropped.collect()[0]["_w"] == 5
