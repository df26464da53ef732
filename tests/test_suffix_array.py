"""Distributed suffix-array tests (operators/suffix_array.py).

Every correctness claim is checked against a brute-force Python model:
full-refinement order isomorphism against naive sorted suffixes,
exact-window class equality at a non-power-of-two target (the
overlapping-window final round), repeated-span exactness against a
substring-counting dict, and the oversized-class skew contract.
"""

from __future__ import annotations

import random
from collections import defaultdict

from rmlint_spark.operators.suffix_array import (
    dense_rank_distributed,
    repeated_spans,
    sa_clone_pairs,
    suffix_array,
    suffix_ranks,
)


def _docs_df(spark, docs: dict[str, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(docs.items())], ["doc_id", "text"]
    )


def test_dense_rank_matches_global_and_is_parallelism_invariant(spark):
    vals = [("b",), ("a",), ("c",), ("a",), ("bb",), ("",), ("c",), ("ab",)]
    df = spark.createDataFrame(vals, ["v"])
    expected = {v: i + 1 for i, v in enumerate(sorted({v for (v,) in vals}))}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("3", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            got = {
                row["v"]: row["r"]
                for row in dense_rank_distributed(df, ["v"]).collect()
            }
            assert got == expected, f"shuffle.partitions={n}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_suffix_array_order_isomorphic_to_naive(spark):
    # d1 == d3 exercises cross-document identical-suffix ties
    docs = {"d1": "banana", "d2": "mississippi", "d3": "banana", "d4": "a"}
    ranks = {
        (r["doc"], r["pos"]): r["r"]
        for r in suffix_array(_docs_df(spark, docs)).collect()
    }
    sufs = [(d, p, t[p:]) for d, t in docs.items() for p in range(len(t))]
    assert set(ranks) == {(d, p) for d, p, _ in sufs}
    for d1, p1, s1 in sufs:
        for d2, p2, s2 in sufs:
            r1, r2 = ranks[(d1, p1)], ranks[(d2, p2)]
            if s1 == s2:
                assert r1 == r2, f"{(d1, p1)} vs {(d2, p2)}"
            else:
                assert (r1 < r2) == (s1 < s2), f"{(d1, p1)} vs {(d2, p2)}"


def test_window_classes_exact_at_non_power_of_two(spark):
    """upto=5 must partition by EXACT length-min(5, len) prefixes —
    the overlapping-window final round, not the next power of two
    (which would over-refine: 8-prefix splits classes that share only
    5 chars)."""
    rnd = random.Random(7)
    docs = {
        f"d{i}": "".join(rnd.choice("ab") for _ in range(rnd.randint(1, 40)))
        for i in range(8)
    }
    ranks = {
        (r["doc"], r["pos"]): r["r"]
        for r in suffix_ranks(_docs_df(spark, docs), upto=5).collect()
    }
    # expected class key: the exact min(5, len)-prefix; a suffix shorter
    # than 5 keys by its full remainder (sentinel rule: shorter suffixes
    # tie only with identical same-length suffixes)
    by_key, by_rank = defaultdict(set), defaultdict(set)
    for d, t in docs.items():
        for p in range(len(t)):
            by_key[t[p : p + 5]].add((d, p))
            by_rank[ranks[(d, p)]].add((d, p))
    assert sorted(map(sorted, by_key.values())) == sorted(
        map(sorted, by_rank.values())
    )
    # binary alphabet guarantees genuine 5-char collisions that an
    # 8-window would split — assert the test is non-vacuous
    assert any(
        len({t[p : p + 8] for (d, p) in pts for t in [docs[d]]}) > 1
        for key, pts in by_key.items()
        if len(key) == 5 and len(pts) > 1
    )


def test_repeated_spans_matches_bruteforce(spark):
    rnd = random.Random(11)
    docs = {
        f"d{i}": "".join(rnd.choice("ab") for _ in range(30)) for i in range(6)
    }
    L = 6  # deliberately non-power-of-two
    got = {
        (r["doc"], r["pos"]): (r["class_id"], r["n_occ"])
        for r in repeated_spans(_docs_df(spark, docs), min_len=L).collect()
    }
    occ = defaultdict(list)
    for d, t in docs.items():
        for p in range(len(t) - L + 1):
            occ[t[p : p + L]].append((d, p))
    expected = {s: pts for s, pts in occ.items() if len(pts) >= 2}
    assert set(got) == {pt for pts in expected.values() for pt in pts}
    sub_to_class = {}
    for s, pts in expected.items():
        cids = {got[pt][0] for pt in pts}
        assert len(cids) == 1, f"split class for {s!r}"
        assert all(got[pt][1] == len(pts) for pt in pts)
        sub_to_class[s] = cids.pop()
    # distinct substrings never share a class (hash-free exactness)
    assert len(set(sub_to_class.values())) == len(sub_to_class)


def test_sa_clone_pairs_planted_pair_and_skew_cap(spark):
    boiler = "0123456789abcdef" * 3  # 48 chars planted in 10 docs
    shared = "the quick brown fox jumps over the lazy dog!!"  # 45 chars, 2 docs
    rnd = random.Random(3)

    def filler(n: int) -> str:
        return "".join(rnd.choice("xyzw ") for _ in range(n))

    # per-doc unique guard chars (A..J) around the boiler block so the
    # only cross-doc repeats among b-docs are the width-10 in-boiler
    # classes (windows touching the boundary pick up the guard)
    docs = {
        f"b{i}": filler(20) + chr(65 + i) + boiler + chr(65 + i) + filler(20)
        for i in range(10)
    }
    docs["s1"] = filler(25) + shared + filler(5)
    docs["s2"] = shared + filler(30)
    pairs, dropped = sa_clone_pairs(
        _docs_df(spark, docs), min_len=32, max_class_width=4
    )
    d = dropped.collect()
    assert d and all(row["width"] > 4 for row in d)
    got = {(r["doc_a"], r["doc_b"]): r["shared_classes"] for r in pairs.collect()}
    assert ("s1", "s2") in got
    # the 45-char shared block holds 45-32+1 stride-1 classes
    assert got[("s1", "s2")] == len(shared) - 32 + 1 == 14
    # boilerplate-only doc pairs are suppressed by the width cap
    assert not any(a.startswith("b") and b.startswith("b") for a, b in got)


def test_pair_lcp_matches_bruteforce(spark):
    rnd = random.Random(23)
    docs = {
        f"d{i}": "".join(rnd.choice("ab") for _ in range(rnd.randint(1, 25)))
        for i in range(5)
    }
    from rmlint_spark.operators.suffix_array import pair_lcp

    names = sorted(docs)
    pairs = []
    for da in names:
        for db in names:
            for pa in range(len(docs[da])):
                for pb in range(len(docs[db])):
                    if rnd.random() < 0.07:
                        pairs.append((da, pa, db, pb))
    pdf = spark.createDataFrame(
        pairs, "doc_a string, pos_a int, doc_b string, pos_b int"
    )
    got = {
        (r["doc_a"], r["pos_a"], r["doc_b"], r["pos_b"]): r["lcp"]
        for r in pair_lcp(_docs_df(spark, docs), pdf).collect()
    }

    def lcp(sa: str, sb: str) -> int:
        n = 0
        for x, y in zip(sa, sb):
            if x != y:
                break
            n += 1
        return n

    assert len(got) == len(pairs)
    for da, pa, db, pb in pairs:
        want = lcp(docs[da][pa:], docs[db][pb:])
        assert got[(da, pa, db, pb)] == want, (da, pa, db, pb, want)


def test_longest_shared_substring_matches_bruteforce(spark):
    rnd = random.Random(31)
    docs = {
        f"d{i}": "".join(rnd.choice("abc") for _ in range(40)) for i in range(5)
    }
    # plant a long exact share between d0 and d3 so the test is
    # non-vacuous above min_len
    block = "zqzqzvqzzvzqqvzz"
    docs["d0"] = docs["d0"][:10] + block + docs["d0"][10 + len(block):]
    docs["d3"] = block + docs["d3"][len(block):]
    from rmlint_spark.operators.suffix_array import longest_shared_substring

    L = 5
    got = {
        (r["doc_a"], r["doc_b"]): r["length"]
        for r in longest_shared_substring(_docs_df(spark, docs), min_len=L).collect()
    }

    def lcs_len(ta: str, tb: str) -> int:
        best = 0
        for i in range(len(ta)):
            for j in range(len(tb)):
                n = 0
                while i + n < len(ta) and j + n < len(tb) and ta[i + n] == tb[j + n]:
                    n += 1
                best = max(best, n)
        return best

    names = sorted(docs)
    for i, da in enumerate(names):
        for db in names[i + 1:]:
            want = lcs_len(docs[da], docs[db])
            if want >= L:
                assert got[(da, db)] == want, (da, db, want)
            else:
                assert (da, db) not in got
    assert got[("d0", "d3")] >= len(block)


def test_sa_lcp_driver_query_matches_bruteforce(spark):
    """The sa_lcp driver query (longest_shared_substring over the
    24-doc derived code corpus at sf0.001) against a Python brute
    force over the SAME corpus texts: pair set identical, every
    max_shared the true longest-common-substring length. The corpus
    construction itself is pinned by the DuckDB oracle (which replays
    it in SQL); this guards the query wiring in CI."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spark_entry_sa_lcp",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    sf = "/root/testdata/sf0.001"
    from pyspark.sql import functions as F

    corpus = {
        r["doc_id"]: r["text"]
        for r in entry._code_corpus(
            entry._docs(spark, sf).filter(F.col("doc_id") < 24)
        ).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["max_shared"]
        for r in entry.q_sa_lcp(spark, sf).collect()
    }

    def lcs_len(ta: str, tb: str) -> int:
        # O(n*m) dp over shared-suffix lengths
        prev = [0] * (len(tb) + 1)
        best = 0
        for i in range(1, len(ta) + 1):
            cur = [0] * (len(tb) + 1)
            for j in range(1, len(tb) + 1):
                if ta[i - 1] == tb[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    if cur[j] > best:
                        best = cur[j]
            prev = cur
        return best

    ids = sorted(corpus)
    want = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            n = lcs_len(corpus[da], corpus[db])
            if n >= 12:
                want[(da, db)] = n
    assert got == want


def _brute_lcp_array(docs: dict[str, str]):
    """Sorted generalized suffixes with predecessor LCPs, ordered by
    (suffix string, doc, pos) — identical strings tie on the string and
    break on (doc, pos), matching the (r, doc, pos) engine order."""
    sufs = sorted(
        (t[p:], d, p) for d, t in docs.items() for p in range(len(t))
    )
    out = []
    prev = None
    for s, d, p in sufs:
        lcp = 0
        if prev is not None:
            while lcp < len(s) and lcp < len(prev) and s[lcp] == prev[lcp]:
                lcp += 1
        out.append((d, p, lcp))
        prev = s
    return out


def test_lcp_array_matches_bruteforce(spark):
    rnd = random.Random(47)
    docs = {
        f"d{i}": "".join(rnd.choice("ab") for _ in range(20)) for i in range(4)
    }
    docs["d4"] = docs["d0"]  # identical docs: every suffix ties on r
    from rmlint_spark.operators.suffix_array import lcp_array

    got = {
        (r["doc"], r["pos"]): r["lcp"]
        for r in lcp_array(_docs_df(spark, docs)).collect()
    }
    want = {(d, p): lcp for d, p, lcp in _brute_lcp_array(docs)}
    assert got == want


def test_lcp_array_parallelism_invariant(spark):
    docs = {"d1": "banana", "d2": "bandana", "d3": "anab"}
    from rmlint_spark.operators.suffix_array import lcp_array

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("3", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(
                sorted(
                    tuple(r)
                    for r in lcp_array(_docs_df(spark, docs)).collect()
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1]


def test_distinct_substring_count_matches_bruteforce(spark):
    rnd = random.Random(53)
    docs = {
        f"d{i}": "".join(rnd.choice("abc") for _ in range(15)) for i in range(4)
    }
    docs["d2"] = docs["d1"][:10]  # a prefix-contained doc: pure overlap
    from rmlint_spark.operators.suffix_array import distinct_substring_count

    got = distinct_substring_count(_docs_df(spark, docs)).collect()[0][
        "n_substrings"
    ]
    want = len(
        {t[i:j] for t in docs.values() for i in range(len(t)) for j in range(i + 1, len(t) + 1)}
    )
    assert got == want


def test_lcp_lanes_release_their_pins(spark):
    """longest_shared_substring / lcp_array / distinct_substring_count
    build O(log L) checkpointed generations plus descent intermediates;
    each must sweep everything it pinned except its own materialized
    result (exactly ONE new persistent RDD per call)."""
    from rmlint_spark.operators.exact import persistent_rdd_ids, unpersist_rdd_ids
    from rmlint_spark.operators.suffix_array import (
        distinct_substring_count,
        lcp_array,
        longest_shared_substring,
    )

    docs = _docs_df(spark, {"d1": "banana", "d2": "bandana", "d3": "anaban"})
    for fn in (
        lambda: longest_shared_substring(docs, min_len=3),
        lambda: lcp_array(docs),
        lambda: distinct_substring_count(docs),
    ):
        base = persistent_rdd_ids(spark)
        out = fn()
        new = persistent_rdd_ids(spark) - base
        assert len(new) == 1, f"{fn}: {len(new)} pins left"
        out.count()  # the survivor is the result itself — still usable
        unpersist_rdd_ids(spark, new)
