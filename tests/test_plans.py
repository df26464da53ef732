"""Physical-plan regression tests: lock in the plan shapes PLANS.md
audits, so a refactor that silently reintroduces a scale-killer
(SortMergeJoin in the funnel, content in a shuffle, lost pushdown or
pruning) fails CI instead of surfacing at 100x the data.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pandas as pd  # module-level: pandas_udf type-hint resolution
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def final_plan(df) -> str:
    """Executed (AQE-final) plan string: run the df, then read its own
    query execution. A fresh action like count() would plan a separate
    query and prove nothing about this df's joins."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def files(spark):
    from rmlint_spark.sources.tables import documents_as_files, load_table

    return documents_as_files(load_table(spark, SF_DIR, "documents"))


def test_funnel_no_sortmergejoin_no_content_refirst(spark, files):
    """The round-1 perf killers, pinned forever: every funnel join must
    resolve to a broadcast (survivor keys are tiny by design) and no
    aggregate may re-materialize content via first()."""
    from rmlint_spark.config import DEFAULT
    from rmlint_spark.operators.exact import exact_clusters, pin_scope

    with pin_scope(spark):
        plan = final_plan(exact_clusters(files, DEFAULT))
        assert "SortMergeJoin" not in plan
        assert "first(content" not in plan and "first(text" not in plan
        # content must not ride a shuffle: no Exchange keyed or carrying it
        bad = [
            ln for ln in plan.splitlines()
            if "Exchange" in ln and ("content" in ln or "text#" in ln)
        ]
        assert not bad, bad


def test_projection_prunes_content_from_scan(spark):
    """Column pruning must reach the parquet reader: a metadata-only
    projection's ReadSchema excludes the (dominant) text column."""
    from rmlint_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = formatted_plan(docs.select("doc_id", "lang"))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("text" not in ln for ln in read_schema)


def test_predicate_pushdown_reaches_scan(spark):
    from rmlint_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = formatted_plan(docs.filter(F.col("lang") == "en").select("doc_id"))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(lang)" in plan or "EqualTo(lang,en)" in plan


def test_lsh_single_python_stage(spark, files):
    """The signature UDF must be ONE ArrowEvalPython stage feeding the
    band explode — a second Python stage means the kernel re-runs."""
    from rmlint_spark.config import DEFAULT
    from rmlint_spark.operators.lsh import band_buckets, with_signatures

    import re

    buckets = band_buckets(with_signatures(files, DEFAULT), DEFAULT)
    plan = formatted_plan(buckets.groupBy("band_id", "band_hash").count())
    # formatted output lists each node in the tree AND a details
    # section — count the numbered detail entries
    n_python = len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M))
    assert n_python == 1, plan
    # row-at-a-time Python must never appear anywhere
    assert "BatchEvalPython" not in plan


def test_band_shuffle_carries_no_content(spark, files):
    from rmlint_spark.config import DEFAULT
    from rmlint_spark.operators.lsh import band_buckets, with_signatures

    buckets = band_buckets(with_signatures(files, DEFAULT), DEFAULT)
    plan = final_plan(buckets.groupBy("band_id", "band_hash").count())
    bad = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and ("content" in ln or "text#" in ln)
    ]
    assert not bad, bad


def test_combined_signatures_single_python_stage(spark, files):
    """MinHash+SimHash come from ONE UDF call even though the plan
    extracts two struct fields and a downstream sentinel filter exists
    — the exact collapse that double-ran the MinHash kernel before the
    UDFs became optimizer barriers."""
    import re

    from rmlint_spark.config import DEFAULT
    from rmlint_spark.operators.lsh import band_buckets, with_combined_signatures

    sigs = with_combined_signatures(files, DEFAULT)
    composed = band_buckets(sigs, DEFAULT).groupBy("band_id", "band_hash").count()
    plan = formatted_plan(composed)
    assert len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M)) == 1, plan


def test_quality_queries_are_shuffle_free(spark):
    """gopher_rules, c4_lines, pii_scrub, and the repetition stats are
    per-document maps — their physical plans must contain NO Exchange
    (shuffle) at all: one scan partition in, one result partition out.
    At 100 TB a stray shuffle here would move the full text corpus."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spark_entry_plans",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    # token_metrics / quality_score / repetition_stats / lang_id were
    # absorbed into text_stats and gopher_rules (driver 50-query cap,
    # r5) — the merged queries keep the zero-Exchange single-scan
    # contract
    for name in ("gopher_rules", "c4_lines", "pii_scrub", "text_stats"):
        df = entry.queries()[name](spark, SF_DIR)
        plan = formatted_plan(df)
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"
        # single parquet scan, and the doc text never re-read twice
        # (formatted explain prints each node in both tree and details,
        # so count numbered node headers)
        import re

        n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
        assert n_scans == 1, f"{name} has {n_scans} scans"


def test_corpus_model_queries_broadcast_and_never_shuffle_text(spark):
    """charlm_quality / mixture_sample / tfidf_keywords: the model /
    census / df relations are tiny by construction, so every join must
    resolve to a broadcast (no SortMergeJoin), and no Exchange may
    carry the text column — at 100 TB the only rows allowed to move
    are (id, token/bigram, count) aggregates."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spark_entry_corpus_plans",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    for name in ("charlm_quality", "mixture_shuffle", "tfidf_keywords", "winnow",
                 "corpus_report", "bpe_pair_counts"):
        df = entry.queries()[name](spark, SF_DIR)
        plan = final_plan(df)
        assert "SortMergeJoin" not in plan, f"{name}:\n{plan}"
        bad = [
            ln for ln in plan.splitlines()
            if "Exchange" in ln and "text#" in ln
        ]
        assert not bad, f"{name} shuffles text: {bad}"


def test_sliding_window_arrays_evaluate_once_per_row(spark):
    """Sliding-window HOFs must keep their source array LET-BOUND
    (singleton-array transform) instead of projected as a column:
    CollapseProject inlines a projected array into the window lambda,
    where `slice(arr, j, w)` re-evaluates the full tokenize/hash
    transform once PER WINDOW POSITION — O(len^2) for split-based
    shingles and O(len^3) for winnow's hashed grams (measured: one
    25-minute single task at 5000 docs, vs 11 s let-bound). The
    smoking gun in the optimized plan is a slice()/element-access
    whose first argument is itself a transform/filter/split."""
    import importlib.util
    import os

    from rmlint_spark.operators.winnow import winnow_fingerprints
    from rmlint_spark.sources.tables import load_table

    def assert_no_inlined_window(df, name):
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        squeezed = optimized.replace(" ", "")
        for bad in ("slice(transform(", "slice(filter(", "slice(split("):
            assert bad not in squeezed, f"{name}: {bad}\n{optimized}"

    assert_no_inlined_window(
        winnow_fingerprints(load_table(spark, SF_DIR, "documents"), k=8, w=4),
        "winnow_fingerprints",
    )

    spec = importlib.util.spec_from_file_location(
        "spark_entry_window_plans",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    # minhash_sql is absorbed into lsh_band_buckets (r5 query-count
    # consolidation) — the composed query still evaluates the shingle
    # window HOF, so the smell check covers it transitively
    for name in ("lsh_band_buckets", "ngram_jaccard", "ngram_repetition",
                 "decontaminate", "winnow", "winnow_clone_pairs"):
        assert_no_inlined_window(entry.queries()[name](spark, SF_DIR), name)


def test_corpus_shuffle_is_one_hash_exchange_no_range_sort(spark):
    """The global-permutation plan must be a single hash shuffle on
    the shard key plus a per-shard sort — never a range-partitioned
    global ORDER BY (its driver-side sampling pass and skew handling
    are pure overhead when the sort key is already a uniform hash)."""
    import re

    from rmlint_spark.operators.sampling import shard_shuffle
    from rmlint_spark.sources.tables import load_table

    df = shard_shuffle(load_table(spark, SF_DIR, "documents"), n_shards=16)
    plan = formatted_plan(df)
    assert "rangepartitioning" not in plan.lower(), plan
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_ex == 1, f"{n_ex} exchanges:\n{plan}"
    # column pruning: the scan must not read the text column
    scan = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "text" not in scan, scan


def test_hyperplane_ladder_signs_each_vector_once(spark, monkeypatch):
    """judge r4 #3: the hyperplane ladder's width probe, over-cap
    semi-join, final union, and the caller's width recompute are four
    references to each level's bucket relation — without per-level
    pinning (plus the asNondeterministic optimizer barrier) the
    signature matmul UDF re-ran ~3x per call. Count the ROWS the UDF
    actually processes with an accumulator: in the no-escalation case
    every vector must be signed exactly once."""
    import numpy as np

    import rmlint_spark.operators.ann as ann
    from rmlint_spark.operators.exact import pin_scope

    acc = spark.sparkContext.accumulator(0)
    orig = ann.hyperplane_sigs_udf

    def counting(n_bands, bits_per_band, seed=42):
        inner = orig(n_bands, bits_per_band, seed)

        @F.pandas_udf("array<long>")
        def _counted(vecs: pd.Series) -> pd.Series:
            acc.add(len(vecs))
            return inner.func(vecs)

        return _counted.asNondeterministic()

    monkeypatch.setattr(ann, "hyperplane_sigs_udf", counting)

    rng = np.random.RandomState(7)
    n = 300
    emb = spark.createDataFrame(
        [(i, rng.standard_normal(16).tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    with pin_scope(spark):
        topk, dropped = ann.hyperplane_topk(emb, k=3, max_bucket=n + 1)
        assert topk.count() > 0
        assert dropped.count() == 0
    assert acc.value == n, f"signature UDF processed {acc.value} rows for {n} vectors"


def test_suffix_array_char_ranks_are_map_side_and_text_never_shuffles(spark):
    """The suffix array's only contact with document text is the
    level-1 char explode, and it must be PURE map-side expression code
    (codepoint ranks): a dense-rank of the alphabet joined back would
    hash-exchange every character in the corpus onto a <=256-key
    space — the worst possible skew. Pin: no Exchange at all in the
    level-1 plan, and no Exchange carrying text in a doubling round."""
    from rmlint_spark.operators.suffix_array import (
        _char_ranks,
        suffix_ranks,
    )

    docs = spark.createDataFrame(
        [("d1", "banana"), ("d2", "cabbage")], ["doc_id", "text"]
    )
    lvl1 = formatted_plan(_char_ranks(docs, "doc_id", "text"))
    assert "Exchange" not in lvl1, lvl1
    # a doubling round shuffles only narrow (doc, pos, rank) triples;
    # the ranked generations are localCheckpointed so text cannot leak
    # into any later plan by construction — assert it on the output
    out = suffix_ranks(docs, upto=4)
    plan = formatted_plan(out)
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and ("text#" in ln or "_t#" in ln)
    ]
    assert not bad, bad
    assert [f.name for f in out.schema.fields] == ["doc", "pos", "r"]


def test_lcp_descent_never_exchanges_the_generation_side(spark):
    """The LCP descent's contract: generations are the INDEX — built
    once, checkpointed hash-partitioned on (doc, pos) with a long pos
    — and every per-level lookup must shuffle only the (small) pair
    relation. Two regressions this pins: (a) generations checkpointed
    with the map-back join's (r, r2) partitioning re-exchange the
    corpus-position-sized relation twice per level; (b) an int pos
    makes Catalyst wrap the generation-side join key in a cast, which
    can never match the stored partitioning. Assert: no Exchange node
    in the descent plan carries a generation rank column (_ra/_rb)."""
    import re

    from pyspark.sql import functions as F

    from rmlint_spark.operators.suffix_array import pair_lcp, rank_generations

    docs = spark.createDataFrame(
        [("d1", "banana"), ("d2", "cabbage"), ("d3", "banal")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        [("d1", 0, "d2", 1), ("d1", 2, "d3", 0)],
        "doc_a string, pos_a long, doc_b string, pos_b long",
    )
    gens = rank_generations(docs)
    # the stored partitioning really is the descent key
    for _, g in gens:
        part = g._jdf.queryExecution().executedPlan().outputPartitioning().toString()
        assert "hashpartitioning(doc#" in part and "pos#" in part, part
        assert dict(g.dtypes)["pos"] == "bigint"
    plan = formatted_plan(pair_lcp(docs, pairs, gens=gens))
    # the generation side projects exactly (doc_x, _kx, _rx); the pair
    # relation legitimately carries _ra between the two lane joins, so
    # flag only 3-column exchanges of the generation projection itself
    gen_side_exchanges = [
        m.group(1)
        for m in re.finditer(
            r"\(\d+\) Exchange\nInput \[3\]: \[([^\]]*)\]", plan
        )
        if ("_ra#" in m.group(1) and "_ka#" in m.group(1))
        or ("_rb#" in m.group(1) and "_kb#" in m.group(1))
    ]
    assert not gen_side_exchanges, gen_side_exchanges


def test_cc_propagation_never_exchanges_the_edge_side(spark):
    """The CC loop's contract (same pattern as the LCP descent index):
    the symmetric edge relation is checkpointed hash-partitioned on u,
    so the per-iteration propagation join exchanges ONLY the label
    relation — exactly one Exchange in the join plan, and it is not
    the edge side (which carries v)."""
    import re

    from rmlint_spark.operators.connected_components import _sym_edges

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "fid_a long, fid_b long"
    )
    sym = _sym_edges(edges, "fid_a", "fid_b")
    part = sym._jdf.queryExecution().executedPlan().outputPartitioning().toString()
    assert "hashpartitioning(u#" in part, part
    labels = spark.createDataFrame([(1, 1), (2, 1)], "fid long, component long")
    j = sym.join(labels.withColumnRenamed("fid", "u"), "u")
    plan = formatted_plan(j)
    exchanges = re.findall(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    assert len(exchanges) == 1, plan
    assert "v#" not in exchanges[0], exchanges
