"""Distributed generalized suffix array — prefix doubling on DataFrames.

The north-star names "cross-file substring lint via distributed
suffix-array shingles"; `operators/substring.py` and
`operators/span_dedup.py` cover that lint semantics with stride-1
window hashes (collision-checked by verification joins). This module
adds the suffix array itself — the exact, hash-free structure — built
with the Manber-Myers prefix-doubling recurrence expressed as
DataFrame rounds (the same family as Flick & Aluru, "Parallel
distributed memory construction of suffix and LCP arrays", SC'15):

  round k: rank_{2h}(d, p) = dense_rank( rank_h(d, p), rank_h(d, p+h) )

with a 0 sentinel for positions past the end of a document (ranks are
1-based, so the sentinel orders first — shorter suffix sorts before
its extensions, the suffix-array convention). Suffixes never cross
document boundaries (generalized SA), so no separator alphabet is
needed and every join stays keyed on (doc, pos).

Scale shape (SCALE.md):
- each round is JVM-only: one positional self-join on (doc, pos+h),
  one distributed dense rank, one map-back join — O(log L) rounds for
  prefix length L, each a constant number of hash/range exchanges over
  narrow (doc, pos, rank) rows; text is read ONCE (the char explode)
  and never shuffles again.
- the dense rank never funnels through a single task: distinct pairs
  are RANGE-partitioned, ranked per-partition under a
  spark_partition_id() window, and shifted by per-partition base
  offsets (one <=P-row collect) — the standard distributed dense-rank,
  parallelism-invariant by construction (pinned in tests).
- repeated-substring lint does NOT need the full array: equality of
  window-w classes is equality of length-min(w, |suffix|) prefixes,
  so detection of "shared substring of length >= L" stops at window
  exactly L (<= ceil(log2 L) + 1 rounds, 5-7 for the typical L of
  32-100; the final round uses the overlapping-window shift L - w) —
  exact stride-1 coverage with zero hash-collision risk, the property
  the window-hash operators buy back with verification joins.

Reference semantics parity: like `substring.py` this is north-star
surface with no direct rmlint counterpart; nearest precedent is the
sub-range hashing of R2's incremental shredder (lib/shredder.c:496-533).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dense_rank_distributed",
    "suffix_ranks",
    "suffix_array",
    "repeated_spans",
    "sa_clone_pairs",
    "rank_generations",
    "pair_lcp",
    "longest_shared_substring",
    "lcp_array",
    "distinct_substring_count",
]


def _sa_parts(spark, n_rows: int | None) -> int:
    """Scale-adaptive partition count for the suffix-array build: the
    prefix-doubling rounds run with AQE off (the stored partitioning
    contract), so a constant shuffle.partitions would schedule hundreds
    of near-empty tasks per round on a small corpus (the 24-doc sa_lcp
    oracle slice spent its 44 s mostly on empty-task rounds). Target
    ~256k narrow (doc, pos, r) rows per partition, capped at the
    session's shuffle-partition setting so large corpora keep full
    parallelism. Floor 2: ``repartition(1, cols)`` compiles to
    SinglePartition, which would drop the stored hashpartitioning the
    LCP descent's exchange-free generation joins rely on
    (plan-asserted in test_plans)."""
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if n_rows is None:
        return cap
    return max(2, min(cap, -(-int(n_rows) // (1 << 18))))


def dense_rank_distributed(
    df: DataFrame, cols: list[str], out: str = "r", n_parts: int | None = None
) -> DataFrame:
    """(cols..., out) mapping relation: 1-based dense rank of the
    distinct ``cols`` tuples in lexicographic order, computed without
    a single-task global window: range-partition the distinct tuples,
    row_number within each physical partition (spark_partition_id is
    evaluated BEFORE the window exchange, so the range classes
    survive), then shift by per-partition base offsets (one bounded
    <= n_parts-row collect). Join the result back on ``cols`` to rank
    a full relation. ``n_parts`` defaults to the shuffle-partition
    setting; the suffix-array rounds pass a corpus-sized value
    (:func:`_sa_parts`)."""
    spark = df.sparkSession
    n_parts = n_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        df.select(*cols)
        .distinct()
        .repartitionByRange(n_parts, *cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    # LAZY checkpoint (round 6): the counts collect right below is the
    # materializing action, so ranking costs ONE driver job instead of
    # two (the checkpoint still freezes (_pid, _lr) — range-boundary
    # sampling and the window run once, during that job — and the
    # caller's join-back reads the frozen blocks). The caller sweeps
    # this checkpoint via persistent_rdd_ids bracketing.
    d = d.withColumn("_lr", F.row_number().over(w)).localCheckpoint(eager=False)
    # base offset of each partition = rows in all lower-range partitions;
    # bounded collect (one row per partition) — materializes d
    counts = {r["_pid"]: r["n"] for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    base, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = base
        base += counts[pid]
    off = spark.createDataFrame(
        [(pid, offsets[pid]) for pid in sorted(counts)] or [(0, 0)], "_pid int, _off long"
    )
    return (
        d.join(F.broadcast(off), "_pid")
        .select(*cols, (F.col("_lr") + F.col("_off")).alias(out))
    )


def _char_ranks(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, r): level-1 ranks = codepoint of the character at
    each position, +1 so the 0 sentinel stays strictly smallest even
    for NUL bytes. Prefix doubling needs ORDER-PRESERVING initial
    ranks, not dense ones (every subsequent round re-densifies), so
    this is pure map-side expression code: one text scan, no alphabet
    pass, no join — and crucially no shuffle of the exploded char
    relation onto an alphabet-sized key space (a ≤256-key hash
    exchange of every character in the corpus would be the worst skew
    in the engine). Codepoint order == UTF-8 binary order, matching
    Spark string comparison."""
    return (
        docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t"))
        .filter(F.length("_t") > 0)
        .select(
            "doc",
            F.explode(F.sequence(F.lit(0), F.length("_t") - 1)).alias("pos"),
            F.col("_t"),
        )
        .select(
            "doc",
            # pos is LONG from birth: the LCP descent joins generations
            # on (doc, pos + lcp) which is long arithmetic — an int pos
            # would make Catalyst wrap the generation-side key in a
            # cast, and a cast key can never match the generation's
            # stored hashpartitioning (plan-audited: the cast was the
            # difference between a pair-only shuffle and re-exchanging
            # the whole position table per level)
            F.col("pos").cast("long").alias("pos"),
            (F.ascii(F.expr("substring(_t, pos + 1, 1)")) + F.lit(1)).alias("r"),
        )
    )


def suffix_ranks(
    docs: DataFrame,
    upto: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, pos, r): prefix-doubled suffix ranks. Two suffixes carry
    the same ``r`` iff their prefixes of length min(upto, |suffix|)
    are EXACTLY equal — not the next power of two: the last round uses
    the overlapping-window trick (rank pair at shift ``upto - w``
    covers [p, p+w) ∪ [p+upto-w, p+upto) = [p, p+upto) when w >= upto/2),
    so non-power-of-two targets refine to exactly ``upto``. Sentinel
    convention: a suffix shorter than the comparison window can only
    tie with a suffix of the SAME length, so class equality implies
    shared-prefix length >= min(upto, |suffix|).

    Driver-action economy (round 6): every generation checkpoint is
    LAZY — round k's dense-rank counts collect is the only driver
    action per round, and it materializes round k-1's pending
    generation as a side effect. A generation is released only after
    the generation built FROM it has materialized (one-round-deferred
    sweep), so at most two narrow (doc, pos, r) generations are live —
    the 24-doc sa_lcp oracle corpus dropped from ~3 driver jobs per
    doubling round to 1."""
    from rmlint_spark.operators.exact import persistent_rdd_ids, unpersist_rdd_ids

    spark = docs.sparkSession
    row = docs.agg(
        F.max(F.length(text_col)).alias("m"),
        F.sum(F.length(text_col)).alias("n"),
    ).collect()[0]
    if upto is None:
        upto = row["m"] or 1
    n_parts = _sa_parts(spark, row["n"])
    before = persistent_rdd_ids(spark)
    cur = _char_ranks(docs, id_col, text_col).localCheckpoint(eager=False)
    prev_ids = persistent_rdd_ids(spark) - before
    free_after_next_action: set[int] = set()
    w = 1
    while w < upto:
        # window grows w -> w + shift; shift <= w keeps the two ranked
        # windows overlapping (prefix-doubling invariant), and
        # shift = upto - w on the last round lands on EXACTLY upto.
        h = min(w, upto - w)
        shifted = cur.select("doc", (F.col("pos") - h).alias("pos"), F.col("r").alias("r2"))
        paired = (
            cur.join(shifted, ["doc", "pos"], "left")
            .select("doc", "pos", "r", F.coalesce("r2", F.lit(0)).alias("r2"))
        )
        before = persistent_rdd_ids(spark)
        # the counts collect inside materializes `paired`'s lineage —
        # i.e. the previous round's pending generation — so anything
        # queued behind that materialization is now safe to free
        rank_map = dense_rank_distributed(paired, ["r", "r2"], out="rn", n_parts=n_parts)
        unpersist_rdd_ids(spark, free_after_next_action)
        rank_ids = persistent_rdd_ids(spark) - before
        cur = (
            paired.join(rank_map, ["r", "r2"])
            .select("doc", "pos", F.col("rn").alias("r"))
            .localCheckpoint(eager=False)
        )
        cur_ids = persistent_rdd_ids(spark) - before - rank_ids
        # prev generation + this round's rank map feed the still-lazy
        # new generation — free them only after IT materializes
        free_after_next_action = prev_ids | rank_ids
        prev_ids = cur_ids
        w += h
    return cur


def suffix_array(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, pos, r): fully refined generalized suffix array ranks.
    Ordering suffixes by r yields suffix-array order; suffixes that
    are IDENTICAL strings (across documents) share an r — the
    generalized-SA tie, broken downstream by (r, doc, pos) when a
    total order is needed."""
    return suffix_ranks(docs, upto=None, id_col=id_col, text_col=text_col)


def repeated_spans(
    docs: DataFrame,
    min_len: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact repeated-substring occurrences: every (class_id, doc,
    pos, n_occ) where the length-``min_len`` substring at (doc, pos)
    occurs >= 2 times corpus-wide (including within one document).
    Hash-free (suffix-class equality IS string equality), stride-1
    exact — the suffix-array-backed sibling of span_dedup's keeper
    table. Refinement stops at window exactly min_len (any value, not
    just powers of two), not at full refinement."""
    ranks = suffix_ranks(docs, upto=min_len, id_col=id_col, text_col=text_col)
    lens = docs.select(
        F.col(id_col).alias("doc"), F.length(text_col).alias("_dl")
    )
    # suffixes long enough to certify a min_len-char repeat
    eligible = ranks.join(lens, "doc").filter(F.col("pos") + min_len <= F.col("_dl"))
    occ = Window.partitionBy("r")
    return (
        eligible.withColumn("n_occ", F.count("*").over(occ))
        .filter(F.col("n_occ") >= 2)
        .select(F.col("r").alias("class_id"), "doc", "pos", "n_occ")
    )


def sa_clone_pairs(
    docs: DataFrame,
    min_len: int = 32,
    max_class_width: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Cross-document substring-clone pairs from the suffix classes:
    (doc_a, doc_b, shared_classes) for documents sharing >= 1 repeated
    substring of length >= min_len. Standard skew contract: a class
    appearing in more than ``max_class_width`` distinct documents is
    excluded from pairing and surfaced in the dropped report
    (class_id, width) — boilerplate hits the report, not the shuffle."""
    spans = repeated_spans(docs, min_len, id_col=id_col, text_col=text_col)
    class_docs = spans.select("class_id", "doc").distinct()
    widths = class_docs.groupBy("class_id").agg(F.count("*").alias("width"))
    dropped = widths.filter(F.col("width") > max_class_width)
    # anti-join against the DROPPED side: oversized classes are rare by
    # construction (that is what the cap asserts), so that is the
    # broadcastable relation — the ok set is corpus-sized
    ok = class_docs.join(
        F.broadcast(dropped.select("class_id")), "class_id", "left_anti"
    )
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(b, "class_id")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared_classes"))
    )
    return pairs, dropped


def rank_generations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[int, DataFrame]]:
    """All pure-doubling rank generations [(1, g1), (2, g2), (4, g4),
    ..., (2^K, gK)] with 2^K >= the longest document — the structure
    the LCP descent walks. Unlike :func:`suffix_ranks` (which frees
    each generation as the next lands), every generation stays
    localCheckpointed: O(log L) narrow (doc, pos, r) relations,
    deliberately retained. Callers that finish with them can unpersist
    via the returned DataFrames.

    Generation semantics (the descent's contract): two positions share
    an ``r`` in generation w iff their length-min(w, remainder)
    prefixes are equal AND (both remainders >= w, or the remainders
    are equal) — the sentinel rule, so equality at w certifies either
    a true w-char match or total remainder equality."""
    spark = docs.sparkSession
    row = docs.agg(
        F.max(F.length(text_col)).alias("m"),
        F.sum(F.length(text_col)).alias("n"),
    ).collect()[0]
    max_len = row["m"] or 1
    n_parts = _sa_parts(spark, row["n"])
    gens: list[tuple[int, DataFrame]] = []
    # every generation is checkpointed HASH-PARTITIONED ON (doc, pos)
    # — the descent's join key. The checkpoint's LogicalRDD preserves
    # that partitioning, so pair_lcp's two per-level lookups shuffle
    # only the (small) pair relation, never the corpus-position-sized
    # generation: the index is built once and queried shuffle-free
    # (plan-asserted in test_plans). The extra build-time exchange is
    # repaid immediately — the next doubling round's positional
    # self-join reuses the same partitioning on its unshifted side.
    #
    # AQE must be OFF while the generations build: a localCheckpoint
    # taken under an AdaptiveSparkPlan stores UnknownPartitioning (the
    # adaptive plan cannot promise a partitioning at capture time), so
    # the index would silently lose the very property it exists for.
    # The build is a fixed chain of narrow statically-sized shuffles —
    # nothing AQE would improve — and the session value is restored
    # before any caller query plans against the result.
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # LAZY checkpoints (round 6): the physical plan — including the
        # stored hashpartitioning(doc, pos) the descent relies on — is
        # fixed here under AQE-off; each round's dense-rank counts
        # collect is the round's single driver action and materializes
        # the previous generation, and the final generation lands with
        # the descent's first action. Generations deliberately stay
        # persistent (the descent walks all of them); callers sweep.
        cur = (
            _char_ranks(docs, id_col, text_col)
            .repartition(n_parts, "doc", "pos")
            .localCheckpoint(eager=False)
        )
        gens.append((1, cur))
        w = 1
        while w < max_len:
            shifted = cur.select(
                "doc", (F.col("pos") - w).alias("pos"), F.col("r").alias("r2")
            )
            paired = (
                cur.join(shifted, ["doc", "pos"], "left")
                .select("doc", "pos", "r", F.coalesce("r2", F.lit(0)).alias("r2"))
            )
            rank_map = dense_rank_distributed(
                paired, ["r", "r2"], out="rn", n_parts=n_parts
            )
            cur = (
                paired.join(rank_map, ["r", "r2"])
                .select("doc", "pos", F.col("rn").alias("r"))
                .repartition(n_parts, "doc", "pos")
                .localCheckpoint(eager=False)
            )
            w *= 2
            gens.append((w, cur))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return gens


def pair_lcp(
    docs: DataFrame,
    pairs: DataFrame,
    gens: list[tuple[int, DataFrame]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact longest-common-prefix for candidate position pairs:
    input (doc_a, pos_a, doc_b, pos_b), output the same + ``lcp``.

    The classic generation descent, distributed: walk windows from the
    largest power of two down; at each window join both positions'
    ranks at offset (pos + lcp-so-far) and add w when the classes
    match. A short-suffix tie (total remainder equality) over-adds w
    once and is repaired by the final remainder clamp, which is exact
    because that tie implies equal remainders. Cost: 2 hash joins of
    the pair relation against a narrow generation per level — O(log L)
    rounds, id+position-only shuffles, text never moves; and because
    generations are checkpointed hash-partitioned on (doc, pos) with a
    long pos (see rank_generations), ONLY the pair relation is
    exchanged at each level — the corpus-position-sized index side
    joins in place (plan-asserted: no Exchange carries a generation
    rank column)."""
    if gens is None:
        gens = rank_generations(docs, id_col=id_col, text_col=text_col)
    lens = docs.select(
        F.col(id_col).alias("_ld"), F.length(text_col).alias("_ll")
    )
    cur = pairs.select("doc_a", "pos_a", "doc_b", "pos_b").withColumn(
        "lcp", F.lit(0)
    )
    for w, g in sorted(gens, key=lambda t: -t[0]):
        ga = g.select(
            F.col("doc").alias("doc_a"), F.col("pos").alias("_ka"), F.col("r").alias("_ra")
        )
        gb = g.select(
            F.col("doc").alias("doc_b"), F.col("pos").alias("_kb"), F.col("r").alias("_rb")
        )
        cur = (
            cur.withColumn("_ka", F.col("pos_a") + F.col("lcp"))
            .withColumn("_kb", F.col("pos_b") + F.col("lcp"))
            .join(ga, ["doc_a", "_ka"], "left")
            .join(gb, ["doc_b", "_kb"], "left")
            .withColumn(
                "lcp",
                F.col("lcp")
                + F.when(
                    F.col("_ra").isNotNull() & (F.col("_ra") == F.col("_rb")),
                    F.lit(w),
                ).otherwise(F.lit(0)),
            )
            .drop("_ka", "_kb", "_ra", "_rb")
        )
    return (
        cur.join(lens.withColumnRenamed("_ld", "doc_a"), "doc_a")
        .withColumnRenamed("_ll", "_la")
        .join(lens.withColumnRenamed("_ld", "doc_b"), "doc_b")
        .withColumnRenamed("_ll", "_lb")
        .select(
            "doc_a",
            "pos_a",
            "doc_b",
            "pos_b",
            F.least(
                "lcp", F.col("_la") - F.col("pos_a"), F.col("_lb") - F.col("pos_b")
            ).alias("lcp"),
        )
    )


def longest_shared_substring(
    docs: DataFrame,
    min_len: int = 32,
    max_class_width: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, length): the EXACT longest substring shared by
    each cross-document pair that shares one of length >= min_len.
    Composition of the lane: every common substring of length >=
    min_len starts at positions sharing a repeated-span class, so the
    max pair-LCP over within-class occurrence pairs IS the longest
    common substring — no hashing, no sampling. Classes wider than
    ``max_class_width`` are excluded (same skew contract as
    :func:`sa_clone_pairs`: boilerplate belongs in its dropped report,
    not in an O(w^2) pair fan-out).

    Storage: the window ranks and descent generations built here are
    RELEASED before returning (snapshot-diff sweep, the pin_scope
    idiom) — the small (doc_a, doc_b, length) result is eagerly
    checkpointed first, so nothing lazily depends on the swept pins."""
    from rmlint_spark.operators.exact import persistent_rdd_ids, unpersist_rdd_ids

    spark = docs.sparkSession
    before = persistent_rdd_ids(spark)
    spans = repeated_spans(docs, min_len, id_col=id_col, text_col=text_col)
    widths = spans.groupBy("class_id").agg(
        F.count_distinct("doc").alias("width")
    )
    ok = spans.join(
        F.broadcast(
            widths.filter(F.col("width") > max_class_width).select("class_id")
        ),
        "class_id",
        "left_anti",
    )
    a = ok.select("class_id", F.col("doc").alias("doc_a"), F.col("pos").alias("pos_a"))
    b = ok.select("class_id", F.col("doc").alias("doc_b"), F.col("pos").alias("pos_b"))
    cand = (
        a.join(b, "class_id")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "pos_a", "doc_b", "pos_b")
        .distinct()
    )
    scored = pair_lcp(docs, cand, id_col=id_col, text_col=text_col)
    built = persistent_rdd_ids(spark) - before
    out = (
        scored.groupBy("doc_a", "doc_b")
        .agg(F.max("lcp").alias("length"))
        .localCheckpoint(eager=True)
    )
    unpersist_rdd_ids(spark, built)
    return out


def lcp_array(
    docs: DataFrame,
    gens: list[tuple[int, DataFrame]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The classic LCP array over the generalized suffix array,
    distributed: (doc, pos, r, lcp) where suffixes are totally ordered
    by (r, doc, pos) — r is the fully-refined rank, so equal r means
    the suffix STRINGS are identical and (doc, pos) breaks the tie —
    and ``lcp`` is the longest common prefix with the order
    PREDECESSOR (0 for the first suffix). SA + LCP array together are
    the complete substring index (Manber & Myers 1993 §3).

    Distribution shape: one range exchange of the narrow (doc, pos, r)
    relation to materialize the order, a per-partition lag under a
    spark_partition_id window (the dense-rank idiom — no single-task
    global window), partition-boundary predecessors stitched from one
    <= shuffle.partitions-row collect, then ONE pair_lcp descent over
    the corpus-position-sized adjacency relation — O(n log L) join
    work, the same asymptotics as building the array, and the
    generation index side of every descent join stays un-shuffled
    (see pair_lcp). Text never appears.

    Storage: the result is eagerly checkpointed and every pin built
    HERE (the order relation, and the generations when this function
    created them) is released before returning; caller-provided
    ``gens`` predate the snapshot and are never touched.
    """
    from rmlint_spark.operators.exact import persistent_rdd_ids, unpersist_rdd_ids

    spark = docs.sparkSession
    before = persistent_rdd_ids(spark)
    if gens is None:
        gens = rank_generations(docs, id_col=id_col, text_col=text_col)
    sa = gens[-1][1]  # fully refined: equal r <=> identical suffix strings
    n_parts = _sa_parts(
        spark, docs.agg(F.sum(F.length(text_col)).alias("n")).collect()[0]["n"]
    )
    # freeze (_pid, order) once: two consumers below + repartitionByRange
    # samples boundaries (the dense_rank_distributed discipline)
    d = (
        sa.repartitionByRange(n_parts, "r", "doc", "pos")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # the lasts collect materializes
    )
    w = Window.partitionBy("_pid").orderBy("r", "doc", "pos")
    cur = d.select(
        "doc",
        "pos",
        "r",
        "_pid",
        F.lag("doc").over(w).alias("_pd"),
        F.lag("pos").over(w).alias("_pp"),
    )
    # partition-boundary predecessors: the last row of each non-empty
    # partition precedes the next non-empty partition's first row.
    # struct max = lexicographic on (r, doc, pos) — exactly the order.
    lasts = sorted(
        d.groupBy("_pid")
        .agg(F.max(F.struct("r", "doc", "pos")).alias("m"))
        .select("_pid", "m.doc", "m.pos")
        .collect(),
        key=lambda row: row["_pid"],
    )
    doc_type = dict(sa.dtypes)["doc"]
    bounds, prev = [], None
    for row in lasts:
        if prev is not None:
            bounds.append((row["_pid"], prev["doc"], prev["pos"]))
        prev = row
    bdf = spark.createDataFrame(
        bounds or [(-1, None, None)],
        f"_pid int, _bd {doc_type}, _bp long",
    )
    cur = (
        cur.join(F.broadcast(bdf), "_pid", "left")
        .select(
            "doc",
            "pos",
            "r",
            F.coalesce("_pd", "_bd").alias("_pd"),
            F.coalesce("_pp", "_bp").alias("_pp"),
        )
    )
    pairs = cur.filter(F.col("_pd").isNotNull()).select(
        F.col("_pd").alias("doc_a"),
        F.col("_pp").alias("pos_a"),
        F.col("doc").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    scored = pair_lcp(docs, pairs, gens=gens, id_col=id_col, text_col=text_col)
    built = persistent_rdd_ids(spark) - before
    out = (
        cur.join(
            scored.select(
                F.col("doc_b").alias("doc"),
                F.col("pos_b").alias("pos"),
                "lcp",
            ),
            ["doc", "pos"],
            "left",
        )
        .select("doc", "pos", "r", F.coalesce("lcp", F.lit(0)).alias("lcp"))
        .localCheckpoint(eager=True)
    )
    unpersist_rdd_ids(spark, built)
    return out


def distinct_substring_count(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact number of DISTINCT substrings across the whole corpus
    (shared substrings counted once — the generalized-SA semantics):
    the classic identity  sum(|suffix|) - sum(LCP array). Returns a
    1-row (n_substrings long) DataFrame. An exact corpus-diversity
    statistic no sketch gives: the hash-free audit twin of the
    HLL/MinHash diversity estimates, at O(n log L) join cost. The
    lcp_array pin is released once the 1-row result materializes."""
    from rmlint_spark.operators.exact import persistent_rdd_ids, unpersist_rdd_ids

    spark = docs.sparkSession
    before = persistent_rdd_ids(spark)
    la = lcp_array(docs, id_col=id_col, text_col=text_col)
    lens = docs.select(
        F.col(id_col).alias("doc"), F.length(text_col).cast("long").alias("_dl")
    )
    built = persistent_rdd_ids(spark) - before
    out = (
        la.join(lens, "doc")
        .agg(
            (F.sum(F.col("_dl") - F.col("pos")) - F.sum("lcp")).alias("n_substrings")
        )
        .localCheckpoint(eager=True)
    )
    unpersist_rdd_ids(spark, built)
    return out
