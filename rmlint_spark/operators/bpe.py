"""Distributed BPE merge learning — the tokenizer-training half of the
training-data pipeline (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units").

The classic algorithm, re-shaped for Spark:

- **Word-frequency compression first.** Pair statistics are identical
  whether computed over the corpus or over the (distinct word, freq)
  relation, and the distinct-word relation is orders of magnitude
  smaller (~10^7 rows for a 100 TB corpus vs ~10^12 word tokens), so
  every iteration runs over it — the corpus is scanned exactly once,
  at census time.
- **Pure-JVM iteration body.** Initial symbols, adjacent-pair
  explode/count, and the greedy left-to-right merge rewrite are all
  built-in higher-order functions (``transform``/``aggregate``) — no
  Python on the iteration path.  The merge rewrite is a fold: commit
  the pending symbol unless it and the current symbol form the chosen
  pair (this reproduces the reference algorithm's non-overlapping
  left-to-right replacement: ``a a a`` + merge(a,a) -> ``aa a``).
- **One bounded driver probe per iteration** (the argmax pair — a
  single row), matching the repo's limit+collect probe discipline.
- **Lineage discipline.** Each iteration's rewrite is
  ``localCheckpoint``-materialized and the previous iteration's
  blocks are freed (the connected-components idiom,
  connected_components.py:185-189) — plan size and storage stay O(1)
  in the merge count instead of nesting n_merges aggregates.

Alphabet note: words are restricted to ``^[A-Za-z0-9_]+$`` so the
symbol alphabet is single-byte and the DuckDB oracle's ``substr``
character indexing agrees with Spark's — the restriction is a parity
pin, not an algorithmic limit.

Determinism: the argmax pair is tie-broken (count desc, left asc,
right asc), so the learned merge sequence is a pure function of the
corpus — re-running at any parallelism yields the identical table.

Reference analog: rmlint has no tokenizer, but the shape — iterative
global-argmax + rewrite over a compressed relation — is the
progressive-digest funnel discipline (SURVEY.md §2 A3) applied to
vocabulary learning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_MARK = "</w>"
_WORD_RE = "^[A-Za-z0-9_]+$"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) census — the single corpus scan. Whitespace
    pretokenization + the ASCII parity pin."""
    words = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    return (
        docs.select(words)
        .filter((F.length("word") > 0) & F.col("word").rlike(_WORD_RE))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + the end-of-word
    marker: (word, freq, symbols array<string>)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return words.select(
        "word", "freq",
        F.concat(chars, F.array(F.lit(END_MARK))).alias("symbols"),
    )


def pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    (left_sym, right_sym, pair_cnt). One explode + one agg; only
    (2 symbols, count) rows shuffle."""
    s = F.col("symbols")
    # guard single-symbol words (fully merged): sequence(1, 0) would
    # DESCEND in Spark; a NULL array explodes to zero rows instead
    pairs = F.when(
        F.size(s) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.struct(
                F.element_at(s, i).alias("l"), F.element_at(s, i + 1).alias("r")
            ),
        ),
    )
    return (
        syms.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym"))
        .agg(F.sum("freq").cast("long").alias("pair_cnt"))
    )


def apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array, replacing adjacent (left, right)
    occurrences with the concatenated symbol — greedy, left-to-right,
    non-overlapping (the reference algorithm's replacement rule) — as
    a pure-JVM fold. State = (committed prefix, pending symbol)."""
    merged = left + right

    def step(st: Column, x: Column) -> Column:
        hit = st.getField("pend").eqNullSafe(F.lit(left)) & (x == F.lit(right))
        flushed = F.when(
            st.getField("pend").isNull(), st.getField("acc")
        ).otherwise(F.concat(st.getField("acc"), F.array(st.getField("pend"))))
        return F.when(
            hit,
            F.struct(
                F.concat(st.getField("acc"), F.array(F.lit(merged))).alias("acc"),
                F.lit(None).cast("string").alias("pend"),
            ),
        ).otherwise(F.struct(flushed.alias("acc"), x.alias("pend")))

    def finish(st: Column) -> Column:
        return F.when(st.getField("pend").isNull(), st.getField("acc")).otherwise(
            F.concat(st.getField("acc"), F.array(st.getField("pend")))
        )

    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("pend"),
    )
    return syms.withColumn("symbols", F.aggregate("symbols", init, step, finish))


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 32,
    min_count: int = 2,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn the BPE merge table: [(rank, left, right, pair_count)].

    Stops early when the best remaining pair's count drops below
    ``min_count`` (merging singleton pairs just memorizes words).
    """
    from rmlint_spark.operators.exact import persistent_rdd_ids, unpersist_rdd_ids

    spark = docs.sparkSession
    _pre = persistent_rdd_ids(spark)
    cur = initial_symbols(word_counts(docs, text_col)).localCheckpoint(eager=True)
    prev_ids = persistent_rdd_ids(spark) - _pre
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("pair_cnt"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_cnt"] < min_count:
            break
        l, r, c = top[0]["left_sym"], top[0]["right_sym"], int(top[0]["pair_cnt"])
        merges.append((rank, l, r, c))
        _pre_iter = persistent_rdd_ids(spark)
        cur = apply_merge(cur, l, r).localCheckpoint(eager=True)
        unpersist_rdd_ids(spark, prev_ids)
        prev_ids = persistent_rdd_ids(spark) - _pre_iter
    unpersist_rdd_ids(spark, prev_ids)
    return merges


def segment_words(
    words: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply a learned merge table (in rank order) to a (word, freq)
    relation: (word, freq, symbols, n_tokens).  Same fold kernel as
    training; chained rewrites are collapsed by Catalyst into one
    projection per word batch."""
    cur = initial_symbols(words)
    for i, (_, l, r, _) in enumerate(merges):
        cur = apply_merge(cur, l, r)
        if (i + 1) % 8 == 0:  # bound nested-HOF plan depth
            cur = cur.localCheckpoint(eager=False)
    return cur.withColumn("n_tokens", F.size("symbols").cast("long"))


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document subword token counts under a learned merge table:
    (id, n_words, n_tokens).  The segmented vocabulary is tiny
    (distinct words), so it broadcasts back onto the exploded corpus —
    the corpus itself never shuffles on a text key."""
    vocab = segment_words(word_counts(docs, text_col), merges)
    per_word = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter((F.length("word") > 0) & F.col("word").rlike(_WORD_RE))
    joined = per_word.join(
        F.broadcast(vocab.select("word", "n_tokens")), "word"
    )
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
