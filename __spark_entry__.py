"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from
SURVEY.md §2 through the rmlint_spark engine; ``oracle_sql()`` holds
the DuckDB-equivalent ANSI SQL. Column names/aliases match exactly on
both sides; boolean outputs are cast to int and double sums go through
decimal(18,6) so value hashes are stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rmlint_spark.config import EngineConfig, SignatureConfig
from rmlint_spark.functions import text as TX
from rmlint_spark.operators import exact as EX
from rmlint_spark.sources.tables import documents_as_files, load_table

CFG = EngineConfig(sig=SignatureConfig(prefix_len=64))

# SQL fragment reproducing sources.tables.documents_as_files
FILES_CTE = """
files AS (
  SELECT source AS repo,
         printf('docs/d%02d/doc%d.txt', CAST(doc_id % 50 AS INT), doc_id) AS path,
         substr(sha256('c' || CAST(doc_id AS VARCHAR)), 1, 8) AS "commit",
         lang,
         text AS content
  FROM documents)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the exact-duplicate funnel (SURVEY.md §7.1) over the
    sf0.001 documents corpus, with a deterministic 10% duplicated
    slice planted so the smoke check observes real clusters."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    files = documents_as_files(docs)
    planted = (
        documents_as_files(docs.filter(F.pmod("doc_id", F.lit(10)) == 0))
        .withColumn("path", F.concat(F.lit("mirror/"), F.col("path")))
        .withColumn("repo", F.lit("mirror-repo"))
    )
    clusters = EX.exact_clusters(files.unionByName(planted), CFG)
    return clusters.orderBy("cluster_id", "rank")


# ---------------------------------------------------------------- queries

def q_size_groups(spark, sf_dir):
    # A1/R1: funnel gen-0 size grouping + qualification
    return (
        _docs(spark, sf_dir)
        .groupBy(F.length("text").alias("size"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )


def q_prefix_stage(spark, sf_dir):
    # R2: gen-1 prefix signature over gen-0 survivors
    d = _docs(spark, sf_dir).select("doc_id", F.length("text").alias("size"), "text")
    surv = d.groupBy("size").agg(F.count("*").alias("n")).filter(F.col("n") >= 2).select("size")
    staged = d.join(surv, "size", "left_semi")
    return (
        staged.select("size", F.sha2(F.substring("text", 1, 64), 256).alias("sig"))
        .groupBy("size", "sig")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )


def q_exact_clusters(spark, sf_dir):
    # the full funnel (R1→R2→sha256→byte-confirm→W1 ranking)
    clusters = EX.exact_clusters(documents_as_files(_docs(spark, sf_dir)), CFG)
    return clusters.select(
        "repo", "path", "commit", "size", "checksum", "cluster_id",
        "cluster_size", "rank", F.col("is_original").cast("int").alias("is_original"),
    )


def q_uniques(spark, sf_dir):
    # K5: files with no twin (anti-join complement)
    files = documents_as_files(_docs(spark, sf_dir))
    clusters = EX.exact_clusters(files, CFG)
    return EX.uniques(files, clusters, CFG)


def q_window_originals(spark, sf_dir):
    # W1: rank rows within a group, head = original
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))


def q_gap_sessions(spark, sf_dir):
    # W3: mtime-window gap split (sessionization), gap = 30 min
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap = ms - F.lag(ms).over(w)
    flagged = e.withColumn("new_s", F.when(gap > 1_800_000, 1).otherwise(0))
    sess = flagged.withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


def q_group_qualify(spark, sf_dir):
    # A4/J7: HAVING count>=2 AND semi-constraint (group must contain a
    # tagged member — --must-match-tagged analog)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.max((F.col("o_orderstatus") == "F").cast("int")).alias("has_f"),
        )
        .filter((F.col("n_orders") >= 2) & (F.col("has_f") == 1))
        .select("o_custkey", "n_orders")
    )


def q_xor_rollup(spark, sf_dir):
    # A5: commutative (order-insensitive) XOR-fold digest per group
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.expr("bit_xor(l_orderkey)").alias("xkey"), F.count("*").alias("n")
    )


def q_dir_rollup(spark, sf_dir):
    # A8: file-count rollup up every path prefix (treemerge counts,
    # lib/treemerge.c:136-187)
    files = documents_as_files(_docs(spark, sf_dir))
    parts = F.split("path", "/")
    exploded = files.select(
        parts.alias("parts"),
        F.explode(F.sequence(F.lit(1), F.size(parts) - 1)).alias("i"),
    )
    prefix = F.concat_ws("/", F.slice("parts", F.lit(1), F.col("i")))
    return exploded.select(prefix.alias("prefix")).groupBy("prefix").agg(F.count("*").alias("n_files"))


def q_pair_confirm(spark, sf_dir):
    # J6: bucketed self-join + byte-equality confirm
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars", "text")
    a, b_ = d.alias("a"), d.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.n_chars") == F.col("b.n_chars"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (F.col("a.text") == F.col("b.text")).cast("int").alias("same_text"),
        )
    )


def q_lint_classify(spark, sf_dir):
    # S2/F10: per-file lint typing and routing counts
    d = _docs(spark, sf_dir)
    lint = (
        F.when(F.length("text") == 0, F.lit("emptyfile"))
        .when(F.length("text") < 32, F.lit("shortfile"))
        .otherwise(F.lit("dupe_candidate"))
    )
    return d.select(lint.alias("lint_type")).groupBy("lint_type").agg(F.count("*").alias("n"))


def q_text_stats(spark, sf_dir):
    # token counting + punctuation/stopword quality counters
    d = _docs(spark, sf_dir)
    punct_cnt = F.length("text") - F.length(F.regexp_replace("text", r"[\.,;:!\?]", ""))
    stop_cnt = TX.sum_cols([TX.word_occurrences(F.col("text"), w) for w in TX.STOPWORDS])
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("token_cnt"),
        punct_cnt.cast("long").alias("punct_cnt"),
        stop_cnt.cast("long").alias("stop_cnt"),
    )


def q_lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", TX.lang_id(F.col("text")).alias("lang_guess"))


def q_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


def q_events_hourly(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "size_groups": q_size_groups,
        "prefix_stage": q_prefix_stage,
        "exact_clusters": q_exact_clusters,
        "uniques": q_uniques,
        "window_originals": q_window_originals,
        "gap_sessions": q_gap_sessions,
        "group_qualify": q_group_qualify,
        "xor_rollup": q_xor_rollup,
        "dir_rollup": q_dir_rollup,
        "pair_confirm": q_pair_confirm,
        "lint_classify": q_lint_classify,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "events_hourly": q_events_hourly,
        "topk_per_group": q_topk_per_group,
    }


def _occ_sql(expr: str, needle: str) -> str:
    n = len(needle)
    return f"CAST((length({expr}) - length(replace({expr}, '{needle}', ''))) / {n} AS BIGINT)"


def _word_sql(word: str) -> str:
    return _occ_sql("(' ' || text || ' ')", f" {word} ")


def _lang_score_sql(lang: str) -> str:
    from rmlint_spark.functions.text import LANG_MARKERS

    return " + ".join(_word_sql(w) for w in LANG_MARKERS[lang])


def oracle_sql() -> dict[str, str]:
    stop_cnt = " + ".join(_word_sql(w) for w in TX.STOPWORDS)
    s_en, s_es, s_de, s_fr = (_lang_score_sql(x) for x in ["en", "es", "de", "fr"])
    return {
        "size_groups": """
            SELECT length(text) AS size, count(*) AS n
            FROM documents GROUP BY 1 HAVING count(*) >= 2
        """,
        "prefix_stage": """
            WITH surv AS (
              SELECT length(text) AS size FROM documents
              GROUP BY 1 HAVING count(*) >= 2)
            SELECT length(text) AS size, sha256(substr(text, 1, 64)) AS sig, count(*) AS n
            FROM documents
            WHERE length(text) IN (SELECT size FROM surv)
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "exact_clusters": f"""
            WITH {FILES_CTE},
            nonempty AS (SELECT * FROM files WHERE length(content) >= 1),
            g AS (
              SELECT sha256(content) AS checksum, count(*) AS cluster_size
              FROM nonempty GROUP BY 1 HAVING count(*) >= 2)
            SELECT repo, path, "commit", length(content) AS size,
                   g.checksum, g.checksum AS cluster_id, g.cluster_size,
                   row_number() OVER (PARTITION BY g.checksum
                                      ORDER BY path, repo, commit) AS rank,
                   CASE WHEN row_number() OVER (PARTITION BY g.checksum
                                      ORDER BY path, repo, commit) = 1
                        THEN 1 ELSE 0 END AS is_original
            FROM nonempty JOIN g ON sha256(nonempty.content) = g.checksum
        """,
        "uniques": f"""
            WITH {FILES_CTE},
            nonempty AS (SELECT * FROM files WHERE length(content) >= 1),
            g AS (SELECT sha256(content) AS cs, count(*) AS c FROM nonempty GROUP BY 1)
            SELECT repo, path, "commit"
            FROM nonempty JOIN g ON sha256(nonempty.content) = g.cs
            WHERE g.c = 1
        """,
        "window_originals": """
            SELECT o_custkey, o_orderkey,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        """,
        "gap_sessions": """
            WITH flagged AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT user_id, event_id,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(event_id) AS first_event, max(event_id) AS last_event
            FROM sess GROUP BY 1, 2
        """,
        "group_qualify": """
            SELECT o_custkey, count(*) AS n_orders
            FROM orders GROUP BY 1
            HAVING count(*) >= 2
               AND max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = 1
        """,
        "xor_rollup": """
            SELECT l_suppkey, bit_xor(l_orderkey) AS xkey, count(*) AS n
            FROM lineitem GROUP BY 1
        """,
        "dir_rollup": f"""
            WITH {FILES_CTE},
            p AS (SELECT string_split(path, '/') AS parts FROM files)
            SELECT array_to_string(list_slice(parts, 1, i), '/') AS prefix,
                   count(*) AS n_files
            FROM p, UNNEST(generate_series(1, len(parts) - 1)) AS t(i)
            GROUP BY 1
        """,
        "pair_confirm": """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CASE WHEN a.text = b.text THEN 1 ELSE 0 END AS same_text
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
        """,
        "lint_classify": """
            SELECT CASE WHEN length(text) = 0 THEN 'emptyfile'
                        WHEN length(text) < 32 THEN 'shortfile'
                        ELSE 'dupe_candidate' END AS lint_type,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "text_stats": f"""
            SELECT doc_id,
                   CASE WHEN length(text) = 0 THEN 0
                        ELSE length(text) - length(replace(text, ' ', '')) + 1
                   END AS token_cnt,
                   CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS BIGINT) AS punct_cnt,
                   CAST({stop_cnt} AS BIGINT) AS stop_cnt
            FROM documents
        """,
        "lang_id": f"""
            SELECT doc_id,
                   CASE
                     WHEN ({s_en}) >= ({s_es}) AND ({s_en}) >= ({s_de})
                          AND ({s_en}) >= ({s_fr}) AND ({s_en}) > 0 THEN 'en'
                     WHEN ({s_es}) >= ({s_de}) AND ({s_es}) >= ({s_fr})
                          AND ({s_es}) > 0 THEN 'es'
                     WHEN ({s_de}) >= ({s_fr}) AND ({s_de}) > 0 THEN 'de'
                     WHEN ({s_fr}) > 0 THEN 'fr'
                     ELSE 'und'
                   END AS lang_guess
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id,
                   sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "events_hourly": """
            SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "topk_per_group": """
            SELECT * FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders) WHERE rk <= 3
        """,
    }
