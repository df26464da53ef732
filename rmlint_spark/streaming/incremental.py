"""Incremental dedup over arriving file batches.

The reference is single-batch (SURVEY.md §2.9); its real-world
"streaming" analog is re-running over new commits with cached results
(replay S4 + xattr R4). This module is that analog done properly on
Structured Streaming: a ``readStream`` over the files location with
``foreachBatch`` folding each micro-batch into a persistent signature
store, so duplicate detection is incremental — new files are hashed
once and compared against the accumulated store, never recomputing
old signatures (exactly the funnel's "only hash what's new" economy).

For tests, parquet-source streams + ``processAllAvailable`` drive the
query synchronously (public Spark testing idiom).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rmlint_spark.operators.lint import KEY

FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


class IncrementalDedup:
    """foreachBatch sink: maintain a signature store and an exact-dup
    cluster table incrementally."""

    def __init__(self, store_dir: str):
        self.store_dir = store_dir
        self.sig_path = os.path.join(store_dir, "signatures")

    def signatures(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.sig_path)
        except Exception:
            return None

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        # narrow-dedup discipline (operators/exact.py): hash map-side,
        # dedup the projection — content never crosses the shuffle
        new_sigs = (
            batch.filter(F.length("content") > 0)
            .select(
                *KEY,
                F.length("content").alias("size"),
                F.sha2("content", 256).alias("checksum"),
            )
            .dropDuplicates(KEY)
        )
        existing = self.signatures(spark)
        if existing is not None:
            # R4: only rows not already in the store are appended
            new_sigs = new_sigs.join(existing.select(*KEY), KEY, "left_anti")
        new_sigs.write.mode("append").parquet(self.sig_path)

    def current_clusters(self, spark: SparkSession) -> DataFrame:
        sigs = self.signatures(spark)
        assert sigs is not None, "no batches processed yet"
        groups = (
            sigs.groupBy("size", "checksum")
            .agg(F.count("*").alias("cluster_size"))
            .filter(F.col("cluster_size") >= 2)
        )
        return sigs.join(groups, ["size", "checksum"]).withColumn(
            "cluster_id", F.col("checksum")
        )

    def start(self, spark: SparkSession, source_dir: str, checkpoint_dir: str):
        stream = (
            spark.readStream.schema(FILES_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(source_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


class IncrementalNearDup:
    """foreachBatch NEAR-dup: fold each micro-batch into persistent
    (signature, band-bucket, edge) stores.

    The batch pipeline's economics, made incremental:
    - node identity is the content sha (content-derived, so the same
      text arriving in any batch/partition maps to the same node and
      is signed exactly ONCE — the streaming form of representative
      bundling, operators/lsh.py);
    - each batch MinHashes only never-seen contents, bands them, and
      joins the new bands against the ACCUMULATED bucket store:
      candidate cost per batch is O(new x bucket-mates), never a
      recompute of history (new-old and new-new pairs found now;
      old-old pairs were found when they were new);
    - the accumulated bucket width cap is the same quadratic guard as
      the batch path (buckets past the cap stop producing pairs; the
      pairs they produced while under it remain valid);
    - verified edges append; clusters materialize on demand via the
      iterative CC over the edge store.
    """

    def __init__(self, store_dir: str, cfg=None):
        from rmlint_spark.config import DEFAULT

        self.cfg = cfg or DEFAULT
        self.store_dir = store_dir
        self.index_path = os.path.join(store_dir, "index")      # (sha, repo, path, commit)
        self.sig_path = os.path.join(store_dir, "neardup_sigs")  # (sha, sig)
        self.band_path = os.path.join(store_dir, "bands")        # (sha, band_id, band_hash)
        self.edge_path = os.path.join(store_dir, "edges")        # (sha_a, sha_b, est_jaccard)

    def _read(self, spark: SparkSession, path: str) -> DataFrame | None:
        try:
            return spark.read.parquet(path)
        except Exception:
            return None

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from rmlint_spark.functions.minhash import minhash_udf
        from rmlint_spark.operators.lsh import band_buckets

        spark = batch.sparkSession
        rows = (
            batch.filter(F.length("content") > 0)
            .select(*KEY, F.sha2("content", 256).alias("sha"), "content")
            .dropDuplicates(KEY)
        )
        new_index = rows.select("sha", *KEY)
        existing_index = self._read(spark, self.index_path)
        if existing_index is not None:
            new_index = new_index.join(existing_index.select(*KEY), KEY, "left_anti")
        new_index.write.mode("append").parquet(self.index_path)

        # sign ONLY never-seen contents (one row per new sha)
        new_contents = rows.dropDuplicates(["sha"])
        old_sigs = self._read(spark, self.sig_path)
        if old_sigs is not None:
            new_contents = new_contents.join(old_sigs.select("sha"), "sha", "left_anti")
        sig = minhash_udf(
            self.cfg.sig.shingle_k, self.cfg.sig.num_perm, self.cfg.sig.minhash_seed
        )
        # materialize BEFORE appending: new_sigs' plan anti-joins a scan
        # of sig_path, so appending first would make it re-evaluate to
        # empty (the scan re-lists the directory it just extended)
        new_sigs = new_contents.select(
            "sha", sig(F.col("content")).alias("sig")
        ).localCheckpoint(eager=True)
        new_sigs.write.mode("append").parquet(self.sig_path)

        new_bands = (
            band_buckets(new_sigs.withColumnRenamed("sha", "fid"), self.cfg)
            .withColumnRenamed("fid", "sha")
            .localCheckpoint(eager=True)
        )
        old_bands = self._read(spark, self.band_path)
        all_bands = (
            new_bands if old_bands is None else old_bands.unionByName(new_bands)
        )
        # accumulated-width quadratic guard (same cap as the batch path)
        over = (
            all_bands.groupBy("band_id", "band_hash")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") > self.cfg.max_bucket_width)
            .select("band_id", "band_hash")
        )
        probe = new_bands.join(over, ["band_id", "band_hash"], "left_anti")
        build = all_bands.join(over, ["band_id", "band_hash"], "left_anti")
        cand = (
            probe.select("band_id", "band_hash", F.col("sha").alias("sha_a"))
            .join(
                build.select("band_id", "band_hash", F.col("sha").alias("sha_b")),
                ["band_id", "band_hash"],
            )
            .filter(F.col("sha_a") != F.col("sha_b"))
            .select(
                F.least("sha_a", "sha_b").alias("sha_a"),
                F.greatest("sha_a", "sha_b").alias("sha_b"),
            )
            .dropDuplicates(["sha_a", "sha_b"])
        )
        old_edges = self._read(spark, self.edge_path)
        if old_edges is not None:
            cand = cand.join(
                old_edges.select("sha_a", "sha_b"), ["sha_a", "sha_b"], "left_anti"
            )
        # post-append read: every sha's signature exactly once
        sigs_all = self._read(spark, self.sig_path)
        from rmlint_spark.functions.minhash import estimated_jaccard

        verified = (
            cand.join(
                sigs_all.select(F.col("sha").alias("sha_a"), F.col("sig").alias("sig_a")),
                "sha_a",
            )
            .join(
                sigs_all.select(F.col("sha").alias("sha_b"), F.col("sig").alias("sig_b")),
                "sha_b",
            )
            .withColumn("est_jaccard", estimated_jaccard(F.col("sig_a"), F.col("sig_b")))
            .filter(F.col("est_jaccard") >= self.cfg.jaccard_threshold)
            .select("sha_a", "sha_b", "est_jaccard")
        )
        verified.write.mode("append").parquet(self.edge_path)
        new_bands.write.mode("append").parquet(self.band_path)

    def current_clusters(self, spark: SparkSession) -> DataFrame:
        """(repo, path, commit, cluster_id, cluster_size, rank,
        is_original) — near-dup clusters over everything seen so far
        (exact twins share a sha node, so they always co-cluster)."""
        from rmlint_spark.operators.connected_components import connected_components
        from rmlint_spark.operators.rank import tag_originals

        index = self._read(spark, self.index_path)
        assert index is not None, "no batches processed yet"
        edges = self._read(spark, self.edge_path)
        if edges is not None and not edges.isEmpty():
            comp = connected_components(edges, src="sha_a", dst="sha_b").select(
                F.col("fid").alias("sha"), "component"
            )
        else:
            comp = spark.createDataFrame(
                [], "sha string, component string"
            )
        sha_counts = index.groupBy("sha").agg(F.count("*").alias("n_rows"))
        labeled = sha_counts.join(comp, "sha", "left").withColumn(
            "cluster_id",
            F.coalesce(
                "component", F.when(F.col("n_rows") >= 2, F.col("sha"))
            ),
        ).filter(F.col("cluster_id").isNotNull()).select("sha", "cluster_id")
        members = index.join(labeled, "sha").withColumn(
            "cluster_size", F.count("*").over(W.partitionBy("cluster_id"))
        )
        return tag_originals(members, cluster_col="cluster_id").select(
            "repo", "path", "commit", "cluster_id", "cluster_size", "rank", "is_original"
        )

    def compact(self, spark: SparkSession, target_partitions: int = 8) -> dict:
        """Rewrite each store into ``target_partitions`` files.

        Every micro-batch appends a few small parquet files per store;
        after many batches the accumulated-store scans (the per-batch
        band join and CC reads) pay per-file open cost. Run this
        OFFLINE (between stream runs — the swap is not concurrent-safe
        with an active writer, exactly like any compaction job).
        Returns {store: files_before} for observability."""
        import shutil

        report = {}
        for path in (self.index_path, self.sig_path, self.band_path, self.edge_path):
            if not os.path.exists(path):
                continue
            n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
            tmp = path + ".compact_tmp"
            spark.read.parquet(path).coalesce(target_partitions).write.mode(
                "overwrite"
            ).parquet(tmp)
            shutil.rmtree(path)
            os.replace(tmp, path)
            report[os.path.basename(path)] = n_before
        return report

    def start(self, spark: SparkSession, source_dir: str, checkpoint_dir: str):
        stream = (
            spark.readStream.schema(FILES_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(source_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    the Structured Streaming shape for late-data-tolerant rollups
    (event-time window + watermark bounds state; the batch twin is
    q_events_hourly). Feed any readStream with (ts, event_type, value)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def start_windowed_counts(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
):
    """readStream(parquet events) -> watermarked window agg ->
    append-mode parquet sink (windows finalize when the watermark
    passes; append mode emits each window exactly once)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    agg = windowed_event_counts(stream)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
