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
