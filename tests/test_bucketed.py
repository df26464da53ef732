"""Bucketed layout: co-located joins must be exchange-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from rmlint_spark.sources.bucketed import (
    colocated_join,
    n_exchanges_in_plan,
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    sigs = spark.range(5000).select(
        F.concat(F.lit("f"), F.col("id")).alias("fid"),
        (F.col("id") % 97).alias("sig_slot"),
    )
    edges = spark.range(2000).select(
        F.concat(F.lit("f"), F.col("id")).alias("fid"),
        F.concat(F.lit("f"), F.col("id") + 1).alias("fid_b"),
    )
    write_bucketed(sigs, "t_sigs", "fid", n_buckets=8, path=str(tmp_path / "sigs"))
    write_bucketed(edges, "t_edges", "fid", n_buckets=8, path=str(tmp_path / "edges"))
    # force shuffle-based joins: at this toy size AQE would broadcast
    # both variants, which proves nothing about the layout
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "t_sigs", "t_edges", "fid")
        assert joined.count() == 2000
        # the point of the layout: NO shuffle on either join side
        assert n_exchanges_in_plan(joined) == 0
        # contrast: the same join from raw (bucket-less) parquet shuffles
        raw = spark.read.parquet(str(tmp_path / "sigs")).join(
            spark.read.parquet(str(tmp_path / "edges")), "fid"
        )
        assert raw.count() == 2000
        assert n_exchanges_in_plan(raw) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_sigs")
        spark.sql("DROP TABLE IF EXISTS t_edges")


def test_bucketed_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.range(1000).select(
        F.concat(F.lit("k"), F.col("id")).alias("fid"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_rt", "fid", n_buckets=4, path=str(tmp_path / "rt"))
    try:
        back = read_bucketed(spark, "t_rt")
        assert back.count() == 1000
        assert back.agg(F.sum("v")).collect()[0][0] == 499500
    finally:
        spark.sql("DROP TABLE IF EXISTS t_rt")
