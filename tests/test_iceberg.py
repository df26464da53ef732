"""Marker-gated Iceberg integration (VERDICT r3 #8).

The production corpus is an Iceberg table (SURVEY §2/BASELINE input
hint); this image has no Iceberg runtime jar, so the integration test
SKIPS unless one is supplied via $RMLINT_SPARK_ICEBERG_JAR (or found in
the pyspark jars dir). What always runs: the honest-failure contract of
``read_files_table(fmt='iceberg')`` without the jar.

When the jar IS present the test asserts the layout parity bucketed.py
promises: a table partitioned by ``bucket(N, fid)`` plans its fid
equi-join with both sides arriving pre-distributed — the Iceberg twin
of the hash-partitioned directory stores (sources/bucketed.py) and the
catalog bucketBy tables (tests/test_bucketed.py).
"""

from __future__ import annotations

import glob
import os

import pytest

from rmlint_spark.sources.tables import read_files_table


def _iceberg_jar() -> str | None:
    env = os.environ.get("RMLINT_SPARK_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark

    hits = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar")
    )
    return hits[0] if hits else None


def test_iceberg_reader_fails_honestly_without_runtime(spark):
    if _iceberg_jar() is not None:
        pytest.skip("Iceberg runtime present; the honest-failure path does not apply")
    with pytest.raises(NotImplementedError, match="Iceberg runtime"):
        read_files_table(spark, "/tmp/nonexistent_iceberg_table", fmt="iceberg")


@pytest.mark.skipif(_iceberg_jar() is None, reason="no Iceberg runtime jar on this image")
def test_iceberg_bucket_transform_join_layout(tmp_path):
    """Runs only with the runtime jar: write a bucket(8, fid) table,
    join it with itself on fid, and assert the scan carries the bucket
    partition transform (the exchange-free layout bucketed.py's
    directory stores emulate locally)."""
    from pyspark.sql import SparkSession

    jar = _iceberg_jar()
    wh = str(tmp_path / "iceberg_wh")
    s = (
        SparkSession.builder.master("local[4]")
        .appName("rmlint_spark_iceberg_it")
        .config("spark.jars", jar)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.it.type", "hadoop")
        .config("spark.sql.catalog.it.warehouse", wh)
        .getOrCreate()
    )
    try:
        s.sql(
            "CREATE TABLE it.db.files (fid STRING, repo STRING, sig ARRAY<BIGINT>) "
            "USING iceberg PARTITIONED BY (bucket(8, fid))"
        )
        s.sql(
            "INSERT INTO it.db.files "
            "SELECT cast(id AS STRING), 'r', array(id) FROM range(1000)"
        )
        df = read_files_table(s, "it.db.files", fmt="iceberg")
        assert df.count() == 1000
        joined = df.alias("a").join(
            read_files_table(s, "it.db.files", fmt="iceberg").alias("b"), "fid"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bucket" in plan.lower()
    finally:
        s.stop()
