"""Multimodal binary-column plumbing tests (decode kernels stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rmlint_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    exact_asset_dupes,
    extract_features,
    synthetic_assets,
)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_feature_extraction_shapes_and_determinism(spark):
    assets = synthetic_assets(spark, n=60)
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    # determinism across partitioning
    rows2 = extract_features(assets.repartition(7)).collect()
    m1 = {r["asset_id"]: r["features"] for r in rows}
    m2 = {r["asset_id"]: r["features"] for r in rows2}
    assert m1 == m2
    # identical payloads -> identical features
    by_sha = {}
    for r in rows:
        by_sha.setdefault(r["payload_sha"], set()).add(tuple(r["features"]))
    assert all(len(v) == 1 for v in by_sha.values())


def test_exact_asset_dupes(spark):
    assets = synthetic_assets(spark, n=60)
    dupes = exact_asset_dupes(assets)
    rows = dupes.collect()
    # ids 0,10,20,30,40,50 share a payload
    dup_ids = {r["asset_id"] for r in rows}
    assert dup_ids == {0, 10, 20, 30, 40, 50}
    assert all(r["cluster_size"] == 6 for r in rows)
