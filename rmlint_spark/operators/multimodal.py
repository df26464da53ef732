"""Multimodal (binary) column plumbing.

Training-data pipelines carry image/audio/video as opaque ``binary``
columns with typed metadata. The image/audio codec libraries are NOT
in this container, so the decode kernels are stubbed — but everything
Spark-side is real and tested: the asset schema, Arrow batch shapes,
``mapInPandas`` signatures, partitioning, and the deterministic fake
feature extractor (hash-seeded vector) standing in for a model.

Swap ``decode_image``'s body for PIL/libvips and ``_fake_features``
for a real encoder; no Spark-side code changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16
FEATURES_SCHEMA = (
    "asset_id long, kind string, n_bytes long, payload_sha string, "
    f"features array<float>"
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode needs an image codec — not in this container."""
    raise NotImplementedError("image codecs unavailable; use fake_features path")


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in encoder: sha256-seeded unit vector.
    Same payload -> same vector, any partitioning."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:4], "big")
    v = np.random.RandomState(seed).standard_normal(FEATURE_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction with real batch plumbing:
    per-batch vectorized metadata + per-asset encoder call (the
    encoder is the stub; batching/schema/shuffle shape are real)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            feats = [list(map(float, _fake_features(p))) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "payload_sha": [hashlib.sha256(p or b"").hexdigest() for p in payloads],
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)


def exact_asset_dupes(assets: DataFrame) -> DataFrame:
    """Exact binary dedup: the funnel's gen-0+final collapsed — size
    bucket then payload sha (payloads are opaque; no prefix stage
    without byte-range pushdown into the blob store)."""
    keyed = assets.select(
        "asset_id",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    )
    groups = (
        keyed.groupBy("n_bytes", "payload_sha")
        .agg(F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
    )
    return keyed.join(groups, ["n_bytes", "payload_sha"]).select(
        "asset_id", "payload_sha", "cluster_size"
    )


RESIZED_SCHEMA = "asset_id long, width int, height int, thumb binary"


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: mapInPandas over image rows, one decoded-and-
    resized thumbnail per asset. The resample kernel is the stub (a
    deterministic payload-derived byte block of exactly the target
    size); the Spark-side shape — image-only filter pushed to the
    scan, Arrow batch in, typed binary thumb out — is real."""
    n_bytes = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"].tolist():
                digest = hashlib.sha256(p or b"").digest()
                reps = -(-n_bytes // len(digest))  # ceil
                thumbs.append((digest * reps)[:n_bytes])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "thumb": thumbs,
                }
            )

    return assets.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "asset_id long, frame_idx int, t_ms long, frame_sha string"


def sample_frames(assets: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing: each video row explodes into one row
    per sampled timestamp (0, every_ms, ... < duration_ms). The frame
    decode is the stub (frame identity = sha of payload+timestamp);
    the batch-explode shape and schema are real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "t_ms": [], "frame_sha": []}
            for aid, payload, dur in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist(), pdf["duration_ms"].tolist()
            ):
                n = 0 if dur is None or pd.isna(dur) else int(dur) // every_ms
                for i in range(n):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["t_ms"].append(i * every_ms)
                    rows["frame_sha"].append(
                        hashlib.sha256((payload or b"") + str(i * every_ms).encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return assets.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAMES_SCHEMA)


def synthetic_assets(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (payload = seeded sha256 bytes —
    DuckDB-reproducible, which is what makes `multimodal_features`
    oracle-checkable; ~10% planted exact duplicates). Videos carry a
    deterministic duration for the frame-sampling op."""
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("id", F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        # duplicate payload group for id % 10 == 0: share seed id=0
        F.when(F.pmod("id", F.lit(10)) == 0, F.lit(0)).otherwise(F.col("id")).alias("pseed"),
    )
    # payload = UTF-8 bytes of a seeded sha256 hex string: opaque binary
    # to the engine, but reproducible as a VARCHAR hash in DuckDB (the
    # oracle hashes the same 64 ASCII bytes)
    payload = F.encode(
        F.sha2(F.concat(F.lit(f"payload-{seed}-"), F.col("pseed").cast("string")), 256), "UTF-8"
    )
    duration = F.when(
        F.pmod("asset_id", F.lit(3)) == 2,
        (F.lit(1000) + F.pmod("asset_id", F.lit(7)) * 500).cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    return base.select(
        "asset_id",
        "kind",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        duration.alias("duration_ms"),
    )
