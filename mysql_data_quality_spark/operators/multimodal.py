"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBS (image/audio libraries are not in
this container — see ``DecodeUnavailable``); everything Spark-side is real
and tested: schemas, batch iteration, partition sizing, deterministic fake
feature extraction so downstream operators (dedup on frame hashes,
similarity on features) can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode paths: codec libraries are not available in
    this environment.  The deterministic fake path is the testable stand-in."""


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def real_decode(payload: bytes, mime: str):  # pragma: no cover — env-gated
    """Where PIL/ffmpeg decode would go.  Gated import per build rules."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise DecodeUnavailable(
            "image/audio codecs not installed in this environment"
        ) from e
    raise DecodeUnavailable("decode wiring reserved for codec-enabled builds")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of sha256 scaled to [0, 1)."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 256.0 for i in range(dim)]


def extract_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas over media batches -> per-item feature rows.

    The Arrow batch shape is the real contract being tested: binary columns
    arrive as bytes objects, output must match FEATURE_SCHEMA exactly, and
    partition boundaries must not affect results (pure per-row function).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "payload_bytes": payloads.map(
                        lambda b: len(b or b"")
                    ).astype("int64"),
                    "feature": payloads.map(
                        lambda b: _fake_feature(b, feature_dim)
                    ),
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode itself is stubbed).  Shows the explode-based fan-out shape:
    partitions scale with frames, not videos — the thing that matters when
    one 10-hour video would otherwise pin a task."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast(
        "long"
    )
    return (
        df.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.when(
                    n_frames > 0,
                    F.sequence(
                        F.lit(0).cast("long"),
                        (n_frames - 1) * every_ms,
                        F.lit(every_ms).cast("long"),
                    ),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("resized_sha256", T.StringType()),
        T.StructField("resized_bytes", T.LongType()),
    ]
)


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Image resize stage: mapInPandas over image rows.

    The pixel kernel is stubbed like :func:`real_decode` (no codec libs in
    this environment); the deterministic stand-in derives the "resized"
    payload from sha256(payload || WxH) so the Spark-side contract — batch
    shape, schema, partition invariance, per-(payload, dims) determinism —
    is fully real and testable.  Swapping in PIL's ``Image.resize`` changes
    only the bytes produced, not the plan."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"|{target_w}x{target_h}".encode()
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if not len(pdf):
                continue
            digests = pdf["payload"].map(
                lambda b: hashlib.sha256((b or b"") + tag).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized_sha256": digests,
                    # fake payload size: 3 bytes/pixel (the real kernel
                    # would return the actual encoded bytes)
                    "resized_bytes": pd.Series(
                        [target_w * target_h * 3] * len(pdf),
                        index=pdf.index,
                        dtype="int64",
                    ),
                }
            )

    return df.mapInPandas(fn, RESIZED_SCHEMA)
