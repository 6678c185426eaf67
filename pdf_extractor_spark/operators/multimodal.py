"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery here is REAL and tested — schemas, Arrow batch
shapes, mapInPandas signatures, partitioning — while the codec step is
stubbed (this container has no image/audio libraries): ``decode_image``
raises NotImplementedError unless ``fake=True``, which substitutes a
deterministic md5-derived feature vector so the distributed plumbing is
exercised end-to-end. Swap ``_decode_image_real`` for a PIL/libvips call on
a real cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", StringType()),  # set by caller as binary
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_DIM = 16

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("features", ArrayType(FloatType())),
        StructField("decode_ok", BooleanType()),
        StructField("error", StringType()),
    ]
)


def _decode_image_real(payload: bytes):  # pragma: no cover - needs codec libs
    """STUB: real decoder requires an image library not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips; run with fake=True in this "
        "environment or swap in a real decoder on a cluster with codecs"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in 'embedding': md5-expanded to FEATURE_DIM floats
    in [0,1). Purely a plumbing exerciser — NOT a real feature extractor."""
    out: list[float] = []
    counter = 0
    while len(out) < FEATURE_DIM:
        h = hashlib.md5(payload + counter.to_bytes(4, "big")).digest()
        for i in range(0, 16, 4):
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
            if len(out) == FEATURE_DIM:
                break
        counter += 1
    return out


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched, no per-row
    Python on the Spark side). At scale, repartition upstream so each task
    holds a bounded number of payloads (payloads can be MBs each)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    feats = (
                        _fake_features(payload) if fake else _decode_image_real(payload)
                    )
                    rows.append(
                        (
                            int(media_id),
                            len(payload),
                            hashlib.md5(payload).hexdigest(),
                            feats,
                            True,
                            None,
                        )
                    )
                except Exception as exc:
                    rows.append(
                        (int(media_id), len(payload), hashlib.md5(payload).hexdigest(), [], False, f"{type(exc).__name__}: {exc}")
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "content_hash", "features", "decode_ok", "error"],
            )

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("duration_est_ms", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("decode_ok", BooleanType()),
        StructField("error", StringType()),
    ]
)

_AUDIO_BYTES_PER_SEC = 16000  # assumed mono 16 kB/s for the duration estimate


def _decode_audio_real(payload: bytes):  # pragma: no cover - needs codec libs
    """STUB: real decoder requires an audio library not present here."""
    raise NotImplementedError(
        "audio decoding requires soundfile/ffmpeg; run with fake=True in "
        "this environment or swap in a real decoder on a cluster with codecs"
    )


def extract_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Audio half of the multimodal triad: same mapInPandas plumbing as
    ``extract_image_features`` with audio metadata (estimated duration at
    an assumed byte rate) and a salt-distinguished fake feature family
    ('audio:' prefix) so identical payloads yield different audio vs image
    features. The codec itself is an honest stub; everything Spark-side
    (schema, batch shape, partitioning, determinism) is real and
    oracle-checked."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    feats = (
                        _fake_features(b"audio:" + payload)
                        if fake
                        else _decode_audio_real(payload)
                    )
                    rows.append(
                        (
                            int(media_id),
                            len(payload),
                            hashlib.md5(payload).hexdigest(),
                            len(payload) * 1000 // _AUDIO_BYTES_PER_SEC,
                            feats,
                            True,
                            None,
                        )
                    )
                except Exception as exc:
                    rows.append(
                        (
                            int(media_id),
                            len(payload),
                            hashlib.md5(payload).hexdigest(),
                            0,
                            [],
                            False,
                            f"{type(exc).__name__}: {exc}",
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "content_hash", "duration_est_ms",
                    "features", "decode_ok", "error",
                ],
            )

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Video frame-sampling PLAN: one row per sampled frame timestamp.

    The expansion is pure Spark (sequence + explode, no UDF); actual frame
    decode would plug into extract_image_features per emitted row."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col(duration_col), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
