"""Multimodal (image/audio/video) column plumbing.

Not in the reference (text/JSON only). Design: media payloads are
opaque `binary` columns travelling next to typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` operators so the Python media libraries see whole
columnar batches, never row-at-a-time serde.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this
environment, so the decode kernels are deterministic fakes behind
`_decode_image_bytes` / `_decode_audio_bytes` — clearly marked; swap
the kernel, keep the plumbing. Everything Spark-side (schemas, batch
iteration, partitioning, column pruning before the UDF) is real and
tested.

Scale notes: media rows are fat — the operators force a narrow
projection before entering Python (only id + payload cross Arrow),
and `spark.sql.files.maxPartitionBytes` should be lowered (e.g. 32m)
when payloads average >1 MB so one task doesn't hold hundreds of
decoded frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _decode_image_bytes(payload: bytes) -> tuple[int, int, float]:
    """STUB — deterministic fake decode (no PIL in this container).

    Real kernel: `img = PIL.Image.open(io.BytesIO(payload))` →
    (img.width, img.height, luma). The fake derives stable pseudo
    dimensions from the payload so tests pin the plumbing.
    """
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n // 7) % 512)
    mean_luma = float((n * 37) % 256) / 255.0 if n else 0.0
    return width, height, mean_luma


def _decode_audio_bytes(payload: bytes) -> tuple[int, int, float]:
    """STUB — deterministic fake decode (no soundfile/ffmpeg here)."""
    n = len(payload)
    sample_rate = 16000
    n_samples = n // 2  # pretend 16-bit PCM
    rms = float((n * 17) % 1000) / 1000.0 if n else 0.0
    return sample_rate, n_samples, rms


def image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode image payloads to (doc_id, n_bytes, width, height,
    mean_luma) via Arrow-batched mapInPandas."""
    narrow = df.select(id_col, payload_col)  # prune before Python

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (
                    int(i),
                    len(p) if p is not None else 0,
                    *_decode_image_bytes(bytes(p) if p is not None else b""),
                )
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                feats, columns=["doc_id", "n_bytes", "width", "height", "mean_luma"]
            )

    return narrow.mapInPandas(op, IMAGE_FEATURES_SCHEMA)


def audio_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode audio payloads to (doc_id, n_bytes, sample_rate,
    n_samples, rms)."""
    narrow = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (
                    int(i),
                    len(p) if p is not None else 0,
                    *_decode_audio_bytes(bytes(p) if p is not None else b""),
                )
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                feats,
                columns=["doc_id", "n_bytes", "sample_rate", "n_samples", "rms"],
            )

    return narrow.mapInPandas(op, AUDIO_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 1024,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling stand-in: emit one row per sampled offset
    (doc_id, frame_idx, frame_bytes). Real kernel would seek keyframes
    with PyAV; the fake slices fixed strides so downstream batch
    shapes (one media row fanning out to many frame rows) are real."""
    narrow = df.select(id_col, payload_col)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(p) if p is not None else b""
                for k in range(0, max(len(payload), 1), every_n_bytes):
                    rows.append((int(i), k // every_n_bytes, payload[k : k + 64]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return narrow.mapInPandas(op, schema)
