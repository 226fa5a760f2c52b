"""Multimodal columns: binary media payloads with typed metadata.

Images/audio/video travel as opaque ``binary`` columns + a metadata
struct; decode/resize/frame-sample run as Arrow-batched ``mapInPandas``
transforms. The decode kernels themselves are STUBBED (no image/audio
libraries in this container — clearly marked below); the Spark-side
plumbing — schema, batch shape, partition sizing, UDF signature — is real
and tested, so swapping in PIL/ffmpeg later touches one function body.

Scale notes: media rows are fat (MBs); ``repartition`` by byte budget
before mapInPandas so one Arrow batch never exceeds executor memory
(maxRecordsPerBatch alone is insufficient for variable-size blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """DETERMINISTIC FAKE decode: byte-histogram moments as the 'feature'.

    A real deployment replaces this body with PIL/torchvision/ffmpeg
    decoding (NotImplementedError-free because the fake is deterministic
    and cheap, which tests and benchmarks need). Everything around it —
    batching, schema, partitioning — is the production code path.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.histogram(arr, bins=dim, range=(0, 256))[0].astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def extract_media_features(media: DataFrame, dim: int = 8, target_rows_per_batch: int = 256) -> DataFrame:
    """media(MEDIA_SCHEMA) → FEATURE_SCHEMA via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — Spark plumbing real, kernel NOT IMPLEMENTED (no
    imaging library in this container). Raises at evaluation time with a
    clear message; the plan/schema contract is exercised by tests via
    ``df.schema`` without collecting."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "swap _fake body for real kernel on a full cluster image"
        )
        yield  # pragma: no cover

    return media.mapInPandas(run, MEDIA_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = [
        (
            i,
            kinds[i % 3],
            bytes(rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8)),
            {"w": str(int(rng.integers(16, 1024))), "codec": "fake"},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
