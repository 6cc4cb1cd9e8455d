"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns beside typed
metadata; the Spark-side plumbing here — schema, partition sizing, Arrow
batch shape, mapInPandas signatures — is real and tested. The actual codec
calls (PIL/ffmpeg/librosa) are NOT available in this environment, so the
decode step is stubbed: ``decoder=None`` raises NotImplementedError, and a
deterministic fake decoder exercises the full pipeline in tests.

Scale notes: media rows are large and variable — the batcher caps Arrow
batch BYTES (not rows) so executor memory stays bounded; feature extraction
emits fixed-size vectors so downstream tables are columnar-friendly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),     # image/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    ]
)

FEATURE_DIM = 16


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real media decoder: derives a
    FEATURE_DIM float vector from a sha256 of the payload. Replace with a
    real decode+embed (PIL/torchvision/librosa) where those libs exist."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw / np.float64(2**32)).astype(np.float64)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """The production decode hook. Media libraries are not installed in
    this environment."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg/librosa — not available here; "
        "pass decoder=fake_decode for pipeline tests"
    )


def _bounded_batches(
    it: Iterator[pd.DataFrame], max_bytes: int
) -> Iterator[pd.DataFrame]:
    """Re-chunk incoming Arrow batches so each processed chunk holds at most
    max_bytes of payload (media rows are big; row-count batching is wrong)."""
    for pdf in it:
        if not len(pdf):
            continue
        sizes = pdf["n_bytes"].to_numpy()
        cum = np.cumsum(sizes)
        start = 0
        while start < len(pdf):
            base = cum[start - 1] if start else 0
            end = int(np.searchsorted(cum, base + max_bytes, side="right"))
            end = max(end, start + 1)
            yield pdf.iloc[start:end]
            start = end


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] | None = None,
    max_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """media table -> (media_id, kind, feature array<double>[FEATURE_DIM]).

    mapInPandas with byte-bounded chunks; decoder runs per row (media codecs
    are per-item), everything around it is Arrow-batched.
    """
    dec = decoder or real_decode
    schema = "media_id string, kind string, feature array<double>"

    def run(batches):
        for chunk in _bounded_batches(batches, max_batch_bytes):
            feats = [dec(bytes(p), k) for p, k in zip(chunk["payload"], chunk["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": chunk["media_id"],
                    "kind": chunk["kind"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload", "n_bytes").mapInPandas(
        run, schema=schema
    )


def byte_stats(
    media: DataFrame, max_batch_bytes: int = 64 << 20
) -> DataFrame:
    """Oracle-checkable probe of the multimodal Arrow path: the SAME
    byte-bounded mapInPandas pipeline as extract_features, but with a
    "decoder" whose output is pure byte arithmetic (length, head/tail
    byte, byte sum) — deterministic and SQL-reproducible, so a DuckDB
    oracle can verify the batching/re-chunking plumbing delivers
    exactly-once, batch-boundary-independent per-row results (a fake
    random decoder can only be pytest-checked; this one closes the
    driver-oracle gap for the media path)."""
    schema = (
        "media_id string, kind string, n_bytes long, head_byte long, "
        "tail_byte long, byte_sum long"
    )

    def run(batches):
        for chunk in _bounded_batches(batches, max_batch_bytes):
            ps = [bytes(p) for p in chunk["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": chunk["media_id"],
                    "kind": chunk["kind"],
                    "n_bytes": [len(p) for p in ps],
                    "head_byte": [p[0] if p else None for p in ps],
                    "tail_byte": [p[-1] if p else None for p in ps],
                    "byte_sum": [
                        int(np.frombuffer(p, dtype=np.uint8).sum()) for p in ps
                    ],
                }
            )

    return media.select("media_id", "kind", "payload", "n_bytes").mapInPandas(
        run, schema=schema
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: explode each video row into the frame
    timestamps a decoder would extract (the Spark-side half of frame
    sampling; the pixel decode itself is the stubbed step)."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            # zero/negative durations have no frames; sequence(0, -1) throws
            F.when(
                F.col("duration_ms") > 0,
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("frame_ms"),
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                f"m{i:06d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                len(payload),
                64 if kind != "audio" else None,
                64 if kind != "audio" else None,
                3000 + 17 * i if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
