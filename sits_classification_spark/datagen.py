"""Deterministic synthetic `sequences` table generator.

Input table per the engine contract: ``(doc_id string, tokens array<int32>,
n_tok int32, source string)`` — one row per pre-tokenized sequence. The shape
mirrors the reference's per-pixel sequence records (ragged ~20-110 obs,
average ~38 like ``pytorch/example/_SITSrefdata/sepfiles/test/csv/315.csv``),
with the nodata sentinel -9999 (``force/skel/SAMPLE.prm:105-107``,
``utils/class_run.py:140``) marking cloud gaps, and a zipf-skewed ``source``
column to exercise salted repartitioning.

Generation is seed-free-deterministic (splitmix64 on the doc index), so the
Spark-distributed generator and the pandas oracle produce bit-identical
tables at any scale without coordinating RNG state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NODATA = -9999

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), True), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 hash."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def doc_fields(i: int) -> tuple[str, np.ndarray, int, str]:
    """All columns for doc index i. Pure function of i."""
    h = _mix(np.uint64(i))
    n = 20 + int(h % np.uint64(90))
    k = np.arange(n, dtype=np.uint64)
    key = np.uint64(i) * np.uint64(1_000_003) + k
    base = np.round(1000.0 * np.sin(2.0 * np.pi * k.astype(np.float64) / 36.5))
    noise = (_mix(key) % np.uint64(200)).astype(np.int64)
    gaps = (_mix(key ^ np.uint64(0xABCDEF)) % np.uint64(10)) == 0
    tokens = np.where(gaps, NODATA, base.astype(np.int64) + noise).astype(np.int32)
    s = int(_mix(np.uint64(i) ^ np.uint64(0x5EED)) % np.uint64(100))
    source = "source0" if s < 50 else f"source{1 + s % 9}"
    return f"doc{i:08d}", tokens, n, source


def generate_pandas(n_docs: int, start: int = 0) -> pd.DataFrame:
    """Driver-side/oracle generator — small scales only."""
    rows = [doc_fields(i) for i in range(start, start + n_docs)]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": [r[1] for r in rows],
            "n_tok": np.array([r[2] for r in rows], dtype=np.int32),
            "source": [r[3] for r in rows],
        }
    )


def generate_spark(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed generator: spark.range -> mapInPandas, no driver collect.

    Scales to any n_docs — each Arrow batch is generated independently from
    the doc index, the exact pattern a 1000-executor cluster needs (no
    broadcast RNG state, no driver bottleneck).
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rows = [doc_fields(int(i)) for i in idx]
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "tokens": [r[1] for r in rows],
                    "n_tok": np.array([r[2] for r in rows], dtype=np.int32),
                    "source": [r[3] for r in rows],
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=SEQUENCES_SCHEMA)
    )


def write_sequences(spark: SparkSession, path: str, n_docs: int) -> None:
    generate_spark(spark, n_docs).write.mode("overwrite").parquet(path)
