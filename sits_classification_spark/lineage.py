"""Per-partition lineage + checkpoint/resume protocol.

Spark form of the reference's skip-if-exists resume
(``pytorch/predict.py:106-109``: a tile whose output folder already exists is
skipped) generalized to partition-granular lineage records:

    (tier, source, salt, input_snapshot_id, rows_out, checksum, committed_at)

A tier rebuild left-anti-joins its input against the committed keys for the
same (tier, input_snapshot_id) and recomputes only missing partitions.
Checksums are order-independent (bit_xor of xxhash64 over the rows), so a
resumed build is verifiable against a from-scratch build.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

LINEAGE_SCHEMA = (
    "tier string, source string, salt int, input_snapshot_id string, "
    "rows_out long, checksum long, committed_at double"
)


def lineage_rows(
    tier_df: DataFrame, tier: str, snapshot_id: str, hash_cols: list[str]
) -> DataFrame:
    """Aggregate one lineage row per (source, salt) partition of a tier."""
    return tier_df.groupBy("source", "salt").agg(
        F.count(F.lit(1)).alias("rows_out"),
        F.expr(f"bit_xor(xxhash64({', '.join(hash_cols)}))").alias("checksum"),
    ).select(
        F.lit(tier).alias("tier"),
        "source",
        "salt",
        F.lit(snapshot_id).alias("input_snapshot_id"),
        "rows_out",
        "checksum",
        F.lit(time.time()).alias("committed_at"),
    )


def read_lineage(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    if not os.path.isdir(lineage_path):
        return None
    try:
        return spark.read.parquet(lineage_path)
    except AnalysisException:
        # an existing-but-empty dir (no committed files yet) has no schema;
        # anything else (corrupt footer, permissions) must SURFACE — a
        # swallowed error would silently disable resume and recompute
        # everything next to the damaged lineage
        return None


def committed_keys(
    spark: SparkSession, lineage_path: str, tier: str, snapshot_id: str
) -> DataFrame | None:
    """Distinct (source, salt) already committed for tier@snapshot."""
    lin = read_lineage(spark, lineage_path)
    if lin is None:
        return None
    keys = (
        lin.filter(
            (F.col("tier") == tier) & (F.col("input_snapshot_id") == snapshot_id)
        )
        .select("source", "salt")
        .distinct()
    )
    return keys


def filter_uncommitted(
    df: DataFrame, keys: DataFrame | None
) -> DataFrame:
    """Drop partitions already committed (broadcast anti-join — the key set
    is tiny: n_sources x salt_buckets)."""
    if keys is None:
        return df
    return df.join(F.broadcast(keys), on=["source", "salt"], how="left_anti")


def append_lineage(rows: DataFrame, lineage_path: str) -> None:
    rows.write.mode("append").parquet(lineage_path)
