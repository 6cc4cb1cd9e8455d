"""Decode stage: token arrays -> long-form observation rows.

Reference semantics reproduced here:
- token position k maps to day ``epoch + k*cadence`` — integer days since
  1970-01-01 exactly as ``force/skel/udf_pixel.py:6-8``;
- nodata sentinel -9999 -> NULL (``utils/class_run.py:140``,
  ``force/skel/udf_block.py:31-35``)  [F5];
- drop sequences with zero valid obs (``utils/class_run.py:150-152``) [F6];
- drop singleton sequences (``utils/class_run.py:154-156``) [F7];
- duplicate-day dedup keep-first (``pytorch/predict.py:400-413``) [W7/J6].

All pure Column expressions — stays in whole-stage codegen; Catalyst prunes
`tokens` down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sits_classification_spark.config import DEFAULT_CONFIG, EngineConfig


def decode_sequences(df: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """tokens array -> (doc_id, source, pos, day, value) with NULL gaps."""
    long = df.select(
        "doc_id",
        "source",
        F.posexplode("tokens").alias("pos", "raw_value"),
    )
    return long.select(
        "doc_id",
        "source",
        "pos",
        (F.lit(cfg.epoch_day) + F.col("pos") * F.lit(cfg.cadence_days)).alias("day"),
        F.when(F.col("raw_value") == cfg.nodata, F.lit(None))
        .otherwise(F.col("raw_value"))
        .cast("int")
        .alias("value"),
    )


def drop_empty_and_singleton(long: DataFrame, min_valid: int = 2) -> DataFrame:
    """F6+F7: keep docs with >= min_valid non-null observations.

    Implemented as a windowed count (one shuffle on doc_id that the
    downstream grouped ops reuse) rather than a groupBy+join.
    """
    w = Window.partitionBy("doc_id")
    return (
        long.withColumn("_n_valid", F.count("value").over(w))
        .filter(F.col("_n_valid") >= min_valid)
        .drop("_n_valid")
    )


def dedup_first_per_day(long: DataFrame, order_col: str = "pos") -> DataFrame:
    """W7/J6: keep the first observation per (doc_id, day).

    ``np.unique(dates, return_index=True)`` at ``pytorch/predict.py:400-413``
    keeps the first occurrence in date order; row_number over (doc, day)
    ordered by arrival reproduces that exactly.
    """
    w = Window.partitionBy("doc_id", "day").orderBy(order_col)
    return (
        long.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
