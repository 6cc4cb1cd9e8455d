"""High-level engine facade — the user-facing API surface.

The reference exposes three entry scripts (sampling / train / predict,
``class_main_*.py``); this engine's equivalents are:

- ``Engine.build_tiers``   — the rollup/retention build (the heavy job),
- ``Engine.read_tier``     — query a materialized tier,
- ``Engine.tier_long``     — long-form view of a tier (for folds/STM/SQL),
- ``Engine.rebuild``       — resume-aware incremental rebuild,
- ``Engine.verify_tier``   — decode the compressed columns and check them
  against the plain arrays (integrity audit of a tier table).

Everything returns DataFrames; nothing collects to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sits_classification_spark.config import DEFAULT_CONFIG, EngineConfig
from sits_classification_spark.plans.cascade import TIERS, CascadeResult, build_cascade


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        cfg: EngineConfig = DEFAULT_CONFIG,
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.cfg = cfg
        self._last: CascadeResult | None = None

    # -- build ---------------------------------------------------------------

    def build_tiers(self, input_path: str, compress: bool = True) -> CascadeResult:
        self._last = build_cascade(
            self.spark, input_path, self.warehouse, self.cfg, resume=False,
            compress=compress,
        )
        return self._last

    def rebuild(self, input_path: str, compress: bool = True) -> CascadeResult:
        """Resume from the last committed checkpoint (lineage anti-join)."""
        self._last = build_cascade(
            self.spark, input_path, self.warehouse, self.cfg, resume=True,
            compress=compress,
        )
        return self._last

    # -- query ---------------------------------------------------------------

    def read_tier(self, tier: str) -> DataFrame:
        assert tier in TIERS, tier
        return self.spark.read.parquet(f"{self.warehouse}/{tier}")

    def tier_long(self, tier: str) -> DataFrame:
        """Nested tier -> long form (doc_id, source, bucket, value, token)."""
        return (
            self.read_tier(tier)
            .select(
                "doc_id",
                "source",
                F.posexplode(F.arrays_zip("buckets", "values", "tokens")).alias(
                    "pos", "z"
                ),
            )
            .select(
                "doc_id",
                "source",
                F.col("z.buckets").alias("bucket"),
                F.col("z.values").alias("value"),
                F.col("z.tokens").alias("token"),
            )
        )

    def fold(self, tier: str, period: str = "month", stat: str = "AVG") -> DataFrame:
        """Ad-hoc continuous aggregate over a materialized tier: any FOLD_TYPE
        (MIN/Q..​/MAX/AVG/STD/RNG/IQR/SKW/KRT/NUM/SUM, ``TSA.prm:314-334``)
        by month/quarter/year/week/doy. Reads the tier table, so repeated
        folds never touch raw data."""
        from sits_classification_spark.operators.folds import fold_by_period

        return fold_by_period(
            self.tier_long(tier), period, stat, day_col="bucket", value_col="value"
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.warehouse}/lineage")

    # -- audit ---------------------------------------------------------------

    def verify_tier(self, tier: str) -> DataFrame:
        """Decode enc_* columns and compare with the plain arrays; returns
        (doc_id, ok). A correct tier is all-true."""
        from sits_classification_spark.compression.gorilla import decode_series

        def check(batches):
            for pdf in batches:
                oks = []
                for eb, ev, bk, vals in zip(
                    pdf["enc_buckets"], pdf["enc_values"], pdf["buckets"], pdf["values"]
                ):
                    if eb is None or ev is None:
                        oks.append(False)
                        continue
                    db, dv = decode_series(bytes(eb), bytes(ev))
                    oks.append(
                        bool(
                            np.array_equal(db, np.asarray(bk, dtype=np.int64))
                            and np.array_equal(dv, np.asarray(vals, dtype=np.float64))
                        )
                    )
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "ok": oks})

        return self.read_tier(tier).mapInPandas(check, schema="doc_id string, ok boolean")
