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
        self._recover_retention_swap(tier)
        return self.spark.read.parquet(f"{self.warehouse}/{tier}")

    def _recover_retention_swap(self, tier: str) -> None:
        """Complete an apply_retention swap interrupted between its two
        os.replace calls: if the tier dir is missing but the fully-written
        trimmed copy exists, install it (the tmp dir is only ever a
        complete write — Spark commits it before the swap starts)."""
        import os

        path = f"{self.warehouse}/{tier}"
        tmp = f"{path}__retain_tmp"
        if not os.path.isdir(path) and os.path.isdir(tmp):
            os.replace(tmp, path)

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
        folds never touch raw data.

        Bucket semantics differ per tier: tier_raw/tier_10d buckets are
        day indices (any period works); tier_monthly buckets are YYYYMM and
        only coarsen to quarter/year; tier_seasonal (YYYYQ) only to year.
        Feeding a calendar-id bucket to the day codec would silently produce
        garbage buckets, so unsupported combinations raise."""
        from sits_classification_spark.operators.folds import (
            fold_by_period,
            fold_from_bucket,
            month_to_quarter,
        )

        long = self.tier_long(tier)
        p = period.lower()
        if tier in ("tier_raw", "tier_10d"):
            return fold_by_period(long, period, stat, day_col="bucket", value_col="value")
        if tier == "tier_monthly":
            if p in ("quarter", "season"):
                return fold_from_bucket(long, month_to_quarter(), stat)
            if p == "year":
                return fold_from_bucket(
                    long, F.floor(F.col("bucket") / 100).cast("int"), stat
                )
        if tier == "tier_seasonal" and p == "year":
            return fold_from_bucket(
                long, F.floor(F.col("bucket") / 10).cast("int"), stat
            )
        raise ValueError(
            f"cannot fold {tier} (bucket id granularity) by {period!r}"
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.warehouse}/lineage")

    # -- per-series analysis over a tier (the TSA output menu) ---------------

    def _analysis_long(self, tier: str) -> DataFrame:
        """tier_long with `bucket` guaranteed to be in DAY units.

        tier_raw/tier_10d buckets already are epoch days. tier_monthly
        (YYYYMM) and tier_seasonal (YYYYQ) carry calendar ids — feeding those
        straight into OLS x-values, harmonic periods (in days), or the DOY
        codec would silently produce garbage (the same hazard `fold` guards
        against), so they are converted to the representative mid-period
        epoch day (15th of the month / 15th of the quarter's middle month)
        before analysis."""
        long = self.tier_long(tier)
        if tier in ("tier_raw", "tier_10d"):
            return long
        b = F.col("bucket")
        if tier == "tier_monthly":
            d = F.make_date(F.floor(b / 100), b % 100, F.lit(15))
        elif tier == "tier_seasonal":
            d = F.make_date(F.floor(b / 10), (b % 10 - 1) * 3 + 2, F.lit(15))
        else:
            raise ValueError(f"unknown tier {tier!r}")
        day = F.datediff(d, F.to_date(F.lit("1970-01-01"))).cast("long")
        return long.withColumn("bucket", day)

    def stm(self, tier: str, stats: tuple[str, ...] | None = None) -> DataFrame:
        """A1 spectral-temporal metrics per series (TSA.prm:300-312)."""
        from sits_classification_spark.operators.stm import STM_DEFAULT, stm

        return stm(
            self.tier_long(tier), value_col="value", stats=stats or STM_DEFAULT
        )

    def trend(self, tier: str, tail: str | None = None) -> DataFrame:
        """A3 trend; with `tail` in {LEFT, TWO, RIGHT} adds the CONF=0.95
        significance decision (TSA.prm:483-497)."""
        from sits_classification_spark.operators import stm as S

        long = self._analysis_long(tier)
        if tail is None:
            return S.trend(long, x_col="bucket", y_col="value")
        return S.trend_significance(
            long, x_col="bucket", y_col="value", keys=("doc_id", "source"),
            tail=tail,
        )

    def harmonic(
        self, tier: str, modes: int = 2, trend: bool = False,
        horizon: int = 0, step: int = 1,
    ) -> DataFrame:
        """W5 harmonic fit per series; with horizon > 0 also evaluates the
        fitted curve on an equidistant grid extended past the last
        observation (the TSI/NRT forecast output)."""
        from sits_classification_spark.operators.harmonic import (
            harmonic_eval,
            harmonic_fit,
        )

        long = self._analysis_long(tier)
        fit = harmonic_fit(long, modes=modes, trend=trend, day_col="bucket")
        if horizon <= 0:
            return fit
        # bounds per (doc_id, source): a doc_id under two sources keeps each
        # source's own fit window instead of a merged lo..hi
        bounds = long.groupBy("doc_id", "source").agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        )
        return harmonic_eval(
            fit.join(bounds, ["doc_id", "source"]), modes=modes,
            horizon=horizon, step=step, trend=trend,
            keys=("doc_id", "source"),
        )

    def breaks(self, tier: str, k: float = 0.5, h: float = 5.0) -> DataFrame:
        """Mean-shift CUSUM break screen per series over a tier (Page 1954)
        — the change-alert readout downstream of trend/harmonic in an NRT
        monitoring setup. Calendar-id tiers go through the same
        representative-day conversion as trend/harmonic (_analysis_long),
        so monthly/seasonal buckets order correctly on the day axis."""
        from sits_classification_spark.operators.stm import cusum_breaks

        return cusum_breaks(
            self._analysis_long(tier), k=k, h=h, day_col="bucket",
            keys=("doc_id", "source"),
        )

    def noise_screen(self, tier: str, iterative: bool = True) -> DataFrame:
        """F2 noise screen over a tier series: the grouped-kernel fixpoint
        (drop worst outlier per pass) by default; iterative=False runs the
        single-pass Column-expression form (one window pass, all residuals
        judged against one rmse). For the BELOW_NOISE restore of externally
        masked observations, call operators.harmonic.below_noise_restore on
        a long frame that carries the mask column — tiers have none."""
        from pyspark.sql import Window
        from sits_classification_spark.operators.harmonic import noise_filter

        long = self._analysis_long(tier)
        if iterative:
            return noise_filter(
                long, above_noise=self.cfg.above_noise, day_col="bucket"
            )
        w = Window.partitionBy("doc_id").orderBy("bucket")
        pv, nv = F.lag("value").over(w), F.lead("value").over(w)
        pb, nb = F.lag("bucket").over(w), F.lead("bucket").over(w)
        interp = pv + (nv - pv) * ((F.col("bucket") - pb) / (nb - pb))
        long = long.withColumn("resid", F.abs(F.col("value") - interp))
        rmse = F.sqrt(
            F.avg(F.col("resid") * F.col("resid")).over(
                Window.partitionBy("doc_id")
            )
        )
        return long.withColumn(
            "kept",
            F.col("resid").isNull()
            | (F.col("resid") <= self.cfg.above_noise * rmse),
        )

    def phenology(self, tier: str, variant: str = "threshold") -> DataFrame:
        """W12 season metrics: 'threshold' (amplitude LSP), 'polar'
        (circular-statistics POL) or 'spline' (SPL — regression-spline
        smoothing before threshold detection, TSA.prm:355-407)."""
        from sits_classification_spark.operators.phenology import (
            lsp_metrics,
            pol_metrics,
            spl_metrics,
        )

        long = self._analysis_long(tier)
        if variant == "polar":
            return pol_metrics(long, day_col="bucket")
        if variant in ("spline", "spl"):
            return spl_metrics(long.withColumnRenamed("bucket", "grid_day"))
        return lsp_metrics(long.withColumnRenamed("bucket", "grid_day"))

    # -- retention -----------------------------------------------------------

    def apply_retention(
        self, tier: str, cutoff_bucket: int, compress: bool = True
    ) -> DataFrame:
        """Retention policy: rewrite `tier` keeping only points with bucket
        >= cutoff (drop_chunks analog). The trimmed tier is written beside
        the old one and swapped in via two dir renames; a crash between the
        renames is healed by _recover_retention_swap (the trimmed copy is
        always complete before the swap starts). A crash after the swap but
        before the lineage append loses only the advisory lineage row — the
        data state is already consistent. Assumes a rename-capable warehouse
        filesystem (local/HDFS); on object stores swap via table-format
        metadata (an Iceberg snapshot) instead. Lineage records the action
        as input_snapshot_id = 'retention<cutoff'. Map-only — no shuffle,
        layout preserved.
        """
        import os
        import shutil

        from sits_classification_spark import lineage as L
        from sits_classification_spark.plans.cascade import stage_retention

        self._recover_retention_swap(tier)
        path = f"{self.warehouse}/{tier}"
        tmp = f"{path}__retain_tmp"
        old = f"{path}__retired"
        trimmed = stage_retention(self.read_tier(tier), cutoff_bucket, compress)
        trimmed.write.mode("overwrite").partitionBy("source", "salt").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        out = self.read_tier(tier)
        L.append_lineage(
            L.lineage_rows(
                out, tier, f"retention<{cutoff_bucket}",
                ["doc_id", "n_tok", "tokens"],
            ),
            f"{self.warehouse}/lineage",
        )
        return out

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
