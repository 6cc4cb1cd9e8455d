"""W1 — gap fill: linear interior interpolation + LOCF/NOCB edge fill.

Reference: ``utils/class_run.py:193-194`` —
``df.interpolate(method='linear', limit_direction='both')`` — interior NaNs
linearly interpolated between bracketing observations, leading NaNs backfilled
from the first obs (NOCB), trailing NaNs carried forward from the last obs
(LOCF). Spec: ``force/skel/TSA.prm:218-224`` (INTERPOLATE=LINEAR).

Two implementations with identical results:

1. ``gapfill_expr`` — pure Column/window expressions. Bracketing neighbors
   via ``last(..., ignorenulls)`` / ``first(..., ignorenulls)`` windows, then
   one arithmetic expression. Whole-stage-codegen'd, no Python in the loop —
   the form you want on a 1000-executor cluster (two window passes over one
   doc_id shuffle).
2. ``gapfill_pandas`` — grouped Arrow UDF wrapping the literal reference op
   (``pd.Series.interpolate``). Used where a fused per-series kernel is
   cheaper (see plans/cascade.py which fuses gapfill+resample in one pass).

Interpolation weight uses the *day* axis (time-weighted), which equals the
reference's index-weighted interpolate for equidistant decode (linear interp
is invariant under affine re-scaling of x) and generalizes correctly to
irregular event series.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sits_classification_spark.operators.seriesmap import map_doc_groups


def _fill_exprs(mode: str):
    prev_v, prev_d = F.col("_pv"), F.col("_pd")
    next_v, next_d = F.col("_nv"), F.col("_nd")
    interior = prev_v + (next_v - prev_v) * (F.col("day") - prev_d) / (next_d - prev_d)
    if mode == "LINEAR":
        filled = (
            F.when(F.col("value").isNotNull(), F.col("value").cast("double"))
            .when(prev_v.isNotNull() & next_v.isNotNull(), interior)
            .when(prev_v.isNotNull(), prev_v.cast("double"))
            .otherwise(next_v.cast("double"))
        )
    elif mode == "LOCF":
        filled = F.coalesce(F.col("value"), prev_v).cast("double")
    elif mode == "NOCB":
        filled = F.coalesce(F.col("value"), next_v).cast("double")
    else:
        raise ValueError(f"unknown gap-fill mode {mode!r}")
    return filled


def gapfill_expr(long: DataFrame, mode: str = "LINEAR") -> DataFrame:
    """Fill NULL values per doc_id ordered by day. Adds column `filled`.

    mode: LINEAR (reference default, limit_direction='both'),
    LOCF (carry forward only), NOCB (carry backward only).
    """
    wb = (
        Window.partitionBy("doc_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("doc_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col("value")
    d = F.when(v.isNotNull(), F.col("day"))
    out = (
        long.withColumn("_pv", F.last(v, ignorenulls=True).over(wb))
        .withColumn("_pd", F.last(d, ignorenulls=True).over(wb))
        .withColumn("_nv", F.first(v, ignorenulls=True).over(wf))
        .withColumn("_nd", F.first(d, ignorenulls=True).over(wf))
    )
    return out.withColumn("filled", _fill_exprs(mode)).drop("_pv", "_pd", "_nv", "_nd")


def gapfill_pandas(long: DataFrame, mode: str = "LINEAR") -> DataFrame:
    """applyInPandas variant — the literal reference kernel per series."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in long.schema.fields
    ) + ", filled double"

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        s = pdf["value"].astype("float64")
        if mode == "LINEAR":
            # utils/class_run.py:194 — interpolate on the day axis
            s.index = pdf["day"].to_numpy()
            filled = s.interpolate(method="index", limit_direction="both")
            pdf["filled"] = filled.to_numpy()
        elif mode == "LOCF":
            pdf["filled"] = s.ffill().to_numpy()
        elif mode == "NOCB":
            pdf["filled"] = s.bfill().to_numpy()
        else:
            raise ValueError(mode)
        return pdf

    return map_doc_groups(long, fill, out_schema)
