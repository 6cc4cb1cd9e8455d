"""A4 — CAT analysis: Change / Aftereffect / Trend decomposition.

Reference: ``force/skel/TSA.prm:344-353,493-497`` — for each folded series,
detect the greatest change (largest absolute year-over-year difference),
then fit trend lines to the full series and to the parts before and after
the change point.

Pure Column implementation: the change point via a window lag + argmax
struct trick; the three sub-range regressions via conditional aggregates —
no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cat_analysis(
    df: DataFrame,
    bucket_col: str = "bucket",
    value_col: str = "value",
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-series CAT: change magnitude/position + before/after/full trends.

    Output: (*keys, change, change_bucket, slope_full, slope_before,
    slope_after, n).
    """
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    b, v = F.col(bucket_col).cast("double"), F.col(value_col).cast("double")
    with_diff = df.withColumn("_prev", F.lag(value_col).over(w)).withColumn(
        "_diff", F.col(value_col) - F.col("_prev")
    )
    # argmax |diff| via min of struct(-|diff|, bucket, diff): greatest
    # magnitude, ties broken by the EARLIEST bucket — an explicit rule both
    # engines reproduce (arg_max ties are engine-arbitrary; measured flips
    # at sf0.1)
    agg = with_diff.groupBy(*keys).agg(
        F.min(
            F.when(
                F.col("_diff").isNotNull(),
                F.struct(
                    (-F.abs(F.col("_diff"))).alias("negmag"),
                    F.col(bucket_col).cast("double").alias("at"),
                    F.col("_diff").alias("signed"),
                ),
            )
        ).alias("_chg"),
        F.regr_slope(v, b).alias("slope_full"),
        F.count(value_col).alias("n"),
    )
    # CAT is undefined for single-point series (no diff exists): drop them
    # instead of emitting an all-null change row
    agg = agg.filter(F.col("_chg").isNotNull())
    keyed = with_diff.join(
        agg.select(*keys, F.col("_chg.at").alias("_chg_at"), "_chg", "slope_full", "n"),
        on=list(keys),
    )
    before = F.when(b < F.col("_chg_at"), v)
    after = F.when(b >= F.col("_chg_at"), v)
    xb = F.when(b < F.col("_chg_at"), b)
    xa = F.when(b >= F.col("_chg_at"), b)
    return keyed.groupBy(*keys).agg(
        F.first("_chg.signed").alias("change"),
        F.first("_chg.at").cast("long").alias("change_bucket"),
        F.first("slope_full").alias("slope_full"),
        F.regr_slope(before, xb).alias("slope_before"),
        F.regr_slope(after, xa).alias("slope_after"),
        F.first("n").alias("n"),
    )
