"""A1 — spectral-temporal metrics; A3 — trend analysis; W3 — moving average.

Reference:
- STM menu (MIN, Q01-Q99, MAX, AVG, STD, RNG, IQR, SKW, KRT, NUM) at
  ``force/skel/TSA.prm:300-312``;
- trend analysis (slope/intercept/R2 + significance) at
  ``force/skel/TSA.prm:335-343,483-497``;
- moving-average smoother (±MOVING_MAX days) at ``force/skel/TSA.prm:225-228``.

All pure Column expressions (whole-stage codegen; partial+final agg free).
STD/SKW/KRT use population moments (numpy ddof=0 default, cf. np.nanstd at
``force/skel/dswi_harmonic_tsi.py:147``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sits_classification_spark.operators.folds import fold_stat_expr


STM_DEFAULT = ("MIN", "Q25", "Q50", "Q75", "MAX", "AVG", "STD", "RNG", "IQR", "NUM")


def stm(
    df: DataFrame,
    value_col: str = "value",
    keys: tuple[str, ...] = ("doc_id", "source"),
    stats: tuple[str, ...] = STM_DEFAULT,
) -> DataFrame:
    """Per-series spectral-temporal metrics, one column per statistic."""
    aggs = [fold_stat_expr(value_col, s).alias(s.lower()) for s in stats]
    return df.groupBy(*keys).agg(*aggs)


def trend(
    df: DataFrame,
    x_col: str = "day",
    y_col: str = "value",
    keys: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """Per-series OLS trend: slope, intercept, r2, t-statistic of the slope.

    The t-stat backs the reference's TAIL/CONF significance test
    (``TSA.prm:335-343``): t = slope / se(slope), with
    se = sqrt(rss/(n-2)) / sqrt(sxx).
    """
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    return df.groupBy(*keys).agg(
        F.regr_slope(y, x).alias("slope"),
        F.regr_intercept(y, x).alias("intercept"),
        F.regr_r2(y, x).alias("r2"),
        F.regr_count(y, x).alias("n"),
        (
            F.regr_slope(y, x)
            / F.sqrt(
                (F.regr_syy(y, x) - F.pow(F.regr_sxy(y, x), 2) / F.regr_sxx(y, x))
                / (F.regr_count(y, x) - 2)
                / F.regr_sxx(y, x)
            )
        ).alias("t_stat"),
    )


def moving_average(
    df: DataFrame,
    radius_days: int,
    day_col: str = "day",
    value_col: str = "value",
    key: str = "doc_id",
) -> DataFrame:
    """W3: mean of observations within ±radius days of each observation.

    rangeBetween on the integer day axis — the FORCE MOVING_MAX window.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(day_col).cast("long"))
        .rangeBetween(-radius_days, radius_days)
    )
    return df.withColumn("smoothed", F.avg(value_col).over(w))


def standardize(
    df: DataFrame,
    value_col: str = "value",
    key: str = "doc_id",
    mode: str = "NORMALIZE",
) -> DataFrame:
    """W11: per-series NONE/NORMALIZE/CENTER (``TSA.prm:184-186``).

    NORMALIZE = (v-mean)/std (population std), CENTER = v-mean.
    """
    w = Window.partitionBy(key)
    mean = F.avg(value_col).over(w)
    if mode == "NONE":
        return df.withColumn("standardized", F.col(value_col).cast("double"))
    if mode == "CENTER":
        return df.withColumn("standardized", F.col(value_col) - mean)
    if mode == "NORMALIZE":
        m2 = F.avg(F.col(value_col) * F.col(value_col)).over(w) - mean * mean
        return df.withColumn("standardized", (F.col(value_col) - mean) / F.sqrt(m2))
    raise ValueError(mode)
