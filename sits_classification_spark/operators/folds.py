"""A2 — fold-by-period continuous aggregates (the rollup-tier cascade).

Reference: ``force/skel/TSA.prm:314-334`` — fold the interpolated series by
YEAR / QUARTER / MONTH / WEEK / DOY with FOLD_TYPE in
{MIN,Q10,Q25,Q50,Q75,Q90,MAX,AVG,STD,RNG,IQR,SKW,KRT,NUM}. Each tier is
computed **from the tier below** (FBM from TSI, FBQ from FBM — TimescaleDB
continuous-aggregate style), never from raw.

Everything here is pure Column expressions: partial+final aggregation,
whole-stage codegen, and AQE come free from Catalyst. STD/SKW/KRT use
population moments (ddof=0) to match the reference's numpy defaults
(``force/skel/dswi_harmonic_tsi.py:147`` uses np.nanstd, population).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sits_classification_spark.functions.scalar import day_to_date  # C4 codec (one impl)

# stats whose raw-moment formulas lose precision catastrophically when
# |mean| >> std (E[x^4] cancellation): computed on per-group SHIFTED values
# instead — skewness/kurtosis are shift-invariant, so the result is exact
_SHIFT_STATS = {"SKW", "KRT"}


def _shift_by_group_mean(
    df: DataFrame, value_col: str, part_cols: tuple[str, ...]
) -> DataFrame:
    """Add `_vc` = value - avg(value) over the fold group. The window
    partitions on the same columns the fold groups by, so it rides the same
    exchange (at the cost of map-side partial aggregation — only paid for
    the two shift-sensitive stats). The MEAN pivot (not min) matters: after
    a mean shift the summed cubes/quads are mixed-sign and O(std^k), so the
    naive-summation error is ~n*eps*std^k instead of ~n*eps*range^k."""
    w = Window.partitionBy(*part_cols)
    return df.withColumn(
        "_vc", F.col(value_col) - F.avg(value_col).over(w)
    )


def period_bucket(day: str | Column, period: str) -> Column:
    """Integer bucket id for a fold period, from an int day column.

    month -> YYYYMM, quarter -> YYYYQ, year -> YYYY, week -> epoch_day//7,
    doy -> 1..366 (calendar fold across years, TSA.prm FBD).
    """
    dt = day_to_date(day)
    col = F.col(day) if isinstance(day, str) else day
    p = period.lower()
    if p == "month":
        return (F.year(dt) * 100 + F.month(dt)).alias("bucket")
    if p in ("quarter", "season"):
        return (F.year(dt) * 10 + F.quarter(dt)).alias("bucket")
    if p == "year":
        return F.year(dt).alias("bucket")
    if p == "week":
        return F.floor(col / 7).cast("int").alias("bucket")
    if p == "doy":
        return F.dayofyear(dt).alias("bucket")
    raise ValueError(f"unknown fold period {period!r}")


def fold_stat_expr(value: str, stat: str) -> Column:
    """One FOLD_TYPE statistic as a Column aggregate over `value`."""
    v = F.col(value)
    s = stat.upper()
    n = F.count(v)
    mean = F.avg(v)
    m2 = F.avg(v * v) - mean * mean                      # population variance
    simple = {
        "MIN": F.min(v).cast("double"),
        "MAX": F.max(v).cast("double"),
        "AVG": F.avg(v),
        "NUM": F.count(v).cast("double"),
        "STD": F.sqrt(m2),
        "RNG": (F.max(v) - F.min(v)).cast("double"),
        "SUM": F.sum(v).cast("double"),
    }
    if s in simple:
        return simple[s]
    if s.startswith("Q") and s[1:].isdigit():
        return F.percentile(v, F.lit(int(s[1:]) / 100.0))
    if s == "IQR":
        return F.percentile(v, F.lit(0.75)) - F.percentile(v, F.lit(0.25))
    if s == "SKW":
        m3 = F.avg(v * v * v) - 3 * mean * m2 - mean * mean * mean
        return m3 / F.pow(m2, 1.5)
    if s == "KRT":
        # population excess kurtosis: E[(x-mu)^4]/var^2 - 3
        m4 = (
            F.avg(v * v * v * v)
            - 4 * mean * F.avg(v * v * v)
            + 6 * mean * mean * F.avg(v * v)
            - 3 * F.pow(mean, F.lit(4))
        )
        return m4 / (m2 * m2) - 3
    raise ValueError(f"unknown FOLD_TYPE {stat!r}")


def fold_by_period(
    df: DataFrame,
    period: str,
    stat: str = "AVG",
    day_col: str = "grid_day",
    value_col: str = "value",
    keys: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """Fold a long-form tier by calendar period with one FOLD_TYPE.

    Output: (*keys, bucket int, value double, n_obs int).
    """
    df = df.withColumn("bucket", period_bucket(day_col, period))
    vcol = value_col
    if stat.upper() in _SHIFT_STATS:
        df = _shift_by_group_mean(df, value_col, (*keys, "bucket"))
        vcol = "_vc"
    return df.groupBy(*keys, "bucket").agg(
        fold_stat_expr(vcol, stat).alias("value"),
        F.count(value_col).alias("n_obs"),
    )


def fold_from_bucket(
    df: DataFrame,
    bucket_map: Column,
    stat: str = "AVG",
    value_col: str = "value",
    keys: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """Fold an already-bucketed tier into a coarser bucket (FBM -> FBQ):
    e.g. month id YYYYMM -> quarter id YYYYQ without touching raw data."""
    df = df.withColumn("bucket2", bucket_map)
    vcol = value_col
    if stat.upper() in _SHIFT_STATS:
        df = _shift_by_group_mean(df, value_col, (*keys, "bucket2"))
        vcol = "_vc"
    return df.groupBy(*keys, F.col("bucket2").alias("bucket")).agg(
        fold_stat_expr(vcol, stat).alias("value"),
        F.count(value_col).alias("n_obs"),
    )


def month_to_quarter(bucket: str = "bucket") -> Column:
    """YYYYMM -> YYYYQ (seasonal tier id from monthly tier id)."""
    yr = F.floor(F.col(bucket) / 100)
    mo = F.col(bucket) % 100
    return (yr * 10 + F.floor((mo - 1) / 3) + 1).cast("int")


def pack_tokens(
    df: DataFrame,
    bucket_col: str = "bucket",
    value_col: str = "value",
    keys: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """Pack a long-form tier back into the nested token-array representation
    (doc_id, source, tokens array<int>, n_tok) — token-array-equality form.

    Rounding rule: banker's (half-to-even) via rint, matching numpy's
    np.round used by the cascade tier writer and the pandas oracle — the
    token-array-equality invariant requires one rule everywhere.
    """
    rounded = F.rint(F.col(value_col)).cast("int")
    return (
        df.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(bucket_col).alias("b"), rounded.alias("v")))
            ).alias("_bv")
        )
        .select(
            *keys,
            F.col("_bv.v").alias("tokens"),
            F.size("_bv").alias("n_tok"),
        )
    )
