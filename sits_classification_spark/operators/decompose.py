"""Classical additive seasonal decomposition (the moving-average method of
Persons 1919 as standardized in e.g. statsmodels ``seasonal_decompose`` and
every forecasting textbook): trend = centered period-length moving average,
seasonal index = per-phase mean of the detrended series, normalized to sum
to ~zero over one period.

Engine-exact contract (shared with the SQL oracle): values quantize to
integer hundredths; the trend enters as the exact 7-term integer SUM (not
the average), so the detrended series is the all-integer
``det700 = 7*vq - trend7_sum`` (units: value·700). Each downstream float
op is a single exact-integer division followed immediately by floor
quantization — one IEEE divide on identical operands per output, no
order-dependent accumulation anywhere.

Plan: one LOCF daily-grid fill (two windows over the doc exchange), one
centered rows-window, one (doc, weekday) hash aggregate, one per-doc
window over the 7 index rows. Everything rides the single doc_id
partitioning; no UDF."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seasonal_decompose_weekday(long: DataFrame) -> DataFrame:
    """Weekly-period classical decomposition of (doc_id, day, value) series:
    LOCF onto the daily grid, 7-day centered moving trend (full windows
    only), per-weekday seasonal index, zero-mean adjusted.

    Returns (doc_id, weekday, n_days, s_e6, adj_e6): the raw and
    mean-adjusted seasonal indices in value-micro-units; weekday 0 =
    Sunday ((day + 4) mod 7 on epoch days — 1970-01-01 was a Thursday)."""
    bounds = long.groupBy("doc_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = bounds.select(
        "doc_id",
        F.explode(F.sequence("lo", "hi", F.lit(1))).alias("day"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    obs = long.select("doc_id", "day", "value", F.lit(0).alias("is_grid"))
    wb = (
        Window.partitionBy("doc_id")
        .orderBy("day", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    daily = (
        obs.unionByName(grid)
        .withColumn("locf", F.last("value", ignorenulls=True).over(wb))
        .filter(F.col("is_grid") == 1)
        .select(
            "doc_id",
            "day",
            F.floor(F.col("locf") * 100 + F.lit(0.5)).cast("long").alias("vq"),
        )
    )
    w7 = Window.partitionBy("doc_id").orderBy("day").rowsBetween(-3, 3)
    det = (
        daily.withColumn("ts7", F.sum("vq").over(w7))
        .withColumn("n7", F.count(F.lit(1)).over(w7))
        .filter(F.col("n7") == 7)
        .select(
            "doc_id",
            ((F.col("day") + 4) % 7).cast("int").alias("weekday"),
            (F.lit(7) * F.col("vq") - F.col("ts7")).alias("det700"),
        )
    )
    idx = det.groupBy("doc_id", "weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("det700").alias("sd700"),
    )
    s_e6 = F.floor(
        F.col("sd700").cast("double") / (700.0 * F.col("n_days")) * 1000000
        + F.lit(0.5)
    ).cast("long")
    wdoc = Window.partitionBy("doc_id")
    out = idx.withColumn("s_e6", s_e6).withColumn(
        "adj_e6",
        F.col("s_e6")
        - F.floor(
            F.sum("s_e6").over(wdoc).cast("double") / F.count(F.lit(1)).over(wdoc)
        ).cast("long"),
    )
    return out.select("doc_id", "weekday", "n_days", "s_e6", "adj_e6")
