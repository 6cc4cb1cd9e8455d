"""J2 — as-of (most-recent-prior) joins.

Reference: the thermal-time lookup maps each observation date to the latest
available thermal band at or before it (``utils/class_run.py:39-61``
calculate_band_index; prediction variant ``pytorch/predict.py:275-345``).

Two forms:
- ``asof_lookup_window``: when left and right share an equi-key and the right
  side is a (sparse) series on the same axis, union + window-LOCF gives the
  as-of value with one sort — no join at all (the Catalyst-friendly form).
- ``asof_join_cogroup``: the general form — cogrouped applyInPandas with
  ``pd.merge_asof`` per key (Arrow-batched, no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_lookup_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    direction: str = "backward",
) -> DataFrame:
    """Attach right.value_col as-of each left row's time. Left columns kept."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        key, time_col, F.col(value_col).alias("_rv")
    ).withColumn("_side", F.lit(0))
    both = l.unionByName(r.select(*[c for c in r.columns]), allowMissingColumns=True)
    if direction == "backward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(time_col), F.col("_side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        asof = F.last("_rv", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(time_col), F.col("_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        asof = F.first("_rv", ignorenulls=True).over(w)
    else:
        raise ValueError(direction)
    return (
        both.withColumn("asof_value", asof)
        .filter(F.col("_side") == 1)
        .select(*lcols, "asof_value")
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    tolerance: int | None = None,
) -> DataFrame:
    """General as-of join via cogrouped pandas (pd.merge_asof per key)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
    ) + ", asof_value double"

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(time_col)
        r = r.sort_values(time_col)[[time_col, value_col]].rename(
            columns={value_col: "asof_value"}
        )
        kwargs = {}
        if tolerance is not None:
            kwargs["tolerance"] = tolerance
        out = pd.merge_asof(l, r, on=time_col, direction="backward", **kwargs)
        out["asof_value"] = out["asof_value"].astype("float64")
        return out

    return left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas(
        merge, schema=out_schema
    )
