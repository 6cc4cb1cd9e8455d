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
    buckets: int | None = None,
) -> DataFrame:
    """General as-of join via cogrouped pandas (pd.merge_asof).

    With ``buckets`` set, the cogroup key is a coarse hash bucket of `key`
    and ``merge_asof(by=key)`` handles the exact-key matching inside each
    Arrow batch — the number of Python invocations is bounded by `buckets`,
    not by key cardinality (one call per key is ~10× slower on many small
    groups). With buckets=None, one cogroup per key (original form)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
    ) + ", asof_value double"
    kwargs: dict = {"on": time_col, "direction": "backward"}
    if tolerance is not None:
        kwargs["tolerance"] = tolerance
    if buckets is not None:
        kwargs["by"] = key

    # Alias the right side's columns to fresh names: when left and right
    # share lineage (e.g. both derive from the same table) the cogroup plan
    # dedups same-id attributes and silently DROPS them from the right
    # pandas frame. Aliasing mints new expression ids on the right.
    rsel = right.select(
        F.col(key).alias("_rk"),
        F.col(time_col).alias(time_col),
        F.col(value_col).alias("asof_value"),
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.drop(columns=["_bk"], errors="ignore").sort_values(
            time_col, kind="stable"
        )
        # drop null right values BEFORE the merge: merge_asof would match
        # the null row and return NaN where the window form (last ...
        # ignorenulls) skips to the previous non-null — the two forms must
        # agree on data with null values
        r = (
            r.rename(columns={"_rk": key})
            .dropna(subset=["asof_value"])
            .sort_values(time_col, kind="stable")
        )[([key] if buckets is not None else []) + [time_col, "asof_value"]]
        out = pd.merge_asof(l, r, **kwargs)
        out["asof_value"] = out["asof_value"].astype("float64")
        return out

    if buckets is None:
        lg, rg = left.groupBy(key), rsel.groupBy(F.col("_rk").alias(key))
    else:
        # the bucket must be a real column on both sides: grouping by a bare
        # expression lets the planner prune `key` out of the passed frames
        lg = left.withColumn(
            "_bk", F.pmod(F.xxhash64(key), F.lit(buckets))
        ).groupBy("_bk")
        rg = rsel.withColumn(
            "_bk", F.pmod(F.xxhash64("_rk"), F.lit(buckets))
        ).groupBy("_bk")
    out = lg.cogroup(rg).applyInPandas(merge, schema=out_schema)
    return out
