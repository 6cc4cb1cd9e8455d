"""W12 — land-surface phenology (LSP) metrics per season.

Reference: ``force/skel/TSA.prm:355-481`` — season detection over the
interpolated series with start/mid/end-of-season dates, values, amplitude,
and integrals. The reference offers spline (SPL) and polar (POL) variants;
this engine implements the amplitude-threshold variant (the common
start-of-season definition: the day the series first crosses
min + frac*(max-min) on the way up, symmetric for end-of-season), which is
deterministic and oracle-checkable.

Grouped Arrow kernel over the 10-day tier (one season record per doc-year).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sits_classification_spark.operators.seriesmap import map_doc_groups

LSP_FIELDS = (
    "source string, year int, sos_day int, pos_day int, "
    "eos_day int, sos_value double, pos_value double, eos_value double, "
    "amplitude double, season_length int, integral double"
)


def lsp_kernel(days: np.ndarray, values: np.ndarray, frac: float = 0.5):
    """One season's metrics from a (sorted) day/value series, or None if the
    series is flat/degenerate."""
    if days.size < 3:
        return None
    vmin, vmax = float(values.min()), float(values.max())
    if vmax <= vmin:
        return None
    thresh = vmin + frac * (vmax - vmin)
    pos_i = int(np.argmax(values))
    above = values >= thresh
    up = np.flatnonzero(above[: pos_i + 1])
    down = np.flatnonzero(above[pos_i:])
    sos_i = int(up[0]) if up.size else 0
    eos_i = pos_i + int(down[-1]) if down.size else days.size - 1
    seg = slice(sos_i, eos_i + 1)
    integral = float(np.trapz(values[seg], days[seg]))
    return (
        int(days[sos_i]),
        int(days[pos_i]),
        int(days[eos_i]),
        float(values[sos_i]),
        float(values[pos_i]),
        float(values[eos_i]),
        vmax - vmin,
        int(days[eos_i] - days[sos_i]),
        integral,
    )


def lsp_metrics(
    tier_10d_long: DataFrame, frac: float = 0.5, epoch_year: bool = True
) -> DataFrame:
    """Long-form 10-day tier (doc_id, source, grid_day, value) -> one LSP
    record per (doc, calendar year)."""

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("grid_day")
        days = pdf["grid_day"].to_numpy(dtype=np.int64)
        vals = pdf["value"].to_numpy(dtype=np.float64)
        years = (days.astype("datetime64[D]").astype("datetime64[Y]").astype(int) + 1970)
        rows = []
        for yr in np.unique(years):
            m = years == yr
            r = lsp_kernel(days[m], vals[m], frac)
            if r is None:
                continue
            rows.append((pdf["doc_id"].iloc[0], pdf["source"].iloc[0], int(yr)) + r)
        return pd.DataFrame(
            rows,
            columns=[
                "doc_id", "source", "year", "sos_day", "pos_day", "eos_day",
                "sos_value", "pos_value", "eos_value", "amplitude",
                "season_length", "integral",
            ],
        )

    idt = {f.name: f.dataType.simpleString() for f in tier_10d_long.schema.fields}["doc_id"]
    return map_doc_groups(
        tier_10d_long, per_doc, f"doc_id {idt}, {LSP_FIELDS}",
        order_cols=("grid_day",),
    )
