"""Pure pandas/numpy reference oracle for the tier cascade.

Re-derives every tier from the same synthetic input with the literal
reference operations (``pd.Series.interpolate(limit_direction='both')`` per
``utils/class_run.py:193-194``; ``np.interp`` grid per ``TSA.prm:262-264``;
calendar AVG folds per ``TSA.prm:314-334``). NO Spark — an independent
implementation path used by pytest for token-array equality.

Deliberately written over per-doc Python loops + pandas (the "obviously
correct, unoptimized" form); the engine's kernels are checked against this,
not the other way around.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sits_classification_spark.config import DEFAULT_CONFIG, EngineConfig


def oracle_tiers(seq: pd.DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """dict tier -> DataFrame(doc_id, source, buckets, values, tokens)."""
    raw_rows, d10_rows, mon_rows, sea_rows = [], [], [], []
    for _, row in seq.iterrows():
        toks = np.asarray(row["tokens"], dtype=np.int64)
        k = np.arange(toks.size)
        days = cfg.epoch_day + k * cfg.cadence_days
        vals = toks.astype(np.float64)
        vals[toks == cfg.nodata] = np.nan
        valid = ~np.isnan(vals)
        if valid.sum() < 2:
            continue
        vdays, vvals = days[valid], vals[valid]
        raw_rows.append((row["doc_id"], row["source"], vdays, vvals))

        # reference gap-fill: pandas interpolate on the day index, both dirs
        s = pd.Series(vals, index=days).interpolate(
            method="index", limit_direction="both"
        )
        # equidistant 10-day grid anchored at first valid obs
        grid = np.arange(vdays.min(), vdays.max() + 1, cfg.int_day, dtype=np.int64)
        gv = np.interp(grid, s.index.to_numpy()[valid], s.to_numpy()[valid])
        d10_rows.append((row["doc_id"], row["source"], grid, gv))

        dt = grid.astype("datetime64[D]")
        mons = dt.astype("datetime64[M]").astype(np.int64)
        mb = (1970 + mons // 12) * 100 + mons % 12 + 1
        mdf = pd.DataFrame({"b": mb, "v": gv}).groupby("b", sort=True)["v"].mean()
        mon_rows.append((row["doc_id"], row["source"], mdf.index.to_numpy(), mdf.to_numpy()))

        qb = mdf.index.to_numpy() // 100 * 10 + (mdf.index.to_numpy() % 100 - 1) // 3 + 1
        qdf = pd.DataFrame({"b": qb, "v": mdf.to_numpy()}).groupby("b", sort=True)["v"].mean()
        sea_rows.append((row["doc_id"], row["source"], qdf.index.to_numpy(), qdf.to_numpy()))

    def mk(rows):
        return pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "source": [r[1] for r in rows],
                "buckets": [np.asarray(r[2], dtype=np.int64) for r in rows],
                "values": [np.asarray(r[3], dtype=np.float64) for r in rows],
                "tokens": [np.round(r[3]).astype(np.int32) for r in rows],
            }
        )

    return {
        "tier_raw": mk(raw_rows),
        "tier_10d": mk(d10_rows),
        "tier_monthly": mk(mon_rows),
        "tier_seasonal": mk(sea_rows),
    }
