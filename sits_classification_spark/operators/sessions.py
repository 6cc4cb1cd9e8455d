"""Gap-based sessionization: split each user's event stream into sessions
wherever the gap to the previous event exceeds a timeout.

Engine addition beyond the reference (the TimescaleDB/streaming-analytics
twin of the reference's DOY windowing — `force/skel/TSA.prm`'s temporal
subsetting cuts series by calendar window; sessionization cuts by
inactivity gap). Used at corpus scale for behavioural rollups and for
splitting long interaction logs into training episodes.

Semantics: events are ordered by (ts, event_id) per user (the id breaks
timestamp ties deterministically). An event starts a new session iff it is
the user's first event or `ts - prev_ts > timeout`. `session_seq` numbers a
user's sessions from 0 in time order; per-session aggregates (bounds,
event count, value sum) come from one groupBy.

Scale posture: ONE shuffle — the lag window, the is-new flag, the running
session counter, and the session groupBy all ride the same
hashpartitioning(user_id) exchange (Spark keeps the sort for the two
stacked windows and the final aggregation is partial+final on a superset
key). Skewed users (one user = 10^8 events) serialize their window; for
that shape pre-split the user by day and stitch boundary sessions — the
same remedy the cascade's salting applies to per-source skew.

Cross-engine parity: all time math is integer epoch-microseconds
(`unix_micros`; a double round-trip of a timestamp is NOT microsecond-exact); the value sum is rounded to 6 dp at the end (inputs are
2-dp-ish doubles summed over small sessions — exact agreement verified by
the driver oracle at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    timeout_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign (user, session_seq) to every event. Adds `session_seq`
    (0-based per user, time order) and `is_session_start`."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > timeout_s * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("is_session_start", is_new).withColumn(
        "session_seq", (F.sum("is_session_start").over(running) - 1).cast("long")
    )


def session_stats(
    df: DataFrame,
    timeout_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: (user, session_seq, started_us, ended_us,
    duration_us, n_events, value_sum); bounds are integer epoch-microseconds."""
    s = sessionize(df, timeout_s, user_col, ts_col, id_col)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("started_us"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("ended_us"),
        (
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
            - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
        ).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 6).alias("value_sum"),
    )
