"""Sequence packing: concatenate documents and chunk into fixed
token-budget training sequences (the standard LLM pretraining layout).

Engine addition beyond the reference (training-data-pipeline layer; the
reference pads each ragged sequence to a per-batch fixed length —
`pytorch/train.py:300-302` — which wastes budget on pad tokens; packing
is the corpus-scale alternative the W8/W9 fixed-length windows feed into).

Semantics (concat-then-chunk): documents are laid out end-to-end in
ascending `order_col` order (must be numeric and unique), and the
resulting token stream is cut every `capacity` tokens. A document
occupies the half-open token range [cum_before, cum_before + n_tok) and
maps to chunks floor(cum_before/capacity) ..
floor((cum_before + n_tok - 1)/capacity) — one output row per
(doc, chunk) with the doc's offset and length inside that chunk. Docs
with n_tok <= 0 emit no rows.

Scale posture — the global exclusive prefix sum is the classic two-pass
form, NEVER a single-task global window (an unpartitioned Spark window
collapses to one task):

  1. rows are binned into P ordered ranges by a DETERMINISTIC bucket
     expression over order_col (uniform split of the collected
     [min, max] — integer math, no sampling: `repartitionByRange`'s
     sampled boundaries could disagree between the two consumers of the
     same subplan, silently mispairing offsets with rows);
  2. per-range totals (P rows) -> exclusive range offsets via one tiny
     window over the P-row side table;
  3. broadcast-join the offsets back; the big side shuffles ONCE (hash
     by range id, P concurrent window tasks sorted by order_col).

Bucket sizes follow the order_col distribution (dense ids -> balanced;
heavy skew -> raise `partitions`). Chunk-range expansion is a
`sequence()` explode — narrow.

Cross-engine parity: all arithmetic is int64 (cumulative token counts,
floor division) — no floats anywhere, so a SQL oracle matches bit-exactly
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    df: DataFrame,
    capacity: int,
    n_tok_col: str = "n_tok",
    order_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """One row per (doc, chunk) the doc's tokens land in:
    (doc cols..., chunk_id, chunk_off, doc_off, seg_len) where chunk_off
    is the segment's start inside the chunk, doc_off the segment's start
    inside the doc, seg_len its length. sum(seg_len) over a doc = n_tok;
    sum(seg_len) over a chunk = capacity (except the final chunk)."""
    spark = df.sparkSession
    p = int(partitions or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n = F.col(n_tok_col).cast("long")
    o = F.col(order_col).cast("long")
    live = df.filter(n > 0)
    b = live.agg(
        F.min(o).alias("lo"), F.max(o).alias("hi")
    ).first()
    if b["lo"] is None:  # empty input: typed empty result
        return live.select(
            *df.columns,
            F.lit(0).cast("long").alias("chunk_id"),
            F.lit(0).cast("long").alias("chunk_off"),
            F.lit(0).cast("long").alias("doc_off"),
            F.lit(0).cast("long").alias("seg_len"),
        )
    lo, span = int(b["lo"]), int(b["hi"]) - int(b["lo"]) + 1
    # all-integer binning: fixed ranges of width ceil(span/p); (o-lo) DIV w
    # is monotone in o, lands in [0, p-1], and never overflows int64 (no
    # multiply by p — float division here would round bucket boundaries
    # past 2^53, breaking the module's exact-integer-math contract)
    w_rid = (span + p - 1) // p
    ranged = live.withColumn("_delta", o - F.lit(lo)).withColumn(
        "_rid", F.expr(f"CAST(_delta DIV {w_rid} AS BIGINT)")
    ).drop("_delta")
    offs = (
        ranged.groupBy("_rid")
        .agg(F.sum(n).alias("_rsum"))
        .select(
            "_rid",
            F.coalesce(
                F.sum("_rsum").over(
                    Window.orderBy("_rid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long").alias("_roff"),
        )
    )
    w_in = (
        Window.partitionBy("_rid")
        .orderBy(o.asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        F.col("_roff") + F.coalesce(F.sum(n).over(w_in), F.lit(0))
    ).cast("long")
    # Stage the window result before the generator (Spark cannot host a
    # window expression and explode() in one Project), and use integer DIV
    # — float division would lose exactness past 2^53 cumulative tokens.
    cummed = ranged.join(F.broadcast(offs), "_rid").select(
        *[c for c in df.columns],
        cum.alias("_cum"),
        n.alias("_n"),
    )
    out = cummed.select(
        *[c for c in df.columns],
        "_cum",
        "_n",
        F.explode(
            F.sequence(
                F.expr(f"_cum DIV {int(capacity)}"),
                F.expr(f"(_cum + _n - 1) DIV {int(capacity)}"),
            )
        ).alias("chunk_id"),
    )
    chunk_lo = F.col("chunk_id") * capacity
    seg_lo = F.greatest(F.col("_cum"), chunk_lo)
    seg_hi = F.least(F.col("_cum") + F.col("_n"), chunk_lo + capacity)
    return out.select(
        *[c for c in df.columns],
        "chunk_id",
        (seg_lo - chunk_lo).alias("chunk_off"),
        (seg_lo - F.col("_cum")).alias("doc_off"),
        (seg_hi - seg_lo).alias("seg_len"),
    )
