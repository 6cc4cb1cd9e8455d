"""Deterministic HyperLogLog distinct-count sketch (Flajolet et al. 2007).

Engine addition beyond the reference (100 TB posture: exact
count-distinct of doc fingerprints per source needs a full shuffle of
every distinct key; an HLL register table is p·2^p bits per group and
merges with a max — the standard sketch for corpus accounting). Spark's
built-in `approx_count_distinct` is also HLL but its hash and register
layout are implementation-private, so its estimates cannot be reproduced
by another engine; this one is md5-derived end-to-end and therefore
bit-reproducible anywhere md5 exists — the same design rationale as the
md5-seeded augmentations and SRP hyperplanes.

Register math (all integer, engine-exact):
  h        = 60-bit md5 prefix of the value
  bucket   = h >> (60 - p)                    (top p bits, 2^p registers)
  rem      = h & (2^(60-p) - 1)               (low 60-p bits)
  rank     = (60 - p) - floor(log2(rem)) if rem > 0 else (60 - p) + 1
             == number of leading zeros of rem in (60-p) bits, + 1
  register = max(rank) per (group, bucket)

floor(log2(rem)) is `length(bin(rem)) - 1` — a string-length trick that
both Spark and DuckDB evaluate identically on positive int64 (no float
log anywhere).

Estimate (the classic bias-corrected form):
  S        = sum over present registers of 2^(-register), plus one unit
             per EMPTY register. Computed exactly in int64 scaled by 2^50:
             sum(2^(50 - register)) + n_empty * 2^50 — powers of two up to
             50 bits, so the sum is exact where a double accumulation
             would depend on summation order.
  E_raw    = alpha_m * m^2 / (S / 2^50)
  E        = m * ln(m / V) if E_raw <= 2.5 m and V > 0 (linear counting,
             V = empty registers), else E_raw.
One double division + one ln at the very end, then micro-unit
quantization — the driver oracle reproduces it to the last digit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sits_classification_spark.operators.text import word_hash60

MERSENNE31 = 2_147_483_647


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    value: Column | str,
    group_cols: tuple[str, ...] = ("source",),
    p: int = 12,
) -> DataFrame:
    """Per-group HLL distinct estimate of `value`.

    Returns (group_cols..., n_exact_buckets, estimate_e6) where
    estimate_e6 is the HLL estimate in integer micro-units.

    Plan shape: two hash aggregations — (group, bucket) max(rank), then
    (group) sum — the first's map-side partial combine collapses
    duplicate values early, so the shuffle carries at most |group|·2^p
    rows regardless of input size. No window, no distinct, no float until
    the final scalar arithmetic.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    if isinstance(value, str):
        value = F.col(value)
    m = 1 << p
    rem_bits = 60 - p
    h = word_hash60(value.cast("string"))
    bucket = F.shiftright(h, rem_bits)
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    # rank: leading zeros in rem_bits, + 1;  floor(log2) via bin-string len
    rank = F.when(
        rem > 0, F.lit(rem_bits + 1) - F.length(F.bin(rem))
    ).otherwise(F.lit(rem_bits + 1))
    regs = (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("reg"))
    )
    # exact int64 accumulation of sum(2^-reg) scaled by 2^50
    # (the python shiftleft helper takes only a literal bit count; the SQL
    # form accepts a column). For p <= 10 a register can exceed 50, where
    # Java's shift-count masking would turn 1 << (50-reg) into a huge
    # positive term — clamp to 0 (the dropped contribution is < 2^-50 of
    # S); the DuckDB oracle applies the identical greatest().
    scaled = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(greatest(50 - reg, 0) AS INT))"
    )
    agg = regs.groupBy(*group_cols).agg(
        F.sum(scaled).alias("s_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    n_empty = F.lit(m) - F.col("n_buckets")
    s_total = (F.col("s_present") + n_empty * F.lit(1 << 50)).cast("double")
    e_raw = F.lit(_alpha(m) * m * m * float(1 << 50)) / s_total
    v = n_empty.cast("double")
    e = F.when(
        (e_raw <= 2.5 * m) & (n_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.floor(e * 1_000_000 + F.lit(0.5)).cast("long").alias("estimate_e6"),
    )


def mg_update(
    counters: dict[str, int], batch_counts: dict[str, int], k: int
) -> dict[str, int]:
    """One Misra-Gries merge step (the mergeable-summaries rule): add the
    batch's exact counts, then if more than k counters survive, subtract
    the (k+1)-th largest count from all and drop non-positives. Invariants
    (property-tested): <= k counters after every step; each surviving
    count is a lower bound on the true count; total undercount <= n/(k+1)
    where n is the tokens consumed so far. Pure: the input summary is
    copied, never mutated — merging one retained summary with several
    siblings must not corrupt it."""
    counters = dict(counters)
    for t, c in batch_counts.items():
        counters[t] = counters.get(t, 0) + int(c)
    if len(counters) > k:
        thr = sorted(counters.values(), reverse=True)[k]
        counters = {t: c - thr for t, c in counters.items() if c - thr > 0}
    return counters


def heavy_hitters(
    df: DataFrame,
    k: int = 4096,
    topn: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Top-``topn`` most frequent terms via a distributed Misra-Gries
    summary (Misra & Gries 1982; mergeability per Agarwal et al.,
    "Mergeable Summaries", PODS 2012).

    Why not a plain groupBy(term).count(): at 100 TB the term shuffle
    carries one row per DISTINCT term per map task — for web-scale vocab
    that is the dominant exchange. Misra-Gries bounds every map task's
    output at k rows regardless of vocabulary, with a total undercount of
    at most n/(k+1) per merged summary — the classic frequent-elements
    guarantee, sufficient to recover every term with frequency > n/(k+1).

    Plan: explode words (JVM) -> mapInPandas MG summary per partition
    (vectorized: pandas value_counts per Arrow batch, then the mergeable
    shrink — subtract the (k+1)-th largest count and drop non-positives —
    so Python work is O(unique terms per batch), never O(tokens)) ->
    groupBy(term) over <= k rows per partition -> top-n with a
    deterministic (count desc, term asc) tie-break.

    When every partition holds fewer than k distinct terms the summary
    never shrinks and counts are EXACT — the property the exact-groupBy
    DuckDB oracle relies on. The default k = 4096 keeps that exactness for
    any corpus whose per-partition vocabulary stays under 4096 (the
    fixtures' is ~31 — two orders of magnitude of headroom, so a richer
    future fixture cannot silently turn lower bounds into reordered
    top-10s), while still bounding every map task's shuffle output at k
    rows. When a shrink DOES fire (true web vocab), counts become the
    documented lower bounds — each task logs the event to stderr so an
    exactness assumption is auditable after the fact.
    """
    import pandas as pd

    from sits_classification_spark.operators.text import words

    toks = df.select(F.explode(words(text_col)).alias("term"))

    def mg(batches):
        import sys

        counters: dict[str, int] = {}
        shrinks = 0
        for pdf in batches:
            vc = pdf["term"].value_counts().to_dict()
            if len(counters.keys() | vc.keys()) > k:
                shrinks += 1  # the merged summary crosses k: a shrink fires
            counters = mg_update(counters, vc, k)
        if shrinks:
            print(
                f"[heavy_hitters] MG shrink fired ({shrinks} batches): "
                "counts are lower bounds, not exact",
                file=sys.stderr,
            )
        yield pd.DataFrame(
            {"term": list(counters.keys()), "cnt": list(counters.values())}
        )

    summaries = toks.mapInPandas(mg, "term string, cnt long")
    merged = summaries.groupBy("term").agg(F.sum("cnt").alias("count_lb"))
    return merged.orderBy(F.desc("count_lb"), F.asc("term")).limit(topn)


CM_PARAMS = ((7, 3), (11, 5), (13, 17), (19, 23))  # d=4 row derivations


def count_min(
    df: DataFrame,
    term_col: str = "term",
    width: int = 1024,
) -> DataFrame:
    """Deterministic Count-Min sketch (Cormode & Muthukrishnan 2005) over a
    term stream — the bounded-size frequency table for corpus accounting:
    where an exact term-frequency table is vocabulary-sized (unbounded),
    the sketch is d·width cells regardless of vocabulary, merges by cell
    addition (map-side combinable), and answers point queries with
    est >= true and est <= true + eps·N (eps = e/width) w.h.p.

    Like the HLL and the bloom filter, the row hashes are md5-derived
    integer math — ((h28·a + b) mod M31) mod width — so the cell table and
    every estimate are bit-reproducible in any engine with md5 (Spark's
    built-ins have no CM at all).

    Returns the cell table (row int, col long, cnt long) — d·width rows
    max. Plan: one explode-free pass (the caller provides the term rows),
    d projected positions per term via a posexplode of a 4-element array,
    then ONE hash aggregate."""
    h = F.pmod(
        F.conv(F.substring(F.md5(F.col(term_col)), 1, 7), 16, 10).cast("long"),
        F.lit(MERSENNE31),
    )
    cols = F.array(
        *[
            F.pmod(
                F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE31)),
                F.lit(width),
            )
            for a, b in CM_PARAMS
        ]
    )
    return (
        df.select(F.posexplode(cols).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, terms: DataFrame, term_col: str = "term", width: int = 1024
) -> DataFrame:
    """Point-query the Count-Min sketch for a set of terms: est(term) =
    min over the d rows of the addressed cell. The sketch (<= d·width
    rows) broadcasts; the probe is d broadcast lookups per term."""
    h = F.pmod(
        F.conv(F.substring(F.md5(F.col(term_col)), 1, 7), 16, 10).cast("long"),
        F.lit(MERSENNE31),
    )
    probes = terms.select(
        term_col,
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE31)),
                        F.lit(width),
                    )
                    for a, b in CM_PARAMS
                ]
            )
        ).alias("row", "col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
