"""Deterministic stratified train/val/test splitting.

Engine addition beyond the reference (training-data-pipeline layer; the
reference's trainer consumes pre-split sample files — ``force/skel``'s
sample workflow — and this operator produces them at corpus scale).

Semantics: within each stratum (language, label, source, ...) rows are
ordered by an md5-derived hash of (stratum, id) — a stable, data-independent
shuffle — and the first ceil(w_train * n) go to train, the next block to
val, the rest to test. EXACT proportions per stratum (unlike Bernoulli
hash-splitting, which only hits the proportions in expectation), fully
deterministic across runs and engines, and adding new rows only perturbs
assignments within the stratum the rows land in.

Scale posture: one window over (stratum) — a single shuffle partitioned by
stratum; the rank and the stratum count ride the same exchange. Strata are
assumed numerous-or-balanced (languages, labels); a single giant stratum
serializes its window — for that shape, salt the stratum into ranged
sub-strata and allocate blocks per sub-stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sits_classification_spark.operators.text import word_hash60


def stratified_split(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Adds a `split` column ('train' | 'val' | 'test') with exact
    per-stratum proportions; `frac` (the stratum-relative rank in [0, 1))
    is exposed for auditing. Boundaries: frac < train -> train,
    frac < train + val -> val, else test."""
    h = word_hash60(
        F.concat_ws(":", F.col(strata_col).cast("string"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    cnt = F.count(F.lit(1)).over(Window.partitionBy(strata_col))
    frac = (F.row_number().over(w) - F.lit(1)) / cnt
    split = (
        F.when(frac < F.lit(train), F.lit("train"))
        .when(frac < F.lit(train + val), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("frac", frac).withColumn("split", split)


def hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    rate_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling by hash threshold
    (corpus mixing: e.g. keep 10% of crawl, 100% of curated).

    A row survives iff md5_60(stratum:id) mod 1e6 < rate*1e6 — a pure
    integer comparison, so the decision is reproducible across runs,
    engines, and cluster sizes (no RNG, no partition dependence), and a
    row's fate never changes when other rows are added. Map-only: no
    shuffle, fully pushed into the scan stage. Rates are resolved via a
    literal CASE chain (rates ship with the plan, the broadcast-free path
    for a handful of strata); at thousands of strata switch to a
    broadcast-joined rates table."""
    h = word_hash60(
        F.concat_ws(":", F.col(rate_col).cast("string"), F.col(id_col).cast("string"))
    )
    expr = F.lit(int(default_rate * 1_000_000))
    for s, r in sorted(rates.items()):
        expr = F.when(F.col(rate_col) == s, F.lit(int(r * 1_000_000))).otherwise(
            expr
        )
    return df.filter(F.pmod(h, F.lit(1_000_000)) < expr)


def cap_per_source(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-source document cap (the source-balancing /
    domain-cap pass of a pre-training mixture): within each source, rows
    are ranked by an md5-derived hash of the id — a stable, uniform,
    data-independent shuffle — and only the first ``cap`` survive. Adds
    ``rk`` (the 1-based rank) for auditing.

    Unlike rate-based `hash_sample` this yields an exact COUNT per source,
    which is what mixture specs are written in ("at most N docs from
    source X").

    Scale posture: one window partitioned by source, and Spark plans the
    `row_number() <= cap` filter as a WindowGroupLimit pushed BELOW the
    exchange (partial per map task, final after): each task pre-prunes to
    its local top-`cap` rows per source, so a hot source ships at most
    cap·tasks rows through the shuffle and the final per-source sort sees
    cap·tasks rows, not the source's full row count — the two-phase cap a
    hand-written rewrite would build, produced by the optimizer."""
    h = F.md5(F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= cap)
    )


def mixture_plan(
    df: DataFrame,
    budget_frac: float = 0.5,
    temperature: float = 0.7,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based mixture sampling PLAN (the multilingual/domain
    rebalance of Conneau & Lample 2019 / Raffel et al. 2020 §3.4.3): the
    sampling weight of source i is q_i ∝ p_i^α with p_i = n_i/N and
    α = temperature — α < 1 upsamples the tail, α = 1 keeps natural
    proportions, α = 0 is uniform. The plan maps the weights to a document
    budget of budget_frac·N total docs: target_i = q_i·budget (capped at
    n_i — no upsampling-with-replacement here) and the equivalent keep
    rate.

    One row per source: (source, n_docs, weight, target_n, rate). Weight is
    rounded at 6 BEFORE the integer target mapping so the plan is
    bit-reproducible across engines (pow() may differ in the last ulp);
    target_n = floor(weight·budget + 0.5); rate = target_n/n_docs.

    Scale posture: one groupBy(source) hash-aggregate, then window sums
    over the per-source table — thousands of rows at most, a single tiny
    partition by design."""
    c = df.groupBy(source_col).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    wall = Window.partitionBy()
    s = F.pow(F.col("n_docs").cast("double"), F.lit(float(temperature)))
    weight = F.round(s / F.sum(s).over(wall), 6)
    budget = F.lit(float(budget_frac)) * F.sum("n_docs").over(wall)
    target = F.floor(weight * budget + F.lit(0.5)).cast("long")
    target_n = F.least(target, F.col("n_docs"))
    return c.select(
        source_col,
        "n_docs",
        weight.alias("weight"),
        target_n.alias("target_n"),
        F.round(target_n.cast("double") / F.col("n_docs"), 6).alias("rate"),
    )


def mixture_sample(
    df: DataFrame,
    budget_frac: float = 0.5,
    temperature: float = 0.7,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a temperature-mixture plan with EXACT per-source counts:
    within each source, rows are ranked by the md5 hash of (source, id) —
    the same stable data-independent shuffle as `cap_per_source` — and the
    first target_n survive. Exact-count beats Bernoulli thresholding here
    because mixture specs are contracts ("this source is 12.3% of the
    mix"), and the deterministic rank means re-running on the same corpus
    reproduces the same sample doc-for-doc.

    Plan shape: the per-source plan (tiny) broadcast-joins onto the corpus,
    then ONE window partitioned by source. Unlike cap_per_source's literal
    cap, the DYNAMIC per-source target defeats the WindowGroupLimit
    pushdown (verified via explain), so every source's rows cross the
    exchange once; at extreme scale pre-prune with
    `cap_per_source(df, max_target)` first — its literal cap DOES push
    below the exchange, and ranking by the same hash makes the composition
    exact."""
    plan = mixture_plan(df, budget_frac, temperature, source_col)
    h = F.md5(F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(plan.select(source_col, "target_n")), source_col)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= F.col("target_n"))
        .select(id_col, source_col, "rk")
    )


def mixture_sample_tokens(
    df: DataFrame,
    budget_frac: float = 0.5,
    temperature: float = 0.7,
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Token-budget temperature mixture: pre-training mixes are specified in
    TOKENS, not documents, so the weights q_i ∝ (tok_i)^α are computed over
    per-source token mass and each source keeps its hash-ranked docs while
    the RUNNING token total stays within target_i = q_i·budget_frac·total
    (greedy prefix — the last doc that would overshoot the budget is
    dropped, so the kept mass is always <= target).

    weight_col is any additive integer mass (token count, char count); the
    running sum stays in int64 so the keep decision is exact and
    engine-independent. Same plan shape as mixture_sample: tiny plan
    broadcast-joined, one window per source ordered by the md5 hash."""
    c = df.groupBy(source_col).agg(
        F.sum(weight_col).cast("long").alias("toks")
    )
    wall = Window.partitionBy()
    s = F.pow(F.col("toks").cast("double"), F.lit(float(temperature)))
    weight = F.round(s / F.sum(s).over(wall), 6)
    budget = F.lit(float(budget_frac)) * F.sum("toks").over(wall)
    plan = c.select(
        source_col, F.floor(weight * budget).cast("long").alias("target_toks")
    )
    h = F.md5(F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(source_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.join(F.broadcast(plan), source_col)
        .withColumn("cum_toks", F.sum(F.col(weight_col).cast("long")).over(w))
        .filter(F.col("cum_toks") <= F.col("target_toks"))
        .select(id_col, source_col, "cum_toks")
    )


def group_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    group_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """EXACT per-group quantiles of an integer-ish column (doc-length /
    token-count distributions per source — the standard corpus-QA
    readout), with `percentile_disc`-style lower-rank semantics: quantile
    q is the value at 1-based rank ceil(q * n) of the sorted group.

    Exact-and-reproducible beats approximate here: Spark's
    `percentile_approx` and DuckDB's `approx_quantile` use different
    sketches, so their outputs cannot be cross-checked. This computes true
    order statistics with ONE window over the group (rank and group count
    ride the same exchange) and keeps only the ceil(q·n) ranks — one
    output row per group, pivoted to q-columns.

    Scale posture: one shuffle partitioned by group; each group's sort is
    a per-partition sort (window), and the filter drops all but len(qs)
    rows per group before the final pivot aggregate. A pathological single
    giant group serializes its sort — at that shape switch the ordering
    column to (value, id) bucketed ranges and pre-aggregate counts per
    value (exact quantiles of a value HISTOGRAM), which this operator's
    semantics permit because ties are resolved by value only."""
    v = F.col(value_col)
    w = Window.partitionBy(*group_cols).orderBy(v.asc())
    cnt = F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    # NULL values are excluded BEFORE ranking: Spark's asc is NULLS FIRST
    # while DuckDB's is NULLS LAST, so ranking nulls would silently shift
    # every quantile and break cross-engine parity; quantiles-of-non-null
    # is also the semantic a QA readout wants
    ranked = df.filter(v.isNotNull()).select(
        *group_cols,
        v.alias("_v"),
        F.row_number().over(w).alias("_rn"),
        cnt.alias("_n"),
    )
    aggs = []
    cond = F.lit(False)
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("_n")).cast("long")
        cond = cond | (F.col("_rn") == target)
        name = f"q{int(round(q * 100)):02d}"
        aggs.append(
            F.min(F.when(F.col("_rn") == target, F.col("_v"))).alias(name)
        )
    return (
        ranked.filter(cond)
        .groupBy(*group_cols)
        .agg(F.max("_n").cast("long").alias("n"), *aggs)
    )
