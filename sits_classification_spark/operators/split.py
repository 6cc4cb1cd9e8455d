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

Scale posture: the stratum rank is a SALTED two-phase prefix rank (the
pack_chunks pattern): the 60-bit order hash is range-bucketed into n_salt
sub-strata, per-(stratum, salt) counts form a tiny side table whose
exclusive prefix sums broadcast back, and the row-level window partitions
by (stratum, salt) — so a giant stratum (90%-English corpora: `lang` IS a
giant stratum) costs at most stratum/n_salt rows per task instead of
serializing into one. Bucketing by a RANGE of the same hash the window
orders by keeps the global (hash, id) order, so the salted rank — and
therefore every split assignment — is bit-identical to the unsalted
single-window form (n_salt=1 degenerates to it).
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
    n_salt: int = 32,
) -> DataFrame:
    """Adds a `split` column ('train' | 'val' | 'test') with exact
    per-stratum proportions; `frac` (the stratum-relative rank in [0, 1))
    is exposed for auditing. Boundaries: frac < train -> train,
    frac < train + val -> val, else test.

    The stratum-global rank is computed saltedly (module docstring): rank
    within (stratum, hash-range bucket) + the broadcast exclusive prefix
    of earlier buckets' counts. Identical output for any n_salt >= 1."""
    h = word_hash60(
        F.concat_ws(":", F.col(strata_col).cast("string"), F.col(id_col).cast("string"))
    )
    # integer DIV: h < 2^60 exceeds float53 precision, so a float divide
    # could misbucket a boundary hash
    bucket_w = (1 << 60) // max(int(n_salt), 1) + 1
    base = df.withColumn("_h", h).withColumn(
        "_salt", F.expr(f"_h DIV {bucket_w}")
    )
    sizes = base.groupBy(strata_col, "_salt").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    w_off = (
        Window.partitionBy(strata_col)
        .orderBy("_salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        strata_col,
        "_salt",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_bn").over(Window.partitionBy(strata_col)).alias("_cnt"),
    )
    w = Window.partitionBy(strata_col, "_salt").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    frac = (F.col("_off") + F.row_number().over(w) - F.lit(1)) / F.col("_cnt")
    split = (
        F.when(frac < F.lit(train), F.lit("train"))
        .when(frac < F.lit(train + val), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        base.join(F.broadcast(offs), [strata_col, "_salt"])
        .withColumn("frac", frac)
        .withColumn("split", split)
        .select(*df.columns, "frac", "split")
    )


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

    Plan shape: a DYNAMIC per-source target defeats Spark's
    WindowGroupLimit pushdown (verified via explain), so ranking the raw
    corpus against target_n would ship every source's full row set through
    the exchange. Instead the tiny plan is collected for its max target
    (one driver-side scalar off a per-source aggregate — the pack_chunks /
    ivf_centroids posture) and `cap_per_source(df, max_target)` pre-prunes
    FIRST: its literal cap pushes below the exchange (partial per map
    task), so a hot source ships at most max_target·tasks rows. Both
    stages rank by the same md5 hash, so cap_per_source's `rk` IS the
    mixture rank and the dynamic filter needs no second window."""
    plan = mixture_plan(df, budget_frac, temperature, source_col)
    max_target = plan.agg(F.max("target_n")).first()[0] or 0
    capped = cap_per_source(df, int(max_target), source_col, id_col)
    return (
        capped.join(F.broadcast(plan.select(source_col, "target_n")), source_col)
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
    min_mass: int | None = 1,
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
    broadcast-joined, one running-sum window per source ordered by the md5
    hash.

    Like mixture_sample, the dynamic target defeats WindowGroupLimit, so
    when every row's mass is >= ``min_mass`` (true for token/char counts
    over non-empty docs) the corpus is pre-pruned with cap_per_source at
    the literal cap max_target // min_mass — a doc at hash rank r has
    cum_toks >= r*min_mass, so no kept doc can sit past that rank, and the
    literal cap pushes below the exchange. The assumption is VALIDATED, not
    trusted: the pre-pass that sizes the cap also reads min(weight_col),
    and if any row's mass falls below ``min_mass`` the prune is SKIPPED
    (unpruned path, identical results) rather than silently cutting a
    zero-mass doc the running-sum rule would have kept. Pass
    ``min_mass=None`` to opt out of the prune entirely."""
    c = df.groupBy(source_col).agg(
        F.sum(weight_col).cast("long").alias("toks"),
        F.min(weight_col).cast("long").alias("_minw"),
    )
    wall = Window.partitionBy()
    s = F.pow(F.col("toks").cast("double"), F.lit(float(temperature)))
    weight = F.round(s / F.sum(s).over(wall), 6)
    budget = F.lit(float(budget_frac)) * F.sum("toks").over(wall)
    plan = c.select(
        source_col,
        F.floor(weight * budget).cast("long").alias("target_toks"),
        "_minw",
    )
    base = df
    if min_mass is not None and min_mass >= 1:
        lim = plan.agg(
            F.max("target_toks").alias("mt"), F.min("_minw").alias("mw")
        ).first()
        max_target = lim["mt"] or 0
        if lim["mw"] is not None and lim["mw"] >= min_mass:
            base = cap_per_source(
                df, int(max_target) // int(min_mass), source_col, id_col
            ).drop("rk")
    plan = plan.drop("_minw")
    h = F.md5(F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(source_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(plan), source_col)
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
    sketches, so their outputs cannot be cross-checked.

    Scale posture — exact quantiles of a value HISTOGRAM (the operator's
    lower-rank tie semantics resolve by value only, which makes this
    legal): a groupBy(group, value) hash-aggregate collapses the data to
    one row per distinct value — partial aggregation absorbs hot values
    map-side, so a giant group (one source = 90% of a corpus) ships its
    distinct-value histogram, not its rows, through the exchange — then a
    cumulative-count window runs over histogram rows (distinct values per
    group, orders of magnitude below row count for doc-length-like
    integers), and quantile q is the least value whose cumulative count
    reaches ceil(q·n). Identical output to the row-level rank form."""
    v = F.col(value_col)
    # NULL values are excluded BEFORE counting: Spark's asc is NULLS FIRST
    # while DuckDB's is NULLS LAST, so ranking nulls would silently shift
    # every quantile and break cross-engine parity; quantiles-of-non-null
    # is also the semantic a QA readout wants
    hist = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = hist.select(
        *group_cols,
        "_v",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(Window.partitionBy(*group_cols)).alias("_n"),
    )
    aggs = []
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("_n")).cast("long")
        name = f"q{int(round(q * 100)):02d}"
        aggs.append(
            F.min(F.when(F.col("_cum") >= target, F.col("_v"))).alias(name)
        )
    return ranked.groupBy(*group_cols).agg(
        F.max("_n").cast("long").alias("n"), *aggs
    )
