"""Text-analysis operators for large-scale training-data pipelines.

Engine additions beyond the reference (per the build contract): language-ID
heuristic, quality scoring, token counting, document fingerprinting — all
pure Column expressions over a `documents(doc_id, text, lang, source,
n_chars)` table, designed so a DuckDB oracle can reproduce them exactly
(shared md5-based hashing, shared whitespace tokenization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# word -> 60-bit int via md5 hex; same expression exists in DuckDB:
#   CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)
def word_hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_hash28(col: Column) -> Column:
    """28-bit variant — safe for (a*h+b) % p minhash math in int64."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def words(text_col: str = "text") -> Column:
    """Shared tokenization: lowercase, split on whitespace runs, drop empties.
    (C7-style string parsing; identical in DuckDB via string_split_regex.)"""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )


def ngram_shingles(w: Column, n: int) -> Column:
    """Word n-gram shingle strings from a words-array expression.

    Built as arrays_zip of n shifted slices, then one concat per struct.
    Crucially the lambda body never references `w`: Catalyst's
    CollapseProject inlines column aliases into lambda bodies, so a
    formulation like `transform(idx, i -> concat(w[i], w[i+1], ...))`
    re-evaluates the whole words expression (a regex split of the full text)
    once PER SHINGLE ELEMENT — O(L²) work that measured 10-50× slower. Here
    `w` is evaluated n times per row (once per slice), total O(L·n).
    Short docs (< n words) yield an empty array."""
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(w, F.lit(j + 1), m).alias(f"g{j}") for j in range(n)]
    )
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"g{j}"] for j in range(n)])
    )


STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "nicht"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "de", "que", "es", "un", "en"),
}


# GPT-2-style pre-tokenizer, restricted to constructs Java regex and RE2
# share (no lookahead, explicit ASCII classes): contraction suffixes,
# space-prefixed letter/digit runs, space-prefixed punctuation runs,
# whitespace runs. Alternation is leftmost-FIRST in both engines, so the
# branch order is part of the contract. Whitespace is the EXPLICIT class
# [ \t\n\f\r], not \s: Java's \s includes \x0B while RE2's does not, so
# \s would silently diverge on vertical tabs.
_WS = " \\t\\n\\f\\r"
BPE_RE = (
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    f"| ?[^A-Za-z0-9{_WS}]+|[{_WS}]+"
)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + distinct-token count + char-per-token,
    plus the BPE-ish pre-tokenizer count (`BPE_RE`) — the usual proxy for
    "how many subword tokens will the trainer see" without shipping a
    vocab file.

    The words array is staged behind a select (here and in the sibling
    metrics below): several output columns reference it, and
    CollapseProject inlines a DIRECT expression into every reference (one
    regex tokenization per reference) but keeps a multiply-referenced
    non-cheap ALIAS at one evaluation (SPARK-36718)."""
    staged = df.select("doc_id", F.col(text_col), words(text_col).alias("_w"))
    w = F.col("_w")
    return staged.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        (F.length(text_col) / F.size(w)).alias("chars_per_token"),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, mean word length, stopword ratio,
    punctuation ratio, uppercase ratio — the usual pre-training screens.
    Words staged behind a select — see token_count."""
    staged = df.select("doc_id", F.col(text_col), words(text_col).alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    mean_wlen = F.aggregate(
        w, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / n
    stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS["en"])))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", ""))
    return staged.select(
        "doc_id",
        F.length(text_col).alias("n_chars_m"),
        n.alias("n_tokens"),
        mean_wlen.alias("mean_word_len"),
        (stop / n).alias("stopword_ratio"),
        (punct / F.length(text_col)).alias("punct_ratio"),
        (upper / F.length(text_col)).alias("upper_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free language ID heuristic: argmax of stopword hits per
    language. Deterministic, SQL-expressible. Words staged behind a
    select — see token_count (one tokenization, not one per language)."""
    staged = df.select("doc_id", "lang", words(text_col).alias("_w"))
    w = F.col("_w")

    def in_set(sw):
        return lambda x: x.isin(*sw)

    hits = [
        F.size(F.filter(w, in_set(sw))).alias(f"hits_{lg}")
        for lg, sw in STOPWORDS.items()
    ]
    scored = staged.select("doc_id", "lang", *hits)
    langs = list(STOPWORDS)
    arr = F.array(*[F.col(f"hits_{lg}") for lg in langs])
    best = F.array_position(arr, F.array_max(arr))
    pred = F.when(F.array_max(arr) == 0, F.lit("unknown"))
    for i, lg in enumerate(langs, start=1):
        pred = pred.when(best == i, F.lit(lg))
    return scored.select("doc_id", "lang", pred.alias("pred_lang"), *[f"hits_{lg}" for lg in langs])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: order-independent 60-bit hash combination
    (bit_xor of word hashes) + length — a cheap rolling-hash-style content id
    usable for exact-content dedup across shards. Words staged behind a
    select — see token_count."""
    staged = df.select("doc_id", words(text_col).alias("_w"))
    w = F.col("_w")
    xor_hash = F.aggregate(
        F.transform(w, word_hash60),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )
    return staged.select(
        "doc_id",
        xor_hash.alias("fingerprint"),
        F.size(w).alias("n_tokens"),
    )


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 of a fixed query-term set against every document.

    Classic retrieval scoring for corpus triage (e.g. topic-targeted
    subset selection before training). Two corpus passes, both scale-safe:

    1. one hash aggregate for the global stats — N, avgdl, and per-term
       document frequencies (a handful of sums, map-side combined);
    2. one scan computing tf per term as a Column expression
       (`size(filter(words, = term))`), joined to the 1-row stats frame
       via broadcast crossJoin — no per-row Python, no shuffle beyond
       the single-row aggregate.

    idf uses the +1 log form (always positive): ln(1 + (N - df + 0.5) /
    (df + 0.5)). The score is emitted quantized to integer micro-units
    (floor(x*1e6 + 0.5)) because ln/avg differ across engines by ~1ulp."""
    # words staged behind a select: one tokenization, not one per query
    # term (CollapseProject inlines a direct expression into every tf_i
    # reference; a multiply-referenced alias stays at one eval, SPARK-36718)
    staged = df.select("doc_id", words(text_col).alias("_w"))
    w = F.col("_w")
    dl = F.size(w)
    tfs = [
        F.size(F.filter(w, lambda x: x == F.lit(t))).alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    toks = staged.select("doc_id", dl.alias("dl"), *tfs)
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = toks.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}").cast("double")
        score = score + idf * tf * (k1 + 1.0) / (
            tf + F.lit(k1) * (1.0 - b + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    return scored.select(
        "doc_id",
        F.col("dl").alias("n_tokens"),
        *[F.col(f"tf_{i}").alias(f"tf_{i}") for i in range(len(terms))],
        F.floor(score * 1000000 + 0.5).cast("long").alias("bm25_e6"),
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Top-k TF-IDF terms per document (corpus keyword extraction).

    Plan shape: one explode -> (doc, term) hash-agg for tf (shuffle on
    (doc, term)) -> term document frequencies derived FROM that table
    (groupBy(term), no re-tokenization) -> join tf⋈df on term (AQE picks
    broadcast when the vocabulary is small) -> per-doc top-k window.
    The corpus size N rides in via a broadcast 1-row crossJoin.

    Cross-engine determinism: scores are quantized to integer micro-units
    BEFORE ranking, and ties break on the term string — so the top-k set
    is identical across engines even when two scores differ only by ln()
    ulp noise."""
    from pyspark.sql import Window

    w = words(text_col)
    tf = (
        df.select("doc_id", F.explode(w).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency as a window count riding the term exchange — a
    # separate groupBy(term) + join would re-run the tokenize+agg subplan
    # a second time (Spark does not auto-materialize shared subplans); the
    # window sees (doc, term)-granularity rows, so the hottest term costs
    # n_docs rows, never n_token_occurrences
    dfq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    ndocs = df.select(F.count(F.lit(1)).alias("n_docs"))
    score = F.log(F.col("n_docs") / F.col("df")) * F.col("tf").cast("double")
    scored = (
        tf.withColumn("df", dfq)
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.floor(score * 1000000 + F.lit(0.5)).cast("long").alias("score_e6"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("score_e6").desc(), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= k)
    )


def unigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram-LM negative log-likelihood per document (fluency/quality
    scoring: high NLL = tokens rare in this corpus = outlier doc).

    Per-word -ln(count(w)/total_tokens) is quantized to integer
    micro-units BEFORE the per-doc sum, so the sum is int64 and immune to
    float summation order — Spark's partial-aggregation order is
    nondeterministic, so a double sum would not even be stable across
    runs, let alone across engines.

    Plan shape: explode -> (doc, term) tf hash-agg (map-side combine, so
    the term shuffle never carries token-level rows) -> corpus term count
    as a window SUM(tf) riding the term exchange (a groupBy + join back
    would re-run the tokenize+agg subplan; the hottest term costs n_docs
    window rows, not n_occurrences) -> per-doc weighted int sum
    (sum(tf · qlp) == the per-token sum, exactly, since qlp is constant
    per term). The corpus total rides in via a broadcast 1-row
    crossJoin."""
    from pyspark.sql import Window

    tf = (
        df.select("doc_id", F.explode(words(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cnt = F.sum("tf").over(Window.partitionBy("term"))
    total = df.select(
        F.sum(F.size(words(text_col))).cast("long").alias("total")
    )
    qlp = F.floor(
        -F.log(F.col("cnt") / F.col("total")) * 1000000 + F.lit(0.5)
    ).cast("long")
    return (
        tf.withColumn("cnt", cnt)
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_words"),
            F.sum(qlp * F.col("tf")).alias("nll_e6"),
        )
        .select(
            "doc_id",
            "n_words",
            "nll_e6",
            F.floor(F.col("nll_e6") / F.col("n_words"))
            .cast("long")
            .alias("avg_nll_e6"),
        )
    )


def cross_split_contamination(
    df: DataFrame,
    split_col: str = "split",
    n: int = 8,
    min_shared: int = 1,
    max_shingle_df: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Train/test contamination detection: test documents sharing word
    n-gram shingles with train documents (the decontamination primitive —
    run before training to evict evaluation text from the corpus).

    Input carries a `split_col` ('train' | 'test'; other values ignored).
    Output (test_doc, train_doc, n_shared) for pairs sharing >=
    `min_shared` distinct n-gram shingles.

    Plan shape mirrors ngram_jaccard_pairs' single-shuffle inverted
    index, bipartite variant: hashed shingles explode -> window df-cap
    riding the shingle exchange (stop-shingles dropped BEFORE the posting
    lists buffer) -> per-shingle SEPARATE train/test posting lists
    (collect_list skips the nulls of the other side) -> train x test pair
    generation JVM-side inside the bucket -> pair count. No self-join, no
    train-vs-test shuffle asymmetry, and the df cap bounds the bucket
    fan-out exactly as in the near-dup path."""
    from pyspark.sql import Window

    wdf = df.select(
        "doc_id", F.col(split_col).alias("sp"), words(text_col).alias("w")
    ).filter(F.size("w") >= n)
    inv = wdf.select(
        "doc_id",
        "sp",
        F.explode(
            F.array_distinct(
                F.transform(ngram_shingles(F.col("w"), n), word_hash60)
            )
        ).alias("sh"),
    )
    wsh = Window.partitionBy("sh")
    buckets = (
        inv.withColumn("_df", F.count(F.lit(1)).over(wsh))
        .filter(F.col("_df") <= max_shingle_df)
        .groupBy("sh")
        .agg(
            F.array_sort(
                F.collect_list(F.when(F.col("sp") == "train", F.col("doc_id")))
            ).alias("tr"),
            F.array_sort(
                F.collect_list(F.when(F.col("sp") == "test", F.col("doc_id")))
            ).alias("te"),
        )
        .filter((F.size("tr") >= 1) & (F.size("te") >= 1))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("te"),
                    lambda t: F.transform(
                        F.col("tr"),
                        lambda r: F.struct(
                            t.alias("test_doc"), r.alias("train_doc")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.test_doc", "p.train_doc")
    return (
        pairs.groupBy("test_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_fingerprints(
    df: DataFrame, k: int = 3, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every word
    k-gram, slide a window of w consecutive k-gram hashes over the doc, and
    keep the DISTINCT window minima — the guarantee is that any match of at
    least w+k-1 tokens between two docs shares a fingerprint, at ~2/(w+1)
    of the full shingle-set size.

    One explode + one sliding row-window per doc + distinct, all
    JVM-side. The k-gram hash is the shared md5->int64 (a Rabin-Karp
    rolling hash is an equivalence-preserving optimization hidden behind
    the hash interface; md5 keeps bit-parity with the SQL oracle).
    Output: (doc_id, fp) exploded — one row per distinct fingerprint.

    Short-doc fallback (mirrors minhash's whole-doc fallback): a doc with
    fewer than w k-grams still emits min(h) over all its k-grams (the
    pos=0 clipped window), and a doc with fewer than k tokens emits the
    whole-doc hash — no doc ever has zero fingerprints, so short exact
    dups remain matchable."""
    from pyspark.sql import Window

    # words staged behind a select: ngram_shingles references its input 2k
    # times and CollapseProject inlines a direct expression into every
    # reference (k regex splits per row) but keeps a multiply-referenced
    # non-cheap ALIAS at one evaluation (SPARK-36718)
    wdf = df.select("doc_id", words(text_col).alias("_wd"))
    sh = wdf.select(
        "doc_id",
        F.posexplode(
            F.transform(ngram_shingles(F.col("_wd"), k), word_hash60)
        ).alias("pos", "h"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    n = Window.partitionBy("doc_id")
    full = (
        sh.withColumn("wmin", F.min("h").over(win))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        # full windows; docs with < w k-grams keep the pos=0 clipped window
        .filter(F.col("pos") <= F.greatest(F.col("_n") - w, F.lit(0)))
        .select("doc_id", F.col("wmin").alias("fp"))
        .distinct()
    )
    tiny = (
        df.select("doc_id", words(text_col).alias("_w"))
        .filter((F.size("_w") > 0) & (F.size("_w") < k))
        .select("doc_id", word_hash60(F.concat_ws(" ", "_w")).alias("fp"))
    )
    return full.unionByName(tiny)


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition screens at word granularity:

    - ``dup_word_frac``: 1 - distinct/total tokens (bulk repetition)
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over the bigram count (boilerplate phrasing); 0.0 for 1-token docs
    - ``max_run``: longest run of consecutive identical tokens (stutter)

    All three are pure array expressions — zero shuffles, the whole thing
    runs inside the parquet scan stage and survives any scale-up that the
    scan itself does. The bigram mode is found by sorting the bigram array
    and taking the longest equal-run (array_sort + one aggregate pass),
    which avoids a per-doc groupBy entirely.

    Rationale (public): Rae et al. 2021 (Gopher) §A1.1 repetition filters;
    Raffel et al. 2020 (C4) boilerplate heuristics.
    """
    # Materialize the token and bigram arrays as named columns first: each
    # metric below references them several times, and CollapseProject only
    # inlines aliases that are cheap or single-use (SPARK-36718) — this
    # two-step select keeps the regex tokenization at exactly ONE
    # evaluation per row (verified in the physical plan) instead of ~12.
    base = df.select("doc_id", words(text_col).alias("_w")).select(
        "doc_id", "_w", ngram_shingles(F.col("_w"), 2).alias("_bg")
    )
    w, bg = F.col("_w"), F.col("_bg")
    n, nb = F.size(w), F.size(bg)
    dup = F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(w)) / n
    ).otherwise(F.lit(0.0))
    top = _max_equal_run(F.array_sort(bg))
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        dup.alias("dup_word_frac"),
        F.when(nb > 0, top / nb).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        _max_equal_run(w).cast("long").alias("max_run"),
    )


def _max_equal_run(arr: Column) -> Column:
    """Longest run of consecutive equal elements, as one aggregate() pass
    with a (prev, run, best) struct accumulator. Empty array -> 0."""
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = (
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(arr, init, step, lambda acc: acc["best"])


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): plain char classes, bounded repetition, ASCII \b only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact email/phone PII spans (the standard pre-training
    scrub pass). Pure regexp Column expressions — map-only, no shuffle;
    at 100 TB this rides the ingest scan like every other per-doc screen.
    Emails are redacted before phones so a phone-shaped substring inside a
    redacted email span is not double-counted. Output keeps the full
    cleaned text; callers hash or store it as they wish."""
    t = F.col(text_col)
    # count phones on the EMAIL-REDACTED text, not the original: a
    # phone-shaped substring inside an email span is swallowed by the
    # email redaction, and n_phones must equal the number of <PHONE>
    # tokens actually emitted
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    return df.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(no_email, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        clean.alias("clean_text"),
    )


BLOOM_POS_PARAMS = ((7, 3), (11, 5), (13, 17))  # k=3 position derivations


def bloom_decontaminate(
    df: DataFrame,
    split_col: str = "split",
    n: int = 8,
    m_bits: int = 1 << 22,
    text_col: str = "text",
) -> DataFrame:
    """Bloom-prefiltered decontamination — the SCALE path in front of
    `cross_split_contamination`: at 100 TB the exact screen's inverted
    index shuffles every train shingle, while an eval/test set is tiny by
    construction (benchmarks), so the right first pass is a sketch of the
    test shingles probed map-only over train.

    Construction is deterministic integer math so a SQL oracle reproduces
    it bit-for-bit: shingle -> 28-bit md5 hash h, k=3 bit positions
    ((h*a + b) mod M31) mod m (overflow-safe in int64 because h < 2^28).
    The set-bit table (<= k * |test shingles| rows — the filter's
    popcount, NOT the corpus size) is broadcast ONCE, and the probe stacks
    all k positions of a train shingle into one exploded (doc, shingle,
    pos) stream joined once against it — map-only over the big side, one
    derivation of the bit table instead of k sequential joins over k
    renames of it — then a (doc, shingle) partial aggregate keeps shingles
    whose k probes all matched, and a per-doc aggregate finishes.

    Output, one row per train doc: n_shingles, n_maybe (shingles whose k
    bits are all set), flagged. GUARANTEE: no false negatives — every
    train doc sharing an n-gram with the test split is flagged; false
    positives at the bloom rate (~(k*S/m)^k per shingle), to be fed to
    the exact screen. SIZE m_bits to the test set: ~16 bits per test
    shingle keeps the per-shingle FP under 1e-5 (an undersized filter
    silently flags — and a decontamination pass then DROPS — a growing
    fraction of clean docs: at 24% fill, ~half of 47-shingle docs
    false-flag). Unlike Spark's built-in bloom_filter_agg, the
    md5-derived construction is engine-independent (cross-checkable) and
    needs no private hash."""
    base = df.select(
        "doc_id", F.col(split_col).alias("sp"), words(text_col).alias("w")
    ).filter(F.size("w") >= n)
    sh = base.select(
        "doc_id",
        "sp",
        F.explode(
            F.array_distinct(
                F.transform(
                    ngram_shingles(F.col("w"), n),
                    lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast(
                        "long"
                    ),
                )
            )
        ).alias("h"),
    )
    m31 = 2_147_483_647

    def pos(i: int) -> Column:
        a, b = BLOOM_POS_PARAMS[i]
        return F.pmod(
            F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(m31)), F.lit(m_bits)
        )

    k = len(BLOOM_POS_PARAMS)
    bits = (
        sh.filter(F.col("sp") == "test")
        .select(F.explode(F.array(*[pos(i) for i in range(k)])).alias("bpos"))
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    probe = sh.filter(F.col("sp") == "train").select(
        "doc_id",
        "h",
        F.explode(F.array(*[pos(i) for i in range(k)])).alias("p"),
    )
    # one broadcast join for all k probes; a duplicate position within a
    # shingle's k-array matches its bit row once per occurrence (bits is
    # distinct), so sum(_set) == k still means "every probe hit"
    per_shingle = (
        probe.join(F.broadcast(bits), probe["p"] == bits["bpos"], "left")
        .groupBy("doc_id", "h")
        .agg(F.sum(F.coalesce(F.col("_set"), F.lit(0))).alias("_nm"))
    )
    return (
        per_shingle.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("_nm") == k).cast("long")).alias("n_maybe"),
        )
        .withColumn("flagged", F.col("n_maybe") >= 1)
    )


def bigram_logprob(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Cross-split bigram LM scoring with stupid backoff (Brants et al.
    2007, "Large Language Models in Machine Translation") — the
    CCNet-style LM quality screen: train the counts on the TRAIN split,
    score the held-out docs; low average negative log-likelihood means
    fluent/in-domain text, high means junk or out-of-domain.

    s(w2|w1) = c12/c1(w1) when the bigram was seen in train, else
    alpha * (c2(w2)+1) / (N+1) — add-one unigram backoff so OOV words
    score finitely. Per-bigram -ln(s) is quantized to integer micro-units
    BEFORE the per-doc sum (int64 sums are immune to partial-aggregation
    order — see unigram_logprob), so the result is engine-exact.

    Plan: train bigram/unigram counts are hash-aggregates (map-side
    combined); the scored side joins its per-doc bigram tf table against
    the count tables on (w1, w2) and w1/w2 — count tables are
    vocabulary-sized, far below corpus size, and Spark picks
    broadcast vs shuffle join by their actual size. Output:
    (doc_id, n_bigrams, nll_e6, avg_nll_e6) for split == 'test' docs."""
    base = df.select(
        "doc_id", F.col(split_col).alias("_sp"), words(text_col).alias("_w")
    )
    pair = F.zip_with(
        F.slice(F.col("_w"), F.lit(1), F.size("_w") - 1),
        F.slice(F.col("_w"), F.lit(2), F.size("_w") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = base.select("doc_id", "_sp", F.explode(pair).alias("bg")).select(
        "doc_id", "_sp", "bg.w1", "bg.w2"
    )
    c12 = (
        big.filter(F.col("_sp") == "train")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    uni = (
        base.filter(F.col("_sp") == "train")
        .select(F.explode("_w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = uni.agg(F.sum("c").cast("long").alias("n_train"))
    tf = (
        big.filter(F.col("_sp") == "test")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    u1 = uni.select(F.col("t").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("t").alias("w2"), F.col("c").alias("c2"))
    s = F.when(
        F.col("c12").isNotNull(), F.col("c12") / F.col("c1")
    ).otherwise(
        F.lit(alpha)
        * (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
        / (F.col("n_train") + F.lit(1))
    )
    q = F.floor(-F.log(s) * 1000000 + F.lit(0.5)).cast("long")
    return (
        tf.join(c12, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(n_total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(q * F.col("tf")).alias("nll_e6"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "nll_e6",
            F.floor(F.col("nll_e6") / F.col("n_bigrams"))
            .cast("long")
            .alias("avg_nll_e6"),
        )
    )


def char_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of the character distribution — the classic
    gibberish / binary-spam / encoding-junk screen (low entropy = repeated
    filler, high = random bytes; natural language sits in a narrow band).

    Identity: H = ln(n) - (1/n)·Σ_c c·ln(c) over per-character counts c.
    The count terms come from a RUN-LENGTH fold over the sorted character
    array — zero shuffles, the whole metric runs inside the scan stage.
    Each run's c·ln(c) is quantized to int micro-units as it retires, so
    the accumulated sum is int64 and independent of both summation order
    and engine (the DuckDB oracle computes the same quantized terms from
    an explode + group-by — different plan, identical integers).

    Output: (doc_id, n_chars_t, n_distinct_chars, ent_e6) with
    ent_e6 = floor(ln(n)·1e6 + 0.5) - floor(S/n) in micro-nats."""
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != F.lit(""))
    srt = F.array_sort(chars)

    def q_term(run: Column) -> Column:
        return F.when(
            run > 1,
            F.floor(
                run.cast("double") * F.log(run.cast("double")) * 1000000
                + F.lit(0.5)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("s"),
        F.lit(0).cast("long").alias("k"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x == acc["prev"]
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["s"]).otherwise(acc["s"] + q_term(acc["run"])).alias("s"),
            F.when(same, acc["k"]).otherwise(acc["k"] + 1).alias("k"),
        )

    fold = F.aggregate(
        srt,
        zero,
        step,
        lambda acc: F.struct(
            (acc["s"] + q_term(acc["run"])).alias("s"), acc["k"].alias("k")
        ),
    )
    staged = df.select(
        "doc_id", F.size(chars).alias("n_chars_t"), fold.alias("_f")
    )
    n = F.col("n_chars_t").cast("double")
    ent = F.when(
        F.col("n_chars_t") > 0,
        F.floor(F.log(n) * 1000000 + F.lit(0.5)).cast("long")
        - F.floor(F.col("_f.s") / F.col("n_chars_t")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return staged.select(
        "doc_id",
        F.col("n_chars_t").cast("long").alias("n_chars_t"),
        F.col("_f.k").alias("n_distinct_chars"),
        ent.alias("ent_e6"),
    )


def dsir_weights(
    df: DataFrame,
    target_col: str = "is_target",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023, DSIR):
    per-doc log importance weight log(p_target(x)/p_raw(x)) under hashed
    bag-of-ngram (unigram + bigram) multinomial LMs — the public recipe for
    tilting a raw web corpus toward a target domain before sampling.

    Features are md5-hashed into `n_buckets` buckets (the paper's hashed
    n-gram trick: vocabulary-independent, fixed model size). Both LMs are
    add-one-smoothed multinomials over buckets; the per-bucket log-ratio
    ln((ct+1)/(Nt+B)) - ln((cr+1)/(Nr+B)) is quantized to integer
    micro-units BEFORE the per-doc tf-weighted int64 sum, so the weight is
    engine-exact (the unigram_logprob pattern).

    Plan: the feature stream (explode of unigrams + zipped bigrams) feeds
    ONE hash-aggregate keyed by bucket for each LM — map-side combined,
    output bounded by n_buckets regardless of corpus size — and the tiny
    count tables broadcast back onto the per-doc bucket tf aggregate. No
    window, no skew: bucket cardinality is capped by construction.

    Returns (doc_id, n_feats, logw_e6); resampling is a downstream
    deterministic Gumbel top-k over logw_e6 (see q_dsir_select)."""
    w = words(text_col)
    feats = F.concat(w, ngram_shingles(w, 2))
    base = df.select(
        "doc_id",
        F.col(target_col).alias("_t"),
        F.explode(feats).alias("_f"),
    ).select(
        "doc_id",
        "_t",
        F.pmod(word_hash60(F.col("_f")), F.lit(n_buckets)).alias("b"),
    )
    tf = base.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("tf"))
    ct = (
        base.filter(F.col("_t"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    cr = base.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    nt = base.filter(F.col("_t")).agg(F.count(F.lit(1)).alias("nt"))
    nr = base.agg(F.count(F.lit(1)).alias("nr"))
    lr = F.floor(
        (
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                / (F.col("nt") + F.lit(float(n_buckets)))
            )
            - F.log(
                (F.col("cr") + F.lit(1.0))
                / (F.col("nr") + F.lit(float(n_buckets)))
            )
        )
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    return (
        tf.join(F.broadcast(ct), "b", "left")
        .join(F.broadcast(cr), "b")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_feats"),
            F.sum(lr * F.col("tf")).cast("long").alias("logw_e6"),
        )
    )
