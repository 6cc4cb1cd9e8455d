"""Corpus-screen operators: repetition metrics, PII scrub, Misra-Gries
heavy hitters, per-source caps (engine additions — the document-quality /
mixture-balancing passes of a pre-training pipeline)."""

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sits_classification_spark.operators.sketch import heavy_hitters
from sits_classification_spark.operators.split import cap_per_source
from sits_classification_spark.operators.text import pii_scrub, repetition_metrics


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=0, text="a b c d e"),                  # all distinct
        Row(doc_id=1, text="a a a a"),                    # one long run
        Row(doc_id=2, text="x y x y x y"),                # repeated bigram
        Row(doc_id=3, text="solo"),                       # single token
        Row(doc_id=4, text="p q p r p q"),                # mixed
    ]
    return spark.createDataFrame(rows)


def test_repetition_metrics_hand_checked(docs):
    out = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    # doc 0: no repetition at all
    assert out[0]["dup_word_frac"] == 0.0
    assert out[0]["top_bigram_frac"] == pytest.approx(1 / 4)
    assert out[0]["max_run"] == 1
    # doc 1: 4 copies of one token -> dup 3/4, run 4, bigram "a a" x3 of 3
    assert out[1]["dup_word_frac"] == pytest.approx(3 / 4)
    assert out[1]["top_bigram_frac"] == pytest.approx(1.0)
    assert out[1]["max_run"] == 4
    # doc 2: "x y" appears 3 times among 5 bigrams, no adjacent equals
    assert out[2]["top_bigram_frac"] == pytest.approx(3 / 5)
    assert out[2]["max_run"] == 1
    # doc 3: single token -> no bigrams, frac defined as 0
    assert out[3]["n_tokens"] == 1
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["max_run"] == 1
    # doc 4: "p q" twice of 5 bigrams
    assert out[4]["top_bigram_frac"] == pytest.approx(2 / 5)


def test_pii_scrub_counts_and_redacts(spark):
    rows = [
        Row(doc_id=0, text="mail me at bob@example.com or al.b+x@sub.org ok"),
        Row(doc_id=1, text="call 555-867-5309 twice 555-867-5309"),
        Row(doc_id=2, text="clean text with no pii at all"),
        # phone-shaped digits glued to more digits must NOT match (\b)
        Row(doc_id=3, text="serial 1555-867-53090 is not a phone"),
    ]
    out = {r["doc_id"]: r for r in pii_scrub(spark.createDataFrame(rows)).collect()}
    assert (out[0]["n_emails"], out[0]["n_phones"]) == (2, 0)
    assert out[0]["clean_text"] == "mail me at <EMAIL> or <EMAIL> ok"
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (0, 2)
    assert out[1]["clean_text"] == "call <PHONE> twice <PHONE>"
    assert (out[2]["n_emails"], out[2]["n_phones"]) == (0, 0)
    assert out[2]["clean_text"] == rows[2].text
    assert (out[3]["n_emails"], out[3]["n_phones"]) == (0, 0)


def test_repetition_metrics_random_docs_match_python(spark):
    """200 seeded random docs (skewed small vocab to force repetition):
    every metric equals the pure-python reference computed per doc."""
    import numpy as np

    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(200):
        n = int(rng.integers(1, 40))
        # geometric-ish skew: low indices dominate -> real dup/bigram mass
        idx = np.minimum(rng.geometric(0.35, size=n) - 1, len(vocab) - 1)
        docs.append(" ".join(vocab[j] for j in idx))
    out = {
        r["doc_id"]: r
        for r in repetition_metrics(
            spark.createDataFrame(
                [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
            )
        ).collect()
    }
    for i, t in enumerate(docs):
        w = t.split()
        n = len(w)
        bigs = [f"{a} {b}" for a, b in zip(w, w[1:])]
        runs, best = 1, 1
        for a, b in zip(w, w[1:]):
            runs = runs + 1 if a == b else 1
            best = max(best, runs)
        r = out[i]
        assert r["n_tokens"] == n
        assert r["dup_word_frac"] == 1.0 - len(set(w)) / n
        expect_tb = (max(Counter(bigs).values()) / len(bigs)) if bigs else 0.0
        assert r["top_bigram_frac"] == expect_tb, (i, t)
        assert r["max_run"] == best


def test_bpe_token_count_matches_python_re(spark):
    """BPE-ish pre-tokenizer count: contractions, punctuation runs,
    digit runs — pinned against Python re (leftmost-first alternation,
    the same semantics Java regex and RE2 apply to BPE_RE)."""
    import re

    from sits_classification_spark.operators.text import BPE_RE, token_count

    texts = [
        "I can't stop, won't stop 2x!",
        "hello   world...",
        "a1b2 c3",
        "it's we've they'll I'm you'd you're",
        # vertical tab: Java \s includes \x0B, RE2's does not — BPE_RE's
        # explicit whitespace class makes all three engines agree (one
        # punctuation run, since \x0B is NOT whitespace under the contract)
        "!\x0b!",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = {r["doc_id"]: r["n_bpe_tokens"] for r in token_count(df).collect()}
    for i, t in enumerate(texts):
        assert out[i] == len(re.findall(BPE_RE, t)), t
    # hand-checked: I | space-can | 't | space-stop | , | space-won | 't
    # | space-stop | space-2 | x | !
    assert out[0] == 11


def test_pii_scrub_phone_inside_email_not_double_counted(spark):
    # a phone-shaped substring swallowed by the email redaction must not
    # appear in n_phones — counts must equal the <PHONE> tokens emitted
    df = spark.createDataFrame(
        [Row(doc_id=0, text="reach me at 212-555-0123@mail.com please")]
    )
    r = pii_scrub(df).collect()[0]
    assert (r["n_emails"], r["n_phones"]) == (1, 0)
    assert r["clean_text"] == "reach me at <EMAIL> please"


def test_heavy_hitters_exact_when_vocab_below_k(spark):
    words = ["t%d" % (i % 7) for i in range(200)] + ["rare"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(words[i * 3:(i + 1) * 3])) for i in range(67)]
    )
    truth = Counter(w for r in df.collect() for w in r["text"].split())
    out = heavy_hitters(df, k=64, topn=5).collect()
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["term"], r["count_lb"]) for r in out] == expect


def test_heavy_hitters_shrink_keeps_frequent_terms(spark):
    # vocab 40 > k=8 forces Misra-Gries shrinks; the guarantee is that any
    # term with freq > n/(k+1) survives with count_lb <= true count
    rows = []
    text = ("hot " * 50 + " ".join("cold%d" % i for i in range(39))).strip()
    rows.append(Row(doc_id=0, text=text))
    df = spark.createDataFrame(rows).repartition(1)
    out = {r["term"]: r["count_lb"] for r in heavy_hitters(df, k=8, topn=3).collect()}
    assert "hot" in out
    assert out["hot"] <= 50
    # n = 89 tokens, error bound n/(k+1) < 10 -> lower bound at least 40
    assert out["hot"] >= 40


def test_group_quantiles_match_order_statistics(spark):
    from sits_classification_spark.operators.split import group_quantiles

    vals = {"a": [5, 1, 9, 3, 7], "b": list(range(1, 21))}
    rows = [
        Row(doc_id=i, source=s, n_chars=v)
        for s, vs in vals.items()
        for i, v in enumerate(vs)
    ]
    out = {
        r["source"]: r
        for r in group_quantiles(
            spark.createDataFrame(rows), "n_chars",
            qs=(0.25, 0.5, 0.75, 0.95), group_cols=("source",),
        ).collect()
    }
    # percentile_disc lower-rank semantics: value at rank ceil(q*n)
    for s, vs in vals.items():
        sv, n = sorted(vs), len(vs)
        assert out[s]["n"] == n
        for q, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.95, "q95")):
            import math

            assert out[s][col] == sv[math.ceil(q * n) - 1], (s, col)


def test_group_quantiles_histogram_on_skewed_group(spark):
    """A giant group (90% of rows) with heavy value ties: the histogram
    plan's window sees one row per DISTINCT value, and duplicated values
    must still yield the exact lower-rank order statistics."""
    import math

    from sits_classification_spark.operators.split import group_quantiles

    vals = {"big": [v % 17 for v in range(1800)], "small": [3, 1, 4, 1, 5]}
    rows = [
        Row(doc_id=i, source=s, n_chars=v)
        for s, vs in vals.items()
        for i, v in enumerate(vs)
    ]
    out_df = group_quantiles(
        spark.createDataFrame(rows), "n_chars",
        qs=(0.25, 0.5, 0.75, 0.95), group_cols=("source",),
    )
    out = {r["source"]: r for r in out_df.collect()}
    for s, vs in vals.items():
        sv, n = sorted(vs), len(vs)
        assert out[s]["n"] == n
        for q, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.95, "q95")):
            assert out[s][col] == sv[math.ceil(q * n) - 1], (s, col)
    # the window's input is the (group, value) aggregate: an Aggregate node
    # sits below the Window in the optimized plan (rows = distinct values,
    # not corpus rows)
    plan = out_df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("Window") < plan.index("+- Aggregate"), plan


def test_mixture_sample_prepruned_window_group_limit(spark):
    """mixture_sample pre-prunes with cap_per_source's LITERAL cap so the
    WindowGroupLimit optimization fires (partial per map task below the
    exchange) — the dynamic target alone defeats it."""
    from sits_classification_spark.operators.split import mixture_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, source="hot" if i < 900 else "cold%d" % (i % 7))
         for i in range(1000)]
    )
    samp = mixture_sample(df, budget_frac=0.3, temperature=0.7)
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    # exact per-source counts survive the pre-prune composition
    got = Counter(r["source"] for r in samp.collect())
    from sits_classification_spark.operators.split import mixture_plan

    want = {
        r["source"]: r["target_n"]
        for r in mixture_plan(df, budget_frac=0.3, temperature=0.7).collect()
        if r["target_n"] > 0
    }
    assert got == want


def test_mixture_tokens_prepruned_above_default_threshold(spark):
    """Token budgets exceed Spark's default windowGroupLimitThreshold
    (1000); the session raises it so the cap_per_source pre-prune still
    plans as a two-phase WindowGroupLimit for a 10k+ token cap."""
    from sits_classification_spark.operators.split import mixture_sample_tokens

    df = spark.createDataFrame(
        [Row(doc_id=i, source="hot" if i < 900 else "cold%d" % (i % 7),
             n_chars=40 + i % 60)
         for i in range(1000)]
    )
    samp = mixture_sample_tokens(df, budget_frac=0.5, temperature=0.7)
    plan = samp._jdf.queryExecution().executedPlan().toString()
    # partial (below the exchange) + final (above): both phases planned
    assert plan.count("WindowGroupLimit") == 2, plan[:2000]
    # and the budget is still respected per source
    toks = {r["source"]: r["t"] for r in df.groupBy("source")
            .agg(F.sum("n_chars").alias("t")).collect()}
    total = sum(toks.values())
    s = sum(t ** 0.7 for t in toks.values())
    kept = {r["source"]: r["m"] for r in samp.join(df, ["doc_id", "source"])
            .groupBy("source").agg(F.sum("n_chars").alias("m")).collect()}
    for src, t in toks.items():
        target = int(round(t ** 0.7 / s, 6) * (0.5 * total))
        assert kept.get(src, 0) <= target


def test_cap_per_source_exact_counts_and_determinism(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="s%d" % (i % 3)) for i in range(100)]
    )
    a = cap_per_source(df, cap=10).collect()
    b = cap_per_source(df, cap=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = Counter(r["source"] for r in a)
    # 100 rows over 3 sources: every source has >= 10 candidates
    assert per == {"s0": 10, "s1": 10, "s2": 10}
    assert all(1 <= r["rk"] <= 10 for r in a)
    # survivors are a subset of the input and stable under a bigger cap
    big = {r["doc_id"] for r in cap_per_source(df, cap=20).collect()}
    assert {r["doc_id"] for r in a} <= big


def test_bloom_decontaminate_no_false_negatives(spark):
    from pyspark.sql import Row

    from sits_classification_spark.operators.text import (
        bloom_decontaminate,
        cross_split_contamination,
    )

    leak = " ".join(f"leak{i}" for i in range(12))
    rows = [
        Row(doc_id=1, split="train", text="one " + leak + " two"),   # leaked
        Row(doc_id=2, split="train",
            text=" ".join(f"clean{i}" for i in range(20))),          # clean
        Row(doc_id=3, split="train", text=leak),                     # leaked
        Row(doc_id=4, split="test", text="pre " + leak + " post"),
        Row(doc_id=5, split="test",
            text=" ".join(f"other{i}" for i in range(15))),
    ]
    df = spark.createDataFrame(rows)
    bloom = {r.doc_id: r for r in
             bloom_decontaminate(df, split_col="split", n=8).collect()}
    exact = cross_split_contamination(df, split_col="split", n=8).collect()
    exact_train = {r.train_doc for r in exact}
    assert exact_train == {1, 3}
    # GUARANTEE: every exactly-contaminated train doc is bloom-flagged
    for d in exact_train:
        assert bloom[d].flagged, d
    # every train doc (flagged or not) gets a row with its shingle count
    assert set(bloom) == {1, 2, 3}
    assert bloom[2].n_shingles > 0
    # at this tiny fill the filter should also be FP-free
    assert not bloom[2].flagged
    # n_maybe upper-bounds nothing but is >= the true shared-shingle count
    shared_by_doc = {}
    for r in exact:
        shared_by_doc[r.train_doc] = shared_by_doc.get(r.train_doc, 0) + r.n_shared
    for d, s in shared_by_doc.items():
        assert bloom[d].n_maybe >= min(s, bloom[d].n_shingles)


def test_bigram_logprob_matches_python_reference(spark):
    import math

    from pyspark.sql import Row

    from sits_classification_spark.operators.text import bigram_logprob

    train = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat ate the fish",
    ]
    test = [
        "the cat sat on the log",      # all-seen bigrams
        "the zebra sat on the mat",    # OOV word -> backoff path
    ]
    rows = [Row(doc_id=i, split="train", text=t) for i, t in enumerate(train)]
    rows += [Row(doc_id=100 + i, split="test", text=t) for i, t in enumerate(test)]
    out = {r.doc_id: r for r in bigram_logprob(
        spark.createDataFrame(rows), split_col="split").collect()}

    # python reference (same quantization)
    toks = [t.split() for t in train]
    c12, c1 = {}, {}
    for ws in toks:
        for w in ws:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    n = sum(c1.values())

    def score(t):
        ws = t.split()
        q = 0
        cnt = 0
        for a, b in zip(ws, ws[1:]):
            if (a, b) in c12:
                s = c12[(a, b)] / c1[a]
            else:
                s = 0.4 * (c1.get(b, 0) + 1) / (n + 1)
            q += math.floor(-math.log(s) * 1e6 + 0.5)
            cnt += 1
        return cnt, q, math.floor(q / cnt)

    for i, t in enumerate(test):
        cnt, q, avg = score(t)
        r = out[100 + i]
        assert (r.n_bigrams, r.nll_e6, r.avg_nll_e6) == (cnt, q, avg), t
    # the OOV doc must score strictly worse than the in-domain one
    assert out[101].avg_nll_e6 > out[100].avg_nll_e6


def test_char_entropy_reference_values(spark):
    import math
    from collections import Counter

    from pyspark.sql import Row

    from sits_classification_spark.operators.text import char_entropy

    rows = [
        Row(doc_id=1, text="aaaaaaaa"),            # zero entropy
        Row(doc_id=2, text="abcdefgh"),            # max entropy ln(8)
        Row(doc_id=3, text="hello world entropy"),
        Row(doc_id=4, text=""),                    # empty: zeros, no crash
    ]
    out = {r.doc_id: r for r in char_entropy(spark.createDataFrame(rows)).collect()}

    def ref(t):
        c = Counter(t)
        n = len(t)
        if n == 0:
            return 0, 0, 0
        s = sum(math.floor(v * math.log(v) * 1e6 + 0.5) for v in c.values() if v > 1)
        return n, len(c), math.floor(math.log(n) * 1e6 + 0.5) - math.floor(s / n)

    for d, t in ((1, "aaaaaaaa"), (2, "abcdefgh"), (3, "hello world entropy"), (4, "")):
        n, k, e = ref(t)
        r = out[d]
        assert (r.n_chars_t, r.n_distinct_chars, r.ent_e6) == (n, k, e), t
    # quantization leaves at most 1 micro-nat of skew on the extremes
    assert out[1].ent_e6 <= 1
    assert abs(out[2].ent_e6 - math.floor(math.log(8) * 1e6 + 0.5)) <= 1
