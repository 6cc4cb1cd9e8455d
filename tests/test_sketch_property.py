"""Property tests for the Misra-Gries merge step (pure python — no Spark;
the Spark operator is just explode -> mg_update per batch -> sum)."""

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from sits_classification_spark.operators.sketch import mg_update

term = st.integers(0, 30).map(lambda i: f"t{i}")
stream = st.lists(term, min_size=0, max_size=400)
ks = st.integers(2, 12)
batch_sizes = st.integers(1, 37)


@settings(max_examples=300, deadline=None)
@given(stream, ks, batch_sizes)
def test_mg_invariants(tokens, k, bs):
    truth = Counter(tokens)
    counters: dict[str, int] = {}
    for i in range(0, len(tokens), bs):
        batch = Counter(tokens[i:i + bs])
        counters = mg_update(counters, dict(batch), k)
        assert len(counters) <= k
    n = len(tokens)
    for t, c in counters.items():
        # every surviving count is a lower bound on the true count
        assert 0 < c <= truth[t], (t, c, truth[t])
    # the frequent-elements guarantee: freq > n/(k+1) MUST survive
    for t, c in truth.items():
        if c > n / (k + 1):
            assert t in counters, (t, c, n, k)


@settings(max_examples=200, deadline=None)
@given(stream, batch_sizes)
def test_mg_exact_when_k_exceeds_vocab(tokens, bs):
    truth = Counter(tokens)
    counters: dict[str, int] = {}
    for i in range(0, len(tokens), bs):
        counters = mg_update(counters, dict(Counter(tokens[i:i + bs])), 64)
    assert counters == dict(truth)


def test_count_min_guarantees(spark):
    """CM invariants on a real Spark run: est >= true for every term,
    the cell table is bounded by d*width, and the sketch MERGES (two
    halves summed cell-wise == the whole)."""
    from collections import Counter

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from sits_classification_spark.operators.sketch import (
        CM_PARAMS,
        cm_estimate,
        count_min,
    )

    stream = (["hot"] * 50 + ["warm"] * 20 + [f"cold{i}" for i in range(200)]) * 2
    truth = Counter(stream)
    df = spark.createDataFrame([Row(term=t) for t in stream])
    sk = count_min(df, width=64)
    assert sk.count() <= len(CM_PARAMS) * 64
    probe = spark.createDataFrame(
        [Row(term=t) for t in ("hot", "warm", "cold0", "never_seen")]
    )
    est = {r.term: r.est for r in cm_estimate(sk, probe, width=64).collect()}
    for t in ("hot", "warm", "cold0"):
        assert est[t] >= truth[t], t
    # overestimate is bounded-ish at this fill; the hot term is dominant
    assert est["hot"] < truth["hot"] + len(stream) // 8
    assert est["never_seen"] >= 0
    # mergeability: sketches of two halves sum to the sketch of the whole
    half = len(stream) // 2
    a = count_min(spark.createDataFrame([Row(term=t) for t in stream[:half]]), width=64)
    b = count_min(spark.createDataFrame([Row(term=t) for t in stream[half:]]), width=64)
    merged = (
        a.unionByName(b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sk.collect()))
