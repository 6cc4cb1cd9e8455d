"""Hot-key de-skew contract for the candidate-pair cap sites.

A boilerplate shingle / LSH bucket / SRP bucket / k-means cell that holds
most of the corpus must never be materialized on ONE task before its cap
filter fires. The caps are therefore `groupBy(key).count` hash-aggregates
(map-side partials absorb the hot key) joined or filtered back — NOT
`count(*) over (partition by key)` windows whose hot partition is a
single-task scan. These tests pin both halves of the contract:

1. PLAN: the physical plan of each capped operator contains no Window
   node at all (pair generation is agg/join/explode; the only row_number
   windows in the family are per-query top-k ranks, which none of these
   four emit).
2. SEMANTICS on a skewed input where one key holds >= 50 % of rows: the
   hot key's members are excluded from pairing, the cold tail still
   pairs, and (for semdedup) the exclusion is reported loudly.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sits_classification_spark.operators.clustering import semdedup
from sits_classification_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from sits_classification_spark.operators.similarity import embedding_near_dups


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_no_window(df):
    plan = _physical_plan(df)
    assert "Window" not in plan, f"hot-key cap regressed to a window:\n{plan}"
    assert "HashAggregate" in plan


def _hot_docs(spark, n=200, hot_frac=0.6):
    """Corpus where >= hot_frac of docs share one exact boilerplate text
    (one LSH bucket / one shingle set holds the majority of rows) and the
    rest form 2 small near-dup families."""
    n_hot = int(n * hot_frac)
    rows = [(f"h{i:04d}", "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
            for i in range(n_hot)]
    for i in range(n - n_hot):
        fam = i % 2
        tail = f"variant {i}" if i % 7 == 0 else "shared tail words here"
        rows.append((f"c{i:04d}", f"family {fam} common prefix tokens {tail}"))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_minhash_lsh_pairs_hot_bucket_capped_no_window(spark):
    d = _hot_docs(spark)
    out = minhash_lsh_pairs(d, k=4, bands=2, max_bucket=50)
    _assert_no_window(out)
    pairs = out.collect()
    ids = {x for r in pairs for x in (r["doc_a"], r["doc_b"])}
    # the hot boilerplate bucket (120 docs > max_bucket=50) never pairs
    assert not any(i.startswith("h") for i in ids)
    assert len(pairs) > 0  # the cold families still pair


def test_ngram_jaccard_hot_shingle_capped_no_window(spark):
    d = _hot_docs(spark)
    out = ngram_jaccard_pairs(d, n=3, threshold=0.1, max_shingle_df=50)
    _assert_no_window(out)
    pairs = out.collect()
    ids = {x for r in pairs for x in (r["doc_a"], r["doc_b"])}
    assert not any(i.startswith("h") for i in ids)
    assert len(pairs) > 0


def _hot_vecs(spark, n=120, dim=8):
    rows = []
    for i in range(n):
        if i < n * 3 // 4:  # one SRP bucket holds 75% of vectors
            v = [1.0] * dim
        else:
            v = [(-1.0) ** j * (1.0 + 0.001 * (i % 5)) for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dups_hot_bucket_capped_no_window(spark):
    d = _hot_vecs(spark)
    out = embedding_near_dups(d, dim=8, threshold=0.9, n_planes=2, max_bucket=40)
    _assert_no_window(out)
    ids = {x for r in out.collect() for x in (r["id_a"], r["id_b"])}
    assert all(i >= 90 for i in ids)  # hot-bucket members never pair
    assert len(ids) > 0


def test_semdedup_hot_cell_exclusion_reported(spark):
    d = _hot_vecs(spark)
    stats = {}
    out = semdedup(
        d, k=2, iters=1, tau_e6=900_000, max_cell=40, stats=stats
    )
    _assert_no_window(out)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 120  # contract: every input vector comes back
    # the 90-member cell exceeds max_cell=40 -> excluded from pairing,
    # all its members keep=true, and the exclusion is LOUD
    assert stats["excluded_cells"] == 1
    assert stats["excluded_rows"] == 90
    assert stats["excluded_frac"] == pytest.approx(0.75)
    assert all(rows[i]["keep"] for i in range(90))
    # the cold cell still dedups its near-identical members
    assert sum(not rows[i]["keep"] for i in range(90, 120)) > 0


def test_semdedup_auto_k_from_target_cell(spark):
    d = _hot_vecs(spark, n=100)
    stats = {}
    semdedup(d, k=None, iters=1, target_cell=25, stats=stats).collect()
    assert stats["k"] == 4  # ceil(100 / 25)
    assert stats["n_rows"] == 100
