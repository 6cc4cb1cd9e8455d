"""Training-pipeline operators: k-means clustering, BM25 scoring,
stratified splitting (engine additions; reference consumes pre-split,
pre-scored corpora — these produce them at corpus scale)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sits_classification_spark.operators.clustering import kmeans_embeddings
from sits_classification_spark.operators.split import stratified_split
from sits_classification_spark.operators.text import bm25_scores


@pytest.fixture(scope="module")
def two_cluster_vecs(spark):
    # two tight clusters far apart in 4-d; ids 0..9
    rows = []
    for i in range(5):
        rows.append(Row(vec_id=i, embedding=[10.0, 10.0, 10.0 + i * 0.01, 10.0]))
    for i in range(5, 10):
        rows.append(Row(vec_id=i, embedding=[-10.0, -10.0, -10.0, -10.0 + i * 0.01]))
    return spark.createDataFrame(rows)


def test_kmeans_separates_obvious_clusters(two_cluster_vecs):
    out = kmeans_embeddings(two_cluster_vecs, k=2, iters=3).collect()
    cells = {r["vec_id"]: r["cell"] for r in out}
    assert len(out) == 10
    assert len({cells[i] for i in range(5)}) == 1
    assert len({cells[i] for i in range(5, 10)}) == 1
    assert cells[0] != cells[9]
    # near-zero distance to the converged centroid for the tight clusters
    for r in out:
        assert r["qdist"] >= 0


def test_kmeans_deterministic(two_cluster_vecs):
    a = sorted(map(tuple, kmeans_embeddings(two_cluster_vecs, k=2, iters=2).collect()))
    b = sorted(map(tuple, kmeans_embeddings(two_cluster_vecs, k=2, iters=2).collect()))
    assert a == b


def _bm25_py(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfs = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    out = {}
    for d, w in toks.items():
        score = 0.0
        for t in terms:
            tf = float(w.count(t))
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            score = score + idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(w) / avgdl)
            )
        out[d] = math.floor(score * 1000000 + 0.5)
    return out


def test_bm25_matches_pure_python(spark):
    docs = {
        1: "spark join hash join merge",
        2: "the quick brown fox",
        3: "hash hash hash table scan",
        4: "join",
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in docs.items()]
    )
    got = {
        r["doc_id"]: r["bm25_e6"]
        for r in bm25_scores(df, terms=("join", "hash")).collect()
    }
    assert got == _bm25_py(docs, ("join", "hash"))


def test_bm25_zero_for_absent_terms(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="alpha beta gamma")])
    r = bm25_scores(df, terms=("missing",)).collect()[0]
    assert r["bm25_e6"] == 0 and r["tf_0"] == 0


def test_stratified_split_exact_proportions(spark):
    rows = [Row(doc_id=i, lang="en" if i < 100 else "de") for i in range(150)]
    df = spark.createDataFrame(rows)
    out = stratified_split(df, "lang", "doc_id", train=0.8, val=0.1)
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    # en: 100 rows -> 80/10/10; de: 50 rows -> 40/5/5 (exact, not Bernoulli)
    assert counts[("en", "train")] == 80 and counts[("en", "val")] == 10
    assert counts[("en", "test")] == 10
    assert counts[("de", "train")] == 40 and counts[("de", "val")] == 5
    assert counts[("de", "test")] == 5


def test_stratified_split_deterministic_and_stable(spark):
    rows = [Row(doc_id=i, lang=["en", "de", "fr"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows)
    a = {r["doc_id"]: r["split"] for r in stratified_split(df, "lang", "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in stratified_split(df, "lang", "doc_id").collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
