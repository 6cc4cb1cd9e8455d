"""Dedup + text-analysis operator tests (SURVEY.md training-data ops).

Covers the hashed-shingle rewrite: ngram_shingles correctness (incl. short
docs), MinHash signature discriminativeness on shingles, LSH pair recall of
a planted near-dup, and n-gram Jaccard against a brute-force python oracle.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from sits_classification_spark.operators.dedup import (
    exact_dedup,
    minhash_base,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from sits_classification_spark.operators.text import ngram_shingles, words


DOCS = [
    ("d0", "the quick brown fox jumps over the lazy dog"),
    ("d1", "the quick brown fox jumps over the lazy cat"),  # near-dup of d0
    ("d2", "completely different content about spark engines and rollups"),
    ("d3", "one two"),  # shorter than shingle width
    ("d4", "the quick brown fox jumps over the lazy dog"),  # exact dup of d0
    ("d5", "spark engines process rollups of token streams at scale"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def py_shingles(text, n=3):
    w = text.lower().split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_ngram_shingles_matches_python(docs):
    out = docs.select(
        "doc_id", ngram_shingles(words("text"), 3).alias("sh")
    ).collect()
    for r in out:
        expect = [
            " ".join(dict(DOCS)[r["doc_id"]].lower().split()[i : i + 3])
            for i in range(max(0, len(dict(DOCS)[r["doc_id"]].split()) - 2))
        ]
        assert r["sh"] == expect, r["doc_id"]


def test_ngram_shingles_short_doc_empty(docs):
    r = docs.filter(F.col("doc_id") == "d3").select(
        ngram_shingles(words("text"), 3).alias("sh")
    ).first()
    assert r["sh"] == []


def test_minhash_base_short_doc_fallback(docs):
    base = {r["doc_id"]: r["base"] for r in minhash_base(docs, 3).collect()}
    assert len(base["d3"]) == 1  # whole-doc fallback shingle
    assert len(base["d0"]) == len(py_shingles(dict(DOCS)["d0"]))


def test_minhash_signatures_discriminate(docs):
    sig = {r["doc_id"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"])
           for r in minhash_signatures(docs, k=4).collect()}
    assert sig["d0"] == sig["d4"]  # identical docs -> identical signature
    assert sig["d0"] != sig["d2"]  # unrelated docs must differ
    # near-dups agree on more hash slots than unrelated docs
    agree_near = sum(a == b for a, b in zip(sig["d0"], sig["d1"]))
    agree_far = sum(a == b for a, b in zip(sig["d0"], sig["d2"]))
    assert agree_near >= agree_far


def test_minhash_lsh_finds_exact_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, k=4, bands=2).collect()}
    assert ("d0", "d4") in pairs
    assert ("d0", "d2") not in pairs


def test_ngram_jaccard_matches_bruteforce(docs):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()
    }
    texts = dict(DOCS)
    expect = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = py_shingles(texts[a]), py_shingles(texts[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter:
            expect[(a, b)] = inter / len(sa | sb)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k])


def test_ngram_containment_detects_subsumption(spark):
    """A short doc quoted wholesale inside a long one: containment
    short->long ~= 1 while Jaccard stays small — the asymmetric screen's
    whole point. Values match the python set formula exactly."""
    from pyspark.sql import Row

    from sits_classification_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = (
        "intro words here first " + short + " and then a lot of trailing "
        "body content that keeps going with many extra tokens overall"
    )
    df = spark.createDataFrame(
        [Row(doc_id=1, text=short), Row(doc_id=2, text=long),
         Row(doc_id=3, text="completely different content entirely")]
    )
    rows = ngram_containment_pairs(df, n=3, threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]
    r = rows[0]
    sa, sb = py_shingles(short), py_shingles(long)
    assert r["containment_ab"] == pytest.approx(len(sa & sb) / len(sa))
    assert r["containment_ab"] == 1.0  # fully contained
    assert r["containment_ba"] == pytest.approx(len(sa & sb) / len(sb))
    assert r["containment_ba"] < 0.5


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    # 30 docs all sharing one hot shingle; cap of 10 removes every pair
    rows = [(f"h{i}", f"alpha beta gamma unique{i} tail{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = ngram_jaccard_pairs(df, n=3, threshold=0.0, max_shingle_df=10)
    assert out.count() == 0


def test_exact_dedup_groups(docs):
    out = exact_dedup(docs)
    grp = {r["keep_doc_id"]: r["n_copies"] for r in out.collect()}
    assert grp["d0"] == 2  # d0 + d4
    assert out.count() == 5


def test_simhash_identical_and_near(docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs, nbits=16).collect()}
    assert sh["d0"] == sh["d4"]
    near = {(r["doc_a"], r["doc_b"]) for r in
            simhash_near_dups(docs, nbits=16, max_hamming=4).collect()}
    assert ("d0", "d4") in near


def test_lsh_hot_bucket_cap_bounds_viral_dups(spark):
    """1000 identical docs put 1000 ids in one band bucket; the cap drops the
    bucket before pair generation instead of emitting ~500k pairs. Docs below
    the cap still pair up (mass dups are exact_dedup's job)."""
    rows = [(f"v{i:04d}", "the same viral text repeated everywhere online") for i in range(1000)]
    d = spark.createDataFrame(rows, "doc_id string, text string")
    assert minhash_lsh_pairs(d, k=4, bands=2, max_bucket=100).count() == 0
    small = spark.createDataFrame(rows[:50], "doc_id string, text string")
    assert minhash_lsh_pairs(small, k=4, bands=2, max_bucket=100).count() == 50 * 49 // 2


def test_minhash_drops_empty_docs(spark):
    d = spark.createDataFrame(
        [("e0", ""), ("e1", "   "), ("e2", "real words here")],
        "doc_id string, text string",
    )
    sigs = minhash_signatures(d, k=4)
    assert [r["doc_id"] for r in sigs.collect()] == ["e2"]
    assert minhash_lsh_pairs(d, k=4, bands=2).count() == 0


def test_embedding_near_dup_bucket_cap(spark):
    from sits_classification_spark.operators.similarity import embedding_near_dups

    vec = [float(j % 7 - 3) for j in range(8)]
    d = spark.createDataFrame(
        [(i, vec) for i in range(100)], "vec_id long, embedding array<float>"
    )
    assert embedding_near_dups(d, dim=8, threshold=0.9, n_planes=2, max_bucket=50).count() == 0
    small = d.limit(10)
    assert embedding_near_dups(small, dim=8, threshold=0.9, n_planes=2, max_bucket=50).count() == 45


def test_ann_multiprobe_recall(spark, sf01):
    """Multi-probe SRP-LSH must reach recall@10 >= 0.8 vs the exact scan at
    probe_hamming=2 (measured 0.845 on this corpus; 0.20/0.49 at probe 0/1)."""
    from sits_classification_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_topk,
    )

    e = spark.read.parquet(f"{sf01}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    exact = cosine_topk(e, q, k=10).select("query_id", "vec_id")
    ann = ann_lsh_topk(
        e, q, dim=64, k=10, n_planes=4, probe_hamming=2
    ).select("query_id", "vec_id")
    hits = exact.join(ann, ["query_id", "vec_id"]).count()
    assert hits / exact.count() >= 0.8


def test_dedup_clusters_chain_and_components(spark):
    """Min-label propagation must traverse chains (worst case for LSH
    cliques) and keep separate components separate."""
    from sits_classification_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),  # chain -> all 'a'
         ("x", "y"),                           # separate component
         ("m", "n"), ("n", "m2")],
        "doc_a string, doc_b string",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert {got[k] for k in "abcd"} == {"a"}
    assert {got[k] for k in ("x", "y")} == {"x"}
    assert {got[k] for k in ("m", "n", "m2")} == {"m"}
    assert len(got) == 9


def test_ivf_topk_structure_and_recall(spark, sf01):
    """IVF-Flat: every corpus vector lands in exactly one of the 16 cells,
    and probing 4/16 cells recovers a reasonable share of the exact top-10
    (the nearest cell always contains the query itself -> rank 1 is the
    query, cos 1.0)."""
    from sits_classification_spark.operators.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
    )

    e = spark.read.parquet(f"{sf01}/embeddings.parquet")
    assert ivf_centroids(e, 16).count() == 16
    q = e.filter(F.col("vec_id") == 0)
    got = ivf_topk(e, q, k=10, n_centroids=16, nprobe=4).collect()
    assert len(got) == 10
    top = [r for r in got if r["rank"] == 1][0]
    assert top["vec_id"] == 0 and abs(top["cos_sim"] - 1.0) < 1e-9
    exact = {r["vec_id"] for r in cosine_topk(e, q, k=10).collect()}
    hits = len(exact & {r["vec_id"] for r in got})
    assert hits >= 3  # 4/16 cells probed; random 64-dim corpus


def test_winnowing_guarantee_and_density(spark):
    """MOSS guarantee: two docs sharing a run of >= w+k-1 (= 6) tokens share
    at least one fingerprint; fingerprint density ~ 2/(w+1) of shingles."""
    from sits_classification_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"
    d = spark.createDataFrame(
        [
            ("a", f"one two three {shared} four five six seven"),
            ("b", f"nine ten {shared} eleven twelve thirteen fourteen"),
            ("c", "totally different words everywhere in this document here"),
        ],
        "doc_id string, text string",
    )
    fps = winnow_fingerprints(d, k=3, w=4)
    ab = (
        fps.filter(F.col("doc_id") == "a")
        .select("fp")
        .intersect(fps.filter(F.col("doc_id") == "b").select("fp"))
        .count()
    )
    ac = (
        fps.filter(F.col("doc_id") == "a")
        .select("fp")
        .intersect(fps.filter(F.col("doc_id") == "c").select("fp"))
        .count()
    )
    assert ab >= 1 and ac == 0


def test_winnowing_short_doc_fallback(spark):
    """Docs shorter than w+k-1 tokens still emit a fingerprint: a short
    exact-dup pair shares it (minhash_base-style whole-doc fallback)."""
    from sits_classification_spark.operators.text import winnow_fingerprints

    d = spark.createDataFrame(
        [
            ("s1", "tiny duplicate text here"),   # 4 tokens: 2 shingles < w
            ("s2", "tiny duplicate text here"),
            ("t1", "hi there"),                    # 2 tokens: < k, no shingle
            ("t2", "hi there"),
            ("u", "something else"),
        ],
        "doc_id string, text string",
    )
    fps = winnow_fingerprints(d, k=3, w=4).toPandas()
    by_doc = fps.groupby("doc_id")["fp"].apply(set)
    assert all(len(by_doc.get(k, set())) >= 1 for k in ("s1", "s2", "t1", "t2", "u"))
    assert by_doc["s1"] & by_doc["s2"]
    assert by_doc["t1"] & by_doc["t2"]
    assert not (by_doc["t1"] & by_doc["u"])
