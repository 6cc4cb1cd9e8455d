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


def test_stratified_split_giant_stratum_salted(spark):
    """One stratum holding 90% of rows (the `lang` shape of a web corpus):
    the salted rank must (a) reproduce the unsalted assignment bit-for-bit,
    (b) keep exact proportions, and (c) partition the row-level window by
    (stratum, salt) so no task sees the whole stratum."""
    import re

    rows = [
        Row(doc_id=i, lang="en" if i < 1800 else "de") for i in range(2000)
    ]
    df = spark.createDataFrame(rows)
    salted = stratified_split(df, "lang", "doc_id", n_salt=16)
    unsalted = stratified_split(df, "lang", "doc_id", n_salt=1)
    a = {(r["doc_id"], r["split"], r["frac"]) for r in salted.collect()}
    b = {(r["doc_id"], r["split"], r["frac"]) for r in unsalted.collect()}
    assert a == b
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in salted.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    assert counts[("en", "train")] == 1440 and counts[("en", "val")] == 180
    assert counts[("de", "train")] == 160 and counts[("de", "test")] == 20
    # the row-level window partitions by (lang, _salt); only the tiny
    # per-bucket side table may window by lang alone
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\((\w+)#\d+L?(?:, (\w+)#\d+L?)?,", plan)
    assert any(s == ("lang", "_salt") for s in specs), specs
    # and the salt genuinely spreads the giant stratum over many buckets
    from sits_classification_spark.operators.text import word_hash60

    bw = (1 << 60) // 16 + 1
    buckets = (
        df.filter(F.col("lang") == "en")
        .select(
            word_hash60(
                F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))
            ).alias("_h")
        )
        .select(F.expr(f"_h DIV {bw}").alias("_s"))
        .distinct()
        .count()
    )
    assert buckets >= 12  # 1800 hashes spread over ~16 range buckets


# ---------------------------------------------------------------------------
# sequence packing (concat-then-chunk)
# ---------------------------------------------------------------------------


def _pack_py(docs, capacity):
    """Oracle: lay docs end-to-end in order, cut every `capacity` tokens."""
    out, cum = [], 0
    for doc_id, n in sorted(docs.items()):
        if n <= 0:
            continue
        for chunk in range(cum // capacity, (cum + n - 1) // capacity + 1):
            lo = max(cum, chunk * capacity)
            hi = min(cum + n, chunk * capacity + capacity)
            out.append((doc_id, chunk, lo - chunk * capacity, lo - cum, hi - lo))
        cum += n
    return sorted(out)


def test_pack_chunks_matches_python_oracle(spark):
    from sits_classification_spark.operators.packing import pack_chunks

    docs = {i: (i * 37) % 90 + 1 for i in range(60)}
    docs[7] = 0  # zero-length doc emits nothing
    df = spark.createDataFrame(
        [Row(doc_id=k, n_tok=v) for k, v in docs.items()]
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_off"], r["doc_off"], r["seg_len"])
        for r in pack_chunks(df, capacity=100, order_col="doc_id").collect()
    )
    assert got == _pack_py(docs, 100)


def test_pack_chunks_invariants(spark):
    from sits_classification_spark.operators.packing import pack_chunks

    docs = {i: (i * 13) % 257 + 1 for i in range(200)}
    df = spark.createDataFrame([Row(doc_id=k, n_tok=v) for k, v in docs.items()])
    out = pack_chunks(df, capacity=128, order_col="doc_id", partitions=7)
    per_doc = {
        r["doc_id"]: r["s"]
        for r in out.groupBy("doc_id").agg(F.sum("seg_len").alias("s")).collect()
    }
    assert per_doc == docs  # every token lands exactly once
    total = sum(docs.values())
    per_chunk = {
        r["chunk_id"]: r["s"]
        for r in out.groupBy("chunk_id").agg(F.sum("seg_len").alias("s")).collect()
    }
    full, last = total // 128, total % 128
    for cid, s in per_chunk.items():
        assert s == (128 if cid < full else last)


def test_pack_chunks_empty_input(spark):
    from sits_classification_spark.operators.packing import pack_chunks

    df = spark.createDataFrame([Row(doc_id=1, n_tok=0)])
    out = pack_chunks(df, capacity=10, order_col="doc_id")
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tok", "chunk_id", "chunk_off", "doc_off", "seg_len"]


# ---------------------------------------------------------------------------
# tf-idf / unigram LM / contamination / hash sampling
# ---------------------------------------------------------------------------


def test_tfidf_rare_term_outranks_common(spark):
    from sits_classification_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common common rare"),
            Row(doc_id=2, text="common stuff here"),
            Row(doc_id=3, text="common other words"),
        ]
    )
    top = tfidf_top_terms(df, k=1).collect()
    best = {r["doc_id"]: r["term"] for r in top}
    # 'common' appears in every doc -> idf 0 -> 'rare' wins doc 1
    assert best[1] == "rare"


def test_unigram_logprob_flags_outlier_doc(spark):
    from sits_classification_spark.operators.text import unigram_logprob

    rows = [Row(doc_id=i, text="the cat sat on the mat") for i in range(9)]
    rows.append(Row(doc_id=99, text="zyx qwv jkl pqr xyz abc"))
    out = {r["doc_id"]: r["avg_nll_e6"] for r in unigram_logprob(
        spark.createDataFrame(rows)).collect()}
    assert out[99] > max(v for k, v in out.items() if k != 99)


def test_contamination_finds_planted_overlap(spark):
    from sits_classification_spark.operators.text import cross_split_contamination

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        Row(doc_id=1, split="train", text=f"{shared} unique train tail words"),
        Row(doc_id=2, split="test", text=f"other head {shared}"),
        Row(doc_id=3, split="train", text="completely different content " * 3),
        Row(doc_id=4, split="val", text=shared),  # val ignored
    ]
    out = cross_split_contamination(spark.createDataFrame(rows), n=8).collect()
    assert [(r["test_doc"], r["train_doc"], r["n_shared"]) for r in out] == [(2, 1, 1)]


def test_hash_sample_deterministic_and_rate_shaped(spark):
    from sits_classification_spark.operators.split import hash_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, source="a" if i % 2 == 0 else "b") for i in range(2000)]
    )
    kept = hash_sample(df, rates={"a": 1.0, "b": 0.25}).collect()
    again = hash_sample(df, rates={"a": 1.0, "b": 0.25}).collect()
    assert sorted(map(tuple, kept)) == sorted(map(tuple, again))
    a = sum(1 for r in kept if r["source"] == "a")
    b = sum(1 for r in kept if r["source"] == "b")
    assert a == 1000  # rate 1.0 keeps everything
    assert 150 <= b <= 350  # ~25% of 1000, md5-uniform

    # a row's fate is independent of the rest of the table
    sub = spark.createDataFrame(
        [Row(doc_id=i, source="b") for i in range(1, 100, 2)]
    )
    kept_sub = {r["doc_id"] for r in hash_sample(sub, rates={"b": 0.25}).collect()}
    kept_full = {r["doc_id"] for r in kept if r["source"] == "b" and r["doc_id"] < 100}
    assert kept_sub == kept_full


# ---------------------------------------------------------------------------
# sessionization / HLL sketch
# ---------------------------------------------------------------------------


def test_sessionize_splits_on_gap(spark):
    import datetime as dt

    from sits_classification_spark.operators.sessions import session_stats

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, event_id=i, ts=t0 + dt.timedelta(seconds=s), value=1.0)
        for i, s in enumerate([0, 60, 120, 5000, 5060, 99999])
    ]  # gaps >1800s after idx 2 and idx 4 -> 3 sessions
    rows.append(Row(user_id=2, event_id=100, ts=t0, value=2.5))
    out = session_stats(spark.createDataFrame(rows), timeout_s=1800).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["session_seq"])
    assert [r["n_events"] for r in u1] == [3, 2, 1]
    assert [r["session_seq"] for r in u1] == [0, 1, 2]
    assert u1[0]["duration_us"] == 120_000_000
    assert by_user[2][0]["n_events"] == 1 and by_user[2][0]["duration_us"] == 0


def test_sessionize_exact_timeout_boundary(spark):
    import datetime as dt

    from sits_classification_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, event_id=0, ts=t0, value=0.0),
        Row(user_id=1, event_id=1, ts=t0 + dt.timedelta(seconds=1800), value=0.0),
        Row(user_id=1, event_id=2, ts=t0 + dt.timedelta(seconds=3601), value=0.0),
    ]
    out = sessionize(spark.createDataFrame(rows), timeout_s=1800).collect()
    seqs = {r["event_id"]: r["session_seq"] for r in out}
    # gap == timeout stays in-session (strict >); gap 1801 starts a new one
    assert seqs == {0: 0, 1: 0, 2: 1}


def test_hll_estimate_accuracy_and_determinism(spark):
    from sits_classification_spark.operators.sketch import hll_distinct

    df = spark.range(20000).select(
        F.when(F.col("id") < 10000, "big").otherwise("small").alias("source"),
        F.when(F.col("id") < 10000, F.col("id"))
        .otherwise(F.col("id") % 200)
        .cast("string")
        .alias("v"),
    )
    a = {r["source"]: r["estimate_e6"] for r in hll_distinct(df, "v", ("source",)).collect()}
    b = {r["source"]: r["estimate_e6"] for r in hll_distinct(df, "v", ("source",)).collect()}
    assert a == b  # no RNG anywhere
    assert abs(a["big"] / 1e6 - 10000) / 10000 < 0.05
    assert abs(a["small"] / 1e6 - 200) / 200 < 0.05


def test_semdedup_drops_centroid_nearer_pair_member(spark):
    """SemDeDup contract: a qualifying pair loses its centroid-NEARER
    member (smaller (qdist, id)); identical vectors tie on qdist, so the
    smaller id is removed and the larger kept."""
    from sits_classification_spark.operators.clustering import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),     # exact dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),     # orthogonal — never paired
        (3, [0.0, 0.96, 0.28, 0.0]),   # cos with 2 = 0.96 -> paired
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semdedup(df, k=2, iters=1, tau_e6=900_000).collect()}
    assert not out[0]["keep"] and out[1]["keep"]  # dup: smaller id dropped
    # 2 vs 3: whichever is nearer its centroid is dropped, the other kept
    assert out[2]["keep"] != out[3]["keep"]
    assert sum(1 for r in out.values() if not r["keep"]) == 2


def test_dsir_weights_match_hand_computation(spark):
    """dsir_weights equals the closed form computed in plain Python with
    the same md5 bucket hashing and add-one smoothing."""
    import hashlib
    import math
    from collections import Counter

    from sits_classification_spark.operators.text import dsir_weights

    docs = [
        (0, "alpha beta alpha", True),
        (1, "beta gamma", True),
        (2, "gamma delta epsilon", False),
    ]
    B = 64

    def feats(text):
        w = text.lower().split()
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B

    ct, cr = Counter(), Counter()
    per_doc = {}
    for did, text, tgt in docs:
        bs = [bucket(f) for f in feats(text)]
        per_doc[did] = Counter(bs)
        cr.update(bs)
        if tgt:
            ct.update(bs)
    nt, nr = sum(ct.values()), sum(cr.values())
    expected = {}
    for did, tf in per_doc.items():
        s = 0
        for b, n in tf.items():
            lr = math.floor(
                (math.log((ct.get(b, 0) + 1.0) / (nt + float(B)))
                 - math.log((cr[b] + 1.0) / (nr + float(B)))) * 1e6 + 0.5
            )
            s += lr * n
        expected[did] = (sum(tf.values()), s)

    df = spark.createDataFrame(
        [(d, t, g) for d, t, g in docs],
        "doc_id long, text string, is_target boolean",
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_e6"])
        for r in dsir_weights(df, n_buckets=B).collect()
    }
    assert got == expected
    # target-language doc outweighs the off-target doc
    assert got[0][1] > got[2][1]


def test_pq_adc_matches_reconstruction(spark):
    """ADC(vec) must equal the (quantized) squared distance from the query
    to the vector's codebook reconstruction, and every code must address a
    real codebook row."""
    import numpy as np

    from sits_classification_spark.operators.clustering import (
        pq_adc_topk,
        pq_codes,
        pq_train,
    )

    rng = [(i, [float(((i * 37 + j * 11) % 97) / 97.0) for j in range(16)])
           for i in range(40)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    books = pq_train(df, dim=16, m=4, ksub=4, iters=2)
    assert len(books) == 4 and all(b.shape == (4, 4) for b in books)
    codes = {r["vec_id"]: [r[f"c{j}"] for j in range(4)]
             for r in pq_codes(df, books).collect()}
    assert all(0 <= c < 4 for cs in codes.values() for c in cs)

    q = df.filter("vec_id = 0")
    out = pq_adc_topk(df, q, books, k=39).collect()
    V = {i: np.array(v, dtype=np.float64) for i, v in rng}
    # float32 storage: compare against the float32-rounded vectors
    V = {i: np.array(np.array(v, dtype=np.float32), dtype=np.float64)
         for i, v in rng}
    for r in out:
        rec = np.concatenate([books[j][codes[r["vec_id"]][j]] for j in range(4)])
        qv = V[0]
        # per-subspace quantization, then the integer sum — mirror exactly
        expect = sum(
            int(np.floor(((qv[j * 4:(j + 1) * 4] - rec[j * 4:(j + 1) * 4]) ** 2).sum() * 1e6 + 0.5))
            for j in range(4)
        )
        assert abs(r["adc_e6"] - expect) <= 4  # one ulp per subspace term
    ranks = [r["rank"] for r in sorted(out, key=lambda r: (r["adc_e6"], r["vec_id"]))]
    assert ranks == sorted(ranks)
