"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Engine additions for the training-data pipeline. All hashing goes through
md5 so a SQL oracle (DuckDB) can reproduce signatures bit-for-bit:
Spark ``conv(substr(md5(w),1,k),16,10)`` == DuckDB
``CAST('0x'||substr(md5(w),1,k) AS BIGINT)``.

Scale notes (100 TB posture):
- exact dedup is a single hash-aggregate on a derived key (no text shuffle —
  group on md5(text), carry min(doc_id));
- MinHash-LSH shuffles only (band_id, band_hash) pairs, never text; the
  band join is an equi-join Catalyst can plan (AQE handles banding skew);
- pair generation dedupes via (a < b) on doc ids to avoid symmetric blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sits_classification_spark.operators.text import word_hash28, words

MERSENNE31 = 2_147_483_647  # 2^31 - 1


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-content groups: canonical (kept) doc per md5(text), dup count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_key"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation params — odd a, fixed table."""
    return [(2 * i + 1, (i * i * 31 + 7) % MERSENNE31) for i in range(1, k + 1)]


def minhash_signatures(df: DataFrame, k: int = 8, text_col: str = "text") -> DataFrame:
    """k-permutation MinHash over word shingles (28-bit base hash keeps
    a*h+b inside int64). Output: (doc_id, sig array<long>[k])."""
    base = F.array_distinct(F.transform(words(text_col), word_hash28))

    def perm(a: int, b: int):
        # Spark introspects lambda arity: must be exactly 1 arg, so close
        # over (a, b) via a factory instead of default args
        return lambda h: (h * a + b) % MERSENNE31

    sigs = [
        F.array_min(F.transform(base, perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(_minhash_params(k))
    ]
    return df.select("doc_id", *sigs)


def minhash_lsh_pairs(
    df: DataFrame, k: int = 8, bands: int = 4, text_col: str = "text"
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become candidate
    pairs. Output: (doc_a, doc_b) distinct, doc_a < doc_b."""
    assert k % bands == 0
    rows_per_band = k // bands
    sig = minhash_signatures(df, k, text_col)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("_", *[c.cast("string") for c in cols]).alias("bh"))
        )
    exploded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, on=["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(df: DataFrame, nbits: int = 16, text_col: str = "text") -> DataFrame:
    """SimHash fingerprint: bit j set iff sum over distinct words of
    (+1 if bit j of word_hash else -1) > 0. nbits<=28 with the shared hash."""
    base = F.array_distinct(F.transform(words(text_col), word_hash28))

    def vote_fn(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_exprs = []
    for j in range(nbits):
        vote = F.aggregate(base, F.lit(0).cast("long"), vote_fn(j))
        bit_exprs.append(F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    sh = bit_exprs[0]
    for e in bit_exprs[1:]:
        sh = sh + e
    return df.select("doc_id", sh.cast("long").alias("simhash"))


def simhash_near_dups(df: DataFrame, nbits: int = 16, max_hamming: int = 2,
                      text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on half-bits
    (pigeonhole: hamming<=2 on 16 bits => one 8-bit half matches exactly)."""
    sh = simhash(df, nbits, text_col)
    half = nbits // 2
    lo = F.col("simhash").bitwiseAND(F.lit((1 << half) - 1))
    hi = F.shiftright(F.col("simhash"), half)
    blocked = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(
            F.struct(F.lit(0).alias("side"), lo.alias("key")),
            F.struct(F.lit(1).alias("side"), hi.alias("key")),
        )).alias("blk"),
    ).select("doc_id", "simhash", "blk.side", "blk.key")
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(b, on=["side", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Word n-gram Jaccard similarity via inverted-index join.

    Pairs sharing >= 1 shingle are scored |A∩B| / (|A|+|B|-|A∩B|); shingles
    occurring in > max_shingle_df docs are dropped (stop-shingle guard — the
    skew defuse that keeps the self-join from exploding at scale).
    """
    w = words(text_col)
    idx = F.sequence(F.lit(0), F.size(w) - n)
    # guard: sequence(0, negative) would generate a DESCENDING range
    shingled = df.filter(F.size(w) >= n).select(
        "doc_id",
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)))
        ).alias("shingles"),
    )
    sizes = shingled.select("doc_id", F.size("shingles").alias("sz"))
    inv = shingled.select("doc_id", F.explode("shingles").alias("sh"))
    sh_df = inv.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    inv = inv.join(F.broadcast(sh_df.filter(F.col("df") <= max_shingle_df)), "sh", "left_semi")
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, on="sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
