"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, pure Column exprs
  (F.aggregate/zip_with dot products — JVM-side, codegen'd);
- LSH-bucketed ANN: sign-random-projection with deterministic hyperplanes
  derived from md5 (shareable with a SQL oracle), probing only the query's
  bucket (+ optional multi-probe) — the scale path: the bucket join prunes
  the candidate set before any dot product is computed;
- embedding-cosine near-dup pairs for dedup.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against (usually few) query vectors.

    query_df: (query_id, embedding). Broadcast the small side; one scan of
    the corpus; ties broken by id for determinism.
    """
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
    )
    joined = df.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        cosine(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.transform(F.col("qvec"), lambda x: x.cast("double")),
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j of
    plane p = fractional part of sin-free integer hash mapped to [-1, 1).
    Pure Python ints — reproducible anywhere (incl. a SQL oracle)."""
    comps = []
    for j in range(dim):
        h = (plane * 1_000_003 + j * 7919 + 12345) * 2_654_435_761 % (1 << 32)
        comps.append(h / float(1 << 31) - 1.0)
    return comps


def srp_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id (0..2^n_planes-1)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(dim, p)
        dot = F.lit(0.0)
        for j, c in enumerate(plane):
            dot = dot + F.element_at(vec, j + 1).cast("double") * F.lit(c)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def probe_buckets(bucket: Column, n_planes: int, probe_hamming: int) -> Column:
    """Multi-probe set: the query's own bucket plus every bucket within
    `probe_hamming` bit flips (flipping a plane whose dot product was near
    zero is the classic multi-probe move; without per-plane margins we probe
    all flips, which is exact for the hamming ball)."""
    import itertools

    variants = [bucket]
    for r in range(1, probe_hamming + 1):
        for planes in itertools.combinations(range(n_planes), r):
            m = 0
            for p in planes:
                m |= 1 << p
            variants.append(bucket.bitwiseXOR(F.lit(m)))
    return F.array(*variants)


def ann_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN: SRP-bucket the corpus once, probe the query's bucket plus every
    bucket within `probe_hamming` plane flips (multi-probe trades candidate
    volume for recall — see tests/bench for the measured recall table).

    At 100 TB the bucket column is precomputed/persisted (write-once,
    partitioned by bucket -> partition pruning per query); here it is inline.
    Recall < 1 by construction; the exact baseline is cosine_topk.
    """
    corpus = df.withColumn("bucket", srp_bucket(F.col(vec_col), dim, n_planes))
    q = (
        query_df.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
        )
        .withColumn("bucket0", srp_bucket(F.col("qvec"), dim, n_planes))
        .withColumn(
            "bucket",
            F.explode(probe_buckets(F.col("bucket0"), n_planes, probe_hamming)),
        )
    )
    joined = corpus.join(F.broadcast(q), on="bucket").select(
        "query_id",
        F.col(id_col),
        cosine(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.transform(F.col("qvec"), lambda x: x.cast("double")),
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col(id_col))
    return joined.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 2000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked (same SRP bucket).

    Buckets larger than `max_bucket` are dropped before the self-join — an
    embedding duplicated n times lands n ids in one bucket and would emit n²
    pairs. Hot-key pre-pass is a count aggregate (map-side combined) + a
    broadcast anti-join; the hot list is at most n_rows/max_bucket keys."""
    b = df.withColumn("bucket", srp_bucket(F.col(vec_col), dim, n_planes))
    hot = (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("bucket")
    )
    b = b.join(F.broadcast(hot), ["bucket"], "left_anti")
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, on="bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(
                F.transform(F.col(f"l.{vec_col}"), lambda x: x.cast("double")),
                F.transform(F.col(f"r.{vec_col}"), lambda x: x.cast("double")),
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
