"""Distributed Lloyd k-means over embedding columns (array<float>).

Engine addition beyond the reference (training-data-pipeline layer, next
to operators/similarity.py's IVF coarse quantizer): cluster a corpus of
embeddings into k cells — the building block for IVF training, corpus
bucketing, and diversity sampling.

Scale posture (the Spark MLlib pattern, reimplemented DataFrame-first):
the k centroids live on the driver (k*dim doubles — the same
ship-the-quantizer-with-the-plan posture as ivf_topk); every Lloyd
iteration is

  1. a MAP-ONLY Arrow-batched assignment pass (one numpy matmul per
     batch against the (k, dim) centroid matrix — no join, no shuffle),
  2. one per-(cell, component) average whose shuffle volume is
     O(k * dim * n_partitions) after map-side partial aggregation —
     independent of corpus size.

So T iterations cost T corpus scans and T tiny shuffles; at 100 TB you
run them on a sample and only the final assignment on the full corpus.

Cross-engine determinism (shared with the SQL oracle, the ivf_topk
recipe): squared distances are QUANTIZED to integer micro-units before
the argmin — BLAS sum order differs from the oracle's sequential
list_dot_product by ~1e-13, so a near-equidistant vector could flip
cells; quantizing both sides turns near-ties into exact ties, resolved
identically by the (dist, cell) order. Updated centroid components are
quantized to the same 1e-6 grid, so iteration t+1 starts from
bit-identical centroids in both engines. Initial centroids are the k
corpus vectors with the smallest md5-derived keys (ivf_centroids —
deterministic, no RNG), labelled cell 0..k-1 in cid order.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # 1e-6 distance/centroid grid shared with the SQL oracle


def _assign_udf(C: np.ndarray):
    """Arrow-batched argmin over quantized squared distances to the rows of
    C; returns the 0-based cell index (np.argmin takes the FIRST minimum =
    lowest cell, matching the oracle's (dist, cell) row_number order)."""
    cc = (C * C).sum(axis=1)

    def _qdist(emb: pd.Series) -> np.ndarray:
        V = np.stack(emb.to_numpy()).astype(np.float64)
        d = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + cc
        return np.floor(d * QUANT + 0.5).astype(np.int64)

    @F.pandas_udf("struct<cell: long, qdist: long>")
    def udf(emb: pd.Series) -> pd.DataFrame:
        q = _qdist(emb)
        cell = np.argmin(q, axis=1)
        return pd.DataFrame(
            {"cell": cell, "qdist": q[np.arange(len(cell)), cell]}
        )

    return udf


def lloyd_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "np.ndarray":
    """The Lloyd training loop alone: `iters` assignment/update rounds from
    the deterministic md5 seeds, centroid components quantized to the 1e-6
    grid each round (bit-identical across engines). Returns the (k, dim)
    centroid matrix — the trainable shared by kmeans_embeddings and the
    per-subspace product quantizer."""
    from sits_classification_spark.operators.similarity import ivf_centroids

    init = sorted(
        (r["cid"], list(r["cvec"]))
        for r in ivf_centroids(df, k, vec_col, id_col).collect()
    )
    C = np.array([cv for _cid, cv in init], dtype=np.float64)
    base = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vd"),
    )
    for _ in range(iters):
        a = _assign_udf(C)
        assigned = base.withColumn("cell", a(F.col("vd"))["cell"])
        upd = (
            assigned.select("cell", F.posexplode("vd").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("av"))
            .collect()
        )
        C = C.copy()
        for r in upd:
            C[r["cell"], r["pos"]] = math.floor(r["av"] * QUANT + 0.5) / QUANT
    return C


def kmeans_embeddings(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd k-means: `iters` update rounds from the deterministic md5
    seeds, then one final assignment. Returns (id, cell, qdist) with cell
    in 0..k-1 and qdist the quantized squared distance to the final
    centroid. Empty cells keep their previous centroid (both engines)."""
    C = lloyd_centroids(df, k, iters, vec_col, id_col)
    base = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vd"),
    )
    a = _assign_udf(C)
    # stage the UDF struct behind an alias: referencing a(vd) twice in one
    # projection can evaluate the Arrow-batched UDF twice per row
    # (CollapseProject inlines direct expressions; a non-cheap ALIAS
    # referenced more than once is pinned — SPARK-36718)
    staged = base.withColumn("_a", a(F.col("vd")))
    return staged.select(
        id_col,
        F.col("_a.cell").alias("cell"),
        F.col("_a.qdist").alias("qdist"),
    )


def semdedup(
    df: DataFrame,
    k: int | None = 8,
    iters: int = 3,
    tau_e6: int = 950_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell: int = 20_000,
    target_cell: int = 5_000,
    stats: dict | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    embeddings (k-means above) and dropping, within each cluster, members
    of high-cosine pairs — keeping the pair member FARTHER from the
    centroid (the paper's keep-low-centroid-similarity rule, which
    preserves cluster diversity). Removal contract (deterministic,
    per-pair domination): v is removed iff some same-cell u with
    quantized cos(u,v) >= tau_e6 has (qdist_u, u_id) lexicographically
    GREATER than (qdist_v, v_id) — i.e. every qualifying pair drops its
    centroid-nearer member, ties broken by id.

    Scale posture: pair generation is confined to cells. The paper's
    regime keeps cells small by scaling k with the corpus (k ~ 1e5 at
    LAION scale); pass ``k=None`` to get that automatically —
    k = ceil(n / target_cell) from one count, so cells average
    ``target_cell`` members at ANY corpus size and a 100 TB run cannot
    silently land most of the corpus in a handful of giant cells.
    Cells larger than `max_cell` are still EXCLUDED from pairing
    (their members all keep=true); the cap is a driver-side decision
    over the k-row cell histogram (one `groupBy(cell).count` hash-
    aggregate — map-side partials absorb a hot cell, no window partition
    ever scans a whole cell on one task), and the exclusion is LOUD: pass
    ``stats={}`` to receive {n_rows, n_cells, k, excluded_cells,
    excluded_rows, excluded_frac} — a near-1.0 excluded_frac means the
    dedup was a no-op and k/max_cell need revisiting. Norms and
    double-cast vectors are computed once per side BEFORE the join.

    Returns (id, cell, qdist, keep) for every input vector."""
    if k is None:
        n_rows = df.count()
        k = max(1, -(-n_rows // max(1, target_cell)))
    cells = kmeans_embeddings(df, k, iters, vec_col, id_col)
    # The self-join on `cell` injects an isnotnull(cell) constraint that
    # Catalyst pushes BELOW the struct-staging projection, forcing a SECOND
    # ArrowEvalPython evaluation of the assignment UDF per row (filter and
    # project cannot share the UDF result). `cell` is never null (argmin
    # always yields), so wrapping it in coalesce(cell, -1) lets
    # NullPropagation fold the pushed constraint to `true` and the plan
    # keeps ONE UDF evaluation per derivation.
    cells = cells.withColumn("cell", F.coalesce(F.col("cell"), F.lit(-1)))
    hist = {
        r["cell"]: r["_n"]
        for r in cells.groupBy("cell").agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    hot = {c for c, n in hist.items() if n > max_cell}
    total = sum(hist.values())
    excluded_rows = sum(hist[c] for c in hot)
    if stats is not None:
        stats.update(
            n_rows=total,
            n_cells=len(hist),
            k=k,
            excluded_cells=len(hot),
            excluded_rows=excluded_rows,
            excluded_frac=(excluded_rows / total) if total else 0.0,
        )
    vecs = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vd"),
    ).withColumn(
        "vn",
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("vd"), F.col("vd"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    )
    side = cells.join(vecs, id_col)
    if hot:
        # hot-cell exclusion as a literal filter (the histogram is k rows,
        # driver-held like the centroids) — no window, no second exchange
        side = side.filter(~F.col("cell").isin(sorted(hot)))
    l, r = side.alias("l"), side.alias("r")
    dot = F.aggregate(
        F.zip_with(F.col("l.vd"), F.col("r.vd"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos_e6 = F.floor(
        dot / (F.col("l.vn") * F.col("r.vn")) * 1_000_000 + F.lit(0.5)
    ).cast("long")
    key_l = F.struct(F.col("l.qdist"), F.col(f"l.{id_col}"))
    key_r = F.struct(F.col("r.qdist"), F.col(f"r.{id_col}"))
    losers = (
        l.join(r, on="cell")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .filter(cos_e6 >= F.lit(tau_e6))
        .select(
            F.when(key_l < key_r, F.col(f"l.{id_col}"))
            .otherwise(F.col(f"r.{id_col}"))
            .alias(id_col)
        )
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return cells.join(losers, id_col, "left").select(
        id_col,
        "cell",
        "qdist",
        F.coalesce(~F.col("_rm"), F.lit(True)).alias("keep"),
    )


def pq_train(
    df: DataFrame,
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Train the product quantizer (Jégou, Douze & Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): split the dim-dimensional
    space into m subspaces of dim/m components and run the deterministic
    Lloyd loop (md5 seeds, 1e-6-quantized centroids — the lloyd_centroids
    recurrence) in each. Returns the m (ksub, dim/m) codebooks, held
    driver-side like the IVF quantizer: m*ksub*(dim/m) = ksub*dim doubles
    ship with the plan regardless of corpus size.

    All m subspaces train TOGETHER: the md5 seed rows are the same k
    vectors for every subspace (the seed key hashes vec_id, not the
    vector), so ONE collect seeds all m codebooks, and each Lloyd
    iteration runs the m assignment UDFs in one projection feeding one
    (subspace, cell, pos) update aggregate — iters+1 Spark jobs total
    instead of m*(iters+1) (the naive per-subspace loop measured 21.7 s at
    sf0.1, almost all fixed job overhead)."""
    from sits_classification_spark.operators.similarity import ivf_centroids

    d0 = dim // m
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    seed_rows = sorted(
        (r["cid"], list(r["cvec"]))
        for r in ivf_centroids(df, ksub, vec_col, id_col).collect()
    )
    books = [
        np.array([cv[j * d0 : (j + 1) * d0] for _cid, cv in seed_rows],
                 dtype=np.float64)
        for j in range(m)
    ]
    base = df.select(F.col(id_col), vd.alias("vd"))
    for _ in range(iters):
        assigned = base
        for j, C in enumerate(books):
            assigned = assigned.withColumn(
                f"_a{j}",
                _assign_udf(C)(F.slice(F.col("vd"), j * d0 + 1, d0))["cell"],
            )
        upd = (
            assigned.select(
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.col(f"_a{j}").alias("cell"),
                            F.slice(F.col("vd"), j * d0 + 1, d0).alias("sv"),
                        )
                        for j in range(m)
                    ])
                ).alias("s")
            )
            .select("s.j", "s.cell", F.posexplode("s.sv").alias("pos", "v"))
            .groupBy("j", "cell", "pos")
            .agg(F.avg("v").alias("av"))
            .collect()
        )
        books = [C.copy() for C in books]
        for r in upd:
            books[r["j"]][r["cell"], r["pos"]] = (
                math.floor(r["av"] * QUANT + 0.5) / QUANT
            )
    return books


def pq_codes(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector as m sub-cell codes — ONE map-only pass: each
    subspace's Arrow-batched argmin UDF runs on its slice in the same
    projection (no joins between subspaces). Codes are the nearest
    (quantized-distance, cell) codebook entry per subspace, identical to
    the SQL oracle's per-subspace kmassign. Output: (id, c0..c{m-1})."""
    d0 = codebooks[0].shape[1]
    out = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vd"),
    )
    for j, C in enumerate(codebooks):
        out = out.withColumn(
            f"_a{j}", _assign_udf(C)(F.slice(F.col("vd"), j * d0 + 1, d0))
        )
    return out.select(
        id_col,
        *[F.col(f"_a{j}.cell").cast("int").alias(f"c{j}")
          for j in range(len(codebooks))],
    )


def pq_adc_topk(
    df: DataFrame,
    query: DataFrame,
    codebooks: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric Distance Computation over PQ codes: estimated squared
    distance from each query row to each encoded vector is the sum
    of per-subspace distances query-subvector -> codebook[code], each
    computed with the SAME vv - 2*dot + cc staged fold the k-means
    assignment uses (quantized to integer micro-units, so the per-code
    lookup values and their m-term sum are engine-exact bit-for-bit).

    Plan: the FAISS shape — a (m*ksub)-row distance LUT is computed ONCE
    per query (a tiny codebook relation crossJoined with the broadcast
    query row; the distance folds run m*ksub times total, NOT per corpus
    row), then FOLDED to one map<j*1024+cell, d_e6> row per query and
    broadcast ONCE onto the code table: the per-row ADC is m JVM-side
    element_at lookups plus an integer m-term sum — one broadcast
    nested-loop join instead of the previous m chained broadcast hash
    joins (each join paid its own broadcast materialization; measured
    4.7 s -> ~1 s warm at sf0.1, identical integer outputs). No UDF, no
    per-row fold blowup, no shuffle until the final top-k. At 100 TB:
    codes are m bytes/vector, the broadcast is m*ksub longs per query,
    and a multi-row query frame fans out per query exactly as the old
    j=0 join did."""
    m = len(codebooks)
    d0 = codebooks[0].shape[1]
    spark = df.sparkSession
    codes = pq_codes(df, codebooks, vec_col, id_col)
    q = query.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qd"),
        F.col(id_col).alias("query_id"),
    )
    cents = spark.createDataFrame(
        [
            (j, cell, [float(x) for x in C[cell]])
            for j, C in enumerate(codebooks)
            for cell in range(C.shape[0])
        ],
        "j int, cell int, cvec array<double>",
    )

    def fold_dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
            lambda acc, x: acc + x,
        )

    qj = F.slice(F.col("qd"), F.col("j") * d0 + 1, F.lit(d0))
    dist = (
        fold_dot(qj, qj)
        - 2.0 * fold_dot(qj, F.col("cvec"))
        + fold_dot(F.col("cvec"), F.col("cvec"))
    )
    lut = cents.crossJoin(F.broadcast(q)).select(
        "j",
        "cell",
        "query_id",
        F.floor(dist * QUANT + F.lit(0.5)).cast("long").alias("d_e6"),
    )
    # one map row per query: key j*1024+cell (ksub <= 1024 by contract)
    assert all(C.shape[0] <= 1024 for C in codebooks)
    lut_map = lut.groupBy("query_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("j") * F.lit(1024) + F.col("cell")).cast("int").alias("k"),
                    F.col("d_e6").alias("v"),
                )
            )
        ).alias("_lut")
    )
    out = codes.crossJoin(F.broadcast(lut_map))
    adc = None
    for j in range(m):
        term = F.element_at(F.col("_lut"), F.col(f"c{j}") + F.lit(j * 1024))
        adc = term if adc is None else adc + term
    scored = out.withColumn("adc_e6", adc).filter(
        F.col(id_col) != F.col("query_id")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_e6").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, *[f"c{j}" for j in range(m)],
                "adc_e6", "rank")
    )
