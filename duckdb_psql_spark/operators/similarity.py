"""Similarity search over embedding columns (charter extended surface).

Brute-force cosine top-k as the exact baseline, and random-hyperplane
LSH-bucketed search as the scale path. All vector math is JVM-side via
higher-order functions (``zip_with`` + ``aggregate``) — Arrow/pandas never
enters the per-row path, so the scan stays inside whole-stage codegen.

Scale notes (100 TB / billions of vectors):

* brute-force top-k for a single query is a map + TakeOrderedAndProject —
  no shuffle at all; for a query SET it's a broadcast nested-loop with
  per-partition heaps (window rank over the joined pairs).
* LSH buckets cut the candidate set by ~2^planes; the bucket join is an
  equi-join on the sketch, shuffle-partitioned and AQE-skew-safe.
* an IVF-style variant (k-means coarse quantizer) would replace the
  sketch with a nearest-centroid id — the plumbing below (bucket column +
  equi-join + re-rank) is identical, so it can slot in without new
  operator shapes.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """⟨a,b⟩ as a codegen-friendly fold (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def infer_vec_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimension from a one-row sample.

    EXPLICITLY runs a (tiny) Spark job — parquet array schemas do not carry
    element counts, so the only source is the data. Call this once up front
    and thread the result into the LSH operators; never called implicitly
    during plan composition.
    """
    row = df.select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError(f"infer_vec_dim: no non-null rows in {vec_col!r}")
    return len(row[0])


def random_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; only sign matters)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def sketch_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Pack sign(⟨vec, plane_i⟩) bits into a bigint LSH sketch."""
    sketch = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot_expr(vec, arr) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sketch = sketch.bitwiseOR(bit)
    return sketch


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    Plan: project cosine per row, TakeOrderedAndProject — per-partition
    heaps, no shuffle; scales linearly with corpus size.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact k-NN of each query against the corpus (broadcast the queries).

    Queries are the small side by construction → broadcast nested loop;
    rank per query with a window. Returns (query_id, corpus_id, cosine, rk).
    """
    # norms are computed once per input row (below the join boundary) so the
    # per-pair work is a single dot product, not three
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        norm_expr(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("__cv"),
        norm_expr(F.col(vec_col)).alias("__cn"),
    )
    pairs = c.crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        F.round(
            dot_expr(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def knn_topk_arrow(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    *,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact k-NN of a small literal query set — Arrow-vectorized scale path.

    The per-pair dot product is the hot loop; ``zip_with``+``aggregate``
    lambdas are interpreted (no codegen for higher-order functions), so at
    corpus scale the vectorized path wins by an order of magnitude: one
    matrix multiply per Arrow batch (numpy BLAS), exact per-batch top-k
    (lexsort on (-cosine, id) — the same tie-break as the final rank), then
    a global window over ≤ k·n_queries·n_batches survivors. No shuffle
    until the (tiny) survivor set.

    ``queries`` are literal (id, vector) pairs — by contract a small set
    the caller already holds; pass a collected DataFrame through
    ``knn_join`` for the broadcast variant.
    """
    import numpy as np

    q_ids = [int(i) for i, _ in queries]
    Q = np.asarray([v for _, v in queries], dtype=np.float64)  # (nq, dim)
    Qn = np.linalg.norm(Q, axis=1)

    out_schema = f"{query_id} long, {corpus_id} long, cosine double"

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (b, dim)
            Cn = np.linalg.norm(C, axis=1)
            S = (C @ Q.T) / np.maximum(Cn[:, None] * Qn[None, :], 1e-300)
            S = np.round(S, 6)
            ids = pdf[corpus_id].to_numpy()
            for j, qid in enumerate(q_ids):
                col = S[:, j]
                order = np.lexsort((ids, -col))[:k]
                yield pd.DataFrame(
                    {query_id: qid, corpus_id: ids[order], "cosine": col[order]}
                )

    survivors = corpus.select(corpus_id, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return survivors.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_assign(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    sample_fraction: float | None = None,
):
    """IVF coarse quantizer: k-means centroids + per-row bucket assignment.

    Returns (assigned_df, centroids): ``assigned_df`` is the input plus a
    ``__bucket`` int column (nearest centroid id, JVM-side via the fitted
    model), ``centroids`` is a driver-side list of vectors (k × dim floats
    — tiny).

    ``sample_fraction`` is the 100 TB path: the iterative k-means fit
    (maxIter full passes) runs on a Bernoulli sample of the corpus — a
    coarse quantizer only needs the density shape, not every row — while
    the ASSIGNMENT still covers every row in one codegen'd pass. With
    ``None`` the fit scans the full corpus (fine to mid-scale).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    fit_input = feat
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        fit_input = feat.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter,
        featuresCol="__features", predictionCol="__bucket",
    ).fit(fit_input)
    assigned = model.transform(feat).drop("__features")
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    return assigned, centroids


def ivf_index_write(assigned: DataFrame, path: str) -> None:
    """Materialize an IVF index: the assigned corpus partitioned by bucket.

    ``partitionBy('__bucket')`` turns the probe phase's bucket predicate
    into directory-level partition pruning — ``ivf_topk`` over
    :func:`ivf_index_read` reads ONLY the nprobe probed buckets
    (plan-asserted in tests/test_plans.py)."""
    assigned.write.mode("overwrite").partitionBy("__bucket").parquet(path)


def ivf_index_read(spark, path: str) -> DataFrame:
    """Open a materialized IVF index written by :func:`ivf_index_write`."""
    return spark.read.parquet(path)


def nearest_centroid_fixed(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign each row to its nearest fixed centroid (squared L2, ties to
    the lowest centroid id). Returns (id, bucket).

    The cross-engine-checkable twin of :func:`ivf_assign`'s assignment
    step: with the centroids given (rather than k-means-fitted) the argmin
    is plain arithmetic, so the DuckDB differential oracle can mirror it
    with list_distance + row_number. Argmin via ``array_min`` over
    (distance, id) structs — lexicographic struct ordering gives the
    deterministic tie-break. For the 100 TB hot path use
    :func:`ivf_assign` (fitted model, JVM codegen'd assignment).
    """
    entries = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return df.select(F.col(id_col), F.array_min(entries)["c"].alias("bucket"))


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest centroids, exact re-rank.

    Centroid distances are computed driver-side (k × dim floats); the scan
    prunes to the probed buckets (a partition-prunable predicate if the
    index is written ``partitionBy('__bucket')``), then exact cosine ranks
    candidates — the standard recall/latency trade of IVF indexes.
    """
    import math

    def dist2(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    order = sorted(range(len(centroids)), key=lambda i: dist2(centroids[i], query_vec))
    probe = order[: max(1, min(nprobe, len(centroids)))]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    cand = assigned.filter(F.col("__bucket").isin(probe))
    scored = cand.select(
        F.col(id_col),
        F.round(
            dot_expr(F.col(vec_col), qcol) / (norm_expr(F.col(vec_col)) * F.lit(qnorm)), 6
        ).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    planes: int = 12,
    max_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-sketch prefilter, exact re-rank.

    Candidates = rows whose sketch is within ``max_hamming`` bits of the
    query's sketch (popcount on XOR — pure codegen); exact cosine re-ranks
    only those. Recall/latency tunable via planes & max_hamming.
    """
    dim = len(query_vec)
    pl = random_planes(planes, dim, seed)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    # query sketch computed driver-side in Python for determinism
    qsketch = 0
    for i, plane in enumerate(pl):
        if sum(a * b for a, b in zip(plane, query_vec)) > 0:
            qsketch |= 1 << i
    sk = df.select(
        F.col(id_col), F.col(vec_col), sketch_expr(F.col(vec_col), pl).alias("sketch")
    )
    cand = sk.filter(
        F.bit_count(F.col("sketch").bitwiseXOR(F.lit(qsketch))) <= max_hamming
    )
    scored = cand.select(
        F.col(id_col), F.round(cosine_expr(F.col(vec_col), qcol), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)
