"""Similarity search over embedding columns.

Two paths, as a 100 TB design requires:
  * brute-force top-k — exact; the *query* side must be small (it is
    broadcast), corpus side streams. Baseline + recall oracle.
  * LSH-bucketed top-k — random-hyperplane signatures bucket the corpus;
    each query probes only its bucket(s). Approximate, scales to
    arbitrary corpus size since the join is an equi-join on bucket key.

Hyperplanes are generated from a seeded RNG on the driver and folded in
as literal arrays (no data-dependent randomness, resumable/deterministic).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datahub_spark.operators.dedup import cosine


FIXED_POINT_SCALE = 10_000_000  # 1e7: elements to ~1e-7, dots to ~1e-14


def dot_fixed(a: Column, b: Column) -> Column:
    """Exact fixed-point dot product: elements scaled to int64 (x * 1e7,
    rounded), products and sum in exact long arithmetic. Addition over
    longs is associative, so the result is bit-identical across engines
    and shuffle schedules — unlike float accumulation. Bounds: |x| <= 4,
    64 dims -> |dot| <= 64 * (4e7)^2 ≈ 1e17 < int64 max. The test
    embeddings are L2-normalized, so this doubles as exact cosine
    (value = cosine * 1e14)."""
    fx = lambda v: F.round(v.cast("double") * FIXED_POINT_SCALE).cast("long")
    prod = F.zip_with(a, b, lambda x, y: fx(x) * fx(y))
    return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)


# DuckDB rendering of the same computation (kept adjacent so the two
# implementations evolve together):
DOT_FIXED_SQL = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(round(CAST(p[1] AS DOUBLE) * 10000000) AS BIGINT)"
    " * CAST(round(CAST(p[2] AS DOUBLE) * 10000000) AS BIGINT))) AS BIGINT)"
)


def ann_bruteforce(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query (excluding self). The query set is
    broadcast; ranking ties break on neighbor id for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("_cos", 4).cast("decimal(9,4)").cast("string").alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for a vector against literal hyperplanes —
    evaluated fully in codegen (zip_with + aggregate per plane)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def ann_ivf(queries: DataFrame, corpus: DataFrame, k: int = 5, n_clusters: int = 16,
            n_probe: int = 4, lloyd_rounds: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) ANN: k-means-style coarse quantizer, then probe
    only the query's n_probe nearest clusters.

    Deterministic throughout: initial centroids are the first n_clusters
    corpus vectors by id; Lloyd refinement is a fixed number of rounds of
    (broadcast centroids -> argmax-cosine assign -> per-cluster mean).
    All vector math is JVM-side (zip_with/aggregate). The cluster
    assignment is materialized once (the inverted file — at scale this is
    the index you persist, bucketed by cluster); probing is an equi-join
    on cluster id, never a cross-join against the full corpus."""
    from pyspark.sql import Window

    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                           F.lit(0.0), lambda acc, v: acc + v)

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))

    # deterministic init: lowest-id vectors seed the centroids
    centroids = (
        c.orderBy("cid").limit(n_clusters)
        .select(F.monotonically_increasing_id().alias("cl"), F.col("cv").alias("centroid"))
    )
    w_assign = Window.partitionBy("cid").orderBy(F.col("_sim").desc(), F.col("cl"))
    for _ in range(lloyd_rounds):
        assigned = (
            c.crossJoin(F.broadcast(centroids))
            .withColumn("_sim", dot(F.col("cv"), F.col("centroid")) / norm(F.col("centroid")))
            .withColumn("_rn", F.row_number().over(w_assign))
            .filter(F.col("_rn") == 1)
            .select("cid", "cv", "cl")
        )
        centroids = (
            assigned.groupBy("cl")
            .agg(F.array_agg(F.col("cv")).alias("_vs"))
            .select(
                "cl",
                F.transform(
                    F.sequence(F.lit(0), F.size(F.col("_vs")[0]) - 1),
                    lambda i: F.aggregate(F.col("_vs"), F.lit(0.0),
                                          lambda acc, v: acc + v[i].cast("double"))
                    / F.size(F.col("_vs")),
                ).alias("centroid"),
            )
        )
    inverted = (
        c.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", dot(F.col("cv"), F.col("centroid")) / norm(F.col("centroid")))
        .withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") == 1)
        .select(F.col("cid").alias("neighbor_id"), F.col("cv").alias("_cv"), "cl")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    w_probe = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cl"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", dot(F.col("_qv"), F.col("centroid")) / norm(F.col("centroid")))
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "_qv", "cl")
    )
    scored = (
        probes.join(inverted, "cl")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("_cos"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("_cos", 4).cast("decimal(9,4)").cast("string").alias("cosine"))
    )


def ann_lsh(queries: DataFrame, corpus: DataFrame, k: int = 5, n_planes: int = 6,
            dim: int = 64, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.
    Equi-join on bucket id replaces the cross-join — the scale path."""
    planes = _hyperplanes(dim, n_planes, seed)
    qb = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("_cos", 4).cast("decimal(9,4)").cast("string").alias("cosine"))
    )
