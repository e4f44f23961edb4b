"""Similarity search over embedding columns (north star, BASELINE.json).

``array<float>`` embeddings (FIXTURES.md ``embeddings`` table). Two tiers:

- ``cosine_topk`` / ``knn_join``: brute-force exact baselines, pure
  higher-order-function expressions (zip_with product, aggregate sum) —
  JVM-side, codegen'd, no Python.
- ``lsh_bucket`` + ``cosine_topk_lsh``: random-hyperplane LSH bucketing —
  the sub-linear scale path; candidates rescored exactly.

Scale notes: brute force against a single query vector is a full scan
(fine — that's the floor); all-pairs knn_join at 100 TB must go through the
LSH bucketing (cost = per-bucket cross products, bounded by bucket size) or
an IVF-style coarse quantizer over a sampled centroid table.
"""

from __future__ import annotations

import math
import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_sim_expr", "cosine_topk", "knn_join", "lsh_bucket", "cosine_topk_lsh"]


def _as_double(vec_col) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_sim_expr(vec_col, query: Sequence[float]) -> Column:
    """Cosine similarity between an array column and a literal query vector,
    accumulated in double left-to-right (deterministic)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = _as_double(vec_col)
    return _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] | None = None,
) -> DataFrame:
    """Exact top-k by cosine against one query vector. orderBy+limit
    compiles to TakeOrderedAndProject: per-partition heaps of size k, no
    global sort — scan-bound at any corpus size."""
    scored = df.withColumn("cosine_sim", cosine_sim_expr(F.col(vec_col), query))
    if exclude_ids:
        scored = scored.where(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))
    return (
        scored.orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: for every left vector, its k nearest right vectors
    by cosine. Brute force (broadcast right, rank per left id) — correct
    baseline; use ``cosine_topk_lsh`` when |right| stops being
    broadcast-able."""
    r = F.broadcast(
        right.select(
            F.col(id_col).alias("nn_id"), F.col(vec_col).alias("__rv")
        )
    )
    l = left.select(F.col(id_col), F.col(vec_col).alias("__lv"))
    lv, rv = _as_double(F.col("__lv")), _as_double(F.col("__rv"))
    sim = _dot(lv, rv) / (F.sqrt(_dot(lv, lv)) * F.sqrt(_dot(rv, rv)))
    scored = (
        l.join(r, F.col(id_col) != F.col("nn_id"))
        .withColumn("cosine_sim", sim)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine_sim"), F.asc("nn_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(id_col, "nn_id", "cosine_sim", F.col("__rk").alias("rank"))
    )


def _random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = 42,
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane (sign) LSH: each vector → an n_planes-bit bucket id.

    Deterministic (seeded plane matrix broadcast as literals). Vectors with
    high cosine similarity collide with probability
    (1 - θ/π)^n_planes. Multi-probe/multi-table variants stack extra
    ``lsh_bucket`` columns with different seeds.
    """
    planes = _random_hyperplanes(dim, n_planes, seed)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(v, p) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return df.withColumn(bucket_col, bucket)


def cosine_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    exclude_ids: Sequence[int] | None = None,
) -> DataFrame:
    """Approximate top-k: hash the corpus and the query with the same
    hyperplanes, scan only the query's bucket, rescore exactly.

    At 100 TB the bucket column is a partition/cluster key, so the bucket
    probe becomes partition pruning at the scan — the query reads
    ~1/2^n_planes of the data. Recall is tunable via n_planes (fewer planes
    → bigger buckets → higher recall, more IO).
    """
    dim = len(query)
    planes = _random_hyperplanes(dim, n_planes, seed)
    qbits = 0
    for i, plane in enumerate(planes):
        dot = sum(float(a) * b for a, b in zip(query, plane))
        if dot >= 0:
            qbits |= 1 << i
    bucketed = lsh_bucket(df, dim, n_planes, vec_col=vec_col, seed=seed)
    candidates = bucketed.where(F.col("lsh_bucket") == qbits)
    return cosine_topk(
        candidates, query, k=k, id_col=id_col, vec_col=vec_col,
        exclude_ids=exclude_ids,
    ).drop("lsh_bucket")
