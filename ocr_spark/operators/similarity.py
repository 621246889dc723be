"""Similarity search over the embeddings table (array<float> column).

Training-data-pipeline staple (driver brief): approximate nearest neighbor.
- brute-force cosine top-k: exact baseline; dot products via higher-order
  array functions (JVM-side `aggregate`/`zip_with` — no Python).
- LSH-bucketed variant (random-hyperplane signs): the scale path — the
  cross product is restricted to same-bucket candidates, so cost is
  O(n * bucket_size) instead of O(n * m).

Determinism: hyperplanes are a fixed seeded numpy matrix broadcast as a
literal array; ties in top-k break on vec_id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, *, k: int = 5, round_to: int = 4
) -> DataFrame:
    """Exact cosine top-k per query. Output (query_id, vec_id, sim, rank).

    The queries side is small -> Catalyst broadcasts it; the big side is
    scanned once with no shuffle before the per-query top-k aggregation.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = embeddings.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_emb")), round_to).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Random-hyperplane LSH ANN: candidates share the sign-pattern bucket.

    Recall < 1 by design (approximate); at 100 TB this is the only viable
    shape — the bucket join replaces the full cross product. Multi-probe =
    union over several plane sets (single set here).
    """
    planes = _hyperplanes(dim, n_planes)

    def bucket_col(emb):
        bits = [
            F.when(
                _dot(emb, F.array(*[F.lit(float(v)) for v in plane])) > 0, F.lit(1)
            ).otherwise(F.lit(0))
            * F.lit(2 ** i)
            for i, plane in enumerate(planes)
        ]
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b
        return acc

    emb_b = embeddings.select("vec_id", "embedding", bucket_col(F.col("embedding")).alias("bucket"))
    q_b = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        bucket_col(F.col("embedding")).alias("bucket"),
    )
    pairs = emb_b.join(F.broadcast(q_b), "bucket").where(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_emb")), round_to).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )
