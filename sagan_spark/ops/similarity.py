"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k baseline — a broadcast join
  of the (small) query set against the corpus; the dot product runs
  JVM-side via ``zip_with``/``aggregate`` (no Python in the loop).
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets both
  sides, the join only touches colliding buckets; recall tunable via
  n_planes / n_tables.  At 100 TB, the bucket join replaces the
  corpus-sized cross product with a per-bucket product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k for each query vector (broadcast the queries).

    Returns (query_id, neighbor_id, cosine, rank), rank 1..k,
    self-matches excluded.  Deterministic tiebreak on neighbor_id.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_c"),
        _norm(F.col(vec_col)).alias("n_c"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("v_q"),
        _norm(F.col(vec_col)).alias("n_q"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("v_q"), F.col("v_c")) / (F.col("n_q") * F.col("n_c")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, table: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side numpy)."""
    import numpy as np

    rng = np.random.RandomState(seed + 1000 * table)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id for one table: bit p = (v . plane_p) >= 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(vec_col, arr)
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 6, n_tables: int = 3, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: random-hyperplane buckets, union over
    n_tables, exact rerank inside colliding buckets."""
    cands = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t)
        be = lsh_bucket_expr(F.col(vec_col), planes)
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_c"),
            be.alias("bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("v_q"),
            be.alias("bucket"),
        )
        pair = c.join(F.broadcast(q), "bucket").filter(
            F.col("neighbor_id") != F.col("query_id")
        ).select("query_id", "neighbor_id", "v_q", "v_c")
        cands = pair if cands is None else cands.unionByName(pair)

    cands = cands.dropDuplicates(["query_id", "neighbor_id"])
    scored = cands.withColumn(
        "cosine",
        _dot(F.col("v_q"), F.col("v_c"))
        / (_norm(F.col("v_q")) * _norm(F.col("v_c"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
