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


def _train_centroids(sample: list[list[float]], n_centroids: int,
                     iters: int = 5, seed: int = 42):
    """Driver-side spherical k-means on a deterministic sample.

    Tiny by design: the sample is a bounded collect (the IVF 'training
    set'), the loop is numpy, and only the resulting n_centroids × dim
    floats ship to executors as literals."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    cent[c] = m / n
    return cent.tolist()


def _centroid_dots(vec_col, centroids: list[list[float]]):
    """array<double> of dot(v, centroid_i) — all JVM-side."""
    return F.array(*[
        _dot(vec_col, F.array(*[F.lit(float(x)) for x in c])) for c in centroids
    ])


def fixed_centroids(n_centroids: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit centroids — the 'pretrained
    codebook' form of IVF (production IVF ships centroids trained
    offline; injecting them also lets the correctness oracle replay the
    assignment with the same literals)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    c = rng.randn(n_centroids, dim)
    c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c.tolist()


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4, dim: int = 64,
             sample_n: int = 256, iters: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other standard ANN
    scale path beside hyperplane LSH.

    Spherical k-means centroids train driver-side on the deterministic
    sample (TakeOrdered first ``sample_n`` by id); every corpus vector lands in its
    nearest centroid's list (argmax of n_centroids JVM dot products —
    one narrow projection, no shuffle); each query probes its n_probe
    nearest lists and reranks exactly.  At 100 TB the bucket join reads
    n_probe/n_centroids of the corpus per query batch instead of all of
    it; recall is tunable via n_probe.  Deterministic given the corpus
    (fixed sample, fixed seed) — pinned against a pure-Python twin in
    tests."""
    if centroids is not None:
        # pretrained codebook injected by the caller (fixed_centroids or
        # an offline training job) — skip the sample/train step
        cent = centroids
    else:
        # TakeOrdered head of the corpus: deterministic for any id domain
        # (an id-value threshold like `vec_id < sample_n` breaks on
        # corpora whose ids don't start near 0)
        sample = [
            row[0]
            for row in corpus.orderBy(id_col).limit(sample_n).select(vec_col).collect()
        ]
        cent = _train_centroids(sample, n_centroids, iters)

    dots = _centroid_dots(F.col(vec_col), cent)
    centroid_id = F.expr(
        "array_position(_dots, array_max(_dots))"
    ).cast("int") - 1

    c = (
        corpus.withColumn("_dots", dots)
        .withColumn("centroid", centroid_id)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("v_c"),
            "centroid",
        )
    )
    # per query: top-n_probe centroids via sorted (dot, idx) structs
    probe_entries = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    dots,
                    lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                )
            )
        ),
        1,
        n_probe,
    )
    q = (
        queries
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("v_q"),
            F.explode(probe_entries).alias("probe"),
        )
        .select("query_id", "v_q", F.col("probe.i").cast("int").alias("centroid"))
    )
    cands = (
        c.join(F.broadcast(q), "centroid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "v_q", "v_c")
    )
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


def quantize_expr(vec_col, bits: int = 8):
    """Symmetric per-vector fixed-point quantization of a float
    embedding — the memory/bandwidth lever of large-vector stores
    (int8 is FAISS's ``SQ8`` scalar quantizer; at 100 TB of
    ``array<float>`` it cuts the shuffled/stored bytes 4x and the
    integer dot products that follow stay exact in any order).

    ``q_i = floor(x_i / max_abs * qmax + 0.5)`` with ``qmax = 2^(bits-1)-1``
    (127 for int8) — round-half-up via ``floor(.. + 0.5)`` because BOTH
    Spark and DuckDB floor identically, whereas their ``round()`` tie
    rules differ.  Every step is an exactly-rounded IEEE double op on
    values cast from float32, so the quantized INTEGER vector is
    bit-identical across engines/partitionings.  An all-zero vector
    (max_abs = 0) quantizes to the zero vector rather than NULLs; a
    NULL embedding stays NULL.
    """
    qmax = float((1 << (bits - 1)) - 1)
    m = F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
    q = F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") / m * F.lit(qmax) + F.lit(0.5)).cast("long"),
    )
    zero = F.transform(vec_col, lambda x: F.lit(0).cast("long"))
    return F.when(m > F.lit(0.0), q).otherwise(zero)


def _idot(a, b):
    """Exact integer dot product (long accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   bits: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k over the QUANTIZED vectors: quantize both
    sides scan-level (no extra pass), integer dot products, rank per
    query.  Zero-norm vectors are excluded from both sides (cosine
    undefined).  Returns (query_id, neighbor_id, cosine_q, rank) —
    ``cosine_q`` approximates the float cosine to ~1/qmax; at scale
    the same expression composes under the LSH/IVF bucketing of
    ``lsh_topk``/``ivf_topk`` in place of the float rerank.
    """
    qz = quantize_expr(F.col(vec_col), bits)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), qz.alias("v_c")
    ).withColumn("cc", _idot(F.col("v_c"), F.col("v_c"))).filter(F.col("cc") > 0)
    q = queries.select(
        F.col(id_col).alias("query_id"), qz.alias("v_q")
    ).withColumn("qq", _idot(F.col("v_q"), F.col("v_q"))).filter(F.col("qq") > 0)
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_q",
            _idot(F.col("v_q"), F.col("v_c"))
            / (F.sqrt(F.col("qq")) * F.sqrt(F.col("cc"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_q", "rank")
    )


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
