"""Similarity search over embedding columns.

* :func:`cosine_topk` — exact brute-force baseline. The scored cross join is
  query-broadcast (queries are small by definition), scoring is pure
  expressions fused into the corpus scan, and only the ranking shuffle moves
  ``|queries| × |corpus|`` score rows.
* :func:`hyperplane_lsh_buckets` / :func:`ann_lsh_topk` — the scale path:
  sign-random-projection buckets shrink each query's candidate set to its
  own bucket before exact scoring. Hyperplanes are derived deterministically
  from a seed so results are reproducible.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    query_vec_col: Optional[str] = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Returns ``query_id, neighbor_id, cosine, rank``; ties broken by
    neighbor id so results are deterministic across engines.
    """
    from patito_spark.functions.vector import dot_product, l2_norm

    query_id_col = query_id_col or id_col
    query_vec_col = query_vec_col or vec_col
    # Norms computed once per side; each scored pair pays one dot product.
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qvec"),
        l2_norm(F.col(query_vec_col)).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cnorm"),
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        dot_product(F.col("__qvec"), F.col("__cvec"))
        / (F.col("__qnorm") * F.col("__cnorm")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _deterministic_hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Seeded pseudo-random unit hyperplanes (no RNG state, reproducible)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def hyperplane_bucket(
    vec: Column, planes: Sequence[Sequence[float]]
) -> Column:
    """Sign-random-projection bucket id (bigint) for a vector column."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Assign each vector to a sign-random-projection bucket."""
    planes = _deterministic_hyperplanes(dim, n_planes, seed)
    return df.withColumn("bucket", hyperplane_bucket(F.col(vec_col), planes))


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search.

    1. A KMeans coarse quantizer (Spark ML, seeded) learns ``n_centroids``
       cells from the corpus.
    2. Each corpus vector is assigned to its nearest cell — one vectorized
       numpy pass via ``mapInPandas`` (the inverted file).
    3. Each query probes its ``n_probe`` nearest cells only; exact cosine
       ranking runs inside the probed cells.

    Scanned fraction ≈ n_probe/n_centroids of the corpus per query — the
    standard IVF recall/speed dial. Recall loss comes from true neighbors
    living in unprobed cells.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=10).fit(train)
    centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])

    assign_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("__cvec", T.ArrayType(T.DoubleType(), False), False),
            T.StructField("__cnorm", T.DoubleType(), False),
        ]
    )
    pruned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    def assign(batches):
        for pdf in batches:
            mat = np.stack(pdf["vec"].to_numpy())
            dists = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
            yield pd.DataFrame(
                {
                    "cell": dists.argmin(1).astype("int32"),
                    "neighbor_id": pdf["neighbor_id"],
                    "__cvec": list(mat),
                    "__cnorm": np.linalg.norm(mat, axis=1),
                }
            )

    inverted = pruned.mapInPandas(assign, schema=assign_schema)

    probe_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType(), False),
            T.StructField("query_id", T.LongType(), False),
            T.StructField("__qvec", T.ArrayType(T.DoubleType(), False), False),
            T.StructField("__qnorm", T.DoubleType(), False),
        ]
    )
    q_pruned = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    def probe(batches):
        for pdf in batches:
            mat = np.stack(pdf["vec"].to_numpy())
            dists = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
            probed = np.argsort(dists, axis=1)[:, :n_probe]
            rows = {
                "cell": probed.reshape(-1).astype("int32"),
                "query_id": np.repeat(pdf["query_id"].to_numpy(), n_probe),
                "__qvec": [v for v in mat for _ in range(n_probe)],
                "__qnorm": np.repeat(np.linalg.norm(mat, axis=1), n_probe),
            }
            yield pd.DataFrame(rows)

    probes = q_pruned.mapInPandas(probe, schema=probe_schema)

    scored = inverted.join(F.broadcast(probes), on="cell").withColumn(
        "cosine",
        F.aggregate(
            F.zip_with(F.col("__qvec"), F.col("__cvec"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("__qnorm") * F.col("__cnorm")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within* each query's bucket.

    The corpus-side bucket assignment is a map-only projection; the join on
    ``bucket`` replaces the cross join, cutting scored candidates by
    ~2^n_planes. Recall degrades gracefully (vectors straddling a
    hyperplane); multi-probe or more tables would raise it — this is the
    canonical speed/recall trade.
    """
    from patito_spark.functions.vector import dot_product, l2_norm

    planes = _deterministic_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cnorm"),
    ).withColumn("bucket", hyperplane_bucket(F.col("__cvec"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qnorm"),
    ).withColumn("bucket", hyperplane_bucket(F.col("__qvec"), planes))
    scored = c.join(F.broadcast(q), on="bucket").withColumn(
        "cosine",
        dot_product(F.col("__qvec"), F.col("__cvec"))
        / (F.col("__qnorm") * F.col("__cnorm")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
