"""Embedding dimensionality reduction: exact PCA and seeded random
projection.

The footprint stack's missing front half: reduce dimensions FIRST
(PCA when you can afford one fit pass, Johnson-Lindenstrauss random
projection when you cannot), then quantize (``..quantize``: SQ8/PQ/
IVFADC). A 1024-d float32 corpus PCA'd to 256 d and PQ'd to 16 bytes is
the standard 256x footprint recipe — every stage here is map-only
Arrow, so the whole chain fuses into one corpus pass after the fit.

PCA fit is EXACT over the full corpus, not sampled: each task
accumulates its partition's Gram partial (d×d), row sum (d) and count
across Arrow batches and emits ONE partial row per partition; the
partials are then summed IN SPARK by a tree reduction (depth grows
with the log of the partition count), so the driver receives exactly
ONE (n, s[d], g[d×d]) triple regardless of how many input partitions
there are — at 10⁶ partitions and d = 1024 the old per-partition
collect would have shipped ~8 TB of 8.4 MB Gram partials to the
driver; the tree ships one. The driver then assembles the covariance
and eigendecomposes (numpy, d×d — seconds at d=4096).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.ArrayType(T.DoubleType()), False),
        T.StructField("g", T.ArrayType(T.DoubleType()), False),
    ]
)


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: Optional[int] = None,
    dim: Optional[int] = None,
    center: bool = True,
) -> dict:
    """Fit PCA on a vector column — exact full-corpus second moments.

    Returns ``{"mean": [d], "components": [k][d], "explained_variance":
    [k], "dim": d, "k": k}`` with components sorted by descending
    eigenvalue; the sign convention is deterministic (each component's
    largest-|coefficient| entry is made positive) so fits are
    reproducible across partitionings. ``k`` defaults to ``dim``
    (rotation only). ``center=False`` skips mean subtraction (already-
    centered or cosine-normalized corpora) — then ``mean`` is zeros.

    One corpus pass: per-partition Gram/sum/count partials (see module
    doc) tree-reduced in Spark to a single triple, driver-side eigh of
    the d×d covariance. Null vectors are skipped (they stay null under
    :func:`pca_project`); a ragged vector (length ≠ ``dim``) fails
    fast with a clear error instead of a shape-mismatch traceback.
    """
    import math

    import numpy as np

    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None or first["d"] is None:
            raise ValueError("fit_pca: empty DataFrame")
        dim = first["d"]
    d = int(dim)

    pruned = df.select(F.col(vec_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )

    def partials(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        g = np.zeros((d, d), dtype="float64")
        s = np.zeros(d, dtype="float64")
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bad = next(
                (len(v) for v in pdf["__v"] if len(v) != d), None
            )
            if bad is not None:
                raise ValueError(
                    f"fit_pca: ragged vector column — expected length "
                    f"{d}, found {bad}"
                )
            mat = np.array([list(v) for v in pdf["__v"]], dtype="float64")
            g += mat.T @ mat
            s += mat.sum(axis=0)
            n += len(mat)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    # Tree-reduce the per-partition partials EXECUTOR-SIDE: the driver
    # receives one (n, s, g) triple, not one per partition — the
    # per-partition collect was O(partitions × d²) driver memory, the
    # one genuinely non-scalable shape flagged at 100 TB partition
    # counts. Depth scales with log₈(P) so no single reduce task holds
    # more than ~8 sibling partials at once.
    partial_rdd = (
        pruned.mapInPandas(partials, schema=_PARTIAL_SCHEMA)
        .rdd.map(
            lambda r: (
                int(r["n"]),
                np.asarray(r["s"], dtype="float64"),
                np.asarray(r["g"], dtype="float64"),
            )
        )
    )
    p_count = max(partial_rdd.getNumPartitions(), 2)
    depth = max(2, int(math.ceil(math.log(p_count, 8))))
    try:
        n, s, g_flat = partial_rdd.treeReduce(
            lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
            depth=depth,
        )
    except ValueError as exc:  # empty RDD: every vector was null
        raise ValueError("fit_pca: no non-null vectors") from exc
    g = g_flat.reshape(d, d)

    mean = s / n if center else np.zeros(d)
    # covariance = E[xxᵀ] − μμᵀ (population, the exact moments we hold)
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    k = d if k is None else min(int(k), d)
    comps = evecs[:, :k].T.copy()
    # deterministic sign: largest-|coeff| entry positive per component
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": np.maximum(evals[:k], 0.0).tolist(),
        "dim": d,
        "k": k,
    }


def _check_out_col(
    df: DataFrame, vec_col: str, out_col: str, keep_vec: bool
) -> None:
    """Fail fast on a duplicate output name (a colliding schema only
    errors at execution time, with an opaque Spark message)."""
    retained = {
        f.name for f in df.schema.fields if keep_vec or f.name != vec_col
    }
    if out_col in retained:
        raise ValueError(
            f"out_col {out_col!r} collides with a retained input column; "
            "pick a different out_col or drop/rename the input "
            "(keep_vec=False drops vec_col, freeing its name)"
        )


def pca_project(
    df: DataFrame,
    params: dict,
    vec_col: str = "embedding",
    out_col: str = "embedding_pca",
    keep_vec: bool = False,
) -> DataFrame:
    """Project vectors onto the fitted components: ``(x − μ) @ Wᵀ``.

    Map-only Arrow stage (one batched matrix multiply per Arrow batch);
    null vectors project to null; the input column is dropped by
    default. Output composes with every embedding operator
    (``cosine_topk``, ``build_ivf_index``, the ``..quantize`` family).
    """
    import numpy as np

    mean = np.asarray(params["mean"], dtype="float64")
    comps = np.asarray(params["components"], dtype="float64")

    _check_out_col(df, vec_col, out_col, keep_vec)
    out_fields = [
        f for f in df.schema.fields if keep_vec or f.name != vec_col
    ]
    schema = T.StructType(
        out_fields
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()), True)]
    )
    names = [f.name for f in out_fields]

    def project(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            mask = pdf[vec_col].notna()
            vecs = [None] * len(pdf)
            if mask.any():
                mat = np.array(
                    [list(v) for v in pdf[vec_col][mask]], dtype="float64"
                )
                proj = (mat - mean) @ comps.T
                it = iter(proj)
                vecs = [
                    next(it).tolist() if ok else None
                    for ok in mask.to_numpy()
                ]
            out = pdf[names].copy() if names else pd.DataFrame(index=pdf.index)
            out[out_col] = vecs
            yield out

    return df.mapInPandas(project, schema=schema)


def random_projection(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "embedding_rp",
    dim: Optional[int] = None,
    seed: int = 42,
    keep_vec: bool = False,
) -> DataFrame:
    """Johnson-Lindenstrauss Gaussian random projection — the zero-fit
    reduction: ``x @ R / sqrt(out_dim)`` with ``R[d][out_dim]`` drawn
    N(0, 1) from ``seed``, so pairwise distances are preserved within
    the JL bound in expectation and two runs (or two corpora — e.g. a
    corpus and its queries) projected with the same seed land in the
    SAME space. No corpus pass at all: the matrix is generated on each
    task from the seed (d × out_dim doubles, never shipped), the
    projection is one batched matmul per Arrow batch, map-only.
    """
    import numpy as np

    if out_dim <= 0:
        raise ValueError(f"out_dim must be positive, got {out_dim}")
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None or first["d"] is None:
            raise ValueError("random_projection: empty DataFrame")
        dim = first["d"]
    d = int(dim)

    _check_out_col(df, vec_col, out_col, keep_vec)
    out_fields = [
        f for f in df.schema.fields if keep_vec or f.name != vec_col
    ]
    schema = T.StructType(
        out_fields
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()), True)]
    )
    names = [f.name for f in out_fields]
    scale = 1.0 / float(np.sqrt(out_dim))

    def project(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        r = np.random.default_rng(seed).standard_normal((d, out_dim))
        for pdf in batches:
            mask = pdf[vec_col].notna()
            vecs = [None] * len(pdf)
            if mask.any():
                mat = np.array(
                    [list(v) for v in pdf[vec_col][mask]], dtype="float64"
                )
                proj = (mat @ r) * scale
                it = iter(proj)
                vecs = [
                    next(it).tolist() if ok else None
                    for ok in mask.to_numpy()
                ]
            out = pdf[names].copy() if names else pd.DataFrame(index=pdf.index)
            out[out_col] = vecs
            yield out

    return df.mapInPandas(project, schema=schema)


def pca_k_for_variance(params: dict, target: float = 0.95) -> int:
    """Smallest ``k`` whose leading eigenvalues capture ``target`` of
    the total variance — the standard way to budget a reduction before
    re-fitting with ``k`` (fit once at full rank, pick, truncate:
    ``params["components"][:k]`` is exactly the k-fit, so no second
    corpus pass is needed either)."""
    if not 0 < target <= 1:
        raise ValueError(f"target must be in (0, 1], got {target}")
    ev = params["explained_variance"]
    total = sum(ev)
    if total <= 0:
        return 1
    acc = 0.0
    for i, v in enumerate(ev):
        acc += v
        if acc / total >= target:
            return i + 1
    return len(ev)


def truncate_pca(params: dict, k: int) -> dict:
    """The k-component fit extracted from a full-rank fit (identical to
    re-fitting with ``k`` — components are eigenvector prefixes)."""
    if not 1 <= k <= params["k"]:
        raise ValueError(f"k must be in [1, {params['k']}], got {k}")
    return {
        "mean": params["mean"],
        "components": params["components"][:k],
        "explained_variance": params["explained_variance"][:k],
        "dim": params["dim"],
        "k": k,
    }


def opq_eigen_allocation(explained_variance, m: int) -> list:
    """Parametric OPQ dimension allocation (Ge et al. 2013, "Optimized
    Product Quantization", the eigenvalue-allocation variant): assign
    PCA dimensions to ``m`` product-quantizer subspaces so the PRODUCT
    of eigenvalues per subspace balances — the free-rotation family's
    closed-form member for Gaussian data, and the standard fix for
    PQ's weakness on anisotropic (PCA'd) vectors, where a contiguous
    split gives the first subspace all the variance.

    Greedy (LPT over SHIFTED log-eigenvalues): every subspace ends
    with exactly ``d/m`` dimensions, so subtracting the minimum log
    from every value shifts each final subspace sum by the same
    constant — balance is unchanged — while making the values
    non-negative, which is what the longest-processing-time greedy
    needs (raw logs of sub-1 eigenvalues are negative, and a
    min-product rule then keeps attracting mass to whichever bucket
    already has the most). Dimensions in descending shifted order,
    each to the unfilled subspace with the smallest current sum.
    Returns a permutation ``perm`` with ``perm[i]`` = the PCA
    dimension placed at output slot ``i`` (slots are contiguous per
    subspace, so a plain contiguous PQ split downstream sees the
    balanced allocation).
    """
    import math

    d = len(explained_variance)
    if m < 1 or d % m != 0:
        raise ValueError(
            f"m must divide the dimension: d={d}, m={m}"
        )
    per = d // m
    logs = [
        math.log(max(float(v), 1e-300)) for v in explained_variance
    ]
    lo = min(logs)
    shifted = [v - lo for v in logs]
    order = sorted(range(d), key=lambda i: (-shifted[i], i))
    load = [0.0] * m
    members: list = [[] for _ in range(m)]
    for dim in order:
        candidates = [g for g in range(m) if len(members[g]) < per]
        g = min(candidates, key=lambda g: (load[g], g))
        members[g].append(dim)
        load[g] += shifted[dim]
    perm: list = []
    for g in range(m):
        perm.extend(members[g])
    return perm


def opq_reorder(params: dict, m: int) -> dict:
    """Apply :func:`opq_eigen_allocation` to a :func:`fit_pca` fit by
    REORDERING its components — projection through the reordered fit
    IS the allocated rotation, so the PCA→OPQ→PQ chain costs zero
    extra corpus passes: ``pca_project(df, opq_reorder(fit, m))``
    feeds ``..quantize.fit_pq(m=m)`` directly. Explained variances are
    permuted alongside (they describe output slots)."""
    perm = opq_eigen_allocation(params["explained_variance"], m)
    return {
        "mean": params["mean"],
        "components": [params["components"][i] for i in perm],
        "explained_variance": [
            params["explained_variance"][i] for i in perm
        ],
        "dim": params["dim"],
        "k": params["k"],
    }
