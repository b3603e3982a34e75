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
across Arrow batches and emits ONE partial row per partition — ~
``n_partitions × d²`` doubles to the driver (32 MB at 1024 d × 32
partitions), never the vectors themselves. The driver assembles the
covariance and eigendecomposes (numpy, d×d — seconds at d=4096).
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
    doc), driver-side eigh of the d×d covariance. Null vectors are
    skipped (they stay null under :func:`pca_project`).
    """
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
            mat = np.array([list(v) for v in pdf["__v"]], dtype="float64")
            g += mat.T @ mat
            s += mat.sum(axis=0)
            n += len(mat)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = pruned.mapInPandas(partials, schema=_PARTIAL_SCHEMA).collect()
    if not rows:
        raise ValueError("fit_pca: no non-null vectors")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)

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
