"""Arrow-batched numpy vector scoring for embedding hot paths.

Why this exists: Spark evaluates higher-order functions (``zip_with`` /
``aggregate`` lambdas) in interpreted mode — measured ~100-1000× slower than
codegen per operation. A 64-dim dot product per scored pair through that
path dominated every ANN/near-dup benchmark. These helpers move scoring
into ``mapInPandas`` (Arrow batch transfer, numpy inner loop), which is the
fast Python path Spark offers when built-in codegen expressions can't
express the computation.

Bit-exactness contract: the correctness oracles (DuckDB
``list_dot_product``) and the previous expression implementation both
accumulate products *sequentially* in double precision. numpy's own
``np.dot``/``@`` use blocked/pairwise summation, which differs in the last
ulp — enough to flip a hash-match. So every scorer here vectorizes across
ROWS but loops sequentially over DIMENSIONS::

    acc = 0; for d in dims: acc += a[:, d] * b[:, d]

which performs, per row, the exact IEEE-754 operation sequence of the
sequential fold (float32 inputs are widened to float64 first — exact).
Cost is ``dim`` fused numpy ops per batch — still vectorized across the
batch, and 2-3 orders of magnitude faster than per-row interpreted lambdas.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _as_matrix(series) -> "np.ndarray":  # noqa: F821 (lazy numpy import)
    """(n, dim) float64 matrix from a pandas Series of array values.

    float32 storage is widened element-wise to float64 — exact, matching
    ``CAST(x AS DOUBLE)`` on both Spark and DuckDB sides.
    """
    import numpy as np

    return np.stack(series.to_numpy()).astype(np.float64, copy=False)


def seq_dot(a, b):
    """Row-wise dot of two (n, dim) matrices, sequential over dims."""
    import numpy as np

    acc = np.zeros(a.shape[0], dtype=np.float64)
    for d in range(a.shape[1]):
        acc += a[:, d] * b[:, d]
    return acc


def seq_norm(a):
    """Row-wise L2 norm of an (n, dim) matrix, sequential over dims."""
    import numpy as np

    acc = np.zeros(a.shape[0], dtype=np.float64)
    for d in range(a.shape[1]):
        acc += a[:, d] * a[:, d]
    return np.sqrt(acc)


def seq_dot_matrix(c, q):
    """(nc, nq) dot-product matrix, sequential over dims.

    ``out[i, j] == seq_dot(c[i], q[j])`` bit-exactly: each dimension adds
    its outer-product slab, so per (i, j) the accumulation order is the
    sequential fold.
    """
    import numpy as np

    acc = np.zeros((c.shape[0], q.shape[0]), dtype=np.float64)
    for d in range(c.shape[1]):
        acc += c[:, d : d + 1] * q[None, :, d]
    return acc


def cosine_score_pairs(
    pairs: DataFrame,
    vec_a: str,
    vec_b: str,
    out_col: str = "cosine",
    threshold: Optional[float] = None,
    keep_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Score candidate pairs carrying two vector columns; drop the vectors.

    One ``mapInPandas`` pass: per Arrow batch, cosine(vec_a, vec_b) with
    sequential-fold semantics (see module docstring). ``threshold`` filters
    inside the batch, so below-threshold pairs never re-enter the JVM.

    Returns ``keep_cols`` (default: all non-vector columns) + ``out_col``.
    """
    import pandas as pd

    keep = (
        list(keep_cols)
        if keep_cols is not None
        else [c for c in pairs.columns if c not in (vec_a, vec_b)]
    )
    out_schema = T.StructType(
        [pairs.schema[c] for c in keep]
        + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = _as_matrix(pdf[vec_a])
            b = _as_matrix(pdf[vec_b])
            cos = seq_dot(a, b) / (seq_norm(a) * seq_norm(b))
            out = pdf[keep].copy()
            out[out_col] = cos
            if threshold is not None:
                out = out[out[out_col] >= threshold]
            yield out

    return pairs.mapInPandas(score, schema=out_schema)


def sign_projection_buckets(
    df: DataFrame,
    planes,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Append a sign-random-projection bucket id (one numpy pass per batch).

    ``planes`` is an (n_planes, dim) array-like; bucket bit ``i`` is set
    when ``dot(vec, planes[i]) > 0``. Dots use sequential-fold accumulation
    (:func:`seq_dot_matrix`), so bucket assignment is bit-reproducible by
    any engine evaluating the same sequential dot — the correctness oracles
    re-derive buckets in SQL from the same plane constants.
    """
    import numpy as np
    import pandas as pd

    plane_mat = np.asarray(planes, dtype=np.float64)
    n_planes = plane_mat.shape[0]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(bucket_col, T.LongType(), False)]
    )

    def assign(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _as_matrix(pdf[vec_col])
            signs = seq_dot_matrix(mat, plane_mat) > 0
            out = pdf.copy()
            out[bucket_col] = signs @ weights
            yield out

    return df.mapInPandas(assign, schema=out_schema)
