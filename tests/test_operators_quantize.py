"""Scalar embedding quantization: roundtrip error bound, null/constant
handling, schema/size contract, and recall of asymmetric ANN over
dequantized vectors vs exact search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patito_spark.operators.quantize import (
    dequantize_embeddings,
    fit_scalar_quantizer,
    quantize_embeddings,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_fit_is_one_job_and_matches_numpy(spark, emb):
    params = fit_scalar_quantizer(emb)
    mat = np.array([r.embedding for r in emb.collect()], dtype="float64")
    assert params["dim"] == mat.shape[1]
    assert params["lo"] == pytest.approx(mat.min(axis=0).tolist())
    assert params["hi"] == pytest.approx(mat.max(axis=0).tolist())


def test_roundtrip_error_bounded_and_4x_smaller(spark, emb):
    params = fit_scalar_quantizer(emb)
    q = quantize_embeddings(emb, params, vec_col="embedding")
    assert "embedding" not in q.columns  # float column dropped
    assert dict(q.dtypes)["embedding_q"] == "array<tinyint>"
    back = dequantize_embeddings(q, params)
    joined = {
        r.vec_id: np.array(r.embedding)
        for r in back.select("vec_id", "embedding").collect()
    }
    orig = {
        r.vec_id: np.array(r.embedding)
        for r in emb.select("vec_id", "embedding").collect()
    }
    scale = (
        np.array(params["hi"]) - np.array(params["lo"])
    ) / 254.0
    bound = scale / 2 + 1e-12
    assert set(joined) == set(orig)
    for k in orig:
        assert (np.abs(joined[k] - orig[k]) <= bound).all()


def test_nulls_and_constant_dims(spark):
    rows = [
        (1, [1.0, 5.0, -2.0]),
        (2, [3.0, 5.0, 4.0]),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = fit_scalar_quantizer(df)
    assert params["lo"][1] == params["hi"][1] == 5.0  # constant dim
    q = quantize_embeddings(df, params)
    codes = {r.vec_id: r.embedding_q for r in q.collect()}
    assert codes[3] is None
    back = {
        r.vec_id: r.embedding
        for r in dequantize_embeddings(q, params).collect()
    }
    assert back[3] is None
    assert back[1][1] == 5.0 and back[2][1] == 5.0  # constant exact
    assert back[1][0] == pytest.approx(1.0, abs=(3.0 - 1.0) / 254 / 2)


def test_asymmetric_ann_recall_vs_exact(spark, emb):
    """cosine top-10 over dequantized corpus vectors recovers >= 95% of
    the exact neighbors for full-precision queries — the SQ8 promise."""
    from patito_spark.operators.similarity import cosine_topk

    params = fit_scalar_quantizer(emb)
    approx_corpus = dequantize_embeddings(
        quantize_embeddings(emb, params), params
    )
    queries = emb.orderBy("vec_id").limit(20)

    def topk(corpus):
        out = cosine_topk(corpus, queries, k=10)
        d: dict = {}
        for r in out.collect():
            d.setdefault(r.query_id, set()).add(r.neighbor_id)
        return d

    exact = topk(emb)
    approx = topk(approx_corpus)
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.95, f"recall {hits/total:.3f}"


def test_empty_frame_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        fit_scalar_quantizer(df)
