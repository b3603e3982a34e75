"""PCA / random projection: numpy-exact fits, invariances, composition."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patito_spark.operators.projection import (
    fit_pca,
    pca_project,
    random_projection,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _np_pca(mat, k, center=True):
    mean = mat.mean(axis=0) if center else np.zeros(mat.shape[1])
    cov = (mat.T @ mat) / len(mat) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    comps = evecs[:, :k].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return mean, comps, evals[:k]


def test_fit_matches_numpy_exactly(spark, emb):
    mat = np.array([r.embedding for r in emb.collect()], dtype="float64")
    params = fit_pca(emb, k=4)
    mean, comps, evals = _np_pca(mat, 4)
    assert params["dim"] == mat.shape[1] and params["k"] == 4
    assert np.allclose(params["mean"], mean, atol=1e-12)
    assert np.allclose(params["explained_variance"], evals, atol=1e-10)
    assert np.allclose(params["components"], comps, atol=1e-10)


def test_fit_deterministic_across_partitionings(spark, emb):
    p1 = fit_pca(emb.repartition(1), k=3)
    p32 = fit_pca(emb.repartition(32), k=3)
    assert np.allclose(p1["components"], p32["components"], atol=1e-10)
    assert np.allclose(p1["mean"], p32["mean"], atol=1e-12)


def test_project_roundtrip_full_rank(spark, emb):
    """k = dim is a rotation: reconstruction through Wᵀ is exact."""
    params = fit_pca(emb)
    proj = pca_project(emb, params)
    comps = np.array(params["components"])
    mean = np.array(params["mean"])
    orig = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    for r in proj.select("vec_id", "embedding_pca").collect():
        back = np.array(r.embedding_pca) @ comps + mean
        assert np.allclose(back, orig[r.vec_id], atol=1e-9)


def test_variance_ordering_and_truncation_error(spark, emb):
    """Eigenvalues descend, and the mean squared reconstruction error
    of a k-truncation equals exactly the dropped eigenvalue mass — the
    Eckart-Young identity, a strong end-to-end check of fit+project."""
    params = fit_pca(emb)
    ev = params["explained_variance"]
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))
    k = 3
    pk = fit_pca(emb, k=k)
    proj = pca_project(emb, pk)
    comps = np.array(pk["components"])
    mean = np.array(pk["mean"])
    orig = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    errs = []
    for r in proj.select("vec_id", "embedding_pca").collect():
        back = np.array(r.embedding_pca) @ comps + mean
        errs.append(((back - orig[r.vec_id]) ** 2).sum())
    dropped = sum(ev[k:])
    assert np.mean(errs) == pytest.approx(dropped, rel=1e-6)


def test_nulls_and_keep_vec(spark):
    rows = [(1, [1.0, 2.0, 3.0]), (2, [4.0, 0.0, -1.0]), (3, None),
            (4, [0.5, 0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = fit_pca(df, k=2)
    out = pca_project(df, params, keep_vec=True)
    got = {r.vec_id: r for r in out.collect()}
    assert got[3].embedding_pca is None and got[3].embedding is None
    assert len(got[1].embedding_pca) == 2
    assert "embedding" in out.columns


def test_center_false(spark, emb):
    params = fit_pca(emb, k=2, center=False)
    assert params["mean"] == [0.0] * params["dim"]


def test_random_projection_deterministic_and_jl(spark, emb):
    a = {
        r.vec_id: np.array(r.embedding_rp)
        for r in random_projection(emb, out_dim=6, seed=7).collect()
    }
    b = {
        r.vec_id: np.array(r.embedding_rp)
        for r in random_projection(
            emb.repartition(16), out_dim=6, seed=7
        ).collect()
    }
    # same seed, any partitioning -> identical space
    for k in a:
        assert np.allclose(a[k], b[k], atol=1e-12)
    c = random_projection(emb, out_dim=6, seed=8).first().embedding_rp
    assert not np.allclose(c, a[emb.first().vec_id])
    # squared-norm preservation in expectation: mean ratio near 1
    orig = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    ratios = [
        (a[k] ** 2).sum() / (orig[k] ** 2).sum()
        for k in a
        if (orig[k] ** 2).sum() > 0
    ]
    assert 0.7 < float(np.mean(ratios)) < 1.3


def test_pca_composes_with_quantize_and_ann(spark, emb):
    """The footprint chain: PCA(k) -> SQ8 -> decode -> cosine_topk
    returns sane neighbors in the reduced space."""
    from patito_spark.operators.quantize import (
        dequantize_embeddings,
        fit_scalar_quantizer,
        quantize_embeddings,
    )
    from patito_spark.operators.similarity import cosine_topk

    params = fit_pca(emb, k=4)
    reduced = pca_project(emb, params, out_col="embedding")
    sq = fit_scalar_quantizer(reduced)
    codes = quantize_embeddings(reduced, sq)
    back = dequantize_embeddings(codes, sq)
    queries = back.filter(F.col("vec_id") < 3)
    out = cosine_topk(back, queries, k=3, id_col="vec_id")
    got = {(r.query_id, r.rank): r.neighbor_id for r in out.collect()}
    # self is always the top hit in the reduced space too
    for q in {k[0] for k in got}:
        assert got[(q, 1)] == q


def test_k_for_variance_and_truncation(spark, emb):
    from patito_spark.operators.projection import (
        pca_k_for_variance,
        truncate_pca,
    )

    full = fit_pca(emb)
    k95 = pca_k_for_variance(full, 0.95)
    ev = full["explained_variance"]
    assert sum(ev[:k95]) / sum(ev) >= 0.95
    assert k95 == 1 or sum(ev[: k95 - 1]) / sum(ev) < 0.95
    # truncation == re-fit
    direct = fit_pca(emb, k=k95)
    trunc = truncate_pca(full, k95)
    assert np.allclose(trunc["components"], direct["components"], atol=1e-10)
    assert pca_k_for_variance(full, 1.0) == full["k"]
    with pytest.raises(ValueError):
        pca_k_for_variance(full, 0.0)
    with pytest.raises(ValueError):
        truncate_pca(full, 0)


def test_fit_reduction_is_distributed_o1_to_driver(spark, emb):
    """fit_pca must not collect per-partition partials: the driver
    receives ONE tree-reduced triple. DataFrame.collect is the
    per-partition-collect code path — patch it to explode; the
    treeReduce path never touches it (dim passed explicitly so the
    probe .first() is skipped too)."""
    from unittest import mock

    from pyspark.sql import DataFrame

    d = len(emb.first().embedding)
    with mock.patch.object(
        DataFrame,
        "collect",
        side_effect=AssertionError("fit_pca collected a DataFrame"),
    ):
        params = fit_pca(emb.repartition(16), k=3, dim=d)
    assert params["k"] == 3 and params["dim"] == d


def test_fit_ragged_vectors_clear_error(spark):
    rows = [(1, [1.0, 2.0, 3.0]), (2, [4.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="ragged vector"):
        fit_pca(df, dim=3)


def test_fit_all_null_clear_error(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no non-null vectors"):
        fit_pca(df, dim=3)


def test_project_out_col_collision_errors(spark, emb):
    params = fit_pca(emb, k=2)
    with pytest.raises(ValueError, match="collides"):
        pca_project(emb, params, out_col="embedding", keep_vec=True)
    with pytest.raises(ValueError, match="collides"):
        pca_project(emb, params, out_col="vec_id")
    with pytest.raises(ValueError, match="collides"):
        random_projection(emb, out_dim=4, out_col="embedding", keep_vec=True)
    # dropping the input frees its name (the rename-in-place idiom)
    out = pca_project(emb, params, out_col="embedding", keep_vec=False)
    assert out.columns.count("embedding") == 1


class TestOpqAllocation:
    def test_balances_log_products(self):
        from patito_spark.operators.projection import opq_eigen_allocation

        ev = [2.0 ** -i for i in range(16)]
        perm = opq_eigen_allocation(ev, 4)
        assert sorted(perm) == list(range(16))
        per = 4
        logs = [
            sum(np.log(ev[i]) for i in perm[g * per:(g + 1) * per])
            for g in range(4)
        ]
        naive = [
            sum(np.log(e) for e in ev[g * per:(g + 1) * per])
            for g in range(4)
        ]
        assert max(logs) - min(logs) < (max(naive) - min(naive)) / 4

    def test_errors_on_indivisible(self):
        from patito_spark.operators.projection import opq_eigen_allocation

        with pytest.raises(ValueError, match="divide"):
            opq_eigen_allocation([1.0] * 10, 4)

    def test_reorder_composes_and_improves_pq(self, spark):
        """PCA -> eigenvalue-allocated reorder -> PQ beats the naive
        contiguous split on anisotropic data (Ge et al. 2013's point):
        same fit, same PQ budget, lower reconstruction MSE."""
        from patito_spark.operators.projection import opq_reorder
        from patito_spark.operators.quantize import (
            fit_pq,
            pq_decode,
            pq_encode,
        )

        rng = np.random.default_rng(11)
        d, n, m = 16, 600, 4
        scales = np.array([2.0 ** -(i / 2) for i in range(d)])
        mat = rng.standard_normal((n, d)) * scales
        df = spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(mat)],
            "vec_id long, embedding array<double>",
        )
        params = fit_pca(df)
        alloc = opq_reorder(params, m)
        assert sorted(map(tuple, alloc["components"])) == sorted(
            map(tuple, params["components"])
        )

        def mse(fit):
            proj = pca_project(df, fit, out_col="embedding")
            pq = fit_pq(proj, m=m, nbits=4, seed=3)
            back = pq_decode(pq_encode(proj, pq), pq)
            err = 0.0
            orig = {
                r.vec_id: np.array(r.embedding)
                for r in proj.collect()
            }
            for r in back.collect():
                err += float(
                    np.sum(
                        (np.array(r.embedding) - orig[r.vec_id]) ** 2
                    )
                )
            return err / len(orig)

        assert mse(alloc) < mse(params) * 0.95
