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


# ---------------------------------------------------------------------- #
# Product quantization                                                    #
# ---------------------------------------------------------------------- #


def test_fit_pq_shapes_and_determinism(spark, emb):
    from patito_spark.operators.quantize import fit_pq

    p1 = fit_pq(emb, m=8, nbits=6)
    p2 = fit_pq(emb, m=8, nbits=6)
    assert p1["m"] == 8 and p1["dsub"] == 8 and p1["dim"] == 64
    assert len(p1["codebooks"]) == 8
    assert all(len(b) <= 64 for b in p1["codebooks"])  # 2**6 entries max
    assert p1["codebooks"] == p2["codebooks"]  # seeded fit is stable

    with pytest.raises(ValueError, match="not divisible"):
        fit_pq(emb, m=7)


def test_pq_roundtrip_and_nulls(spark):
    from patito_spark.operators.quantize import fit_pq, pq_decode, pq_encode

    rng = np.random.RandomState(3)
    # 4 tight clusters in each 2-dim subspace -> PQ reconstructs well
    base = rng.normal(size=(4, 8))
    rows = [
        (i, (base[i % 4] + 0.01 * rng.normal(size=8)).tolist())
        for i in range(200)
    ] + [(999, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = fit_pq(df.filter("embedding is not null"), m=4, nbits=4)
    codes = pq_encode(df, params)
    assert dict(codes.dtypes)["pq_code"] == "array<smallint>"
    back = {r.vec_id: r.embedding for r in pq_decode(codes, params).collect()}
    assert back[999] is None
    orig = {i: np.array(r) for i, r in rows[:200]}
    errs = [np.abs(np.array(back[i]) - orig[i]).max() for i in orig]
    assert np.median(errs) < 0.05  # tight clusters reconstruct closely


def test_pq_adc_matches_decode_compose_and_recall(spark, emb):
    """ADC scoring (LUT sums, corpus never reconstructed) must rank like
    scoring the decoded corpus with the unit query; recall vs exact
    cosine is pinned at the level synthetic near-orthogonal embeddings
    support (PQ's worst case — real clustered embeddings do better)."""
    from patito_spark.operators.quantize import (
        fit_pq,
        pq_adc_topk,
        pq_decode,
        pq_encode,
    )
    from patito_spark.operators.similarity import cosine_topk

    params = fit_pq(emb, m=16, nbits=8)
    codes = pq_encode(emb, params)
    queries = emb.orderBy("vec_id").limit(10)

    adc = pq_adc_topk(codes, queries, params, k=10)
    got = {}
    for r in adc.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.score))

    # decode-compose oracle: unit query dot reconstructed corpus vector
    decoded = {r.vec_id: np.array(r.embedding)
               for r in pq_decode(codes, params).collect()}
    q_vecs = {r.vec_id: np.array(r.embedding) for r in queries.collect()}
    for qid, rows_ in got.items():
        qv = q_vecs[qid] / np.linalg.norm(q_vecs[qid])
        want = sorted(
            ((float(qv @ v), -nid) for nid, v in decoded.items()),
            reverse=True,
        )[:10]
        got_sorted = sorted(rows_)
        for (rank, nid, score), (w_score, w_negid) in zip(got_sorted, want):
            assert nid == -w_negid
            assert score == pytest.approx(w_score, rel=1e-9)

    # recall vs exact cosine: each query must at least find itself and
    # most true neighbors at m=16 on near-orthogonal synthetic vectors
    exact = {}
    for r in cosine_topk(emb, queries, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(exact[q] & {nid for _, nid, _ in got[q]}) for q in exact
    )
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"ADC recall {hits/total:.2f}"
    for q in exact:
        assert q in {nid for _, nid, _ in got[q]}  # self-hit survives PQ


# ---------------------------------------------------------------------- #
# IVFADC                                                                  #
# ---------------------------------------------------------------------- #


def test_ivfadc_matches_decode_compose_oracle(spark, emb):
    """With every cell probed, IVFADC scores must equal the unit query's
    inner product with (centroid + decoded residual) for every corpus
    row — the full-coverage oracle; ranking/determinism ride on it."""
    from patito_spark.operators.quantize import (
        ann_ivfadc_topk,
        build_ivfadc_index,
    )

    idx = build_ivfadc_index(emb, m=16, nbits=8, n_centroids=8)
    try:
        queries = emb.orderBy("vec_id").limit(6)
        out = ann_ivfadc_topk(idx, queries, k=10, n_probe=8)  # all cells
        got = {}
        for r in out.collect():
            got.setdefault(r.query_id, []).append(
                (r.rank, r.neighbor_id, r.score)
            )

        books = [np.asarray(b) for b in idx.pq["codebooks"]]
        m = idx.pq["m"]
        recon = {}
        for r in idx.codes.collect():
            res = np.concatenate([books[s][r.pq_code[s]] for s in range(m)])
            recon[r.neighbor_id] = idx.centroids[r.cell] + res
        q_vecs = {r.vec_id: np.array(r.embedding) for r in queries.collect()}
        for qid, rows_ in got.items():
            qv = q_vecs[qid] / np.linalg.norm(q_vecs[qid])
            want = sorted(
                ((float(qv @ v), -nid) for nid, v in recon.items()),
                reverse=True,
            )[:10]
            for (rank, nid, score), (w_score, w_negid) in zip(
                sorted(rows_), want
            ):
                assert nid == -w_negid
                assert score == pytest.approx(w_score, rel=1e-9)
    finally:
        idx.unpersist()


def test_ivfadc_probing_prunes_and_recalls(spark, emb):
    """n_probe < n_cells returns a subset of the full-probe candidates
    per query (cell pruning loses candidates, never invents them), the
    codes scan filters to probed cells, and each query still finds
    itself (the self-cell is always its top routed cell)."""
    from patito_spark.operators.quantize import (
        ann_ivfadc_topk,
        build_ivfadc_index,
    )
    from patito_spark.plans import executed_plan

    idx = build_ivfadc_index(emb, m=8, nbits=6, n_centroids=8)
    try:
        queries = emb.orderBy("vec_id").limit(6)
        full = ann_ivfadc_topk(idx, queries, k=5, n_probe=8)
        part = ann_ivfadc_topk(idx, queries, k=5, n_probe=2)
        f = {}
        for r in full.collect():
            f.setdefault(r.query_id, {})[r.neighbor_id] = r.score
        p = {}
        for r in part.collect():
            p.setdefault(r.query_id, {})[r.neighbor_id] = r.score
        for q, neigh in p.items():
            for nid, score in neigh.items():
                if nid in f[q]:
                    assert score == pytest.approx(f[q][nid], rel=1e-12)
            assert q in neigh  # self-hit survives routing
        plan = executed_plan(ann_ivfadc_topk(idx, queries, k=5, n_probe=2))
        assert "cell IN" in plan or "cell#" in plan  # pushed cell filter
    finally:
        idx.unpersist()


def test_ivfadc_storage_is_codes_only(spark, emb):
    from patito_spark.operators.quantize import build_ivfadc_index

    idx = build_ivfadc_index(emb, m=8, nbits=8, n_centroids=4)
    try:
        assert set(idx.codes.columns) == {"cell", "neighbor_id", "pq_code"}
        assert dict(idx.codes.dtypes)["pq_code"] == "array<smallint>"
    finally:
        idx.unpersist()


def test_ivfadc_write_read_roundtrip(spark, emb, tmp_path):
    from patito_spark.operators.quantize import (
        IvfAdcIndex,
        ann_ivfadc_topk,
        build_ivfadc_index,
    )

    idx = build_ivfadc_index(emb, m=8, nbits=6, n_centroids=4)
    queries = emb.orderBy("vec_id").limit(5)
    want = {(r.query_id, r.rank): (r.neighbor_id, r.score)
            for r in ann_ivfadc_topk(idx, queries, k=5, n_probe=4).collect()}
    idx.write(str(tmp_path / "ivfadc"))
    idx.unpersist()
    back = IvfAdcIndex.read(spark, str(tmp_path / "ivfadc"))
    try:
        got = {(r.query_id, r.rank): (r.neighbor_id, r.score)
               for r in ann_ivfadc_topk(back, queries, k=5, n_probe=4).collect()}
        assert set(got) == set(want)
        for key in want:
            assert got[key][0] == want[key][0]
            assert got[key][1] == pytest.approx(want[key][1], rel=1e-12)
    finally:
        back.unpersist()


def test_sq8_composes_with_embedding_dedup(spark, emb):
    """Dequantized vectors drop into the existing near-dup operator
    unchanged; at SQ8 error (scale/2 per dim) the pair set over this
    corpus is identical to full precision at a 0.35 threshold."""
    from patito_spark.operators.dedup import embedding_dedup_pairs
    from patito_spark.operators.quantize import (
        dequantize_embeddings,
        fit_scalar_quantizer,
        quantize_embeddings,
    )

    params = fit_scalar_quantizer(emb)
    deq = dequantize_embeddings(quantize_embeddings(emb, params), params)
    exact = {(r.id_a, r.id_b): r.cosine for r in
             embedding_dedup_pairs(emb, threshold=0.35).collect()}
    approx = {(r.id_a, r.id_b) for r in
              embedding_dedup_pairs(deq, threshold=0.35).collect()}
    assert len(exact) > 0
    # SQ8 noise only flips pairs whose exact cosine sits within the
    # reconstruction error of the threshold — every disagreement must
    # be a near-threshold pair, and the overwhelming majority agree.
    inter = approx & set(exact)
    union = approx | set(exact)
    assert len(inter) / len(union) >= 0.9
    for pair, cos in exact.items():
        if pair not in approx:
            assert abs(cos - 0.35) < 0.02, (pair, cos)


def test_sq8_encode_matches_duckdb_replay(spark, emb):
    """The SQ8 code formula is plain arithmetic, so DuckDB replays it
    value-for-value: floor((x - lo) * inv + 0.5) - 127 clipped — an
    independent-engine oracle for the encode kernel. The replay uses
    the IDENTICAL IEEE op sequence (subtract, multiply by the
    precomputed reciprocal, add, floor), so agreement is EXACT — the
    old rint-based encode needed a .5-boundary tolerance here."""
    import duckdb

    from patito_spark.operators.quantize import (
        fit_scalar_quantizer,
        quantize_embeddings,
    )

    params = fit_scalar_quantizer(emb)
    got = {
        r.vec_id: list(r.embedding_q)
        for r in quantize_embeddings(emb, params).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create view emb as select * from "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    lo_sql = "[" + ",".join(repr(v) for v in params["lo"]) + "]"
    hi_sql = "[" + ",".join(repr(v) for v in params["hi"]) + "]"
    con.execute(
        "create view params as select "
        "unnest(range(1, 65)) as dim_1based, "
        f"unnest({lo_sql}::DOUBLE[]) as lo, unnest({hi_sql}::DOUBLE[]) as hi"
    )
    want_rows = con.execute(
        """
        with elems as (
            select vec_id, u.x, u.i from emb,
                 lateral (select unnest(embedding) as x,
                          generate_subscripts(embedding, 1) as i) u
        ), coded as (
            select vec_id, i,
                   case when hi = lo then -127
                        else greatest(-127, least(127,
                             floor((x - lo) * (1.0 / ((hi - lo) / 254.0))
                                   + 0.5) - 127))
                   end as c
            from elems join params on i = dim_1based
        )
        select vec_id, list(c order by i) from coded group by vec_id
        """
    ).fetchall()
    want = {r[0]: [int(v) for v in r[1]] for r in want_rows}
    assert want == {k: [int(v) for v in vs] for k, vs in got.items()}


def test_fit_splits_wide_embeddings_across_jobs(spark, emb):
    """max_exprs_per_job below 2*dim forces multiple aggregate jobs; the
    fitted params must be identical to the single-job fit."""
    one = fit_scalar_quantizer(emb)
    split = fit_scalar_quantizer(emb, max_exprs_per_job=20)  # 10 dims/job
    assert split == one


def test_ivfadc_build_single_corpus_scan(spark, emb):
    """The round-11 finding: an unpersisted residual stream made the
    build re-run IVF assignment + residual compute ~3x (fit count, fit
    sample collect, encode). Count actual corpus-row reads with an
    accumulator on the inverted-file lineage: the whole ADC build must
    pass over the corpus exactly ONCE."""
    import pandas as pd
    from pyspark.sql import types as T

    from patito_spark.operators.quantize import build_ivfadc_index
    from patito_spark.operators.similarity import build_ivf_index

    acc = spark.sparkContext.accumulator(0)

    def counted(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    schema = T.StructType(
        [
            T.StructField("vec_id", emb.schema["vec_id"].dataType, True),
            T.StructField(
                "embedding", emb.schema["embedding"].dataType, True
            ),
        ]
    )
    src = emb.select("vec_id", "embedding")
    n = src.count()
    wrapped = src.mapInPandas(counted, schema=schema)
    # Prebuilt UNMATERIALIZED ivf index: its table lineage flows through
    # the counter, so every downstream pass over residuals bumps it.
    ivf = build_ivf_index(wrapped, n_centroids=4, materialize=False)
    base = acc.value  # the IVF build's own passes (count + kmeans fit)
    idx = build_ivfadc_index(src, ivf_index=ivf, m=8, nbits=6)
    assert idx.codes.count() == n
    # ivf.n_rows is None for a prebuilt index, so fit_pq pays ONE
    # count... unless the residual persist absorbs it: the fit's count
    # and sample-collect and the encode all read the one cached pass.
    assert acc.value - base == n
