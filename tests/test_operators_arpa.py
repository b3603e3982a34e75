"""Pretrained .arpa LM scoring: parse, backoff chain, artifacts.

The hand-written model below exercises every branch of the Katz chain:
full trigram hits, single and double backoff (with and without stored
backoff weights), <s> conditioning, OOV -> <unk>, and the order cap.
arpa_logloss is pinned bit-exact (1e-12) against score_arpa_py, the
readable reference implementation of the SRILM/KenLM convention.
"""

from __future__ import annotations

import pytest

from patito_spark.operators.arpa import (
    ArpaLm,
    UNK,
    arpa_logloss,
    kenlm_logloss,
    load_arpa,
    score_arpa_py,
)

ARPA_TEXT = """\\data\\
ngram 1=7
ngram 2=5
ngram 3=3

\\1-grams:
-1.0\t<unk>
-0.5\t<s>\t-0.30103
-0.7\tthe\t-0.2
-0.9\tcat\t-0.1
-0.8\tsat\t-0.15
-1.1\tmat
-1.2\ton\t-0.05

\\2-grams:
-0.3\t<s> the\t-0.05
-0.4\tthe cat\t-0.1
-0.5\tcat sat\t-0.08
-0.6\tsat on
-0.7\tthe mat

\\3-grams:
-0.2\t<s> the cat
-0.25\tthe cat sat
-0.35\tcat sat on

\\end\\
"""

NGRAMS = {
    (UNK,): (-1.0, None),
    ("<s>",): (-0.5, -0.30103),
    ("the",): (-0.7, -0.2),
    ("cat",): (-0.9, -0.1),
    ("sat",): (-0.8, -0.15),
    ("mat",): (-1.1, None),
    ("on",): (-1.2, -0.05),
    ("<s>", "the"): (-0.3, -0.05),
    ("the", "cat"): (-0.4, -0.1),
    ("cat", "sat"): (-0.5, -0.08),
    ("sat", "on"): (-0.6, None),
    ("the", "mat"): (-0.7, None),
    ("<s>", "the", "cat"): (-0.2, None),
    ("the", "cat", "sat"): (-0.25, None),
    ("cat", "sat", "on"): (-0.35, None),
}

DOCS = [
    (1, "the cat sat on the mat"),   # trigram hits + backoffs
    (2, "the dog sat on a mat"),     # OOV words -> <unk> + bo chains
    (3, "cat"),                      # single token, <s> context miss
    (4, "mat mat mat"),              # bigram misses, unigram fallthrough
]


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("arpa") / "tiny.arpa"
    p.write_text(ARPA_TEXT)
    return str(p)


@pytest.fixture(scope="module")
def lm(spark, arpa_path):
    return load_arpa(spark, arpa_path)


def test_parse_counts_and_unk(lm):
    assert lm.order == 3
    assert lm.counts == {1: 7, 2: 5, 3: 3}
    assert lm.unk_log10 == -1.0
    rows = {r["gram"]: (r["logp"], r["bo"]) for r in lm.tables[2].collect()}
    assert rows["<s> the"] == (-0.3, -0.05)
    assert rows["sat on"] == (-0.6, None)


@pytest.mark.parametrize("bos", [True, False])
def test_matches_python_reference(spark, lm, bos):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["arpa_ce"], r["arpa_ppl"])
        for r in arpa_logloss(df, lm, bos=bos).collect()
    }
    want = score_arpa_py(
        {d: t.split(" ") for d, t in DOCS}, NGRAMS, order=3, bos=bos
    )
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12)
        assert got[d][2] == pytest.approx(want[d][2], rel=1e-12)


def test_order_cap_scores_as_bigram(spark, lm):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["arpa_ce"]
        for r in arpa_logloss(df, lm, order=2).collect()
    }
    want = score_arpa_py(
        {d: t.split(" ") for d, t in DOCS}, NGRAMS, order=2
    )
    for d in want:
        assert got[d] == pytest.approx(want[d][1], rel=1e-12)
    # the cap changes the numbers (trigram hits no longer apply)
    full = {
        r["doc_id"]: r["arpa_ce"]
        for r in arpa_logloss(df, lm).collect()
    }
    assert any(abs(full[d] - got[d]) > 1e-9 for d in got)


def test_artifact_round_trip(spark, lm, tmp_path):
    path = str(tmp_path / "lm_parquet")
    lm.write(path)
    lm2 = ArpaLm.read(spark, path)
    assert lm2.order == lm.order and lm2.counts == lm.counts
    assert lm2.unk_log10 == lm.unk_log10
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {r["doc_id"]: r["arpa_ce"] for r in arpa_logloss(df, lm).collect()}
    b = {r["doc_id"]: r["arpa_ce"] for r in arpa_logloss(df, lm2).collect()}
    for d in a:
        assert a[d] == pytest.approx(b[d], rel=1e-12)
    lm2.unpersist()


def test_no_unk_model_uses_floor(spark, tmp_path):
    text = (
        "\\data\\\nngram 1=2\n\n\\1-grams:\n-0.4\ta\n-0.6\tb\n\n\\end\\\n"
    )
    p = tmp_path / "nounk.arpa"
    p.write_text(text)
    lm = load_arpa(spark, str(p))
    assert lm.unk_log10 is None
    df = spark.createDataFrame([(1, "a z")], "doc_id long, text string")
    got = arpa_logloss(df, lm, bos=False, oov_log10=-9.0).first()
    want = score_arpa_py(
        {1: ["a", "z"]},
        {("a",): (-0.4, None), ("b",): (-0.6, None)},
        order=1,
        bos=False,
        oov_log10=-9.0,
    )
    assert got["arpa_ce"] == pytest.approx(want[1][1], rel=1e-12)


def test_kenlm_import_gate(spark):
    pytest.importorskip_absent = None
    try:
        import kenlm  # noqa: F401

        pytest.skip("kenlm installed - gate not exercised")
    except ImportError:
        pass
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ImportError, match="kenlm"):
        kenlm_logloss(df, "/nonexistent.bin")


def test_null_and_empty_text(spark, lm):
    df = spark.createDataFrame(
        [(1, None), (2, "the cat")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in arpa_logloss(df, lm).collect()}
    assert 1 not in rows  # null text carries no positions
    assert rows[2]["n_tokens"] == 2


def test_plan_broadcast_lookups_no_cartesian(spark, lm):
    """Broadcast-able model -> the DIRECT path: every lookup is a
    map-side BroadcastHashJoin on the positioned stream and the ONLY
    exchange in the whole plan is the per-doc aggregate's (round 13:
    the tuple collapse is reserved for corpus-scale models - a filter
    artifact must score shuffle-free)."""
    from patito_spark.plans import executed_plan

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = executed_plan(arpa_logloss(df, lm))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_tuple_fallback_matches_direct(spark, lm):
    """Forcing the tuple path (gate between the largest table and the
    model total) reproduces the direct path's scores - same NLL
    expression, different join topology."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    direct = {
        r["doc_id"]: r["arpa_ce"]
        for r in arpa_logloss(df, lm).collect()
    }
    # counts are {1:7, 2:5, 3:3}: 10 < 15 total forces the tuple shape
    # while every per-order side still broadcasts
    tup = {
        r["doc_id"]: r["arpa_ce"]
        for r in arpa_logloss(
            df, lm, max_broadcast_ngrams=10
        ).collect()
    }
    assert set(direct) == set(tup)
    for d in direct:
        assert tup[d] == pytest.approx(direct[d], rel=1e-12)


def test_admission_matches_join_form_and_streams(spark, lm, tmp_path):
    """arpa_admission (broadcast-dict map) reproduces arpa_logloss's
    perplexities (same reference scorer, 1e-9) and composes with
    readStream as a stateless map - the winnow_admission contract."""
    from patito_spark.operators.arpa import arpa_admission, arpa_logloss

    df = spark.createDataFrame(
        DOCS + [(9, None)], "doc_id long, text string"
    )
    gated = {r.doc_id: r for r in arpa_admission(df, lm, max_ppl=12.0).collect()}
    joined = {r.doc_id: r for r in arpa_logloss(df, lm).collect()}
    for d, row in joined.items():
        assert gated[d].arpa_ppl == pytest.approx(
            row.arpa_ppl, rel=1e-9
        ), d
        assert gated[d].admitted == (row.arpa_ppl <= 12.0)
    assert gated[9].arpa_ppl is None and gated[9].admitted
    assert set(gated) == set(joined) | {9}

    # streaming composition: same gate over a file stream
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        arpa_admission(stream, lm, max_ppl=12.0)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    assert set(got) == set(gated)
    for d in joined:
        assert got[d].admitted == gated[d].admitted

    with pytest.raises(ValueError, match="join form"):
        arpa_admission(df, lm, max_ppl=1.0, max_broadcast_ngrams=3)
