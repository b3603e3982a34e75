"""DSIR importance resampling: weight direction, temperature,
length-normalization, determinism, and the end-to-end sample."""

import pytest

from pyspark.sql import functions as F

from patito_spark.operators.selection import dsir_sample, dsir_weights


@pytest.fixture(scope="module")
def corpora(spark):
    # Target domain: "code-ish" vocabulary. Raw corpus: half code-ish,
    # half prose-ish, 200 docs each.
    target = spark.createDataFrame(
        [(i, "def func return class import lambda yield await")
         for i in range(20)],
        "doc_id long, text string",
    )
    raw = spark.range(400).selectExpr(
        "id as doc_id",
        "if(id % 2 = 0,"
        " concat('def func return class value ', id),"
        " concat('the weather was lovely yesterday evening ', id)) as text",
    )
    return raw, target


def test_weights_favor_target_like_docs(spark, corpora):
    raw, target = corpora
    w = dsir_weights(raw, target)
    rows = {r["doc_id"]: r for r in w.collect()}
    assert len(rows) == 400
    code = [rows[i]["log_ratio"] for i in range(0, 400, 2)]
    prose = [rows[i]["log_ratio"] for i in range(1, 400, 2)]
    assert min(code) > max(prose)
    # dsir_weight = exp(log_ratio): same ordering, positive.
    assert all(rows[i]["dsir_weight"] > 0 for i in rows)


def test_temperature_flattens(spark, corpora):
    raw, target = corpora
    w1 = {r["doc_id"]: r["dsir_weight"]
          for r in dsir_weights(raw, target, temperature=1.0).collect()}
    w4 = {r["doc_id"]: r["dsir_weight"]
          for r in dsir_weights(raw, target, temperature=4.0).collect()}
    ratio1 = w1[0] / w1[1]
    ratio4 = w4[0] / w4[1]
    assert ratio1 > ratio4 > 1  # hotter -> flatter, ordering preserved
    with pytest.raises(ValueError, match="temperature"):
        dsir_weights(raw, target, temperature=0)


def test_length_normalization(spark, corpora):
    raw, target = corpora
    norm = {r["doc_id"]: r["log_ratio"]
            for r in dsir_weights(raw, target).collect()}
    rawlr = {r["doc_id"]: r["log_ratio"]
             for r in dsir_weights(
                 raw, target, length_normalize=False).collect()}
    ntok = {r["doc_id"]: r["n_tokens"]
            for r in dsir_weights(raw, target).collect()}
    for i in (0, 1, 2):
        assert rawlr[i] == pytest.approx(norm[i] * ntok[i], rel=1e-9)


def test_sample_is_target_skewed_and_deterministic(spark, corpora):
    raw, target = corpora
    out = dsir_sample(raw, target, fraction=0.3, temperature=0.5)
    ids = sorted(r["doc_id"] for r in out.collect())
    n_code = sum(1 for i in ids if i % 2 == 0)
    n_prose = len(ids) - n_code
    assert n_code > 3 * n_prose  # strongly skewed toward the target
    assert 40 < len(ids) < 200  # in the neighborhood of 30% (truncation)
    again = sorted(r["doc_id"] for r in dsir_sample(
        raw, target, fraction=0.3, temperature=0.5).collect())
    assert again == ids  # hash-deterministic
    assert out.columns == raw.columns


def test_weights_match_closed_form(spark):
    """Pin the exact weight formula against a hand-computed reference.

    add-1 smoothed unigram LMs: p(t) = (count+1) / (total + V + 1);
    H = mean(-ln p); log_ratio = H_raw - H_target; w = exp(log_ratio/T).
    """
    import math

    target = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "a b c"), (2, "c c d")], "doc_id long, text string"
    )

    def p(tok, counts, total, v):
        return (counts.get(tok, 0) + 1.0) / (total + v + 1.0)

    t_counts, t_total, t_v = {"a": 2, "b": 1}, 3, 2
    r_counts, r_total, r_v = {"a": 1, "b": 1, "c": 3, "d": 1}, 6, 4
    expected = {}
    for doc_id, toks in ((1, ["a", "b", "c"]), (2, ["c", "c", "d"])):
        h_t = -sum(math.log(p(t, t_counts, t_total, t_v)) for t in toks) / 3
        h_r = -sum(math.log(p(t, r_counts, r_total, r_v)) for t in toks) / 3
        expected[doc_id] = h_r - h_t

    for temp in (1.0, 2.0):
        got = {r["doc_id"]: r for r in
               dsir_weights(raw, target, temperature=temp).collect()}
        for doc_id, lr in expected.items():
            assert got[doc_id]["log_ratio"] == pytest.approx(lr, rel=1e-12)
            assert got[doc_id]["dsir_weight"] == pytest.approx(
                math.exp(lr / temp), rel=1e-12)


def test_hashed_features_favor_target_like_docs(spark, corpora):
    raw, target = corpora
    w = dsir_weights(raw, target, features="hashed")
    rows = {r["doc_id"]: r for r in w.collect()}
    assert len(rows) == 400
    code = [rows[i]["log_ratio"] for i in range(0, 400, 2)]
    prose = [rows[i]["log_ratio"] for i in range(1, 400, 2)]
    assert min(code) > max(prose)
    # feature stream = unigrams + bigrams = 2*tokens - 1
    uni = dsir_weights(raw, target).collect()[0]
    assert rows[uni["doc_id"]]["n_tokens"] == 2 * uni["n_tokens"] - 1
    with pytest.raises(ValueError, match="features"):
        dsir_weights(raw, target, features="trigram")


def test_hashed_portable_matches_python_replay(spark):
    """Full independent replay of the hashed-bigram DSIR pipeline in
    pure Python (md5 buckets, add-1 LMs, closed-form weights)."""
    import hashlib
    import math
    from collections import Counter

    n_buckets = 64
    t_rows = [(0, "a b a c"), (1, "b c")]
    r_rows = [(10, "a b c d"), (11, "d d e"), (12, "x")]
    target = spark.createDataFrame(t_rows, "doc_id long, text string")
    raw = spark.createDataFrame(r_rows, "doc_id long, text string")

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n_buckets

    def feats(text):
        toks = text.split(" ")
        grams = toks + [a + "\x1f" + b for a, b in zip(toks, toks[1:])]
        return [bucket(g) for g in grams]

    def lm(rows):
        c = Counter()
        for _, text in rows:
            c.update(feats(text))
        return c, sum(c.values()), len(c)

    t_c, t_tot, t_v = lm(t_rows)
    r_c, r_tot, r_v = lm(r_rows)

    def h(fs, c, tot, v):
        return -sum(
            math.log((c.get(f, 0) + 1.0) / (tot + v + 1.0)) for f in fs
        ) / len(fs)

    got = {r["doc_id"]: r for r in dsir_weights(
        raw, target, features="hashed", ngram_buckets=n_buckets,
        hash_mode="portable").collect()}
    assert set(got) == {10, 11, 12}
    for doc_id, text in r_rows:
        fs = feats(text)
        lr = h(fs, r_c, r_tot, r_v) - h(fs, t_c, t_tot, t_v)
        assert got[doc_id]["n_tokens"] == len(fs)
        assert got[doc_id]["log_ratio"] == pytest.approx(lr, rel=1e-12)
        assert got[doc_id]["dsir_weight"] == pytest.approx(
            math.exp(lr), rel=1e-12)


def test_keep_weight_col_and_precomputed_lms(spark, corpora):
    from patito_spark.operators.text import build_vocab

    raw, target = corpora
    t_lm = build_vocab(target)
    r_lm = build_vocab(raw)
    out = dsir_sample(
        raw, target, fraction=0.5, keep_weight_col="dsir_w",
        raw_lm=r_lm, target_lm=t_lm,
    )
    assert "dsir_w" in out.columns
    assert out.filter(F.col("dsir_w") <= 0).count() == 0


def test_dsir_lm_precompute_matches_inline(spark, corpora):
    from patito_spark.operators.selection import dsir_lm

    raw, target = corpora
    inline = {r["doc_id"]: r["dsir_weight"] for r in dsir_weights(
        raw, target, features="hashed", ngram_buckets=512).collect()}
    pre = {r["doc_id"]: r["dsir_weight"] for r in dsir_weights(
        raw, target, features="hashed", ngram_buckets=512,
        raw_lm=dsir_lm(raw, features="hashed", ngram_buckets=512),
        target_lm=dsir_lm(target, features="hashed", ngram_buckets=512),
    ).collect()}
    assert pre == pytest.approx(inline)
    with pytest.raises(ValueError, match="features"):
        dsir_lm(raw, features="char")


def test_raw_weight_mode_never_overflows_to_inf(spark):
    """length_normalize=False sums per-token log ratios; long
    target-like docs would push exp() past DBL_MAX without the clamp,
    poisoning weighted_sample's mean-weight rescale (inf mean -> all
    finite docs dropped, overflowed docs kept via NaN->1)."""
    import math

    body = "def func return class import lambda yield await " * 120
    target = spark.createDataFrame([(0, body)], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, body), (2, "the weather was lovely yesterday " * 120)],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r for r in dsir_weights(
        raw, target, length_normalize=False).collect()}
    assert abs(w[1]["log_ratio"]) > 700 or abs(w[2]["log_ratio"]) > 700
    for r in w.values():
        assert math.isfinite(r["dsir_weight"])
    out = dsir_sample(raw, target, fraction=0.5, length_normalize=False)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids  # the target-like doc survives, no NaN poisoning
