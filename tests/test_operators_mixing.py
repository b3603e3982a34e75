"""mix_corpora: plan math, determinism, epoch fan-out, DuckDB replay."""

import duckdb
import pytest
from pyspark.sql import functions as F

from patito_spark.operators.mixing import mix_corpora
from patito_spark.operators.text import token_count


def make_corpus(spark, name, n_docs, words_per_doc):
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.concat(F.lit(name), F.lit("tok")),
                                words_per_doc)
        ).alias("text"),
    )


@pytest.fixture(scope="module")
def corpora(spark):
    return {
        "web": make_corpus(spark, "web", 400, 10),    # 4000 tokens
        "books": make_corpus(spark, "books", 50, 40),  # 2000 tokens
        "code": make_corpus(spark, "code", 20, 10),    # 200 tokens
    }


def tokens_by_source(mixed):
    rows = (
        mixed.groupBy("mix_source")
        .agg(F.sum(token_count("text")).alias("t"))
        .collect()
    )
    return {r["mix_source"]: r["t"] for r in rows}


def test_plan_math_and_proportions(corpora):
    out = mix_corpora(
        corpora,
        weights={"web": 6, "books": 3, "code": 1},
        token_budget=2000,
    )
    plan = {p["source"]: p for p in out["plan"]}
    # web: target 1200 of 4000 -> fraction 0.3, zero full epochs
    assert plan["web"]["epochs"] == 0
    assert plan["web"]["remainder_fraction"] == pytest.approx(0.3)
    # books: target 600 of 2000 -> 0.3
    assert plan["books"]["total_tokens"] == 2000
    # code: target 200 of 200 -> exactly one full epoch
    assert plan["code"]["epochs"] == 1
    assert plan["code"]["remainder_fraction"] == pytest.approx(0.0)

    got = tokens_by_source(out["mixed"])
    # hash sampling is exact-in-expectation; docs are uniform so the
    # realized counts sit near target (binomial, n=400 -> sd ~3%).
    assert got["code"] == 200
    assert got["web"] == pytest.approx(1200, rel=0.2)
    assert got["books"] == pytest.approx(600, rel=0.3)


def test_repeat_epochs_when_undersized(corpora):
    out = mix_corpora(
        {"code": corpora["code"]},
        weights={"code": 1},
        token_budget=500,  # 2.5 epochs of the 200-token corpus
    )
    plan = out["plan"][0]
    assert plan["epochs"] == 2
    assert plan["remainder_fraction"] == pytest.approx(0.5)
    mixed = out["mixed"]
    per_epoch = {
        r["epoch"]: r["n"]
        for r in mixed.groupBy("epoch").agg(F.count("*").alias("n")).collect()
    }
    # Two full copies of all 20 docs plus a ~half partial copy.
    assert per_epoch[0] == 20 and per_epoch[1] == 20
    assert 2 in per_epoch and 0 < per_epoch[2] < 20
    # Within an epoch no doc repeats.
    assert (
        mixed.groupBy("doc_id", "epoch").count().filter("count > 1").count()
        == 0
    )


def test_no_repeat_caps_at_one_epoch(corpora):
    out = mix_corpora(
        {"code": corpora["code"]},
        weights={"code": 1},
        token_budget=500,
        allow_repeat=False,
    )
    assert out["plan"][0]["epochs"] == 1
    assert out["plan"][0]["remainder_fraction"] == pytest.approx(0.0)
    assert out["mixed"].count() == 20


def test_deterministic_across_calls(corpora):
    a = mix_corpora(corpora, {"web": 1, "books": 1, "code": 1}, 900)
    b = mix_corpora(corpora, {"web": 1, "books": 1, "code": 1}, 900)
    ka = sorted(
        (r["mix_source"], r["doc_id"], r["epoch"])
        for r in a["mixed"].select("mix_source", "doc_id", "epoch").collect()
    )
    kb = sorted(
        (r["mix_source"], r["doc_id"], r["epoch"])
        for r in b["mixed"].select("mix_source", "doc_id", "epoch").collect()
    )
    assert ka == kb and len(ka) > 0


def test_validation_errors(spark, corpora):
    with pytest.raises(ValueError, match="weight keys"):
        mix_corpora(corpora, {"web": 1}, 100)
    with pytest.raises(ValueError, match="token_budget"):
        mix_corpora(corpora, {k: 1 for k in corpora}, 0)
    with pytest.raises(ValueError, match="sum > 0"):
        mix_corpora(corpora, {k: 0 for k in corpora}, 100)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty mixture"):
        mix_corpora({"e": empty}, {"e": 1}, 100)


def test_portable_mode_matches_duckdb(spark, corpora):
    """The partial-epoch membership is replayable in SQL: DuckDB picks
    the same web docs from the same md5-derived fraction."""
    from patito_spark.operators.sampling import sample_fraction_sql

    out = mix_corpora(
        {"web": corpora["web"]},
        {"web": 1},
        token_budget=1200,
        hash_mode="portable",
        seed=7,
    )
    frac = out["plan"][0]["remainder_fraction"]
    got = sorted(
        r["doc_id"] for r in out["mixed"].select("doc_id").collect()
    )

    rows = [(r["doc_id"],) for r in corpora["web"].select("doc_id").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE web(doc_id BIGINT)")
    con.executemany("INSERT INTO web VALUES (?)", rows)
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM web "
            f"WHERE {sample_fraction_sql('doc_id', 7)} < {frac!r}"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_weighted_partial_epoch(spark):
    from patito_spark.operators.text import token_count

    # 4000 docs x 5 tokens = 20k tokens; target 10k -> remainder 0.5.
    # Weights 3:1 -> high-weight docs selected ~3x as often, and the
    # realized token share still tracks the 0.5 target.
    docs = spark.range(4000).selectExpr(
        "id as doc_id",
        "'five little tokens per doc' as text",
        "if(id % 2 = 0, 3.0d, 1.0d) as quality",
    )
    out = mix_corpora(
        {"web": docs},
        weights={"web": 1},
        token_budget=10_000,
        doc_weight_col="quality",
    )
    mixed = out["mixed"]
    toks = mixed.agg(F.sum(token_count("text"))).first()[0]
    assert abs(toks / 10_000 - 1.0) < 0.08
    kept = {
        r["quality"]: r["n"]
        for r in mixed.groupBy("quality").agg(F.count("*").alias("n")).collect()
    }
    assert 2.0 < kept[3.0] / kept[1.0] < 4.0
    # Unweighted call unchanged: uniform membership.
    uni = mix_corpora({"web": docs}, {"web": 1}, 10_000)["mixed"]
    kept_u = {
        r["quality"]: r["n"]
        for r in uni.groupBy("quality").agg(F.count("*").alias("n")).collect()
    }
    assert abs(kept_u[3.0] / kept_u[1.0] - 1.0) < 0.2


class TestTemperatureWeights:
    def test_alpha_one_is_proportional(self):
        from patito_spark.operators.mixing import temperature_weights

        w = temperature_weights({"web": 900, "books": 100}, alpha=1.0)
        assert abs(w["web"] - 0.9) < 1e-12 and abs(w["books"] - 0.1) < 1e-12

    def test_alpha_zero_is_uniform(self):
        from patito_spark.operators.mixing import temperature_weights

        w = temperature_weights({"a": 1e12, "b": 3}, alpha=0.0)
        assert w == {"a": 0.5, "b": 0.5}

    def test_alpha_half_upweights_small_domains(self):
        from patito_spark.operators.mixing import temperature_weights

        w = temperature_weights({"big": 10000, "small": 100}, alpha=0.5)
        # proportional share would be ~0.0099; sqrt gives 100/1100 ~ 0.0909
        assert 0.09 < w["small"] < 0.1
        assert abs(sum(w.values()) - 1.0) < 1e-12

    def test_zero_size_domain_gets_zero_weight(self):
        from patito_spark.operators.mixing import temperature_weights

        w = temperature_weights({"a": 0, "b": 100}, alpha=0.5)
        assert w["a"] == 0.0 and w["b"] == 1.0

    def test_validation(self):
        import pytest

        from patito_spark.operators.mixing import temperature_weights

        with pytest.raises(ValueError, match="alpha"):
            temperature_weights({"a": 1}, alpha=1.5)
        with pytest.raises(ValueError, match="empty"):
            temperature_weights({})
        with pytest.raises(ValueError, match=">= 0"):
            temperature_weights({"a": -1})
        with pytest.raises(ValueError, match="zero"):
            temperature_weights({"a": 0, "b": 0})

    def test_feeds_mix_corpora(self, spark):
        from patito_spark.operators.mixing import (
            mix_corpora,
            temperature_weights,
        )

        big = spark.range(900).selectExpr(
            "id as doc_id", "'w1 w2 w3 w4' as text")
        small = spark.range(100).selectExpr(
            "id as doc_id", "'b1 b2' as text")
        sizes = {"web": 3600, "books": 200}
        weights = temperature_weights(sizes, alpha=0.5)
        out = mix_corpora(
            {"web": big, "books": small}, weights, token_budget=1000
        )
        plan = {p["source"]: p for p in out["plan"]}
        # sqrt weighting: books gets ~19% of the budget despite ~5% of
        # the tokens -> its 200-token corpus must repeat (epochs).
        assert plan["books"]["target_tokens"] > 150
        assert out["mixed"].count() > 0


def test_mixture_stats_matches_plan(spark):
    from patito_spark.operators.mixing import mix_corpora, mixture_stats

    web = spark.range(400).selectExpr(
        "id as doc_id", "concat('web doc ', id, ' word word word') as text"
    )
    code = spark.range(100).selectExpr(
        "id + 1000 as doc_id", "concat('code doc ', id, ' word word word') as text"
    )
    out = mix_corpora(
        {"web": web, "code": code}, {"web": 3, "code": 1},
        token_budget=1500,
    )
    stats = {r["mix_source"]: r for r in
             mixture_stats(out["mixed"]).collect()}
    assert set(stats) == {"web", "code"}
    # realized token share within sampling noise of the 75/25 plan
    assert stats["web"]["token_share"] == pytest.approx(0.75, abs=0.08)
    assert stats["code"]["token_share"] == pytest.approx(0.25, abs=0.08)
    assert stats["web"]["n_epochs"] >= 1
    # shares sum to 1 exactly
    assert sum(s["token_share"] for s in stats.values()) == pytest.approx(1.0)
    assert sum(s["row_share"] for s in stats.values()) == pytest.approx(1.0)


def test_mixture_stats_without_epoch_column(spark):
    from pyspark.sql import functions as F
    from patito_spark.operators.mixing import mixture_stats

    df = spark.range(10).selectExpr(
        "if(id < 7, 'a', 'b') as mix_source",
        "'w x y' as text",
    )
    stats = mixture_stats(df)
    assert "n_epochs" not in stats.columns
    by = {r["mix_source"]: r for r in stats.collect()}
    assert by["a"]["n_rows"] == 7 and by["b"]["n_rows"] == 3
    assert by["a"]["n_tokens"] == 21
    assert by["a"]["row_share"] == pytest.approx(0.7)
