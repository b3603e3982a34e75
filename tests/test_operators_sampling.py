"""Sampling determinism + statistical sanity."""

import pytest

from patito_spark.operators import sampling


@pytest.fixture(scope="module")
def data(spark):
    return spark.range(10_000).selectExpr(
        "id", "cast(id % 4 as string) as label"
    )


def test_deterministic_sample_reproducible(data):
    s1 = sampling.deterministic_sample(data, 0.2, key_col="id", seed=7)
    s2 = sampling.deterministic_sample(data, 0.2, key_col="id", seed=7)
    ids1 = {r.id for r in s1.collect()}
    ids2 = {r.id for r in s2.collect()}
    assert ids1 == ids2
    assert 0.15 < len(ids1) / 10_000 < 0.25
    # different seed -> different sample
    s3 = sampling.deterministic_sample(data, 0.2, key_col="id", seed=8)
    assert {r.id for r in s3.collect()} != ids1


def test_train_test_split_partitions(data):
    train, test = sampling.train_test_split(data, "id", test_fraction=0.25)
    train_ids = {r.id for r in train.collect()}
    test_ids = {r.id for r in test.collect()}
    assert train_ids.isdisjoint(test_ids)
    assert len(train_ids) + len(test_ids) == 10_000
    assert 0.2 < len(test_ids) / 10_000 < 0.3


def test_stratified_sample(data):
    out = sampling.stratified_sample(
        data, "label", {"0": 1.0, "1": 0.5, "2": 0.0}, key_col="id"
    )
    counts = {r.label: r["count"] for r in out.groupBy("label").count().collect()}
    assert counts.get("0") == 2500
    assert 1000 < counts.get("1", 0) < 1500
    assert "2" not in counts
    assert "3" not in counts  # unlisted strata excluded


def test_balance_classes(spark):
    df = spark.range(1100).selectExpr(
        "id", "if(id < 1000, 'big', 'small') as label"
    )
    out = sampling.balance_classes(df, "label", key_col="id")
    counts = {r.label: r["count"] for r in out.groupBy("label").count().collect()}
    assert counts["small"] == 100
    assert 60 < counts["big"] < 140  # ~100 expected


def test_shuffle_rows_is_permutation(data):
    out = sampling.shuffle_rows(data, "id", seed=3)
    rows = [r.id for r in out.toLocalIterator()]
    assert sorted(rows) == list(range(10_000))
    assert rows != list(range(10_000))  # order actually changed
    again = [r.id for r in sampling.shuffle_rows(data, "id", seed=3).toLocalIterator()]
    assert rows == again  # reproducible
