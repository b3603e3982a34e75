"""Salting utilities must produce results identical to the direct plan."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture()
def skewed(spark):
    # key 0 is 90% of rows
    return spark.range(1000).selectExpr(
        "if(id < 900, 0, id) as k", "id as payload", "cast(id % 7 as double) as v"
    )


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_aggregate_matches_direct(skewed):
    direct = skewed.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.count("v").alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.avg("v").alias("a"),
    )
    salted = salted_aggregate(
        skewed,
        keys=["k"],
        aggs={
            "s": ("v", "sum"),
            "n": ("v", "count"),
            "mn": ("v", "min"),
            "mx": ("v", "max"),
            "a": ("v", "avg"),
        },
        salt_buckets=8,
    )
    assert canon(direct) == canon(salted)


def test_salted_aggregate_rejects_non_mergeable(skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"x": ("v", "median")})


def test_salted_join_matches_direct(spark, skewed):
    right = spark.range(20).selectExpr("id as k", "id * 10 as r_val")
    direct = skewed.join(right, on="k", how="inner")
    salted = salted_join(skewed, right, on=["k"], hot_keys=[0], salt_buckets=4)
    assert canon(direct.select("k", "payload", "r_val")) == canon(
        salted.select("k", "payload", "r_val")
    )


def test_salted_join_left(spark, skewed):
    right = spark.range(5).selectExpr("id as k", "id * 10 as r_val")
    direct = skewed.join(right, on="k", how="left")
    salted = salted_join(
        skewed, right, on=["k"], hot_keys=[0], salt_buckets=4, how="left"
    )
    assert canon(direct.select("k", "payload", "r_val")) == canon(
        salted.select("k", "payload", "r_val")
    )


def test_salted_join_auto_detects_hot_keys(spark, skewed):
    right = spark.range(20).selectExpr("id as k", "id * 10 as r_val")
    direct = skewed.join(right, on="k", how="inner")
    salted = salted_join(skewed, right, on=["k"], salt_buckets=4)
    assert canon(direct.select("k", "payload", "r_val")) == canon(
        salted.select("k", "payload", "r_val")
    )


def test_salted_join_no_hot_keys_falls_through(spark):
    left = spark.range(100).selectExpr("id as k", "id as payload")
    right = spark.range(100).selectExpr("id as k", "id * 2 as r_val")
    out = salted_join(left, right, on=["k"], hot_keys=[], salt_buckets=4)
    assert out.count() == 100
