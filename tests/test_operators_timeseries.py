"""cascade_rollup / fill_gaps / kmv_distinct vs hand-checked inputs."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.sketch import kmv_distinct
from patito_spark.operators.timeseries import cascade_rollup, fill_gaps, time_bucket


def test_time_bucket_negative_floor(spark):
    df = spark.createDataFrame([(-1,), (0,), (59,), (60,)], "t long")
    got = [r["b"] for r in df.select(time_bucket("t", 60).alias("b")).collect()]
    assert got == [-60, 0, 0, 60]


def test_cascade_rollup_matches_direct(spark):
    events = spark.range(1000).selectExpr(
        "id * 37 as ts", "cast(id % 7 as double) as v", "id % 3 as g"
    )
    rolled = cascade_rollup(
        events, "ts", widths=[60, 3600],
        aggs={"n": ("v", "count"), "total": ("v", "sum"), "mx": ("v", "max"),
              "a": ("v", "avg")},
        group_cols=["g"],
    )
    for width in (60, 3600):
        direct = (
            events.groupBy(
                time_bucket("ts", width).alias("bucket_start"), "g"
            ).agg(
                F.count("v").alias("n"), F.sum("v").alias("total"),
                F.max("v").alias("mx"), F.avg("v").alias("a"),
            )
        )
        got = sorted(
            tuple(r) for r in rolled.filter(F.col("resolution") == width)
            .select("bucket_start", "g", "n", "total", "mx", "a").collect()
        )
        want = sorted(tuple(r) for r in direct.collect())
        assert got == want, f"width {width}"


def test_cascade_rollup_rejects_non_multiple(spark):
    df = spark.createDataFrame([(1, 1.0)], "ts long, v double")
    with pytest.raises(ValueError, match="multiple"):
        cascade_rollup(df, "ts", [60, 90], {"n": ("v", "count")})


def test_cascade_rollup_rejects_non_decomposable(spark):
    df = spark.createDataFrame([(1, 1.0)], "ts long, v double")
    with pytest.raises(ValueError, match="decomposable"):
        cascade_rollup(df, "ts", [60], {"m": ("v", "median")})


def test_cascade_rollup_single_raw_scan(spark):
    df = spark.createDataFrame([(1, 1.0)], "ts long, v double")
    out = cascade_rollup(df, "ts", [60, 3600, 86400], {"n": ("v", "count")})
    # intermediate levels are cached, so union branches reuse them instead
    # of re-deriving from the raw scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    other = spark.createDataFrame([(2, 2.0)], "ts long, v double")
    uncached = cascade_rollup(
        other, "ts", [60, 3600], {"n": ("v", "count")}, materialize=False
    )
    p2 = uncached._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in p2


def test_fill_gaps(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 120, 2.0), ("b", 60, 3.0)],
        "g string, bucket long, v double",
    )
    out = fill_gaps(df, "bucket", step=60, group_cols=["g"])
    got = {(r["g"], r["bucket"]): r["v"] for r in out.collect()}
    assert got == {
        ("a", 0): 1.0, ("a", 60): None, ("a", 120): 2.0,
        ("b", 60): 3.0,
    }


def test_fill_gaps_fill_value(spark):
    df = spark.createDataFrame([("a", 0, 1.0), ("a", 120, 2.0)],
                               "g string, bucket long, v double")
    out = fill_gaps(df, "bucket", 60, group_cols=["g"], fill={"v": 0.0})
    got = {r["bucket"]: r["v"] for r in out.collect()}
    assert got[60] == 0.0


def test_kmv_exact_below_k(spark):
    df = spark.range(100).selectExpr("id % 10 as g", "id as v")
    out = kmv_distinct(df, "v", group_cols=["g"], k=64)
    for r in out.collect():
        assert r["distinct_est"] == 10.0  # 10 distinct values per group, < k


def test_kmv_estimate_accuracy(spark):
    df = spark.range(200_000).selectExpr("id % 100000 as v")  # 100k distinct
    row = kmv_distinct(df, "v", k=256).first()
    assert row["n_kept"] == 256
    assert abs(row["distinct_est"] - 100_000) / 100_000 < 0.2  # ~3 sigma


def test_kmv_partition_invariant(spark):
    a = spark.range(50_000).selectExpr("id as v")
    est1 = kmv_distinct(a, "v", k=128).first()["distinct_est"]
    est2 = kmv_distinct(a.repartition(17), "v", k=128).first()["distinct_est"]
    assert est1 == est2  # k smallest of a set don't depend on partitioning


def test_kmv_plan_prunes_map_side(spark):
    """The smallest-k window must compile to WindowGroupLimit so each
    partition ships at most k rows per group to the shuffle."""
    df = spark.range(10_000).selectExpr("id % 5 as g", "id as v")
    out = kmv_distinct(df, "v", group_cols=["g"], k=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_fill_gaps_multiple_groups_independent_ranges(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 180, 2.0), ("b", 300, 3.0), ("b", 360, 4.0)],
        "g string, bucket long, v double",
    )
    out = fill_gaps(df, "bucket", 60, group_cols=["g"])
    buckets = {}
    for r in out.collect():
        buckets.setdefault(r["g"], []).append(r["bucket"])
    # each group's axis spans ITS OWN min..max, not the global range
    assert sorted(buckets["a"]) == [0, 60, 120, 180]
    assert sorted(buckets["b"]) == [300, 360]
