"""HLL sketch tables + count-min frequency estimation."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.sketch import (
    cms_frequencies,
    hll_distinct_rollup,
    hll_merge,
    hll_sketch,
)


@pytest.fixture(scope="module")
def visits(spark):
    """Synthetic visit log: 40 hourly buckets over 2 days, per-hour user
    sets overlap heavily across hours (the case where summing per-hour
    distincts overcounts badly)."""
    return spark.range(40_000).selectExpr(
        "id",
        "cast(id % 40 as long) * 3600 as ts",           # 40 distinct hours
        "concat('u', cast(id % 700 as string)) as user",  # 700 users total
        "cast(id % 3 as string) as site",
    )


def test_hll_sketch_merge_matches_direct_and_truth(visits):
    """Union of hourly sketches answers the day within the sketch error
    bound, agreeing with both the direct day sketch and the exact
    count — the property the sketch-table pattern depends on. (Union
    may change internal representation, so estimates need not be
    bit-identical to the direct sketch's.)"""
    with_day = visits.withColumn("day", (F.col("ts") / 86400).cast("long"))
    hourly = hll_sketch(with_day, "user", ["day", "ts"])
    via_merge = {
        r.day: r.distinct_est
        for r in hll_merge(hourly, ["day"]).collect()
    }
    direct = {
        r.day: r.distinct_est
        for r in hll_merge(hll_sketch(with_day, "user", ["day"]), ["day"]).collect()
    }
    exact = {
        r.day: r.n
        for r in with_day.groupBy("day")
        .agg(F.count_distinct("user").alias("n"))
        .collect()
    }
    assert set(via_merge) == set(exact) and len(exact) == 2
    for day, n in exact.items():
        assert via_merge[day] == pytest.approx(n, rel=0.05)
        assert via_merge[day] == pytest.approx(direct[day], rel=0.02)


def test_hll_estimates_near_exact(visits):
    est = {
        r.site: r.distinct_est
        for r in hll_merge(hll_sketch(visits, "user", ["site"]), ["site"]).collect()
    }
    exact = {
        r.site: r.n
        for r in visits.groupBy("site")
        .agg(F.count_distinct("user").alias("n"))
        .collect()
    }
    for site, n in exact.items():
        assert est[site] == pytest.approx(n, rel=0.05)


def test_hll_rollup_one_scan_cascade(visits):
    out = hll_distinct_rollup(
        visits, "ts", "user", widths=[3600, 86400], group_cols=["site"]
    )
    rows = out.collect()
    fine = [r for r in rows if r.resolution == 3600]
    coarse = [r for r in rows if r.resolution == 86400]
    assert len(fine) == 40 * 3 and len(coarse) == 2 * 3
    exact_day = {
        (r.bucket_start, r.site): r.n
        for r in visits.withColumn(
            "bucket_start", (F.floor(F.col("ts") / 86400) * 86400).cast("long")
        )
        .groupBy("bucket_start", "site")
        .agg(F.count_distinct("user").alias("n"))
        .collect()
    }
    for r in coarse:
        assert r.distinct_est == pytest.approx(
            exact_day[(r.bucket_start, r.site)], rel=0.05
        )


def test_hll_rollup_width_validation(visits):
    with pytest.raises(ValueError, match="not a multiple"):
        hll_distinct_rollup(visits, "ts", "user", widths=[3600, 5000])


def test_cms_bounds(spark):
    """est >= true always; est <= true + eps*N at the configured
    confidence (asserted with the full eps*N slack, no luck needed)."""
    n = 50_000
    df = spark.range(n).selectExpr(
        # zipf-ish: value v appears ~n/2^(v+1) times
        "cast(floor(log2(id + 2)) as string) as v"
    )
    exact = {r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    items = list(exact) + ["absent_a", "absent_b"]
    est = {
        r.item: r.estimate
        for r in cms_frequencies(df, "v", items, eps=1e-3, confidence=0.99).collect()
    }
    for it in items:
        true = exact.get(it, 0)
        assert est[it] >= true
        assert est[it] <= true + 1e-3 * n
    # the heavy item is estimated tightly
    heavy = max(exact, key=exact.get)
    assert est[heavy] == pytest.approx(exact[heavy], rel=0.01)
