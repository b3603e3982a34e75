"""Bucketed tables must join without a shuffle (co-located join)."""

import pytest

from patito_spark.plans import executed_plan
from patito_spark.sources import write_bucketed


@pytest.fixture()
def bucketed_tables(spark):
    # tables land in the default spark-warehouse dir (gitignored)
    left = spark.range(10_000).selectExpr("id as k", "id * 2 as lval")
    right = spark.range(10_000).selectExpr("id as k", "id * 3 as rval")
    write_bucketed(left, "pt_bkt_left", bucket_by=["k"], num_buckets=8,
                   sort_by=["k"])
    write_bucketed(right, "pt_bkt_right", bucket_by=["k"], num_buckets=8,
                   sort_by=["k"])
    yield "pt_bkt_left", "pt_bkt_right"
    spark.sql("DROP TABLE IF EXISTS pt_bkt_left")
    spark.sql("DROP TABLE IF EXISTS pt_bkt_right")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lname, rname = bucketed_tables
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = spark.table(lname).join(spark.table(rname), on="k")
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_unbucketed_join_would_shuffle(spark, tmp_path):
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        left = spark.range(10_000).selectExpr("id as k", "id * 2 as lval")
        right = spark.range(10_000).selectExpr("id as k", "id * 3 as rval")
        plan = executed_plan(left.join(right, on="k"))
        assert "Exchange" in plan  # the baseline the bucketed path removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


# ---------------------------------------------------------------------- #
# Range-clustered writes (file-skipping layout)                           #
# ---------------------------------------------------------------------- #


def test_write_clustered_files_have_disjoint_ranges(spark, tmp_path):
    import pyarrow.parquet as pq

    from patito_spark.sources import write_clustered

    df = spark.range(100_000).selectExpr(
        "cast(rand(7) * 1000000 as long) as k", "id as payload"
    )
    path = str(tmp_path / "clustered")
    write_clustered(df, path, cluster_by=["k"], num_files=8)

    import glob as globmod

    ranges = []
    for f in sorted(globmod.glob(f"{path}/part-*.parquet")):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # k is the first column
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    # files cover non-overlapping key ranges -> selective reads skip files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # round-trip intact
    back = spark.read.parquet(path)
    assert back.count() == 100_000
    assert back.agg({"payload": "sum"}).first()[0] == sum(range(100_000))
