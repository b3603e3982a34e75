"""URL canonicalization / dedup against hand-checked expectations."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.urls import canonicalize_url, dedup_urls
from patito_spark.plans.explain import executed_plan


def canon(spark, url, **kw):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url("url", **kw).alias("c")).collect()[0]["c"]


@pytest.mark.parametrize(
    "raw,expect",
    [
        ("HTTP://WWW.Example.COM/Path/", "http://example.com/Path"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("https://example.com/a#section-2", "https://example.com/a"),
        (
            "https://example.com/a?utm_source=x&utm_medium=y&id=7",
            "https://example.com/a?id=7",
        ),
        (
            "https://example.com/a?fbclid=abc123",
            "https://example.com/a",
        ),
        (
            "https://example.com/a?id=7&gclid=z&page=2",
            "https://example.com/a?id=7&page=2",
        ),
        ("https://example.com", "https://example.com/"),
        ("https://example.com///", "https://example.com/"),
        # Case preserved where it matters: path and query values.
        ("https://example.com/CaseSensitive?Q=Val", "https://example.com/CaseSensitive?Q=Val"),
    ],
)
def test_canonical_forms(spark, raw, expect):
    assert canon(spark, raw) == expect


def test_malformed_urls_get_stable_keys(spark):
    assert canon(spark, "  Not A URL  ") == "not a url"
    assert canon(spark, "example.com/path") == "example.com/path"


def test_sort_query_opt_in(spark):
    raw = "https://example.com/a?b=2&a=1"
    assert canon(spark, raw) == "https://example.com/a?b=2&a=1"
    assert canon(spark, raw, sort_query=True) == "https://example.com/a?a=1&b=2"
    # Sorted variants collapse to one key.
    assert canon(
        spark, "https://example.com/a?a=1&b=2", sort_query=True
    ) == canon(spark, raw, sort_query=True)


def test_keep_www_opt_out(spark):
    assert (
        canon(spark, "https://www.example.com/", strip_www=False)
        == "https://www.example.com/"
    )


def test_canonicalize_is_shuffle_free(spark):
    df = spark.range(10).select(
        F.concat(F.lit("https://example.com/p?utm_source=x&id="), "id").alias(
            "url"
        )
    )
    plan = executed_plan(df.select(canonicalize_url("url")))
    assert "Exchange" not in plan


def test_dedup_urls_min_id(spark):
    df = spark.createDataFrame(
        [
            (3, "https://example.com/a?utm_source=feed"),
            (1, "HTTP://WWW.EXAMPLE.COM/b"),
            (2, "https://example.com/a"),
            (4, "https://example.com/b"),  # differs from 1: scheme
            (5, "https://other.org/x"),
        ],
        "doc_id long, url string",
    )
    out = dedup_urls(df, keep="min_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    # 2 beats 3 (same canonical URL); 1 vs 4 differ by scheme, both stay.
    assert ids == [1, 2, 4, 5]
    assert out.columns == ["doc_id", "url"]


def test_dedup_urls_exposes_canonical_column(spark):
    df = spark.createDataFrame(
        [(1, "https://www.example.com/a/")], "doc_id long, url string"
    )
    out = dedup_urls(df, canonical_col="canon")
    row = out.collect()[0]
    assert row["canon"] == "https://example.com/a"


def test_dedup_urls_any_keeps_one_per_key(spark):
    df = spark.createDataFrame(
        [(i, f"https://example.com/p?utm_source=s{i}") for i in range(10)],
        "doc_id long, url string",
    )
    assert dedup_urls(df, keep="any").count() == 1
    with pytest.raises(ValueError, match="keep"):
        dedup_urls(df, keep="last")


class TestFilterUrls:
    def test_gates(self, spark):
        from patito_spark.operators.urls import filter_urls

        rows = [
            (1, "https://good.example/article/one"),
            (2, "http://good.example/page?q=x"),
            (3, "ftp://files.example/data"),              # scheme
            (4, "https://cdn.example/logo.PNG"),           # extension
            (5, "https://docs.example/paper.pdf"),         # extension
            (6, "https://bad.example/story"),              # blocked host
            (7, "https://sub.bad.example/story"),          # subdomain
            (8, "https://ok.example/tag/archive/2020"),    # pattern trap
            (9, "https://trap.example/" + "a" * 3000),     # overlong
            (10, None),                                    # null
            (11, "https://good.example/release-1.2.3"),    # dot != ext
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = filter_urls(
            df,
            blocked_hosts=["bad.example"],
            blocked_patterns=[r"/tag/"],
        )
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 11]

    def test_host_table_anti_join_and_plan(self, spark):
        from patito_spark.operators.urls import filter_urls
        from patito_spark.plans import executed_plan

        df = spark.range(100).selectExpr(
            "id as doc_id",
            "concat('https://host', id % 10, '.example/p', id) as url",
        )
        block = spark.createDataFrame(
            [("HOST3.example",), ("host7.example",)], "host string"
        )
        out = filter_urls(df, blocked_host_table=block)
        assert out.count() == 80
        assert out.filter("url like '%host3%'").count() == 0
        plan = executed_plan(out)
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        # schema untouched
        assert out.columns == ["doc_id", "url"]

    def test_map_only_without_table(self, spark):
        from patito_spark.operators.urls import filter_urls
        from patito_spark.plans import executed_plan

        df = spark.range(10).selectExpr(
            "concat('https://h', id, '.example/x') as url")
        plan = executed_plan(filter_urls(df, blocked_hosts=["h1.example"]))
        assert "Exchange" not in plan and "Python" not in plan

    def test_drop_extensions_case_insensitive(self, spark):
        from patito_spark.operators.urls import filter_urls

        df = spark.createDataFrame(
            [(1, "https://a.example/file.PDF"),
             (2, "https://a.example/page")],
            "doc_id long, url string",
        )
        out = filter_urls(df, drop_extensions=("PDF",))
        assert [r["doc_id"] for r in out.collect()] == [2]


def test_dedup_urls_with_unorderable_metadata_column(spark):
    """keep='min_id' compares only the id (min_by), so rows may carry
    unorderable columns — MapType fetch metadata is a common crawl-row
    shape that a min(struct(*row)) aggregate rejects at analysis."""
    df = spark.createDataFrame(
        [
            (2, "https://example.com/a?utm_source=x", {"ip": "1.2.3.4"}),
            (1, "https://www.example.com/a", {"ip": "5.6.7.8"}),
            (3, "https://other.com/b", {"ip": "9.9.9.9"}),
        ],
        schema="doc_id long, url string, fetch_meta map<string,string>",
    )
    out = sorted(dedup_urls(df, keep="min_id").collect(), key=lambda r: r.doc_id)
    assert [r.doc_id for r in out] == [1, 3]
    assert out[0].fetch_meta == {"ip": "5.6.7.8"}
    assert out[0].url == "https://www.example.com/a"


def test_dedup_urls_reuses_precomputed_canonical_column(spark):
    df = spark.createDataFrame(
        [(2, "https://example.com/a?utm_source=x"),
         (1, "https://www.example.com/a"),
         (3, "https://other.com/b")],
        "doc_id long, url string",
    )
    pre = df.withColumn("canon", canonicalize_url(F.col("url")))
    out = sorted(
        dedup_urls(pre, keep="min_id", canonical_col="canon").collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.doc_id for r in out] == [1, 3]
    # the plan canonicalizes once: no second regexp chain above the agg
    plan = executed_plan(dedup_urls(pre, keep="min_id", canonical_col="canon"))
    assert plan.count("try_parse_url") <= 8  # one projection's worth


def test_empty_tracking_params_disables_stripping(spark):
    """tracking_params=() must be a no-op for param removal: the fused
    alternation would otherwise degenerate to (^|&)(?:)=[^&]* and strip
    empty-NAMED query params ('?=x')."""
    raw = "https://example.com/a?=x&a=1&utm_source=t"
    assert canon(spark, raw, tracking_params=()) == (
        "https://example.com/a?=x&a=1&utm_source=t"
    )
    # default list still strips utm_source but keeps the odd '=x' param
    assert canon(spark, raw) == "https://example.com/a?=x&a=1"
