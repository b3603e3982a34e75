"""Regression tests pinning previously-reported bugs to their exact inputs.

Each test reproduces the input from a judge/advisor bug report; the fix
landed without a test, so these guard against silent re-regression.
"""

import warnings

import duckdb
import pytest
from pyspark.sql import functions as F

import patito_spark as pt
from patito_spark.exceptions import DataFrameValidationError


# --- except_ must be EXCEPT DISTINCT (bag-subtract dropped row 1 twice) -- #


def test_except_with_duplicate_left_rows(spark):
    """left=[1,1,2] ∖ [1] must be [2] — set semantics, not bag subtract."""
    db = pt.Database(spark)
    left = db.to_relation(spark.createDataFrame([(1,), (1,), (2,)], "a long"))
    right = db.to_relation(spark.createDataFrame([(1,)], "a long"))
    assert sorted(left.except_(right).to_pandas()["a"]) == [2]


def test_except_dedups_surviving_rows(spark):
    """EXCEPT DISTINCT also dedups rows that survive: [2,2] ∖ [1] = [2]."""
    db = pt.Database(spark)
    left = db.to_relation(spark.createDataFrame([(2,), (2,)], "a long"))
    right = db.to_relation(spark.createDataFrame([(1,)], "a long"))
    assert sorted(left.except_(right).to_pandas()["a"]) == [2]


# --- duplicated NULLs in a nullable unique column must fail validation -- #


class _UniqueTag(pt.Model):
    id: int
    tag: str | None = pt.Field(unique=True)


@pytest.mark.parametrize("approximate", [False, True])
def test_duplicated_nulls_violate_uniqueness(spark, approximate):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id long, tag string"
    )
    with pytest.raises(DataFrameValidationError) as err:
        _UniqueTag.validate_df(df, approximate_unique=approximate)
    assert "duplicated" in str(err.value)
    assert "tag" in str(err.value)


@pytest.mark.parametrize("approximate", [False, True])
def test_single_null_is_unique(spark, approximate):
    df = spark.createDataFrame([(1, None), (2, "x")], "id long, tag string")
    _UniqueTag.validate_df(df, approximate_unique=approximate)  # no raise


# --- examples(): generators consumed once; length mismatch raises ------- #


class _Example(pt.Model):
    a: int
    b: str


def test_examples_accepts_generator(spark):
    df = _Example.examples({"a": (i for i in range(3))}, spark=spark)
    assert sorted(r["a"] for r in df.inner.collect()) == [0, 1, 2]


def test_examples_raises_on_mismatched_iterable_lengths(spark):
    with pytest.raises(ValueError, match="differing"):
        _Example.examples({"a": [1, 2, 3], "b": ["x", "y"]}, spark=spark)


def test_examples_scalar_broadcasts(spark):
    df = _Example.examples({"a": [1, 2, 3], "b": "fixed"}, spark=spark)
    assert [r["b"] for r in df.inner.collect()] == ["fixed"] * 3


# --- Relation(str): SQL-keyword-prefixed TABLE NAMES are tables --------- #


@pytest.mark.parametrize(
    "name", ["from_api_events", "values_daily", "withdrawals", "selections"]
)
def test_relation_dispatches_keyword_prefixed_table_names(spark, name):
    spark.createDataFrame([(1,)], "x long").createOrReplaceTempView(name)
    try:
        rel = pt.Database(spark).to_relation(name)
        assert rel.count() == 1
    finally:
        spark.catalog.dropTempView(name)


def test_relation_still_dispatches_real_sql(spark):
    rel = pt.Database(spark).to_relation("select 41 + 1 as answer")
    assert rel.to_pandas()["answer"][0] == 42


# --- connected_components: convergence warning, incl. max_iterations=0 -- #


def _chain(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )


def test_connected_components_warns_when_iterations_exhausted(spark):
    from patito_spark.operators.graph import connected_components

    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = connected_components(
            _chain(spark, 40), max_iterations=1, driver_threshold=0
        )
    assert out.count() == 41  # still returns a (possibly split) labeling


def test_connected_components_zero_iterations_warns_not_raises(spark):
    from patito_spark.operators.graph import connected_components

    with pytest.warns(RuntimeWarning, match="loop never ran"):
        out = connected_components(
            _chain(spark, 3), max_iterations=0, driver_threshold=0
        )
    assert out.count() == 4


def test_connected_components_long_chain_converges(spark):
    from patito_spark.operators.graph import connected_components

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no convergence warning allowed
        out = connected_components(
            _chain(spark, 64), max_iterations=10, driver_threshold=0
        )
    rows = out.collect()
    assert all(r["component"] == 0 for r in rows)  # O(log n) via jumping


# --- portable hash: Spark and DuckDB must agree bit-for-bit ------------- #


def test_portable_hash_matches_duckdb(spark):
    from patito_spark.functions.hashing import hash64, portable_hash64_sql

    samples = ["", "a", "hello world", "Ünïcodé ✓", "123:42", "x" * 500]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    spark_hashes = {
        r["s"]: r["h"]
        for r in sdf.select("s", hash64("s", mode="portable").alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        duck_h = con.execute(
            f"SELECT {portable_hash64_sql('?')}", [s]
        ).fetchone()[0]
        assert spark_hashes[s] == duck_h, f"hash mismatch for {s!r}"
    con.close()


def test_portable_hash_nonnegative_60bit(spark):
    from patito_spark.functions.hashing import hash64

    sdf = spark.range(200).select(
        hash64(F.col("id").cast("string"), mode="portable").alias("h")
    )
    rows = [r["h"] for r in sdf.collect()]
    assert all(0 <= h < (1 << 60) for h in rows)


# --- hot-key detection: sampled, capped, never an unbounded collect ----- #


def test_detect_hot_keys_samples_not_full_scans(spark):
    from patito_spark.operators.skew import _key_counts, detect_hot_keys

    skewed = spark.range(4000).selectExpr("if(id < 2000, 0, id) as k")
    # The detection plan reads a Sample of the input, not the full table.
    plan = _key_counts(skewed, "k", fraction=0.5, seed=42)._jdf.queryExecution().toString()
    assert "Sample" in plan
    hot = detect_hot_keys(
        skewed,
        "k",
        sample_fraction=0.5,
        min_sample_rows=100,
        min_count=10,
    )
    assert hot == [0]


def test_detect_hot_keys_caps_driver_transfer(spark):
    from patito_spark.operators.skew import detect_hot_keys

    # 20 keys × 50 rows each: every key clears a 1% threshold.
    uniform_heavy = spark.range(1000).selectExpr("id % 20 as k")
    with pytest.warns(RuntimeWarning, match="heaviest"):
        hot = detect_hot_keys(
            uniform_heavy,
            "k",
            threshold_fraction=0.01,
            min_count=1,
            sample_fraction=1.0,
            max_hot_keys=5,
        )
    assert len(hot) == 5


def test_detect_hot_keys_small_data_falls_back_exact(spark):
    from patito_spark.operators.skew import detect_hot_keys

    skewed = spark.range(1000).selectExpr("if(id < 900, 7, id) as k")
    # Default 1% sample of 1000 rows is far below min_sample_rows — the
    # fallback exact pass must still find the hot key.
    hot = detect_hot_keys(skewed, "k", min_count=100)
    assert hot == [7]


# --------------------------------------------------------------------- #
# Round 4: advisor-reported bug fixes                                   #
# --------------------------------------------------------------------- #


def test_embedding_dedup_diagonal_pairs_are_id_ordered(spark):
    # Same-block (diagonal) pairs used to come out in pandas *row* order,
    # so descending-id input produced (id_a > id_b) rows.
    from patito_spark.operators.dedup import embedding_dedup_pairs

    vec = [1.0, 0.5, 0.25, 0.125]
    df = spark.createDataFrame(
        [(i, vec) for i in (9, 7, 3, 1)], "vec_id long, embedding array<double>"
    )
    rows = embedding_dedup_pairs(
        df, threshold=0.9, n_blocks=1
    ).collect()
    assert len(rows) == 6  # all 4-choose-2 pairs of identical vectors
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_range_join_left_null_point_column(spark):
    # A matched point with a NULL payload column must not ALSO reappear as
    # an unmatched row (the old anti-join compared point columns with `=`,
    # and NULL never equals NULL).
    from patito_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(5, None), (50, "x")], "t long, tag string"
    )
    intervals = spark.createDataFrame(
        [(0, 10, "iv1")], "s long, e long, name string"
    )
    out = range_join(points, intervals, "t", "s", "e", how="left").collect()
    assert len(out) == 2
    by_t = {r["t"]: r for r in out}
    assert by_t[5]["name"] == "iv1"
    assert by_t[50]["name"] is None


def test_range_join_left_shared_column_names(spark):
    # Point/interval sides sharing a non-`by` column name used to make the
    # unmatched-recovery select ambiguous.
    from patito_spark.operators.temporal import range_join

    points = spark.createDataFrame([(5,), (50,)], "t long")
    intervals = spark.createDataFrame([(0, 10)], "s long, e long")
    out = range_join(points, intervals, "t", "s", "e", how="left").collect()
    assert len(out) == 2


def test_asof_tolerance_with_timestamp_on(spark):
    # timestamp - timestamp is a DayTimeInterval; tolerance (seconds) used
    # to raise AnalysisException comparing it to an int literal.
    from patito_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("2024-01-01 10:00:30",), ("2024-01-01 10:05:00",)], "ts string"
    ).selectExpr("cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1.0)], "ts string, v double"
    ).selectExpr("cast(ts as timestamp) as ts", "v")
    out = asof_join(left, right, on="ts", tolerance=60)
    rows = {str(r["ts"]): r["right_v"] for r in out.collect()}
    assert rows["2024-01-01 10:00:30"] == 1.0
    assert rows["2024-01-01 10:05:00"] is None  # 300 s > 60 s tolerance


def test_fill_gaps_keeps_off_grid_rows(spark):
    # Buckets {0, 5, 7} with step 5: 7 is off the min-anchored grid and
    # used to be silently dropped by the left join onto the dense axis.
    from patito_spark.operators.timeseries import fill_gaps

    df = spark.createDataFrame(
        [(0, 1.0), (5, 2.0), (7, 3.0)], "bucket long, v double"
    )
    out = fill_gaps(df, "bucket", step=5)
    got = {r["bucket"]: r["v"] for r in out.collect()}
    assert got == {0: 1.0, 5: 2.0, 7: 3.0}


def test_range_join_default_width_deterministic(spark):
    from patito_spark.operators.temporal import _estimate_bucket_width

    intervals = spark.createDataFrame(
        [(0, 3), (10, 25), (100, 104)], "s long, e long"
    ).repartition(7)
    w1 = _estimate_bucket_width(intervals, "s", "e")
    w2 = _estimate_bucket_width(intervals, "s", "e")
    assert w1 == w2 == 15  # max interval length, a pure function of the data


def _cache_manager_empty(spark):
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_minhash_caches_released_on_request(spark):
    from patito_spark.operators.dedup import minhash_dedup_pairs
    import patito_spark as pt

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    minhash_dedup_pairs(df, num_hashes=16, bands=4).count()
    assert not _cache_manager_empty(spark)  # intermediates are cached...
    assert pt.release_caches() >= 1  # ...until the caller releases them
    assert _cache_manager_empty(spark)


def test_cache_scope_does_not_evict_sibling_caches(spark):
    """Spark's cache manager is keyed by plan structure, so a structurally
    identical pipeline in two operator calls shares ONE cache entry.
    dedup_corpus's internal cache_scope must therefore skip releasing
    plans that were already cached when it ran — otherwise it would evict
    a sibling minhash_dedup_pairs call's still-live intermediates (the
    round-5 bench-floor regression)."""
    import patito_spark as pt
    from patito_spark.operators.dedup import dedup_corpus, minhash_dedup_pairs

    spark.catalog.clearCache()
    pt.release_caches()
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    minhash_dedup_pairs(df, num_hashes=16, bands=4).count()
    assert not _cache_manager_empty(spark)  # sibling's shingle cache live
    # same shingle plan inside — its cache_scope must leave it alone
    dedup_corpus(df, num_hashes=16, bands=4).count()
    assert not _cache_manager_empty(spark)
    assert pt.release_caches() >= 1
    assert _cache_manager_empty(spark)


# ---------------------------------------------------------------------- #
# Cache hygiene: operators must not leak persisted intermediates          #
# ---------------------------------------------------------------------- #


# NOTE: these assert on the *tracked-persist registry* (the operator
# contract), not on sc.getPersistentRDDs() — the JVM registry also holds
# localCheckpoint RDDs that the ContextCleaner reclaims asynchronously,
# which makes raw counts racy in a shared test session.


def test_dedup_corpus_leaves_no_cache_residue(spark):
    """dedup_corpus materializes internally (cache_scope): after it
    returns, every intermediate it persisted must already be released."""
    import patito_spark as pt
    from patito_spark.operators.dedup import dedup_corpus

    # Start from a clean tracked registry: other tests (e.g. the entry
    # suite's session-lived ANN indexes) may hold tracked persists, and
    # this test must not be order-sensitive to them.
    pt.release_caches()
    docs = spark.createDataFrame(
        [(i, f"common shared text piece number {i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    result = dedup_corpus(docs, threshold=0.5)
    result.count()
    # cache_scope consumed every tracked persist — nothing left for the
    # caller to release.
    assert pt.release_caches() == 0


def test_release_caches_clears_minhash_persists(spark):
    """Lazy operators register persists in the tracked registry;
    release_caches() frees them all after the caller's action."""
    import patito_spark as pt
    from patito_spark.functions.cache import _TRACKED
    from patito_spark.operators.dedup import minhash_dedup_pairs

    pt.release_caches()  # order-independence: clear others' tracked persists
    docs = spark.createDataFrame(
        [(i, f"some repeated words for document {i % 5}") for i in range(30)],
        "doc_id long, text string",
    )
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    pairs.count()
    # banded signatures + shingle rows registered and still cached mid-use
    assert len(_TRACKED) >= 2
    assert all(df.storageLevel.useMemory for df in _TRACKED)
    freed = pt.release_caches()
    assert freed >= 2
    assert len(_TRACKED) == 0
