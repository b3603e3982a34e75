"""Large-input smoke tests (opt-in: SPARK_GRAFT_SCALE_SMOKE=1).

Synthesizes 10M-row inputs in-memory (spark.range — no testdata writes)
and runs the shuffle-heavy operators end-to-end. Catches plans that only
work at unit-test sizes (driver collects, unbounded state, per-row Python).
"""

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="scale smoke is opt-in (SPARK_GRAFT_SCALE_SMOKE=1)",
)

N = 10_000_000


def test_validation_single_pass_10m(spark):
    import patito_spark as pt

    class Row(pt.Model):
        id: int = pt.Field(ge=0)
        v: float
        bucket: int = pt.Field(ge=0, le=99)

    df = spark.range(N).selectExpr(
        "id", "cast(id % 1000 as double) / 7 as v", "cast(id % 100 as int) as bucket"
    ).withColumn("bucket", F.col("bucket").cast("long"))
    Row.validate_df(df, approximate_unique=True)


def test_exact_dedup_10m(spark):
    from patito_spark.operators.dedup import dedup_exact

    df = spark.range(N).selectExpr("id % 1000000 as k", "id as payload")
    out = dedup_exact(df, subset=["k"], id_col="payload")
    assert out.count() == 1_000_000


def test_salted_aggregate_10m_hot_key(spark):
    from patito_spark.operators.skew import salted_aggregate

    # 50% of rows share one key
    df = spark.range(N).selectExpr(
        "if(id % 2 = 0, 0, id) as k", "cast(id % 13 as double) as v"
    )
    out = salted_aggregate(
        df, keys=["k"], aggs={"s": ("v", "sum"), "n": ("v", "count")},
        salt_buckets=32,
    )
    hot = out.filter("k = 0").first()
    assert hot["n"] == N // 2


def test_minhash_1m_docs(spark):
    from patito_spark.operators.dedup import minhash_lsh_candidates

    # 1M short synthetic docs, every 1000th is a duplicate of doc 0
    docs = spark.range(1_000_000).selectExpr(
        "id as doc_id",
        "if(id % 1000 = 0, 'alpha beta gamma delta epsilon zeta', "
        "concat('w', id, ' x', id + 1, ' y', id + 2, ' z', id + 3)) as text",
    )
    pairs = minhash_lsh_candidates(
        docs, num_hashes=32, bands=8, max_bucket_size=2000
    )
    # the 1000 planted duplicates form up to ~500k candidate pairs capped
    # by bucket size; just require the pipeline completes and finds some
    assert pairs.limit(1).count() == 1


def test_topk_1m_corpus(spark):
    from patito_spark.operators.similarity import cosine_topk

    corpus = spark.range(1_000_000).selectExpr(
        "id as vec_id",
        "array(cast(id % 97 as double), cast(id % 89 as double), "
        "cast(id % 83 as double), 1.0d) as embedding",
    )
    queries = corpus.filter("vec_id < 3")
    out = cosine_topk(corpus, queries, k=5)
    assert out.count() == 15


def test_asof_join_10m(spark):
    """As-of join at 10M left rows x 1M right rows: the union-window plan
    must complete without nested loops or driver materialization."""
    from patito_spark.operators.temporal import asof_join

    left = spark.range(N).selectExpr(
        "id % 100000 as k", "id as t", "id as payload"
    )
    right = spark.range(1_000_000).selectExpr(
        "id % 100000 as k", "id * 10 as t", "cast(id as double) as px"
    )
    out = asof_join(left, right, on="t", by=["k"])
    assert out.count() == N


def test_range_join_2m_points(spark):
    """Bucketed range join: 2M points x 10k intervals resolves through the
    bucket equi-join (a nested-loop cross product would be 2e10 pairs)."""
    from patito_spark.operators.temporal import range_join

    points = spark.range(2_000_000).selectExpr("id as p")
    intervals = spark.range(10_000).selectExpr(
        "id as iv_id", "id * 200 as s", "id * 200 + 100 as e"
    )
    out = range_join(points, intervals, "p", "s", "e", bucket_width=200)
    # every interval covers exactly 100 integer points
    assert out.count() == 10_000 * 100


def test_apply_changes_10m(spark):
    from patito_spark.operators.temporal import apply_changes

    changes = spark.range(N).selectExpr(
        "id % 1000000 as k",
        "id as seq",
        "concat('v', id) as v",
        "if(id % 17 = 0, 'D', 'U') as op",
    )
    out = apply_changes(None, changes, key_cols=["k"], seq_col="seq")
    n = out.count()
    assert 0 < n <= 1_000_000


def test_contamination_1m_docs(spark):
    """1M synthetic docs scanned against a 1k-doc benchmark: the overlap
    must resolve through the broadcast gram-hash join (corpus never
    shuffles on the gram)."""
    from patito_spark.operators.contamination import ngram_contamination

    corpus = spark.range(1_000_000).selectExpr(
        "id as doc_id",
        "concat('tok', id % 997, ' tok', (id + 1) % 997, ' tok', (id + 2) % 997, "
        "' tok', (id + 3) % 997, ' tok', (id + 4) % 997) as text",
    )
    benchmark = spark.range(1_000).selectExpr(
        "id + 2000000 as doc_id",
        "concat('tok', id % 997, ' tok', (id + 1) % 997, ' tok', (id + 2) % 997, "
        "' tok', (id + 3) % 997, ' tok', (id + 4) % 997) as text",
    )
    out = ngram_contamination(corpus, benchmark, n=5)
    assert out.count() > 0  # constructed overlaps exist


def test_pack_sequences_1m_docs(spark):
    """1M docs packed per-partition: the best-fit bisect lookup must keep
    partitions with many small docs from going quadratic (the first-fit
    linear scan did), and seq ids must stay globally unique."""
    from patito_spark.operators.packing import pack_sequences

    df = spark.range(1_000_000).selectExpr(
        "id as doc_id", "cast(1 + id % 97 as long) as n_tok"
    )
    packed = pack_sequences(df, length_col="n_tok", max_len=2048)
    agg = packed.agg(
        F.sum("total_tokens").alias("toks"),
        F.sum("n_docs").alias("docs"),
        F.count("*").alias("seqs"),
        F.count_distinct("seq_id").alias("uniq"),
    ).first()
    assert agg["docs"] == 1_000_000
    assert agg["uniq"] == agg["seqs"]
    # token mass conserved: sum over 0..999999 of (1 + id % 97)
    expected = 1_000_000 + sum(i % 97 for i in range(1_000_000))
    assert agg["toks"] == expected


def test_streaming_dedup_lsh_100k_docs(spark, tmp_path):
    """100k synthetic docs through the streaming near-dup path: bounded
    state (one rep per occupied bucket), no driver collects, and the
    planted duplicate cohort is flagged."""
    from patito_spark.streaming.dedup import streaming_dedup_lsh

    path = str(tmp_path / "stream_docs")
    # 1000 cohorts with fully disjoint token sets (every token carries the
    # cohort id), each repeated 100x with a distinct doc id: exactly the
    # non-first cohort members should be flagged, nothing across cohorts.
    spark.range(100_000).selectExpr(
        "id as doc_id",
        "array_join(transform(sequence(1, 12), "
        "i -> concat('w', id % 1000, 'x', i)), ' ') as text",
    ).write.parquet(path)
    stream = spark.readStream.schema("doc_id long, text string").parquet(path)
    flagged = streaming_dedup_lsh(stream, num_hashes=16, bands=4)
    q = (
        flagged.select("doc_id").writeStream.format("memory")
        .queryName("t_sdl_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n = spark.sql("select count(distinct doc_id) as n from t_sdl_smoke").first()["n"]
    assert n == 100_000 - 1000  # everyone but the 1000 representatives
