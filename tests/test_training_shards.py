"""Token-budgeted training-shard writer: manifest integrity, balance,
determinism, and layout."""

import pytest

from pyspark.sql import functions as F

from patito_spark.sources import write_training_shards


@pytest.fixture()
def corpus(spark):
    # 2000 docs with skewed lengths (1..40 tokens), ~41k tokens total.
    return spark.range(2000).selectExpr(
        "id as doc_id",
        "concat_ws(' ', transform(sequence(1, cast(id % 40 + 1 as int)),"
        " i -> concat('tok', i))) as text",
        "concat('src', id % 3) as source",
    )


def test_shards_cover_corpus_and_manifest_matches(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    info = write_training_shards(
        corpus, path, target_tokens_per_shard=5000
    )
    total = corpus.select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    assert info["total_tokens"] == total
    assert info["n_shards"] == -(-total // 5000)
    # Every doc written exactly once, all columns intact.
    back = spark.read.parquet(path)
    assert set(back.columns) == {"doc_id", "text", "source", "shard"}
    assert back.count() == 2000
    assert back.select("doc_id").distinct().count() == 2000
    # Manifest sums reconcile with the written data.
    assert sum(r["n_docs"] for r in info["manifest"]) == 2000
    assert sum(r["n_tokens"] for r in info["manifest"]) == total
    manifest = spark.read.parquet(f"{path}/_manifest")
    assert {r["shard"] for r in manifest.collect()} == set(
        range(info["n_shards"])
    )


def test_shards_are_token_balanced(corpus, tmp_path):
    info = write_training_shards(
        corpus, str(tmp_path / "s"), target_tokens_per_shard=5000
    )
    sizes = [r["n_tokens"] for r in info["manifest"]]
    # Hash assignment: every shard within 2x of the mean at ~250
    # docs/shard (loose bound -- the point is no empty/overloaded shard).
    mean = sum(sizes) / len(sizes)
    assert all(0.5 * mean < s < 2.0 * mean for s in sizes)


def test_deterministic_across_runs(spark, corpus, tmp_path):
    a = write_training_shards(
        corpus, str(tmp_path / "a"), target_tokens_per_shard=5000
    )
    b = write_training_shards(
        corpus, str(tmp_path / "b"), target_tokens_per_shard=5000
    )
    assign = lambda p: {
        r["doc_id"]: r["shard"]
        for r in spark.read.parquet(p).select("doc_id", "shard").collect()
    }
    assert assign(str(tmp_path / "a")) == assign(str(tmp_path / "b"))
    # A different seed reassigns (at least some) docs.
    write_training_shards(
        corpus, str(tmp_path / "c"), target_tokens_per_shard=5000, seed=7
    )
    assert assign(str(tmp_path / "c")) != assign(str(tmp_path / "a"))


def test_precomputed_token_count_col(spark, corpus, tmp_path):
    pre = corpus.withColumn("n_tok", F.size(F.split("text", " ")))
    info = write_training_shards(
        pre,
        str(tmp_path / "p"),
        target_tokens_per_shard=5000,
        token_count_col="n_tok",
    )
    total = pre.select(F.sum("n_tok")).first()[0]
    assert info["total_tokens"] == total
    assert sum(r["n_tokens"] for r in info["manifest"]) == total


def test_single_shard_when_budget_exceeds_corpus(corpus, tmp_path):
    info = write_training_shards(
        corpus, str(tmp_path / "one"), target_tokens_per_shard=10**9
    )
    assert info["n_shards"] == 1
    assert len(info["manifest"]) == 1


def test_invalid_budget_raises(corpus, tmp_path):
    with pytest.raises(ValueError, match="positive"):
        write_training_shards(
            corpus, str(tmp_path / "x"), target_tokens_per_shard=0
        )


def test_written_row_order_reproducible(spark, corpus, tmp_path):
    """Review regression: 'shard' leads the within-partition sort keys,
    so the dynamic-partition writer keeps this sort (instead of
    inserting its own) and the physical row order in every shard file
    is identical across same-seed runs."""
    import glob

    import pyarrow.parquet as pq

    for name in ("o1", "o2"):
        write_training_shards(
            corpus, str(tmp_path / name), target_tokens_per_shard=5000
        )

    def physical_order(root):
        order = {}
        for d in sorted(glob.glob(f"{root}/shard=*")):
            ids = []
            for f in sorted(glob.glob(f"{d}/*.parquet")):
                ids.extend(pq.read_table(f, columns=["doc_id"])
                           .column("doc_id").to_pylist())
            order[d.rsplit("=", 1)[1]] = ids
        return order

    a = physical_order(str(tmp_path / "o1"))
    b = physical_order(str(tmp_path / "o2"))
    assert a == b
    # And the order is the seeded hash order, not insertion order.
    assert any(ids != sorted(ids) for ids in a.values())


def test_shards_carry_bpe_token_ids(spark, tmp_path):
    """The id path end to end: encode with the BPE artifacts, shard,
    read back — ids survive the parquet roundtrip intact and match the
    driver reference."""
    from patito_spark.operators.tokenizer import (
        bpe_token_ids,
        load_bpe_merges,
        with_bpe_token_ids,
    )
    from patito_spark.sources.readers import write_training_shards

    mp = tmp_path / "merges.txt"
    mp.write_text("#v\nh e\nl l\nhe ll\nhell o\n", encoding="utf-8")
    merges = load_bpe_merges(str(mp))
    vocab = {"hello": 7, "he": 1, "l": 2, "p": 3, "Ġ": 4, "Ġhello": 5}

    rows = [(i, "hello" + " hello" * (i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ids_df = with_bpe_token_ids(df, merges, vocab, unk_id=-1)
    out_dir = str(tmp_path / "shards")
    write_training_shards(
        ids_df, out_dir, target_tokens_per_shard=200, text_col="text"
    )
    back = spark.read.parquet(f"{out_dir}/shard=*")
    got = {r.doc_id: list(r.token_ids) for r in back.collect()}
    assert len(got) == 30
    for i, text in rows:
        assert got[i] == bpe_token_ids(text, merges, vocab, unk_id=-1)
