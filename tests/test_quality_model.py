"""Learned quality classifier: separation, passthrough, save/load."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.quality_model import (
    score_quality,
    train_quality_classifier,
)

WORDS = ("the quick brown fox jumps over lazy dog while reading about "
         "distributed query engines and training data pipelines").split()


def _labeled(spark, n=150):
    rows = []
    for i in range(n):
        good = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(12))
        bad = " ".join(
            "zq" + str((i * 7 + j * 13) % 9973) for j in range(12)
        )
        rows.append((2 * i, good, 1.0))
        rows.append((2 * i + 1, bad, 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


@pytest.fixture(scope="module")
def model(spark):
    return train_quality_classifier(_labeled(spark))


def test_separates_good_from_junk(spark, model):
    test = _labeled(spark, n=40)
    scored = score_quality(test, model)
    means = {
        r["label"]: r["m"]
        for r in scored.groupBy("label")
        .agg(F.avg("quality_prob").alias("m"))
        .collect()
    }
    assert means[1.0] > means[0.0] + 0.5


def test_passthrough_and_gate(spark, model):
    docs = spark.createDataFrame(
        [(1, " ".join(WORDS[:12]), "web")],
        "doc_id long, text string, source string",
    )
    scored = score_quality(docs, model)
    assert scored.columns == ["doc_id", "text", "source", "quality_prob"]
    gated = score_quality(docs, model, min_prob=0.99999)
    assert gated.count() in (0, 1)  # filter applies without error


def test_renamed_text_column(spark, model):
    docs = spark.createDataFrame(
        [(1, " ".join(WORDS[:12]))], "doc_id long, body string"
    )
    scored = score_quality(docs, model, text_col="body")
    assert scored.columns == ["doc_id", "body", "quality_prob"]
    assert 0.0 <= scored.first()["quality_prob"] <= 1.0


def test_save_load_roundtrip(spark, model, tmp_path):
    from pyspark.ml import PipelineModel

    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    docs = _labeled(spark, n=10)
    a = score_quality(docs, model).select("doc_id", "quality_prob")
    b = score_quality(docs, reloaded).select("doc_id", "quality_prob")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_score_quality_on_stream(spark, model, tmp_path):
    """The scorer is a plain transform, so it applies to a readStream
    unchanged — ingestion-time learned quality gating."""
    import uuid as _uuid

    path = str(tmp_path / "qdocs")
    spark.createDataFrame(
        [(1, " ".join(WORDS[:12])), (2, "zq1 zq2 zq3 zq4 zq5 zq6")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(path)
    stream = spark.readStream.schema("doc_id long, text string").parquet(path)
    scored = score_quality(stream, model, min_prob=0.5)
    name = f"t_qms_{_uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = [r["doc_id"] for r in spark.table(name).collect()]
    assert ids == [1]
