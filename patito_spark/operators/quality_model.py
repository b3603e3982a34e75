"""Learned quality filtering: train/score a text classifier, Spark-native.

Production pipelines gate documents with a LEARNED quality model
(GPT-3's LR-against-WebText, CCNet/fastText-style classifiers), not
only heuristics: label a small seed set (curated corpus = positive,
raw crawl = negative), train, then score the full corpus and keep the
top mass. The heuristic :func:`..text.quality_score` stays the cheap
always-on gate; this module is the learned upgrade when labels exist.

Spark-first design: the model is a standard ``pyspark.ml`` Pipeline
(tokenizer → hashing-TF → logistic regression) so training is the
stock distributed LBFGS and scoring is one ``transform`` — a JVM-side
map over the corpus, no Python workers. Feature hashing keeps the
model size fixed (``2^18`` dims by default) regardless of vocabulary,
which is what lets the SAME model score a 100 TB corpus: the scorer
broadcasts a few MB of coefficients, nothing grows with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_quality_classifier", "score_quality"]


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
):
    """Fit a quality classifier on ``(text, label)`` rows (label 1 =
    keep-quality, 0 = reject-quality).

    Returns a fitted ``pyspark.ml.PipelineModel`` — persist it with
    ``model.write().overwrite().save(path)`` and reload with
    ``PipelineModel.load(path)``; the artifact is a few MB of hashed
    coefficients, independent of corpus size.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    stages = [
        RegexTokenizer(
            inputCol=text_col, outputCol="__words", pattern=r"\s+"
        ),
        HashingTF(
            inputCol="__words", outputCol="__features",
            numFeatures=n_features,
        ),
        LogisticRegression(
            featuresCol="__features", labelCol=label_col,
            maxIter=max_iter, regParam=reg_param,
        ),
    ]
    return Pipeline(stages=stages).fit(labeled)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    output_col: str = "quality_prob",
    min_prob: float | None = None,
) -> DataFrame:
    """Score documents with a trained quality model.

    Appends ``output_col`` = P(label=1) to ``df`` (all original columns
    pass through; the model's intermediate token/feature/raw columns are
    dropped). With ``min_prob`` the result is additionally filtered —
    the one-call learned quality gate. Scoring is a single distributed
    ``transform``: hashing + a broadcast coefficient dot product per
    row, no shuffle.
    """
    from pyspark.ml.functions import vector_to_array

    if model.stages and model.stages[0].getInputCol() != text_col:
        # The pipeline was trained against a differently-named text
        # column; rename transiently so transform() finds it.
        scored = model.transform(
            df.withColumnRenamed(text_col, model.stages[0].getInputCol())
        ).withColumnRenamed(model.stages[0].getInputCol(), text_col)
    else:
        scored = model.transform(df)
    out = scored.withColumn(
        output_col,
        F.element_at(vector_to_array(F.col("probability")), 2),
    ).select(*df.columns, output_col)
    if min_prob is not None:
        out = out.filter(F.col(output_col) >= min_prob)
    return out
