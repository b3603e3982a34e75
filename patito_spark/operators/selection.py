"""Data selection: importance resampling toward a target domain.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169): given a large raw corpus
and a small target corpus that looks like what you want to train on,
estimate per-document importance weights w(x) = p_target(x) /
p_raw(x) under cheap bag-of-features language models and resample the
raw corpus proportionally to w. The original uses hashed-bigram
features; this implementation uses the engine's unigram LM machinery
(:func:`..text.build_vocab` / :func:`..text.unigram_logloss`) — the
same importance-weight family, one hash bucket per token. The
log-ratio is length-normalized by default (per-token average, i.e.
the cross-entropy difference), so document length does not dominate
the weight; ``length_normalize=False`` restores the paper's raw
product-of-ratios behavior.

Scale shape: two vocabulary aggregates (target corpus once, raw
corpus once — each one hash aggregate) and two per-document
cross-entropy passes over the raw corpus (each: one token explode +
broadcast-LM join + per-doc aggregate, the :func:`..text.
unigram_logloss` shape). The target corpus is typically tiny (a
benchmark, a curated set) and is never joined against the raw corpus
row-for-row. Selection itself is the map-only deterministic
:func:`..sampling.weighted_sample` — no rand(), reproducible under
seed, no shuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ["dsir_weights", "dsir_sample"]


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    length_normalize: bool = True,
    smoothing_k: float = 1.0,
    raw_lm: Optional[DataFrame] = None,
    target_lm: Optional[DataFrame] = None,
    return_components: bool = False,
) -> DataFrame:
    """Per-document DSIR importance weights for ``raw`` toward ``target``.

    Returns ``<id_col>, n_tokens, log_ratio, dsir_weight`` where
    ``log_ratio`` is the per-token average log p_target − log p_raw
    (equivalently ``H_raw − H_target``, positive for target-like
    documents) and ``dsir_weight = exp(log_ratio / temperature)``.
    With ``length_normalize=False`` the log-ratio is the document SUM
    (``n_tokens ×`` the average) — the paper's raw importance weight,
    where longer target-like documents weigh exponentially more.
    ``temperature`` flattens (>1) or sharpens (<1) the distribution.

    Pass precomputed ``raw_lm`` / ``target_lm`` (``build_vocab``
    output) to skip the corresponding vocabulary aggregate — e.g. when
    scoring many snapshots against one fixed target.
    ``return_components=True`` appends the per-token cross-entropies
    both LMs already computed (``cross_entropy_raw`` — the CCNet-style
    self-perplexity signal when ``raw_lm`` is the corpus's own vocab —
    and ``cross_entropy_target``), so callers that also want the
    perplexity diagnostic don't pay a third scoring pass.
    """
    from patito_spark.operators.text import build_vocab, unigram_logloss

    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    t_lm = (
        target_lm
        if target_lm is not None
        else build_vocab(target, text_col=text_col, id_col=id_col)
    )
    r_lm = (
        raw_lm
        if raw_lm is not None
        else build_vocab(raw, text_col=text_col, id_col=id_col)
    )
    h_t = unigram_logloss(
        raw, text_col=text_col, id_col=id_col, lm=t_lm,
        smoothing_k=smoothing_k,
    ).select(id_col, "n_tokens", F.col("cross_entropy").alias("__h_t"))
    h_r = unigram_logloss(
        raw, text_col=text_col, id_col=id_col, lm=r_lm,
        smoothing_k=smoothing_k,
    ).select(id_col, F.col("cross_entropy").alias("__h_r"))
    joined = h_t.join(h_r, on=id_col)
    log_ratio = F.col("__h_r") - F.col("__h_t")
    if not length_normalize:
        log_ratio = log_ratio * F.col("n_tokens")
    cols = [
        F.col(id_col),
        F.col("n_tokens"),
        log_ratio.alias("log_ratio"),
        F.exp(log_ratio / F.lit(float(temperature))).alias("dsir_weight"),
    ]
    if return_components:
        cols += [
            F.col("__h_r").alias("cross_entropy_raw"),
            F.col("__h_t").alias("cross_entropy_target"),
        ]
    return joined.select(*cols)


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    fraction: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    length_normalize: bool = True,
    smoothing_k: float = 1.0,
    keep_weight_col: Optional[str] = None,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    raw_lm: Optional[DataFrame] = None,
    target_lm: Optional[DataFrame] = None,
) -> DataFrame:
    """Resample ``fraction`` of ``raw`` proportionally to DSIR weights.

    Composition: :func:`dsir_weights` → join back to the documents →
    deterministic :func:`..sampling.weighted_sample` with the expected
    kept fraction rescaled to ``fraction`` (weight-proportional keep
    probability, truncated at 1 — heavy-tailed weights undershoot
    slightly, the standard truncation). Documents the weight pass
    cannot score (no tokens) are dropped. ``keep_weight_col`` names an
    output column carrying the weight (for dataset cards / further
    mixing); default drops it.
    """
    from patito_spark.operators.sampling import weighted_sample

    w = dsir_weights(
        raw,
        target,
        text_col=text_col,
        id_col=id_col,
        temperature=temperature,
        length_normalize=length_normalize,
        smoothing_k=smoothing_k,
        raw_lm=raw_lm,
        target_lm=target_lm,
    ).select(id_col, F.col("dsir_weight").alias("__dsir_w"))
    scored = raw.join(w, on=id_col)
    sampled = weighted_sample(
        scored,
        weight_col="__dsir_w",
        key_col=id_col,
        target_fraction=fraction,
        seed=seed,
        hash_mode=hash_mode,
    )
    if keep_weight_col:
        return sampled.withColumnRenamed("__dsir_w", keep_weight_col)
    return sampled.drop("__dsir_w")
