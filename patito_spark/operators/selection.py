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
corpus once — each one hash aggregate) and ONE fused per-document
scoring pass over the raw corpus: a single token explode feeds two
broadcast-LM lookups and one per-doc aggregate computing both
cross-entropies together (vs. the naive two `unigram_logloss`
passes + join — half the explode/shuffle work). The target corpus is
typically tiny (a benchmark, a curated set) and is never joined
against the raw corpus row-for-row. Selection itself is the map-only deterministic
:func:`..sampling.weighted_sample` — no rand(), reproducible under
seed, no shuffle.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, functions as F

from patito_spark.functions.hashing import HashMode, hash64

__all__ = ["dsir_weights", "dsir_sample", "dsir_lm", "hashed_ngram_features"]

#: Separator between the two tokens of a bigram before hashing — an
#: ASCII unit separator, so "a b"+"c" and "a"+"b c" hash differently.
_BIGRAM_SEP = "\x1f"


def hashed_ngram_features(
    text: Union[str, Column],
    n_buckets: int = 10_000,
    hash_mode: HashMode = "xxhash64",
) -> Column:
    """Hashed unigram+bigram feature stream of a text column.

    The DSIR paper's feature space (arXiv:2302.03169 §3): every unigram
    and every adjacent-pair bigram is hashed into ``n_buckets`` buckets,
    and the importance LMs are bag-of-buckets models. Returns the
    bucket-id stream re-joined with spaces so it can feed the same
    whitespace-token LM machinery as plain text (``build_vocab`` /
    ``unigram_logloss``). All array ops are codegen higher-order
    functions — no Python, no shuffle; ``hash_mode="portable"`` makes
    the buckets engine-reproducible (md5-based, see
    ``functions/hashing.py``) at ~2-3× the hashing cost.
    """
    toks = F.split(F.col(text) if isinstance(text, str) else text, " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, F.lit(1), n - F.lit(1)),
        F.slice(toks, F.lit(2), n - F.lit(1)),
        lambda a, b: F.concat(a, F.lit(_BIGRAM_SEP), b),
    )
    buckets = F.transform(
        F.concat(toks, bigrams),
        lambda s: F.pmod(hash64(s, hash_mode), F.lit(n_buckets)).cast("string"),
    )
    return F.array_join(buckets, " ")


def dsir_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    features: str = "unigram",
    ngram_buckets: int = 10_000,
    hash_mode: HashMode = "xxhash64",
) -> DataFrame:
    """Build a DSIR language model over the chosen feature space.

    The precompute companion to :func:`dsir_weights`: pass the result
    as ``raw_lm`` / ``target_lm`` (with MATCHING ``features`` /
    ``ngram_buckets`` / ``hash_mode`` arguments) to amortize the
    vocabulary aggregate when scoring many snapshots against one fixed
    target. One hash aggregate; ``build_vocab`` output schema.
    """
    from patito_spark.operators.text import build_vocab

    if features == "hashed":
        df = df.withColumn(
            "__dsir_features",
            hashed_ngram_features(
                text_col, n_buckets=ngram_buckets, hash_mode=hash_mode
            ),
        )
        text_col = "__dsir_features"
    elif features != "unigram":
        raise ValueError(
            f"features must be 'unigram' or 'hashed', got {features!r}"
        )
    return build_vocab(df, text_col=text_col, id_col=id_col)


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
    features: str = "unigram",
    ngram_buckets: int = 10_000,
    hash_mode: HashMode = "xxhash64",
    max_broadcast_vocab: int = 2_000_000,
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

    ``features="hashed"`` switches the LM feature space from plain
    whitespace unigrams to the paper's hashed unigram+bigram buckets
    (:func:`hashed_ngram_features` with ``ngram_buckets`` /
    ``hash_mode``) — bigrams capture local word order, and the fixed
    bucket count bounds both LM vocabularies at ``ngram_buckets`` rows
    regardless of corpus size (always broadcastable). ``n_tokens`` then
    counts FEATURES (unigrams + bigrams ≈ 2·tokens − 1). Precomputed
    ``raw_lm`` / ``target_lm`` must have been built over the same
    feature space. ``max_broadcast_vocab`` gates each LM's broadcast
    (the ``unigram_logloss`` contract); a vocabulary past it falls
    back to a shuffle join.
    """
    from patito_spark.operators.text import build_vocab, tokens

    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    if features not in ("unigram", "hashed"):
        raise ValueError(
            f"features must be 'unigram' or 'hashed', got {features!r}"
        )
    if features == "hashed":
        feat = hashed_ngram_features(
            text_col, n_buckets=ngram_buckets, hash_mode=hash_mode
        )
        feat_col = "__dsir_features"
        raw = raw.withColumn(feat_col, feat)
        target = target.withColumn(feat_col, feat)
        text_col = feat_col
    from patito_spark.functions.cache import tracked_persist

    # Internally-built LMs are read twice (totals action + the join
    # side); persist so each vocabulary aggregate runs once — the
    # totals .first() materializes the cache. Registered for
    # release_caches(); precomputed raw_lm/target_lm skip this.
    t_lm = (
        target_lm
        if target_lm is not None
        else tracked_persist(
            build_vocab(target, text_col=text_col, id_col=id_col)
        )
    )
    r_lm = (
        raw_lm
        if raw_lm is not None
        else tracked_persist(
            build_vocab(raw, text_col=text_col, id_col=id_col)
        )
    )

    # Fused scoring: ONE token explode + ONE per-doc aggregate computes
    # both cross-entropies (two broadcast LM lookups per token row),
    # instead of two unigram_logloss passes + a join — halves the
    # explode/shuffle work, which dominates the operator's cost.
    # Smoothing math mirrors unigram_logloss: p(t) = (count + k) /
    # (total + k·(V + 1)), unseen tokens at the count = 0 floor.
    def _lm_side(lm: DataFrame, cnt_alias: str):
        lm = lm.select("token", F.col("count").alias(cnt_alias))
        totals = lm.agg(
            F.sum(cnt_alias).alias("t"), F.count("*").alias("v")
        ).first()
        total, v = totals["t"] or 0, totals["v"]
        denom = float(total) + smoothing_k * (v + 1)
        side = F.broadcast(lm) if v <= max_broadcast_vocab else lm
        return side, denom

    t_side, t_denom = _lm_side(t_lm, "__cnt_t")
    r_side, r_denom = _lm_side(r_lm, "__cnt_r")

    def _nll(cnt_col: str, denom: float) -> Column:
        return -F.log(
            (F.coalesce(F.col(cnt_col), F.lit(0)) + F.lit(smoothing_k))
            / F.lit(denom)
        )

    toks = raw.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    joined = (
        toks.join(t_side, on="token", how="left")
        .join(r_side, on="token", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(_nll("__cnt_t", t_denom)).alias("__h_t"),
            F.avg(_nll("__cnt_r", r_denom)).alias("__h_r"),
        )
    )
    log_ratio = F.col("__h_r") - F.col("__h_t")
    if not length_normalize:
        log_ratio = log_ratio * F.col("n_tokens")
    # Clamp the exponent: with length_normalize=False the log-ratio is
    # a document SUM, and a few hundred target-like tokens push it past
    # ln(DBL_MAX) ≈ 709.78 — exp() would return Infinity, which then
    # poisons weighted_sample's mean-weight rescale (inf mean → every
    # finite-weight doc gets keep probability 0, every overflowed doc
    # NaN→1: the sample silently becomes "overflowed docs only"). At
    # e±700 the keep probability has long saturated at 1 (or 0), so
    # clamping changes no sane selection, only prevents the poisoning.
    exponent = log_ratio / F.lit(float(temperature))
    cols = [
        F.col(id_col),
        F.col("n_tokens"),
        log_ratio.alias("log_ratio"),
        F.exp(
            F.greatest(F.least(exponent, F.lit(700.0)), F.lit(-700.0))
        ).alias("dsir_weight"),
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
    features: str = "unigram",
    ngram_buckets: int = 10_000,
) -> DataFrame:
    """Resample ``fraction`` of ``raw`` proportionally to DSIR weights.

    Composition: :func:`dsir_weights` → join back to the documents →
    deterministic :func:`..sampling.weighted_sample` with the expected
    kept fraction rescaled to ``fraction`` (weight-proportional keep
    probability, truncated at 1 — heavy-tailed weights undershoot
    slightly, the standard truncation). Documents the weight pass
    cannot score (no tokens) are dropped. ``keep_weight_col`` names an
    output column carrying the weight (for dataset cards / further
    mixing); default drops it. ``features`` / ``ngram_buckets`` select
    the LM feature space (see :func:`dsir_weights`); ``hash_mode``
    applies to both the feature hashing and the keep decision.
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
        features=features,
        ngram_buckets=ngram_buckets,
        hash_mode=hash_mode,
    ).select(id_col, F.col("dsir_weight").alias("__dsir_w"))
    # weighted_sample's target-fraction rescale runs a mean-weight
    # ACTION over this frame, then returns a lazy filter over it —
    # without a persist the whole scoring DAG (explode + LM joins +
    # aggregate, the dominant cost) would execute twice. One id+double
    # row per doc; registered for release_caches().
    from patito_spark.functions.cache import tracked_persist

    w = tracked_persist(w)
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
