"""Corpus mixing: weighted domain sampling to a token budget.

Pretraining data is assembled from many domains with explicit mixture
weights (The Pile's per-set epochs, DoReMi's reweighting): "books 30%,
web 60%, code 10% of a 500B-token budget". ``mix_corpora`` turns those
weights into a deterministic per-domain sampling plan and materializes
the mixture lazily. The reference engine has no corpus layer; this is
part of the pipeline surface this engine adds (SURVEY.md §2 [O]).

Scale design (100 TB / 1000 executors):

* Token totals are ONE codegen aggregate per domain (sum of
  ``token_count``) — the only jobs this operator runs; everything else
  is a lazy plan.
* Selection is :func:`deterministic_sample`'s keyed hash — map-only,
  no shuffle, stable across runs/partitionings, so two calls with the
  same seed produce the identical mixture (reproducible data cards).
* Undersized domains repeat (The Pile's "epochs > 1"): ``k`` full
  copies plus a hash-sampled remainder, emitted via a map-only
  ``explode(sequence(...))`` — no self-union of N scans, one scan per
  domain regardless of epoch count. The ``epoch`` column keeps copies
  distinguishable downstream (e.g. for shuffling or loss masking).
"""

from __future__ import annotations

import math
from typing import Mapping, Optional

from pyspark.sql import DataFrame, functions as F

from patito_spark.operators.sampling import _hash_fraction

__all__ = ["mix_corpora", "mixture_stats", "temperature_weights"]


def _token_count_col(mode, text_col: str):
    """Resolve a ``token_count_mode`` into a count Column.

    ``"whitespace"`` (default) and ``"bpe_ish"`` are the codegen
    heuristics; a callable receives ``text_col`` and returns a Column;
    any other string names a PRECOMPUTED count column — e.g.
    ``tokenizer.with_bpe_token_count``'s output, which prices the
    budget in real model tokens (run the tokenizer pass first, then
    ``mix_corpora(..., token_count_mode="n_bpe_tokens")``).
    """
    from patito_spark.operators.text import bpe_ish_token_count, token_count

    if callable(mode):
        return mode(text_col)
    if mode == "whitespace":
        return token_count(text_col)
    if mode == "bpe_ish":
        return bpe_ish_token_count(text_col)
    return F.col(mode)


def _domain_totals(
    corpora: Mapping[str, DataFrame],
    token_count_mode,
    text_col: str,
    doc_weight_col: Optional[str],
) -> DataFrame:
    """ONE blocking action for every domain's totals (round 15): the
    per-domain 1-row aggregates crossJoin into a single 1-row frame, so
    the N domain scans run as parallel stages of one job instead of N
    serial driver round trips (the old per-domain ``.first()`` ladder
    was the entry's dominant fixed cost at bench scale). Each side is a
    1-row aggregate, so the folds plan as BroadcastNestedLoopJoin —
    never a sort-merge join — pinned by
    tests/test_plans.py::test_scalar_crossjoin_assemblies_plan_bnlj."""
    agg_frames = []
    for i, (name, df) in enumerate(corpora.items()):
        tc = _token_count_col(token_count_mode, text_col)
        aggs = [F.sum(tc).alias(f"__t{i}")]
        if doc_weight_col is not None:
            w = F.col(doc_weight_col).cast("double")
            aggs.append(
                F.sum(F.when(w > 0, w * tc).otherwise(0.0)).alias(f"__wt{i}")
            )
        agg_frames.append(df.agg(*aggs))
    fused = agg_frames[0]
    for frame in agg_frames[1:]:
        fused = fused.crossJoin(frame)
    return fused


def mix_corpora(
    corpora: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    allow_repeat: bool = True,
    doc_weight_col: Optional[str] = None,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    token_count_mode="whitespace",
) -> dict:
    """Sample each domain so expected token counts match the weights.

    Args:
        corpora: ``{domain_name: documents_df}``; each frame needs
            ``id_col`` and ``text_col``.
        weights: relative mixture weights per domain (normalized
            internally; every corpus key must be present).
        token_budget: total token target for the mixture, in the units
            ``token_count_mode`` selects (default: whitespace tokens,
            the same ``token_count`` the quality gates use).
        token_count_mode: how a document's token count is computed —
            ``"whitespace"`` (default) or ``"bpe_ish"`` (both codegen
            heuristics), a callable ``text_col -> Column``, or the NAME
            of a precomputed count column. For budgets in REAL model
            tokens, run :func:`..tokenizer.with_bpe_token_count` over
            each corpus first and pass its ``out_col`` here — the plan's
            totals/targets and the partial-epoch token mass all price in
            that unit.
        allow_repeat: when a domain has fewer tokens than its share,
            repeat it (epochs, Pile-style). With ``allow_repeat=False``
            the domain is capped at one full epoch and the mixture
            under-fills instead.
        doc_weight_col: optional per-document weight column (quality
            score, source trust) present in every corpus frame. The
            partial-epoch membership probability becomes proportional
            to the weight, rescaled (the weight×tokens mass rides the
            same per-domain aggregate) so the domain still hits its
            token share in
            expectation — higher-quality documents fill the share more
            often. Probabilities truncate at 1, so heavy-tailed weights
            undershoot the share slightly. Full epochs are unaffected
            (every doc repeats). Null/negative weights never enter the
            partial epoch.
        seed / hash_mode: passed to the deterministic hash selector
            (``hash_mode="portable"`` makes the mixture replayable in
            ANSI SQL, same contract as the sampling operators).

    Returns a dict:

    * ``"mixed"`` — lazy DataFrame: every selected document with
      ``mix_source`` (domain) and ``epoch`` (0-based copy number)
      columns; other columns pass through.
    * ``"plan"`` — list of per-domain dicts (``source``,
      ``total_tokens``, ``share``, ``target_tokens``, ``epochs``:
      full copies, ``remainder_fraction``): the materialized sampling
      decisions, ready for a dataset card.
    """
    if set(corpora) != set(weights):
        raise ValueError(
            f"corpora keys {sorted(corpora)} != weight keys {sorted(weights)}"
        )
    if not corpora:
        raise ValueError("mix_corpora needs at least one corpus")
    total_w = float(sum(weights.values()))
    if total_w <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative and sum > 0: {weights}")
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")

    totals = _domain_totals(
        corpora, token_count_mode, text_col, doc_weight_col
    ).first()

    plan = []
    parts = []
    for i, (name, df) in enumerate(corpora.items()):
        share = weights[name] / total_w
        target = share * token_budget
        total_tokens = totals[f"__t{i}"] or 0
        wt_sum = totals[f"__wt{i}"] if doc_weight_col is not None else None
        if total_tokens == 0:
            ratio = 0.0
        else:
            ratio = target / total_tokens
        if not allow_repeat:
            ratio = min(ratio, 1.0)
        epochs = int(math.floor(ratio))
        remainder = ratio - epochs

        plan.append(
            {
                "source": name,
                "total_tokens": int(total_tokens),
                "share": share,
                "target_tokens": int(round(target)),
                "epochs": epochs,
                "remainder_fraction": remainder,
            }
        )
        if ratio <= 0:
            continue

        # One scan per domain: full epochs fan out map-only via
        # explode(sequence(0, epochs-1)); the remainder epoch is the
        # keyed hash sample. Different epochs use the SAME remainder
        # membership only for the last partial copy, so no document
        # appears twice within one epoch.
        if doc_weight_col is not None and remainder > 0:
            # Weighted partial epoch: p_i = min(1, w_i * c) with c set so
            # sum(p_i * tokens_i) ~= remainder * total_tokens (expected
            # token share preserved, higher-weight docs selected more).
            w = F.col(doc_weight_col).cast("double")
            if not wt_sum:
                keep_p = F.lit(0.0)
            else:
                c = remainder * total_tokens / float(wt_sum)
                keep_p = F.when(
                    w > 0, F.least(w * F.lit(c), F.lit(1.0))
                ).otherwise(F.lit(0.0))
        else:
            keep_p = F.lit(remainder)
        selected = df.withColumn(
            "__keep_partial",
            _hash_fraction(F.col(id_col), seed, hash_mode=hash_mode)
            < keep_p,
        )
        n_copies = F.when(
            F.col("__keep_partial"), F.lit(epochs + 1)
        ).otherwise(F.lit(epochs))
        # sequence(0, n-1) is DESCENDING (not empty) when n = 0, so gate
        # the array behind when(): explode(null) drops the row, which is
        # exactly "document not selected this mixture".
        epoch_arr = F.when(
            n_copies > 0, F.sequence(F.lit(0), n_copies - F.lit(1))
        )
        part = (
            selected.withColumn("epoch", F.explode(epoch_arr))
            .drop("__keep_partial")
            .withColumn("mix_source", F.lit(name))
        )
        parts.append(part)

    if not parts:
        raise ValueError(
            "empty mixture: every corpus is empty or has zero weight"
        )
    mixed = parts[0]
    for p in parts[1:]:
        mixed = mixed.unionByName(p, allowMissingColumns=True)
    return {"mixed": mixed, "plan": plan}


def temperature_weights(
    token_counts: Mapping[str, float],
    alpha: float = 0.5,
) -> dict:
    """Temperature-sampled mixture weights from raw domain sizes.

    The standard multi-domain / multilingual recipe (GPT-3's Pile
    weighting, PaLM/mT5's alpha-sampling, UniMax's motivation): sample
    domain ``i`` with probability proportional to ``n_i ** alpha``.
    ``alpha=1`` is proportional (big domains dominate), ``alpha=0`` is
    uniform (small domains oversample/repeat aggressively); the usual
    sweet spot is 0.2-0.7. Feed the result straight into
    :func:`mix_corpora`'s ``weights=``:

        sizes = {d: df.select(F.sum(token_count("text"))).first()[0]
                 for d, df in corpora.items()}
        mix_corpora(corpora, temperature_weights(sizes, 0.3), budget)

    Driver-side arithmetic over one number per domain — the token
    counts come from aggregates the caller already runs (or
    ``mix_corpora``'s returned per-domain plan).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if not token_counts:
        raise ValueError("token_counts is empty")
    powered = {}
    for k, n in token_counts.items():
        if n is None or n < 0:
            raise ValueError(f"token count for {k!r} must be >= 0, got {n}")
        powered[k] = float(n) ** alpha if n > 0 else 0.0
    total = sum(powered.values())
    if total == 0:
        raise ValueError("all token counts are zero")
    return {k: v / total for k, v in powered.items()}


def mixture_stats(
    mixed: DataFrame,
    source_col: str = "mix_source",
    text_col: str = "text",
    token_count_mode="whitespace",
) -> DataFrame:
    """Realized composition of a :func:`mix_corpora` output.

    The plan dict says what the mixture SHOULD contain; this measures
    what it does — the dataset-card cross-check, and the guard against
    silent drift when upstream corpora change under a pinned plan.
    Returns one row per source: ``n_rows`` (selected copies, epochs
    included), ``n_tokens``, ``token_share``, ``row_share``, and
    ``n_epochs`` (when the ``epoch`` column is present).
    ``token_count_mode`` follows :func:`mix_corpora` — pass the same
    mode the mixture was built with so the realized shares are in the
    plan's units.

    One hash aggregate over the mixture; the share columns are a
    window over the AGGREGATED frame (one row per domain — the
    unpartitioned window never sees the corpus itself).
    """
    from pyspark.sql import Window

    aggs = [
        F.count("*").alias("n_rows"),
        F.sum(_token_count_col(token_count_mode, text_col)).alias(
            "n_tokens"
        ),
    ]
    if "epoch" in mixed.columns:
        aggs.append((F.max("epoch") + F.lit(1)).alias("n_epochs"))
    per_source = mixed.groupBy(source_col).agg(*aggs)
    everything = Window.partitionBy()
    return per_source.select(
        "*",
        (F.col("n_tokens") / F.sum("n_tokens").over(everything)).alias(
            "token_share"
        ),
        (F.col("n_rows") / F.sum("n_rows").over(everything)).alias(
            "row_share"
        ),
    )
