"""SentencePiece-style unigram-LM tokenizer training + encoding
(Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates" — the unigram
language model tokenizer; Kudo & Richardson 2018 for the SentencePiece
packaging conventions).

The OTHER major subword family next to BPE (``.tokenizer``): instead of
greedy merges, a vocabulary of candidate pieces is fitted as a unigram
LM over the segmentation lattice by EM, then pruned to the target size
by each piece's likelihood contribution. Segmentation at encode time is
the Viterbi path (the 1-best; sampling alternatives is the paper's
subword-regularization trick).

Pipeline shape — the :func:`..tokenizer.train_bpe` split, one stage
further distributed:

1. **Word-frequency collapse** (shared with BPE:
   :func:`..tokenizer.bpe_word_frequencies`): the only stage that sees
   corpus-sized data. Everything after scales with DISTINCT word
   forms, not tokens.
2. **Seed piece enumeration** — every substring of every distinct word
   up to ``max_piece_len``, counted with word frequencies: a
   distributed explode + one mergeable sum + exact top-K (TakeOrdered,
   ties bytewise). All single characters are always kept.
3. **EM** — the E-step (forward–backward over each word's segmentation
   lattice, the expensive embarrassingly-parallel part) runs as an
   Arrow-batched pass over the word table with the current piece
   log-probs BROADCAST; per-batch local fold, one (piece, expected)
   aggregate, vocabulary-bounded collect. The M-step is the paper's
   Bayesianified update ``logp = ψ(c) − ψ(Σc)`` (digamma), driver-side
   over the vocabulary.
4. **Pruning rounds** — each piece's loss if removed is its expected
   count times the gap to the best ALTERNATIVE segmentation of the
   piece by the rest of the vocabulary (the sentencepiece
   ``prune_pieces`` estimate); the least-costly pieces are dropped by
   ``shrink_factor`` per round until ``vocab_size``, single characters
   never pruned. EM re-runs between rounds.

Artifacts use the public SentencePiece ``.vocab`` text format
(``piece<TAB>logprob`` per line, ids = line numbers) so fitted vocabs
interchange with any SP-compatible consumer.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator, Mapping, Optional, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: id 0 by SentencePiece convention; scores OOV characters at encode
#: time (training corpora always cover their own characters).
UNK_PIECE = "<unk>"
UNK_LOG_PROB = -20.0

_NEG_INF = float("-inf")


def _digamma(x: float) -> float:
    """ψ(x) for x > 0 (recurrence + asymptotic series — the standard
    implementation; no scipy dependency)."""
    result = 0.0
    while x < 6.0:
        result -= 1.0 / x
        x += 1.0
    f = 1.0 / (x * x)
    return (
        result
        + math.log(x)
        - 0.5 / x
        - f
        * (
            1.0 / 12
            - f
            * (
                1.0 / 120
                - f * (1.0 / 252 - f * (1.0 / 240 - f * (1.0 / 132)))
            )
        )
    )


def _logsumexp2(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    hi, lo = (a, b) if a >= b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def viterbi_segment(
    word: str, logp: Mapping[str, float], max_piece_len: int
) -> Tuple[list, float]:
    """Best segmentation of ``word`` under the piece log-probs: the
    1-best lattice path (ties resolved toward FEWER pieces, then the
    earlier/longer piece — deterministic). Returns ``(pieces, score)``;
    characters absent from the vocabulary segment as themselves with
    ``UNK_LOG_PROB`` (encode-time OOV; score reflects it)."""
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            if best[i] == _NEG_INF:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i == 1:
                    lp = UNK_LOG_PROB  # single-char OOV floor
                else:
                    continue
            cand = best[i] + lp
            if cand > best[j]:
                best[j] = cand
                back[j] = i
    pieces = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces, best[n]


def _forward_backward(
    word: str,
    count: int,
    logp: Mapping[str, float],
    max_piece_len: int,
    expected: dict,
) -> float:
    """One word's E-step: accumulate ``count``-weighted expected piece
    counts into ``expected``; returns the word's log-likelihood times
    ``count``. Spans score ``exp(α_i + logp + β_j − loglik)`` — the
    textbook lattice posterior."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    beta = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    spans = []
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                continue
            spans.append((i, j, piece, lp))
            if alpha[i] != _NEG_INF:
                alpha[j] = _logsumexp2(alpha[j], alpha[i] + lp)
    loglik = alpha[n]
    if loglik == _NEG_INF:
        raise ValueError(
            f"unsegmentable word {word!r}: a character is missing from "
            "the vocabulary (seed keeps all corpus characters — did "
            "you prune externally?)"
        )
    beta[n] = 0.0
    for j in range(n, 0, -1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or beta[j] == _NEG_INF:
                continue
            beta[i] = _logsumexp2(beta[i], lp + beta[j])
    for i, j, piece, lp in spans:
        if alpha[i] == _NEG_INF or beta[j] == _NEG_INF:
            continue
        post = math.exp(alpha[i] + lp + beta[j] - loglik)
        if post > 0.0:
            expected[piece] = expected.get(piece, 0.0) + count * post
    return count * loglik


def unigram_seed_pieces(
    word_freqs: DataFrame,
    seed_size: int = 100_000,
    max_piece_len: int = 8,
) -> DataFrame:
    """Seed candidate pieces from a ``(word, count)`` table: every
    substring up to ``max_piece_len``, frequency-weighted, exact top-K
    by (count desc, piece asc) PLUS all single characters (which the
    top-K may not retain but pruning must never lose). Distributed:
    substring enumeration is an Arrow pass with a per-batch local fold,
    then one mergeable sum — the driver never sees more than the
    bounded candidate table."""
    schema = T.StructType(
        [
            T.StructField("piece", T.StringType(), False),
            T.StructField("count", T.DoubleType(), False),
        ]
    )

    def substrings(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ctr: dict = {}
            for word, cnt in zip(pdf["word"], pdf["count"]):
                n = len(word)
                for i in range(n):
                    for j in range(i + 1, min(i + max_piece_len, n) + 1):
                        p = word[i:j]
                        ctr[p] = ctr.get(p, 0.0) + cnt
            if ctr:
                yield pd.DataFrame(
                    {"piece": list(ctr.keys()), "count": list(ctr.values())}
                )

    counted = (
        word_freqs.select("word", "count")
        .mapInPandas(substrings, schema=schema)
        .groupBy("piece")
        .agg(F.sum("count").alias("count"))
    )
    top = counted.filter(F.length("piece") > 1).orderBy(
        F.col("count").desc(), F.col("piece").asc()
    ).limit(max(seed_size, 1))
    chars = counted.filter(F.length("piece") == 1)
    return top.unionByName(chars)


def _estep_spark(
    words: DataFrame,
    logp: Mapping[str, float],
    max_piece_len: int,
) -> Tuple[dict, float]:
    """Distributed E-step: forward–backward per distinct word with the
    piece log-probs broadcast; per-batch local fold, one (piece,
    expected) + loglik aggregate, vocabulary-bounded collect."""
    bc = words.sparkSession.sparkContext.broadcast(dict(logp))
    schema = T.StructType(
        [
            T.StructField("piece", T.StringType(), False),
            T.StructField("expected", T.DoubleType(), False),
        ]
    )

    def estep(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        lp = bc.value
        exp_counts: dict = {}
        ll = 0.0
        for pdf in batches:
            for word, cnt in zip(pdf["word"], pdf["count"]):
                ll += _forward_backward(
                    word, int(cnt), lp, max_piece_len, exp_counts
                )
        # the log-likelihood rides the same aggregate as a reserved row
        exp_counts["\x00loglik"] = ll
        yield pd.DataFrame(
            {
                "piece": list(exp_counts.keys()),
                "expected": list(exp_counts.values()),
            }
        )

    rows = (
        words.select("word", "count")
        .mapInPandas(estep, schema=schema)
        .groupBy("piece")
        .agg(F.sum("expected").alias("expected"))
        .collect()
    )
    expected = {r["piece"]: r["expected"] for r in rows}
    loglik = expected.pop("\x00loglik", 0.0)
    return expected, loglik


def _estep_local(
    word_freqs: Mapping[str, int],
    logp: Mapping[str, float],
    max_piece_len: int,
) -> Tuple[dict, float]:
    """Driver-only E-step — the bit-compatible reference the
    distributed pass is tested against (summation order differs at
    ~1e-12)."""
    expected: dict = {}
    ll = 0.0
    for word, cnt in word_freqs.items():
        ll += _forward_backward(word, int(cnt), logp, max_piece_len, expected)
    return expected, ll


def _mstep(expected: Mapping[str, float]) -> dict:
    """The paper's Bayesianified M-step: ``logp = ψ(c) − ψ(Σc)``.
    Pieces whose expected count vanished get a hard floor so they fall
    in the next prune instead of producing ψ(0)."""
    total = sum(expected.values())
    psi_total = _digamma(total) if total > 0 else 0.0
    out = {}
    for piece, c in expected.items():
        if c > 1e-10:
            out[piece] = _digamma(c) - psi_total
        else:
            out[piece] = -1e10
    return out


def _prune(
    logp: dict,
    expected: Mapping[str, float],
    target: int,
    shrink_factor: float,
    max_piece_len: int,
) -> dict:
    """sentencepiece's prune_pieces estimate: removing piece x forces
    its expected occurrences onto x's best ALTERNATIVE segmentation by
    the remaining vocabulary; loss(x) = c_x · (logp(x) − alt(x)).
    Single characters are never pruned; the keep set shrinks by
    ``shrink_factor`` per round, never below ``target``."""
    multi = [p for p in logp if len(p) > 1]
    if not multi:
        return dict(logp)
    losses = []
    for p in multi:
        saved = logp.pop(p)
        _, alt = viterbi_segment(p, logp, max_piece_len)
        logp[p] = saved
        c = expected.get(p, 0.0)
        losses.append((c * (saved - alt), p))
    losses.sort(key=lambda t: (-t[0], t[1]))
    n_chars = len(logp) - len(multi)
    keep_multi = max(
        target - n_chars, int(len(multi) * shrink_factor)
    )
    kept = {p for _, p in losses[: max(keep_multi, 0)]}
    return {
        p: lp for p, lp in logp.items() if len(p) == 1 or p in kept
    }


def learn_unigram_pieces(
    word_freqs: Mapping[str, int],
    vocab_size: int = 8000,
    seed_size: int = 100_000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink_factor: float = 0.75,
    _words_df: Optional[DataFrame] = None,
) -> dict:
    """Fit unigram-LM piece log-probs from a word-frequency dict — the
    pure-driver learner (and the reference :func:`train_unigram` is
    pinned against; pass ``_words_df`` to run every E-step
    distributed). Returns ``{piece: logp}`` of at most ``vocab_size``
    multi-char + char pieces (chars always kept; the char floor means
    the result can exceed ``vocab_size`` when the corpus has more
    characters than that)."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    # seed: substring counts (frequency-weighted), top seed_size multi
    # + all chars — the local mirror of unigram_seed_pieces
    ctr: dict = {}
    for word, cnt in word_freqs.items():
        n = len(word)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = word[i:j]
                ctr[p] = ctr.get(p, 0.0) + cnt
    multi = sorted(
        ((p, c) for p, c in ctr.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    seed = dict(multi)
    seed.update({p: c for p, c in ctr.items() if len(p) == 1})
    total = sum(seed.values())
    logp = {p: math.log(c / total) for p, c in seed.items()}

    def one_estep(cur):
        if _words_df is not None:
            return _estep_spark(_words_df, cur, max_piece_len)
        return _estep_local(word_freqs, cur, max_piece_len)

    while True:
        for _ in range(max(em_iters, 1)):
            expected, _ = one_estep(logp)
            # pieces can drop out of every lattice after an M-step;
            # they carry 0 expected mass and die in the next prune
            logp = _mstep({p: expected.get(p, 0.0) for p in logp})
        if len(logp) <= vocab_size:
            break
        pruned = _prune(
            logp, expected, vocab_size, shrink_factor, max_piece_len
        )
        if len(pruned) >= len(logp):
            break  # nothing prunable left (char floor)
        logp = pruned
    return logp


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 8000,
    seed_size: int = 100_000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink_factor: float = 0.75,
    max_word_types: int = 200_000,
    min_count: int = 1,
) -> dict:
    """Train a unigram-LM tokenizer on a corpus column — fully
    distributed where distribution pays: ONE corpus-sized aggregate
    (the shared BPE word-frequency collapse), distributed seed
    enumeration, and a distributed forward–backward E-step per EM
    iteration over the PERSISTED distinct-word table; only the
    vocabulary-sized M-step/prune arithmetic runs on the driver (the
    :func:`..tokenizer.train_bpe` split). Returns ``{piece: logp}``
    for :func:`with_unigram_token_ids` / :func:`save_unigram_vocab`.
    """
    from patito_spark.functions.cache import tracked_persist
    from patito_spark.operators.tokenizer import bpe_word_frequencies

    words = tracked_persist(
        bpe_word_frequencies(
            df,
            text_col=text_col,
            max_word_types=max_word_types,
            min_count=min_count,
        )
    )
    try:
        rows = words.collect()  # bounded by max_word_types
        word_freqs = {r["word"]: r["count"] for r in rows}
        if not word_freqs:
            raise ValueError("train_unigram: empty corpus")
        return learn_unigram_pieces(
            word_freqs,
            vocab_size=vocab_size,
            seed_size=seed_size,
            max_piece_len=max_piece_len,
            em_iters=em_iters,
            shrink_factor=shrink_factor,
            _words_df=words,
        )
    finally:
        words.unpersist()


def build_unigram_vocab(logp: Mapping[str, float]) -> dict:
    """``{piece: id}`` with the SentencePiece id convention: ``<unk>``
    is 0, then pieces by descending score, ties bytewise — so two fits
    of the same corpus assign identical ids."""
    out = {UNK_PIECE: 0}
    for i, (p, _) in enumerate(
        sorted(logp.items(), key=lambda t: (-t[1], t[0]))
    ):
        out[p] = i + 1
    return out


def save_unigram_vocab(logp: Mapping[str, float], path: str) -> None:
    """The public SentencePiece ``.vocab`` text format: one
    ``piece<TAB>score`` line per id, line number = id."""
    inv = {i: p for p, i in build_unigram_vocab(logp).items()}
    with open(path, "w", encoding="utf-8") as fh:
        for i in range(len(inv)):
            p = inv[i]
            score = 0.0 if p == UNK_PIECE else logp[p]
            fh.write(f"{p}\t{score}\n")


def load_unigram_vocab(path: str) -> Tuple[dict, dict]:
    """Read a ``.vocab`` file back: ``(logp, piece->id)``."""
    logp, ids = {}, {}
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            piece, _, score = line.rstrip("\n").partition("\t")
            ids[piece] = i
            if piece != UNK_PIECE:
                logp[piece] = float(score)
    return logp, ids


def with_unigram_token_ids(
    df: DataFrame,
    logp: Mapping[str, float],
    text_col: str = "text",
    out_col: str = "token_ids",
    max_piece_len: int = 8,
) -> DataFrame:
    """Append Viterbi-segmented piece ids (the 1-best encoding). The
    vocabulary broadcasts once; segmentation runs per DISTINCT word in
    each Arrow batch (an LRU-less per-batch memo — web text repeats
    words heavily), ids from :func:`build_unigram_vocab`; OOV
    characters map to ``<unk>`` (id 0)."""
    from patito_spark.operators.tokenizer import (
        _pretokenize,
        bytes_to_unicode,
    )

    ids = build_unigram_vocab(logp)
    bc = df.sparkSession.sparkContext.broadcast((dict(logp), ids))
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()), True)]
    )
    names = [f.name for f in df.schema.fields]

    def encode(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        lp, vocab_ids = bc.value
        b2u = bytes_to_unicode()
        memo: dict = {}

        def word_ids(word: str) -> list:
            got = memo.get(word)
            if got is None:
                pieces, _ = viterbi_segment(word, lp, max_piece_len)
                got = [vocab_ids.get(p, 0) for p in pieces]
                memo[word] = got
            return got

        for pdf in batches:
            col = []
            for text in pdf[text_col]:
                if text is None:
                    col.append(None)
                    continue
                out: list = []
                for w in _pretokenize(text):
                    out.extend(
                        word_ids(
                            "".join(b2u[c] for c in w.encode("utf-8"))
                        )
                    )
                col.append(out)
            out_pdf = pdf[names].copy()
            out_pdf[out_col] = col
            yield out_pdf

    return df.mapInPandas(encode, schema=schema)


def with_unigram_token_count(
    df: DataFrame,
    logp: Mapping[str, float],
    text_col: str = "text",
    out_col: str = "n_unigram_tokens",
    max_piece_len: int = 8,
) -> DataFrame:
    """Append the Viterbi piece COUNT (the budget number packing and
    mixing consume) without materializing ids."""
    from patito_spark.operators.tokenizer import (
        _pretokenize,
        bytes_to_unicode,
    )

    bc = df.sparkSession.sparkContext.broadcast(dict(logp))
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.LongType(), True)]
    )
    names = [f.name for f in df.schema.fields]

    def count(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        lp = bc.value
        b2u = bytes_to_unicode()
        memo: dict = {}

        def word_count(word: str) -> int:
            got = memo.get(word)
            if got is None:
                got = len(viterbi_segment(word, lp, max_piece_len)[0])
                memo[word] = got
            return got

        for pdf in batches:
            col = []
            for text in pdf[text_col]:
                if text is None:
                    col.append(None)
                    continue
                col.append(
                    sum(
                        word_count(
                            "".join(b2u[c] for c in w.encode("utf-8"))
                        )
                        for w in _pretokenize(text)
                    )
                )
            out_pdf = pdf[names].copy()
            out_pdf[out_col] = pd.array(col, dtype="Int64")
            yield out_pdf

    return df.mapInPandas(count, schema=schema)


def sample_segment(
    word: str,
    logp: Mapping[str, float],
    max_piece_len: int,
    alpha: float,
    rng,
) -> list:
    """One sampled segmentation from ``p(seg | word)^α / Z`` —
    forward-filtering backward-sampling over the lattice (the paper's
    subword-regularization draw; ``α → ∞`` recovers Viterbi, small α
    flattens toward uniform over segmentations). OOV single characters
    get the ``UNK_LOG_PROB`` floor, as in :func:`viterbi_segment`."""
    import math as _math

    n = len(word)
    alpha = float(alpha)
    # forward mass in log space under the tempered scores
    fwd = [_NEG_INF] * (n + 1)
    fwd[0] = 0.0
    arcs: list = [[] for _ in range(n + 1)]  # arcs[j] = [(i, piece, a*lp)]
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i == 1:
                    lp = UNK_LOG_PROB
                else:
                    continue
            score = alpha * lp
            arcs[j].append((i, piece, score))
            if fwd[i] != _NEG_INF:
                fwd[j] = _logsumexp2(fwd[j], fwd[i] + score)
    if fwd[n] == _NEG_INF:
        raise ValueError(f"unsegmentable word {word!r}")
    pieces = []
    j = n
    while j > 0:
        total = fwd[j]
        r = rng.random()
        acc = 0.0
        chosen = None
        for i, piece, score in arcs[j]:
            if fwd[i] == _NEG_INF:
                continue
            acc += _math.exp(fwd[i] + score - total)
            if r < acc:
                chosen = (i, piece)
                break
        if chosen is None:  # float-sum slack: take the last valid arc
            for i, piece, score in reversed(arcs[j]):
                if fwd[i] != _NEG_INF:
                    chosen = (i, piece)
                    break
        i, piece = chosen
        pieces.append(piece)
        j = i
    pieces.reverse()
    return pieces


def with_unigram_sampled_ids(
    df: DataFrame,
    logp: Mapping[str, float],
    text_col: str = "text",
    out_col: str = "token_ids",
    max_piece_len: int = 8,
    alpha: float = 0.2,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Append SAMPLED piece ids — the paper's subword regularization:
    each epoch's seed draws a different segmentation of the same text,
    so the model sees segmentation variants as augmentation. The draw
    is seeded per (seed, document id), NEVER rand(): the same
    (seed, doc) pair yields the same ids at any partitioning or retry
    (the repo's determinism contract), and a new epoch = a new seed."""
    import zlib as _zlib

    from patito_spark.operators.tokenizer import (
        _pretokenize,
        bytes_to_unicode,
    )

    ids = build_unigram_vocab(logp)
    bc = df.sparkSession.sparkContext.broadcast((dict(logp), ids))
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()), True)]
    )
    names = [f.name for f in df.schema.fields]

    def encode(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import random

        import pandas as pd

        lp, vocab_ids = bc.value
        b2u = bytes_to_unicode()

        for pdf in batches:
            col = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    col.append(None)
                    continue
                rng = random.Random(
                    (seed << 32)
                    ^ _zlib.crc32(str(doc_id).encode("utf-8"))
                )
                out: list = []
                for w in _pretokenize(text):
                    word = "".join(b2u[c] for c in w.encode("utf-8"))
                    out.extend(
                        vocab_ids.get(p, 0)
                        for p in sample_segment(
                            word, lp, max_piece_len, alpha, rng
                        )
                    )
                col.append(out)
            out_pdf = pdf[names].copy()
            out_pdf[out_col] = col
            yield out_pdf

    return df.mapInPandas(encode, schema=schema)


def unigram_decode_ids(ids, logp: Mapping[str, float]) -> str:
    """Invert :func:`with_unigram_token_ids`: ids → pieces → raw bytes
    → text (pieces live in the GPT-2 byte alphabet, which is
    bijective, so in-vocabulary round-trips are exact). ``<unk>`` (id
    0) decodes to U+FFFD — the encoder only emits it for characters
    the vocabulary never saw, so the original bytes are genuinely
    gone."""
    from patito_spark.operators.tokenizer import bytes_to_unicode

    inv = {i: p for p, i in build_unigram_vocab(logp).items()}
    u2b = {c: b for b, c in bytes_to_unicode().items()}
    out = bytearray()
    for i in ids:
        piece = inv.get(i)
        if piece is None:
            raise ValueError(
                f"id {i} is not in this vocab ({len(inv)} entries)"
            )
        if piece == UNK_PIECE:
            out.extend("�".encode("utf-8"))
            continue
        out.extend(u2b[c] for c in piece)
    return out.decode("utf-8", errors="replace")
