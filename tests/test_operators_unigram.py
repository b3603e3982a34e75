"""Unigram-LM (SentencePiece-style) tokenizer: lattice math pinned
against brute-force enumeration, distributed E-step vs the local
reference, training determinism, artifacts, encoding."""

from __future__ import annotations

import math

import pytest

from patito_spark.operators.unigram import (
    UNK_PIECE,
    _estep_local,
    _estep_spark,
    _forward_backward,
    build_unigram_vocab,
    learn_unigram_pieces,
    load_unigram_vocab,
    save_unigram_vocab,
    train_unigram,
    viterbi_segment,
    with_unigram_token_count,
    with_unigram_token_ids,
)

LOGP = {
    "a": math.log(0.2),
    "b": math.log(0.1),
    "ab": math.log(0.3),
    "ba": math.log(0.15),
    "aba": math.log(0.2),
    "bb": math.log(0.05),
}
MAXLEN = 3


def all_segmentations(word, logp, max_len):
    if not word:
        yield []
        return
    for ln in range(1, min(max_len, len(word)) + 1):
        p = word[:ln]
        if p in logp:
            for rest in all_segmentations(word[ln:], logp, max_len):
                yield [p] + rest


@pytest.mark.parametrize("word", ["abab", "ababa", "bbaab", "a", "ab"])
def test_forward_backward_matches_enumeration(word):
    segs = list(all_segmentations(word, LOGP, MAXLEN))
    probs = [math.exp(sum(LOGP[p] for p in s)) for s in segs]
    z = sum(probs)
    want = {}
    for s, pr in zip(segs, probs):
        for p in s:
            want[p] = want.get(p, 0.0) + pr / z
    got = {}
    ll = _forward_backward(word, 1, LOGP, MAXLEN, got)
    assert ll == pytest.approx(math.log(z), rel=1e-12)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-12), p
    # frequency weighting scales linearly
    got7 = {}
    ll7 = _forward_backward(word, 7, LOGP, MAXLEN, got7)
    assert ll7 == pytest.approx(7 * ll, rel=1e-12)
    for p in want:
        assert got7[p] == pytest.approx(7 * got[p], rel=1e-12)


@pytest.mark.parametrize("word", ["abab", "ababa", "bbaab", "aba"])
def test_viterbi_matches_enumeration_argmax(word):
    segs = list(all_segmentations(word, LOGP, MAXLEN))
    best = max(segs, key=lambda s: sum(LOGP[p] for p in s))
    best_score = sum(LOGP[p] for p in best)
    pieces, score = viterbi_segment(word, LOGP, MAXLEN)
    assert score == pytest.approx(best_score, rel=1e-12)
    assert sum(LOGP[p] for p in pieces) == pytest.approx(
        best_score, rel=1e-12
    )
    assert "".join(pieces) == word


def test_viterbi_oov_char_floor():
    pieces, score = viterbi_segment("azb", LOGP, MAXLEN)
    assert "".join(pieces) == "azb"
    assert "z" in pieces
    assert score < -15  # the unk floor dominates


def test_unsegmentable_word_clear_error():
    with pytest.raises(ValueError, match="unsegmentable"):
        _forward_backward("az", 1, LOGP, MAXLEN, {})


WORDS = {
    "abab": 16,
    "ababa": 8,
    "bbaab": 4,
    "aab": 2,
    "babb": 1,
}


def test_distributed_estep_matches_local(spark):
    words_df = spark.createDataFrame(
        list(WORDS.items()), "word string, count long"
    )
    exp_l, ll_l = _estep_local(WORDS, LOGP, MAXLEN)
    exp_s, ll_s = _estep_spark(words_df.repartition(4), LOGP, MAXLEN)
    assert ll_s == pytest.approx(ll_l, rel=1e-9)
    assert set(exp_s) == set(exp_l)
    for p in exp_l:
        assert exp_s[p] == pytest.approx(exp_l[p], rel=1e-9), p


def test_learn_deterministic_and_bounded():
    lp1 = learn_unigram_pieces(WORDS, vocab_size=6, seed_size=50,
                               max_piece_len=3)
    lp2 = learn_unigram_pieces(WORDS, vocab_size=6, seed_size=50,
                               max_piece_len=3)
    assert lp1 == lp2
    # chars always kept; char floor bounds the vocab from below
    assert {"a", "b"} <= set(lp1)
    assert len(lp1) <= max(6, 2)
    assert all(v < 0 for v in lp1.values())


def test_train_matches_local_learner(spark):
    rows = []
    doc_id = 0
    for w, c in WORDS.items():
        # spell the b2u alphabet implicitly: ascii words survive the
        # byte-to-unicode map unchanged except the leading-space mark,
        # so build texts whose pretokenization yields exactly WORDS
        for _ in range(c):
            rows.append((doc_id, w))
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = train_unigram(
        df, vocab_size=6, seed_size=50, max_piece_len=3,
        max_word_types=100,
    )
    from patito_spark.operators.tokenizer import bpe_word_frequencies

    wf = {
        r["word"]: r["count"]
        for r in bpe_word_frequencies(df).collect()
    }
    want = learn_unigram_pieces(
        wf, vocab_size=6, seed_size=50, max_piece_len=3
    )
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-6), p


def test_vocab_ids_and_artifact_round_trip(tmp_path):
    lp = learn_unigram_pieces(WORDS, vocab_size=6, seed_size=50,
                              max_piece_len=3)
    ids = build_unigram_vocab(lp)
    assert ids[UNK_PIECE] == 0
    assert sorted(ids.values()) == list(range(len(ids)))
    path = str(tmp_path / "uni.vocab")
    save_unigram_vocab(lp, path)
    lp2, ids2 = load_unigram_vocab(path)
    assert ids2 == ids
    for p in lp:
        assert lp2[p] == pytest.approx(lp[p], rel=1e-12)


def test_encoding_ids_and_counts(spark):
    lp = learn_unigram_pieces(WORDS, vocab_size=8, seed_size=50,
                              max_piece_len=3)
    ids = build_unigram_vocab(lp)
    inv = {i: p for p, i in ids.items()}
    df = spark.createDataFrame(
        [(1, "abab ababa"), (2, None), (3, "abab")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in with_unigram_token_ids(
            df, lp, max_piece_len=3
        ).collect()
    }
    assert out[2].token_ids is None
    # decode identity on in-vocabulary text: pieces concatenate back
    assert "".join(inv[i] for i in out[3].token_ids) == "abab"
    # the leading-space marker of word 2 was never in training, so it
    # encodes as <unk> (id 0) and the rest decodes exactly
    decoded1 = [inv[i] for i in out[1].token_ids]
    assert decoded1.count(UNK_PIECE) == 1
    assert "".join(decoded1).replace(UNK_PIECE, "") == "abababab" + "a"
    counts = {
        r.doc_id: r.n_unigram_tokens
        for r in with_unigram_token_count(
            df, lp, max_piece_len=3
        ).collect()
    }
    assert counts[2] is None
    assert counts[1] == len(out[1].token_ids)
    assert counts[3] == len(out[3].token_ids)


class TestSampledSegmentation:
    def test_high_alpha_recovers_viterbi(self):
        import random

        from patito_spark.operators.unigram import sample_segment

        rng = random.Random(7)
        for word in ("abab", "ababa", "bbaab"):
            want, _ = viterbi_segment(word, LOGP, MAXLEN)
            for _ in range(5):
                got = sample_segment(word, LOGP, MAXLEN, 1000.0, rng)
                assert got == want, word

    def test_sampling_distribution_matches_tempered_posterior(self):
        import math
        import random
        from collections import Counter

        from patito_spark.operators.unigram import sample_segment

        word, alpha = "abab", 0.7
        segs = list(all_segmentations(word, LOGP, MAXLEN))
        weights = [
            math.exp(alpha * sum(LOGP[p] for p in s)) for s in segs
        ]
        z = sum(weights)
        want = {tuple(s): w / z for s, w in zip(segs, weights)}
        rng = random.Random(123)
        n = 20_000
        got = Counter(
            tuple(sample_segment(word, LOGP, MAXLEN, alpha, rng))
            for _ in range(n)
        )
        assert set(got) <= set(want)
        for seg, p in want.items():
            freq = got[seg] / n
            # 4-sigma binomial band
            sigma = math.sqrt(p * (1 - p) / n)
            assert abs(freq - p) < 4 * sigma + 1e-3, (seg, freq, p)

    def test_dataframe_sampling_deterministic_and_epochwise(self, spark):
        from patito_spark.operators.unigram import (
            with_unigram_sampled_ids,
        )

        lp = learn_unigram_pieces(WORDS, vocab_size=8, seed_size=50,
                                  max_piece_len=3)
        ids = build_unigram_vocab(lp)
        inv = {i: p for p, i in ids.items()}
        df = spark.createDataFrame(
            [(i, "abab ababa bbaab") for i in range(30)] + [(99, None)],
            "doc_id long, text string",
        )
        a = {
            r.doc_id: r.token_ids
            for r in with_unigram_sampled_ids(
                df, lp, max_piece_len=3, alpha=0.3, seed=1
            ).collect()
        }
        b = {
            r.doc_id: r.token_ids
            for r in with_unigram_sampled_ids(
                df.repartition(8), lp, max_piece_len=3, alpha=0.3, seed=1
            ).collect()
        }
        assert a == b  # partitioning-invariant (seeded per doc)
        assert a[99] is None
        c = {
            r.doc_id: r.token_ids
            for r in with_unigram_sampled_ids(
                df, lp, max_piece_len=3, alpha=0.3, seed=2
            ).collect()
        }
        assert any(a[d] != c[d] for d in range(30))  # new epoch varies
        # draws differ ACROSS docs under one seed too (augmentation,
        # not one shared sample)
        assert len({tuple(v) for d, v in a.items() if v}) > 1
        # every sampled id decodes to a valid piece covering the text
        for d in range(30):
            decoded = "".join(
                inv[i] for i in a[d] if inv[i] != UNK_PIECE
            )
            assert "ababababa" in decoded.replace("Ġ", "")


def test_decode_round_trips(spark):
    """encode -> decode recovers the original text exactly for
    in-vocabulary input, for BOTH tokenizer families (the byte
    alphabet is bijective)."""
    from patito_spark.operators.tokenizer import (
        bpe_decode_ids,
        build_bpe_vocab,
        train_bpe,
        with_bpe_token_ids,
    )
    from patito_spark.operators.unigram import unigram_decode_ids

    texts = ["abab ababa bbaab", "aab babb abab", "café abab"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=20)
    vocab = build_bpe_vocab(merges)
    out = {
        r.doc_id: r.token_ids
        for r in with_bpe_token_ids(df, merges, vocab).collect()
    }
    for i, t in enumerate(texts):
        assert bpe_decode_ids(out[i], vocab) == t
    with pytest.raises(ValueError, match="different artifacts"):
        bpe_decode_ids([10 ** 9], vocab)

    lp = train_unigram(df, vocab_size=64, seed_size=200, max_piece_len=4)
    uni = {
        r.doc_id: r.token_ids
        for r in with_unigram_token_ids(df, lp, max_piece_len=4).collect()
    }
    for i, t in enumerate(texts):
        assert unigram_decode_ids(uni[i], lp) == t
    with pytest.raises(ValueError, match="not in this vocab"):
        unigram_decode_ids([10 ** 9], lp)
