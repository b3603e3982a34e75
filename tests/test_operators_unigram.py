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
