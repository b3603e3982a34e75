"""Byte-level BPE token accounting: algorithm, artifact parsing, the
distributed counter, and the mix_corpora budget wiring."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.tokenizer import (
    bpe_token_count,
    bpe_tokens,
    bytes_to_unicode,
    load_bpe_merges,
    with_bpe_token_count,
)

# A tiny GPT-2-format merge list (rank = line order). 'Ġ' is the
# bytes_to_unicode image of the space byte — space-prefixed words are
# single pre-tokens in the GPT-2 scheme, exactly like the real artifact.
MERGES_TXT = """#version: 0.2-test
h e
l l
he ll
hell o
Ġ t
Ġt he
w o
wo r
wor l
worl d
"""


@pytest.fixture(scope="module")
def merges(tmp_path_factory):
    p = tmp_path_factory.mktemp("bpe") / "merges.txt"
    p.write_text(MERGES_TXT, encoding="utf-8")
    return load_bpe_merges(str(p))


def test_load_bpe_merges_ranks(merges):
    assert merges[("h", "e")] == 0
    assert merges[("hell", "o")] == 3
    assert len(merges) == 10


def test_bytes_to_unicode_is_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("a")] == "a"  # printable ASCII maps to itself
    assert m[ord(" ")] == "Ġ"  # the 'Ġ' space convention


def test_bpe_merge_order_hand_checked(merges):
    # "hello": h e l l o -> (he) l l o -> (he)(ll) o -> (hell) o -> (hello)
    assert bpe_tokens("hello", merges) == ["hello"]
    # "help": h e l p -> (he) l p; no further merges
    assert bpe_tokens("help", merges) == ["he", "l", "p"]
    # space-prefixed pre-token merges through the Ġ rules
    assert bpe_tokens("hello the", merges) == ["hello", "Ġthe"]
    # unseen word falls back to one symbol per byte
    assert bpe_tokens("xyz", merges) == ["x", "y", "z"]
    assert bpe_token_count("hello the world", merges) == 1 + 1 + 2


def test_pretokenizer_contractions_digits_punct(merges):
    # GPT-2 pre-token split: contraction suffix, digit runs, punctuation
    toks = bpe_tokens("it's 2026!", merges)
    # it -> i,t ; 's -> ',s ; Ġ2026 -> per byte; ! -> !
    assert "".join(toks).replace("Ġ", " ") == "it's 2026!"
    assert bpe_token_count("don't", merges) == len(bpe_tokens("don", merges)) + len(
        bpe_tokens("'t", merges)
    )


def test_multibyte_utf8_counts(merges):
    # é is 2 UTF-8 bytes -> 2 unmerged symbols; no merges defined for them
    assert bpe_token_count("é", merges) == 2


@pytest.mark.parametrize(
    "text",
    [
        "foo_bar",  # the regression: '_' used to match NO alternative
        "snake_case_name = _private",
        "__dunder__ and a_b_c",
        "x_1 + y_2",
        "tab\tand  spaces",
        "it's 2026! Ⅻ² ½x",  # Nl/No numerics group with numbers, not letters
    ],
)
def test_pretokenizer_is_lossless(merges, text):
    # Byte-level BPE must be a lossless encoding: rejoining the tokens
    # (undoing the byte->unicode map) reproduces the input exactly.
    b2u = bytes_to_unicode()
    u2b = {v: k for k, v in b2u.items()}
    toks = bpe_tokens(text, merges)
    rejoined = bytes(u2b[ch] for tok in toks for ch in tok).decode("utf-8")
    assert rejoined == text


def test_pretokenizer_numeric_class_matches_published():
    # '²' (No) and 'Ⅻ' (Nl) are \p{N} in the published GPT-2 pattern:
    # they must run with digits, not letters, and '_' runs with
    # symbols. The Nl/No handling goes through the translate-and-slice
    # path, so also pin that sliced tokens carry the ORIGINAL bytes.
    from patito_spark.operators.tokenizer import _pretokenize

    assert _pretokenize("a²b") == ["a", "²", "b"]
    assert _pretokenize("x2²3") == ["x", "2²3"]
    assert _pretokenize("Ⅻ½ mixed") == ["Ⅻ½", " mixed"]
    assert _pretokenize("a_b") == ["a", "_", "b"]
    assert _pretokenize("foo _bar") == ["foo", " _", "bar"]
    # non-ASCII letters still group as letters through the slice path
    assert _pretokenize("café 2²") == ["café", " 2²"]


def test_with_bpe_token_count_matches_reference(spark, merges):
    texts = [
        "hello the world",
        "help hello hello",
        "it's 2026! worl d",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.n_bpe_tokens
        for r in with_bpe_token_count(df, merges).collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert out[i] is None
        else:
            assert out[i] == bpe_token_count(t, merges), t
    # all original columns pass through
    cols = with_bpe_token_count(df, merges).columns
    assert cols == ["doc_id", "text", "n_bpe_tokens"]


def test_mix_corpora_budgets_in_bpe_tokens(spark, merges):
    """The verdict-7 wiring: tokenize once, budget in model tokens."""
    from patito_spark.operators.mixing import mix_corpora, mixture_stats

    rows_a = [(i, "hello the world") for i in range(40)]  # 4 BPE toks each
    rows_b = [(100 + i, "xyz xyz") for i in range(40)]    # 7 BPE toks each
    a = with_bpe_token_count(
        spark.createDataFrame(rows_a, "doc_id long, text string"), merges
    )
    b = with_bpe_token_count(
        spark.createDataFrame(rows_b, "doc_id long, text string"), merges
    )
    out = mix_corpora(
        {"a": a, "b": b},
        {"a": 1.0, "b": 1.0},
        token_budget=2 * 40 * 4,
        token_count_mode="n_bpe_tokens",
        hash_mode="portable",
    )
    plan = {p["source"]: p for p in out["plan"]}
    assert plan["a"]["total_tokens"] == 40 * 4
    assert plan["b"]["total_tokens"] == 40 * 7
    # a's share (160 tokens) needs exactly one epoch of a
    assert plan["a"]["epochs"] == 1 and plan["a"]["remainder_fraction"] == 0
    # b's share (160) is 160/280 of one epoch
    assert plan["b"]["epochs"] == 0
    assert plan["b"]["remainder_fraction"] == pytest.approx(160 / 280)
    stats = {
        r.mix_source: r.n_tokens
        for r in mixture_stats(
            out["mixed"], token_count_mode="n_bpe_tokens"
        ).collect()
    }
    assert stats["a"] == 160  # the full epoch, priced in BPE tokens


def test_load_rejects_malformed(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("a b c\n")
    with pytest.raises(ValueError, match="malformed"):
        load_bpe_merges(str(p))
    p2 = tmp_path / "empty.txt"
    p2.write_text("#version: only\n")
    with pytest.raises(ValueError, match="no merges"):
        load_bpe_merges(str(p2))


VOCAB = {
    "hello": 0, "he": 1, "l": 2, "p": 3, "Ġthe": 4, "world": 5, "Ġ": 6,
    "x": 7, "y": 8, "z": 9, "Ġworld": 10,
}


def test_bpe_token_ids_reference(merges, tmp_path):
    import json

    from patito_spark.operators.tokenizer import (
        bpe_token_ids,
        load_bpe_vocab,
    )

    p = tmp_path / "vocab.json"
    p.write_text(json.dumps(VOCAB), encoding="utf-8")
    vocab = load_bpe_vocab(str(p))
    assert bpe_token_ids("hello", merges, vocab) == [0]
    assert bpe_token_ids("help", merges, vocab) == [1, 2, 3]
    # "hello the" -> hello, Ġthe
    assert bpe_token_ids("hello the", merges, vocab) == [0, 4]
    with pytest.raises(ValueError, match="not in vocab"):
        bpe_token_ids("qq", merges, vocab)
    assert bpe_token_ids("qq", merges, vocab, unk_id=99) == [99, 99]


def test_with_bpe_token_ids_matches_reference(spark, merges):
    from patito_spark.operators.tokenizer import (
        bpe_token_ids,
        with_bpe_token_ids,
    )

    texts = ["hello the world", "help hello", "xyz", "", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.token_ids
        for r in with_bpe_token_ids(df, merges, VOCAB, unk_id=-1).collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert out[i] is None
        else:
            assert out[i] == bpe_token_ids(t, merges, VOCAB, unk_id=-1), t
    assert dict(
        with_bpe_token_ids(df, merges, VOCAB, unk_id=-1).dtypes
    )["token_ids"] == "array<int>"


def test_load_bpe_vocab_rejects_bad(tmp_path):
    import json

    from patito_spark.operators.tokenizer import load_bpe_vocab

    p = tmp_path / "bad.json"
    p.write_text(json.dumps([1, 2]))
    with pytest.raises(ValueError, match="token->id"):
        load_bpe_vocab(str(p))


# ---------------------------------------------------------------------- #
# BPE training (round 12)                                                 #
# ---------------------------------------------------------------------- #


def _naive_learn(word_freqs, n_merges):
    """Full-recount reference learner (the published greedy loop,
    recounting every pair each iteration) — the bit-exact oracle for the
    incremental learner's bookkeeping."""
    import collections

    words = {}
    for w, c in word_freqs.items():
        t = tuple(w)
        words[t] = words.get(t, 0) + c
    ranks = {}
    for _ in range(n_merges):
        pairs = collections.Counter()
        for parts, c in words.items():
            for p in zip(parts, parts[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        ranks[best] = len(ranks)
        a, b = best
        ab = a + b
        merged = {}
        for parts, c in words.items():
            out = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        words = merged
    return ranks


def _corpus_word_freqs(texts):
    import collections

    from patito_spark.operators.tokenizer import (
        _pretokenize,
        bytes_to_unicode,
    )

    b2u = bytes_to_unicode()
    freq = collections.Counter()
    for t in texts:
        for w in _pretokenize(t):
            freq["".join(b2u[c] for c in w.encode("utf-8"))] += 1
    return dict(freq)


def test_learn_bpe_merges_matches_naive_reference():
    from patito_spark.operators.tokenizer import learn_bpe_merges

    texts = [
        "the cat sat on the mat, the cat sat again",
        "low lower lowest newer newest wider widest",
        "aaa aaaa aaaaa overlap overlap overlap",
        "snake_case_names and CamelCase and 1234 numbers",
    ]
    wf = _corpus_word_freqs(texts)
    for n in (1, 5, 25, 200):
        assert learn_bpe_merges(wf, n) == _naive_learn(wf, n)


def test_learn_bpe_merges_matches_naive_randomized():
    import random

    from patito_spark.operators.tokenizer import learn_bpe_merges

    rng = random.Random(42)
    for trial in range(20):
        wf = {}
        for _ in range(rng.randint(1, 40)):
            w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
            wf[w] = wf.get(w, 0) + rng.randint(1, 9)
        n = rng.randint(1, 30)
        assert learn_bpe_merges(wf, n) == _naive_learn(wf, n), (trial, wf, n)


def test_learn_bpe_overlapping_pairs_exact():
    """'aaaa' holds three overlapping (a,a) occurrences but greedy
    left-to-right replacement merges two; bookkeeping must count the
    rebuilt word, not arithmetic over occurrences."""
    from patito_spark.operators.tokenizer import learn_bpe_merges

    ranks = learn_bpe_merges({"aaaa": 3}, 2)
    assert ranks == {("a", "a"): 0, ("aa", "aa"): 1}


def test_bpe_word_frequencies_matches_driver_counter(spark, sf_dir):
    from patito_spark.operators.tokenizer import bpe_word_frequencies

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    texts = [r.text for r in docs.select("text").collect() if r.text is not None]
    got = {
        r["word"]: r["count"]
        for r in bpe_word_frequencies(docs, "text").collect()
    }
    assert got == _corpus_word_freqs(texts)


def test_bpe_word_frequencies_topk_deterministic(spark):
    from patito_spark.operators.tokenizer import bpe_word_frequencies

    df = spark.createDataFrame(
        [("b b c c a a x",), ("y z w v u t s",)], "text string"
    )
    rows = bpe_word_frequencies(df, "text", max_word_types=3).collect()
    # words are in the mapped alphabet (space -> 'Ġ'); the doubled words
    # win, and the count-1 tie breaks word-ascending ('b' < 'y' < 'Ġ…')
    assert sorted((r["word"], r["count"]) for r in rows) == [
        ("b", 1), ("Ġa", 2), ("Ġc", 2),
    ]


def test_train_bpe_end_to_end_and_artifacts(spark, sf_dir, tmp_path):
    from patito_spark.operators.tokenizer import (
        build_bpe_vocab,
        load_bpe_merges,
        save_bpe_merges,
        train_bpe,
        with_bpe_token_count,
        with_bpe_token_ids,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    small = train_bpe(docs, n_merges=30)
    # the synthetic corpus holds ~61 distinct words; asking for far more
    # merges than exist must terminate cleanly at pair exhaustion
    big = train_bpe(docs, n_merges=10_000)
    assert len(small) == 30 and 30 < len(big) < 10_000
    # a longer table extends, never rewrites, the shorter one
    assert all(big[p] == r for p, r in small.items())

    # merges.txt round-trip
    path = str(tmp_path / "merges.txt")
    save_bpe_merges(big, path)
    assert load_bpe_merges(path) == big

    # more merges never increase the token count (prefix-run argument)
    counted = (
        with_bpe_token_count(docs, small, out_col="n_small")
        .transform(lambda d: with_bpe_token_count(d, big, out_col="n_big"))
        .select("n_small", "n_big")
        .collect()
    )
    assert all(r.n_big <= r.n_small for r in counted)
    assert any(r.n_big < r.n_small for r in counted)

    # the implied vocab covers every token the merges can emit
    vocab = build_bpe_vocab(big)
    ids = with_bpe_token_ids(docs, big, vocab, unk_id=None)
    row = ids.select(F.sum(F.size("token_ids")).alias("s")).first()
    assert row.s > 0


def test_save_bpe_merges_rejects_sparse_ranks(tmp_path):
    from patito_spark.operators.tokenizer import save_bpe_merges

    with pytest.raises(ValueError, match="dense"):
        save_bpe_merges({("a", "b"): 0, ("b", "c"): 2}, str(tmp_path / "m.txt"))


def test_save_bpe_vocab_roundtrip(tmp_path):
    from patito_spark.operators.tokenizer import (
        build_bpe_vocab,
        load_bpe_vocab,
        save_bpe_vocab,
    )

    vocab = build_bpe_vocab({("a", "b"): 0, ("ab", "c"): 1})
    path = str(tmp_path / "vocab.json")
    save_bpe_vocab(vocab, path)
    assert load_bpe_vocab(path) == vocab
    with pytest.raises(ValueError, match="duplicate ids"):
        save_bpe_vocab({"a": 1, "b": 1}, path)
