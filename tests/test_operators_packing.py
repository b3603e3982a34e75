"""Chunking + sequence packing (context-window prep) tests."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.packing import chunk_documents, pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    words = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    return spark.createDataFrame(
        [
            (1, words(10, "a")),
            (2, words(25, "b")),
            (3, words(3, "c")),
            (4, words(40, "d")),
        ],
        "doc_id long, text string",
    )


def test_chunk_documents_covers_all_tokens(docs):
    out = chunk_documents(docs, max_tokens=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2 has 25 tokens -> chunks of 10/10/5
    sizes = [r.n_tokens for r in sorted(by_doc[2], key=lambda r: r.chunk_id)]
    assert sizes == [10, 10, 5]
    # reassembling the chunks in order restores the document
    for doc_id, rows in by_doc.items():
        joined = " ".join(
            r.chunk_text for r in sorted(rows, key=lambda r: r.chunk_id)
        )
        original = {r.doc_id: r.text for r in docs.collect()}[doc_id]
        assert joined == original


def test_chunk_documents_overlap(docs):
    out = chunk_documents(
        docs.filter(F.col("doc_id") == 2), max_tokens=10, overlap=2
    ).collect()
    rows = sorted(out, key=lambda r: r.chunk_id)
    # step = 8: starts 0, 8, 16 -> sizes 10, 10, 9. A start at 24 would
    # duplicate a chunk-3-covered token (24 + overlap >= 25), so it is
    # not emitted — every chunk contains at least one novel token.
    assert [r.n_tokens for r in rows] == [10, 10, 9]
    first = rows[0].chunk_text.split(" ")
    second = rows[1].chunk_text.split(" ")
    assert first[-2:] == second[:2]  # 2-token overlap


def test_chunk_documents_overlap_validation(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, max_tokens=5, overlap=5)


def test_chunk_documents_min_tokens(docs):
    out = chunk_documents(
        docs.filter(F.col("doc_id") == 2), max_tokens=10, min_chunk_tokens=6
    ).collect()
    assert [r.n_tokens for r in out] == [10, 10]  # 5-token tail dropped


def test_chunk_is_map_only(docs):
    plan = (
        chunk_documents(docs, max_tokens=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_respects_budget_and_partition(docs):
    packed = pack_sequences(docs.repartition(1), max_len=30).collect()
    # every sequence within budget unless it is a single long doc
    for r in packed:
        assert r.total_tokens <= 30 or r.n_docs == 1
        assert r.fill_ratio <= 1.0
    # every doc appears exactly once
    seen = sorted(d for r in packed for d in r.doc_ids)
    assert seen == [1, 2, 3, 4]
    # greedy best-fit on sorted ids with budget 30:
    # doc1(10) -> bin0 (rem 20); doc2(25) -> bin1 (rem 5); doc3(3) ->
    # tightest fitting bin = bin1 (rem 5 < rem 20); doc4(40) oversize
    # singleton
    by_docs = {tuple(r.doc_ids): r for r in packed}
    assert (2, 3) in by_docs and by_docs[(2, 3)].total_tokens == 28
    assert (1,) in by_docs and (4,) in by_docs


def test_pack_sequences_precomputed_lengths(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 900), (3, 200)], "doc_id long, n_tok long"
    )
    packed = pack_sequences(
        df.repartition(1), length_col="n_tok", max_len=1024
    ).collect()
    assert len(packed) == 1 or all(r.total_tokens <= 1024 for r in packed)
    total = sum(r.total_tokens for r in packed)
    assert total == 1200


def test_pack_sequences_seq_ids_unique(spark):
    df = spark.range(200).selectExpr(
        "id as doc_id", "repeat('w ', 100) as text"
    )
    packed = pack_sequences(df, max_len=512).collect()
    ids = [r.seq_id for r in packed]
    assert len(ids) == len(set(ids))
    assert sorted(d for r in packed for d in r.doc_ids) == list(range(200))


# ---------------------------------------------------------------------- #
# Property tests                                                          #
# ---------------------------------------------------------------------- #

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=8),
    max_tokens=st.integers(min_value=2, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_documents_properties(spark, lengths, max_tokens, overlap_frac):
    overlap = int(max_tokens * overlap_frac)
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=max_tokens, overlap=overlap).collect()
    step = max_tokens - overlap
    by_doc = {}
    for r in out:
        assert r.n_tokens <= max_tokens
        by_doc.setdefault(r.doc_id, []).append(r)
    for (doc_id, text), n in zip(rows, lengths):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        toks = text.split(" ")
        # chunk c covers tokens [c*step, c*step + max_tokens)
        for c, r in enumerate(chunks):
            assert r.chunk_text.split(" ") == toks[
                c * step : c * step + max_tokens
            ]
        # union of chunks covers every token (overlap ensures no gaps)
        covered = set()
        for c in range(len(chunks)):
            covered.update(range(c * step, min(c * step + max_tokens, n)))
        assert covered == set(range(n))
        # no chunk is a subset of its predecessor: every chunk after the
        # first contributes at least one token the previous one did not
        prev_end = None
        for c, r in enumerate(chunks):
            start, end = c * step, min(c * step + max_tokens, n)
            if prev_end is not None:
                assert end > prev_end, (
                    f"chunk {c} [{start},{end}) adds nothing beyond "
                    f"{prev_end}"
                )
            prev_end = end


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lengths=st.lists(
        st.integers(min_value=1, max_value=100), min_size=1, max_size=20
    ),
    max_len=st.integers(min_value=10, max_value=120),
)
def test_pack_sequences_properties(spark, lengths, max_len):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)], "doc_id long, n_tok long"
    )
    packed = pack_sequences(
        df.repartition(2), length_col="n_tok", max_len=max_len
    ).collect()
    # every doc exactly once
    seen = sorted(d for r in packed for d in r.doc_ids)
    assert seen == list(range(len(lengths)))
    # budget respected except oversize singletons; totals are exact
    for r in packed:
        assert r.total_tokens == sum(lengths[d] for d in r.doc_ids)
        assert r.total_tokens <= max_len or r.n_docs == 1
    # token mass conserved
    assert sum(r.total_tokens for r in packed) == sum(lengths)


def test_pack_sequences_emit_offsets(spark):
    """doc_offsets/doc_lengths: the block-diagonal-attention contract —
    offsets are exact prefix sums of the member lengths."""
    from patito_spark.operators.packing import pack_sequences

    df = spark.range(20).selectExpr(
        "id as doc_id", "cast(3 + id % 5 as long) as n_tok"
    ).coalesce(1)
    out = pack_sequences(df, length_col="n_tok", max_len=16,
                         emit_offsets=True)
    rows = out.collect()
    assert rows
    for r in rows:
        assert len(r["doc_lengths"]) == len(r["doc_ids"]) == r["n_docs"]
        assert sum(r["doc_lengths"]) == r["total_tokens"]
        run = 0
        for off, ln in zip(r["doc_offsets"], r["doc_lengths"]):
            assert off == run
            run += ln
        assert run <= 16
    # default schema unchanged
    base = pack_sequences(df, length_col="n_tok", max_len=16)
    assert "doc_offsets" not in base.columns


class TestSentenceChunking:
    def test_hand_checked_sentence_packing(self, spark):
        from patito_spark.operators.packing import chunk_documents

        text = "One two three. Four five. Six seven eight nine. Ten!"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = sorted(
            chunk_documents(df, max_tokens=6, boundary="sentence").collect(),
            key=lambda r: r.chunk_id,
        )
        # greedy: [One two three. Four five.] = 5 toks; [Six seven eight
        # nine.] = 4; adding [Ten!] = 5 fits -> second chunk has both
        assert [(r.chunk_text, r.n_tokens) for r in out] == [
            ("One two three. Four five.", 5),
            ("Six seven eight nine. Ten!", 5),
        ]
        # no chunk ends mid-sentence
        assert all(r.chunk_text[-1] in ".!?" for r in out)

    def test_oversized_sentence_hard_splits(self, spark):
        from patito_spark.operators.packing import chunk_documents

        text = "Short one. " + " ".join(f"w{i}" for i in range(10)) + ". End."
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = sorted(
            chunk_documents(df, max_tokens=4, boundary="sentence").collect(),
            key=lambda r: r.chunk_id,
        )
        texts = [r.chunk_text for r in out]
        assert texts[0] == "Short one."
        # the 10-token sentence splits into 4+4+2 token windows
        assert [r.n_tokens for r in out] == [2, 4, 4, 2, 1]
        assert texts[-1] == "End."
        rejoined = " ".join(texts)
        assert rejoined == text  # nothing lost, nothing duplicated

    def test_sentence_mode_contracts(self, spark):
        from patito_spark.operators.packing import chunk_documents

        df = spark.createDataFrame(
            [(1, "A b. C d."), (2, None)], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, boundary="sentence", overlap=2)
        with pytest.raises(ValueError, match="boundary"):
            chunk_documents(df, boundary="paragraph")
        out = chunk_documents(
            df, max_tokens=10, boundary="sentence", min_chunk_tokens=1
        )
        rows = out.collect()
        assert {r.doc_id for r in rows} == {1}  # null text emits nothing
        assert rows[0].chunk_text == "A b. C d."


class TestSentenceChunkingProperties:
    def test_token_stream_preserved_random_texts(self, spark):
        """For single-space texts, the concatenated chunk token streams
        equal the original token stream — nothing lost, duplicated or
        reordered, at any budget (hypothesis-style sweep, deterministic
        corpus so failures replay)."""
        import random

        from patito_spark.operators.packing import chunk_documents

        rng = random.Random(11)
        words = ["alpha", "b.", "c!", "Dd?", "e,f", '"g."', "(h)", "i2"]
        rows = []
        for d in range(60):
            n = rng.randint(1, 40)
            rows.append((d, " ".join(rng.choice(words) for _ in range(n))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for budget in (1, 3, 7, 64):
            out = chunk_documents(
                df, max_tokens=budget, boundary="sentence",
                min_chunk_tokens=1,
            )
            got = {}
            for r in out.collect():
                got.setdefault(r.doc_id, []).append(
                    (r.chunk_id, r.chunk_text, r.n_tokens)
                )
            for d, text in rows:
                chunks = sorted(got.get(d, []))
                # chunk ids are dense 0..k-1
                assert [c[0] for c in chunks] == list(range(len(chunks)))
                # budget respected
                assert all(c[2] <= budget for c in chunks)
                # token stream preserved exactly
                stream = [t for _, ct, _ in chunks for t in ct.split(" ")]
                assert stream == text.split(" "), (d, budget)
