"""Chat/SFT conversation operators: rendering, structural stats/gate,
exact dedup, and composition with the text-level operators."""

import pytest

from pyspark.sql import functions as F

from patito_spark.operators.conversations import (
    conversation_stats,
    dedup_conversations,
    filter_conversations,
    render_conversations,
)

SCHEMA = (
    "conv_id long, "
    "messages array<struct<role: string, content: string>>, "
    "source string"
)


def msgs(*pairs):
    return [{"role": r, "content": c} for r, c in pairs]


@pytest.fixture()
def convs(spark):
    return spark.createDataFrame(
        [
            (
                1,
                msgs(("system", "be helpful"), ("user", "hi"),
                     ("assistant", "hello")),
                "a",
            ),
            (2, msgs(("user", "hi"), ("assistant", "hello")), "b"),
            (
                3,
                msgs(("user", "q1"), ("assistant", "a1"), ("user", "q2")),
                "a",
            ),  # trailing user turn
            (
                4,
                msgs(("user", "q"), ("user", "q again"),
                     ("assistant", "a")),
                "a",
            ),  # broken alternation
            (5, msgs(("user", "q"), ("assistant", "  ")), "b"),  # blank body
            (
                6,
                msgs(("system", "other prompt"), ("user", "HI"),
                     ("assistant", "Hello")),
                "c",
            ),  # dup of 1/2 modulo system + case
            (7, [], "c"),
        ],
        schema=SCHEMA,
    )


def test_render_role_tagged(convs):
    out = {
        r["conv_id"]: r["text"]
        for r in render_conversations(convs).collect()
    }
    assert out[2] == "user: hi\n\nassistant: hello"
    assert out[1] == "system: be helpful\n\nuser: hi\n\nassistant: hello"
    assert out[7] == ""


def test_render_is_shuffle_free(convs):
    from patito_spark.plans.explain import executed_plan

    assert "Exchange" not in executed_plan(render_conversations(convs))


def test_stats(convs):
    rows = {
        r["conv_id"]: r
        for r in conversation_stats(convs).collect()
    }
    assert rows[1]["n_turns"] == 3
    assert rows[1]["n_user"] == 1 and rows[1]["n_assistant"] == 1
    assert rows[1]["alternates"] is True  # system prefix tolerated
    assert rows[2]["alternates"] is True
    assert rows[3]["alternates"] is True  # alternation ok; gate is last_role
    assert rows[3]["last_role"] == "user"
    assert rows[4]["alternates"] is False
    assert rows[5]["has_empty_content"] is True
    assert rows[7]["n_turns"] == 0
    assert not rows[7]["alternates"]
    assert rows[7]["first_role"] is None


def test_filter_structural_gate(convs):
    kept = sorted(
        r["conv_id"] for r in filter_conversations(convs).collect()
    )
    # 3: ends on user; 4: broken alternation; 5: blank body; 7: empty.
    assert kept == [1, 2, 6]
    assert filter_conversations(convs).columns == [
        "conv_id", "messages", "source",
    ]


def test_filter_turn_bounds(convs):
    kept = sorted(
        r["conv_id"]
        for r in filter_conversations(convs, min_turns=3).collect()
    )
    assert kept == [1, 6]


def test_dedup_ignores_system_and_normalizes(convs):
    out = sorted(
        r["conv_id"] for r in dedup_conversations(convs).collect()
    )
    # 1, 2, 6 share a key (system ignored, case folded) -> min id 1 kept.
    assert 1 in out and 2 not in out and 6 not in out
    assert {3, 4, 5, 7} <= set(out)


def test_dedup_verbatim_mode_keeps_system_variants(convs):
    out = sorted(
        r["conv_id"]
        for r in dedup_conversations(
            convs, ignore_roles=False, normalize=False
        ).collect()
    )
    # Verbatim keys: 1 and 6 differ by system prompt AND case; all stay.
    assert {1, 2, 6} <= set(out)


def test_dedup_preserves_columns_and_rows_once(convs):
    result = dedup_conversations(convs)
    assert result.columns == ["conv_id", "messages", "source"]
    ids = [r["conv_id"] for r in result.collect()]
    assert len(ids) == len(set(ids))


def test_composes_with_text_pipeline(spark, convs):
    # render -> token gate: the bridge into the pretraining operators.
    from patito_spark.operators.text import filter_corpus

    rendered = render_conversations(filter_conversations(convs))
    gated = filter_corpus(
        rendered, id_col="conv_id", text_col="text", min_tokens=4
    )
    # Whitespace tokens: conv 2 renders to 3 ("user:", "hi\n\nassistant:",
    # "hello") and drops at min_tokens=4; the system-prefixed ones pass.
    assert sorted(r["conv_id"] for r in gated.collect()) == [1, 6]


def test_gate_and_render_on_stream(spark, tmp_path):
    """filter_conversations + render_conversations are plain transforms,
    so they apply to a readStream unchanged — ingestion-time structural
    gating of chat data."""
    import uuid as _uuid

    path = str(tmp_path / "convs")
    spark.createDataFrame(
        [
            (1, msgs(("user", "hi"), ("assistant", "hello"))),
            (2, msgs(("user", "no reply yet"))),
        ],
        schema="conv_id long, "
        "messages array<struct<role: string, content: string>>",
    ).coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(
        "conv_id long, messages array<struct<role: string, content: string>>"
    ).parquet(path)
    out = render_conversations(filter_conversations(stream))
    name = f"t_conv_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    assert [(r["conv_id"], r["text"]) for r in rows] == [
        (1, "user: hi\n\nassistant: hello")
    ]


def test_assistant_token_spans(spark):
    """Loss-mask geometry: 0-based inclusive whitespace-token ranges of
    each assistant turn in the rendered text (split on \\s+)."""
    import re

    convs = spark.createDataFrame(
        [
            (1, msgs(("system", "be helpful"), ("user", "hi"),
                     ("assistant", "hello world"), ("user", "more?"),
                     ("assistant", "sure thing friend"))),
            (2, msgs(("user", "never answered"),)),
        ],
        schema="conv_id long, "
        "messages array<struct<role: string, content: string>>",
    )
    out = {
        r["conv_id"]: r
        for r in render_conversations(
            convs, assistant_spans_col="assistant_spans"
        ).collect()
    }
    # chunks: "system: be helpful"(3) "user: hi"(2) "assistant: hello
    # world"(3) "user: more?"(2) "assistant: sure thing friend"(4)
    spans1 = [(s["start"], s["end"]) for s in out[1]["assistant_spans"]]
    assert spans1 == [(5, 7), (10, 13)]
    # The spans select exactly the assistant chunks of the \s+ stream.
    toks = re.split(r"\s+", out[1]["text"])
    assert toks[5:8] == ["assistant:", "hello", "world"]
    assert toks[10:14] == ["assistant:", "sure", "thing", "friend"]
    assert out[2]["assistant_spans"] == []


def test_spans_unaffected_by_trailing_whitespace_and_empty_content(spark):
    """Review regression: trailing/leading whitespace in a message (and
    empty content) must not shift later spans — per-chunk counting trims
    before splitting, matching re.split(r"\\s+", text.strip())."""
    import re

    convs = spark.createDataFrame(
        [
            (1, msgs(("user", "hi "), ("assistant", "ok"))),
            (2, msgs(("user", " lead"), ("assistant", ""),
                     ("user", "more"), ("assistant", "fin"))),
        ],
        schema="conv_id long, "
        "messages array<struct<role: string, content: string>>",
    )
    out = {
        r["conv_id"]: r
        for r in render_conversations(
            convs, assistant_spans_col="spans"
        ).collect()
    }
    for cid in (1, 2):
        toks = re.split(r"\s+", out[cid]["text"].strip())
        for s in out[cid]["spans"]:
            assert toks[s["start"]] == "assistant:", (cid, s, toks)
            assert s["end"] < len(toks)
    # conv 1: ["user:","hi","assistant:","ok"] -> span (2,3)
    assert [(s["start"], s["end"]) for s in out[1]["spans"]] == [(2, 3)]
    # conv 2: empty assistant content -> chunk "assistant:" is 1 token.
    toks2 = re.split(r"\s+", out[2]["text"].strip())
    spans2 = [(s["start"], s["end"]) for s in out[2]["spans"]]
    assert toks2[spans2[1][0] : spans2[1][1] + 1] == ["assistant:", "fin"]


def test_null_message_fields_do_not_vanish(spark):
    """Review regression: NULL content renders as an empty turn (not
    dropped), so a conversation with a null-content assistant turn is
    NOT a dedup duplicate of one without the turn; rows whose messages
    column is NULL pass through dedup untouched."""
    schema = (
        "conv_id long, messages array<struct<role: string, content: string>>"
    )
    a = spark.createDataFrame(
        [(1, [{"role": "user", "content": "x"},
              {"role": "assistant", "content": None}]),
         (2, [{"role": "user", "content": "x"}]),
         (3, None)],
        schema=schema,
    )
    rendered = {r["conv_id"]: r["text"] for r in
                render_conversations(a.filter("messages is not null")).collect()}
    assert rendered[1] == "user: x\n\nassistant: "
    deduped = dedup_conversations(a)
    assert sorted(r["conv_id"] for r in deduped.collect()) == [1, 2, 3]


def test_ignore_roles_true_uses_default(spark):
    convs = spark.createDataFrame(
        [(1, msgs(("system", "a"), ("user", "q"), ("assistant", "r"))),
         (2, msgs(("system", "b"), ("user", "q"), ("assistant", "r")))],
        schema="conv_id long, "
        "messages array<struct<role: string, content: string>>",
    )
    out = dedup_conversations(convs, ignore_roles=True)
    assert [r["conv_id"] for r in out.collect()] == [1]


def test_filter_does_not_clobber_same_named_columns(spark):
    """Review regression: an input column named like a stat must pass
    through untouched (the gate uses raw expressions, not columns)."""
    convs = spark.createDataFrame(
        [(1, msgs(("user", "q"), ("assistant", "r")), 999)],
        schema="conv_id long, "
        "messages array<struct<role: string, content: string>>, "
        "n_turns long",
    )
    out = filter_conversations(convs).collect()
    assert out[0]["n_turns"] == 999


def test_dedup_conversations_stream_matches_batch_keys(spark, tmp_path):
    """Streaming keep-first on the SAME conversation_key: formatting and
    system-prompt variants drop at ingestion; distinct conversations
    pass. (Keep rule is first-arrival, vs the batch operator's min-id.)"""
    import uuid as _uuid

    from patito_spark.streaming.dedup import dedup_conversations_stream

    path = str(tmp_path / "convstream")
    rows = [
        (1, 100, msgs(("user", "hi"), ("assistant", "hello"))),
        (2, 200, msgs(("system", "x"), ("user", "HI"),
                      ("assistant", "Hello"))),  # variant of 1 -> drops
        (3, 300, msgs(("user", "new question"), ("assistant", "reply"))),
    ]
    spark.createDataFrame(
        rows,
        schema="conv_id long, ts_s long, "
        "messages array<struct<role: string, content: string>>",
    ).selectExpr(
        "conv_id", "timestamp_seconds(ts_s) as ts", "messages"
    ).coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(
        "conv_id long, ts timestamp, "
        "messages array<struct<role: string, content: string>>"
    ).parquet(path)
    out = dedup_conversations_stream(stream, ts_col="ts")
    name = f"t_dcs_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    ids = sorted(r["conv_id"] for r in spark.table(name).collect())
    assert len(ids) == 2 and 3 in ids and (1 in ids) != (2 in ids)


class TestPreferencePairs:
    SCHEMA = "pair_id long, prompt string, chosen string, rejected string"

    def pairs(self, spark):
        return spark.createDataFrame(
            [
                (1, "explain joins", "a clear answer", "a worse answer"),
                (2, "explain joins", "different good answer", "meh"),
                (3, "EXPLAIN   JOINS", "x y", "z w"),  # prompt variant of 1/2
                (4, "identical responses", "same thing", "Same  THING"),
                (5, "blank rejected", "ok", "   "),
                (6, None, "a", "b"),
                (7, "length runaway", "w " * 50, "w"),
            ],
            self.SCHEMA,
        )

    def test_filter_gate(self, spark):
        from patito_spark.operators.conversations import (
            filter_preference_pairs,
        )

        kept = sorted(
            r["pair_id"]
            for r in filter_preference_pairs(self.pairs(spark)).collect()
        )
        # 4: identical after normalization; 5: blank; 6: null prompt.
        assert kept == [1, 2, 3, 7]
        with_ratio = sorted(
            r["pair_id"]
            for r in filter_preference_pairs(
                self.pairs(spark), max_length_ratio=10.0
            ).collect()
        )
        assert with_ratio == [1, 2, 3]  # 7: 50 tokens vs 1

    def test_dedup_prompt_scope(self, spark):
        from patito_spark.operators.conversations import (
            dedup_preference_pairs,
        )

        out = sorted(
            r["pair_id"]
            for r in dedup_preference_pairs(self.pairs(spark)).collect()
        )
        # 1/2/3 share a normalized prompt -> min id 1; null prompt (6)
        # bypasses untouched.
        assert 1 in out and 2 not in out and 3 not in out
        assert {4, 5, 6, 7} <= set(out)

    def test_dedup_pair_scope(self, spark):
        from patito_spark.operators.conversations import (
            dedup_preference_pairs,
        )

        out = sorted(
            r["pair_id"]
            for r in dedup_preference_pairs(
                self.pairs(spark), scope="pair"
            ).collect()
        )
        # Distinct response pairs for the same prompt BOTH survive.
        assert {1, 2} <= set(out) and 6 in out
        import pytest

        with pytest.raises(ValueError, match="scope"):
            dedup_preference_pairs(self.pairs(spark), scope="whatever")

    def test_null_response_pairs_do_not_collide(self, spark):
        from patito_spark.operators.conversations import (
            dedup_preference_pairs,
        )

        df = spark.createDataFrame(
            [(1, "p", None, "r"), (2, "p", "r", None)], self.SCHEMA
        )
        out = dedup_preference_pairs(df, scope="pair")
        assert out.count() == 2  # concat_ws null-skip must not merge them
