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
