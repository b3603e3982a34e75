"""Chat/SFT corpus preparation: conversation-shaped documents.

Instruction-tuning corpora arrive as message lists, not flat text —
``array<struct<role: string, content: string>>`` per row. The pretraining
operators (dedup, gates, packing) all consume a flat ``text`` column, so
the bridge is three map-only primitives plus a structural gate:

* :func:`render_conversations` — deterministic role-tagged flattening
  (one codegen-shaped projection; the interpreted ``transform`` lambda
  runs once per MESSAGE, typically tens per row — not a hot per-token
  path);
* :func:`conversation_stats` — structural features (turn counts, role
  alternation, emptiness) for filtering and dataset cards;
* :func:`filter_conversations` — the structural gate SFT pipelines run
  before the text-level quality gates (broken alternation, missing
  final assistant turn, empty messages);
* :func:`dedup_conversations` — exact dedup on a normalized render
  (whitespace/case-folded), so formatting-only variants collapse.
  Near-dup dedup composes: render first, then run the standard
  MinHash/embedding operators on the rendered text.

Everything is a per-row projection or reuses an existing operator —
no new shuffle shapes; at 100 TB the cost is the scan.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "render_conversations",
    "conversation_stats",
    "filter_conversations",
    "dedup_conversations",
]


def _render_expr(
    messages: Column, role_sep: str, turn_sep: str
) -> Column:
    return F.array_join(
        F.transform(
            messages,
            lambda m: F.concat(
                m.getField("role"), F.lit(role_sep), m.getField("content")
            ),
        ),
        turn_sep,
    )


def render_conversations(
    df: DataFrame,
    messages_col: str = "messages",
    output_col: str = "text",
    role_sep: str = ": ",
    turn_sep: str = "\n\n",
    assistant_spans_col: Optional[str] = None,
    assistant_role: str = "assistant",
) -> DataFrame:
    """Flatten message lists to role-tagged text (map-only).

    ``[{role: "user", content: "hi"}, {role: "assistant", content:
    "hello"}]`` renders as ``"user: hi\\n\\nassistant: hello"`` under the
    defaults. The ``turn_sep`` default is the paragraph boundary, so the
    paragraph-level operators (:mod:`.paragraphs`) see one paragraph per
    turn. Deterministic — the same conversation always renders to the
    same text, which is what makes :func:`dedup_conversations` and the
    downstream near-dup operators meaningful.

    ``assistant_spans_col`` additionally emits the loss-mask geometry
    SFT trainers need: an ``array<struct<start, end>>`` of 0-based
    INCLUSIVE whitespace-token index ranges (in the rendered text)
    covering each ``assistant_role`` turn — including its role tag, so
    ``span = [start of "assistant:", last content token]``. Computed in
    the same fold that walks the message array (token counts per
    rendered turn accumulate a cursor) — O(messages) per row, no
    second pass over the text. Caveat: valid for whitespace
    tokenization of the rendered text (the same convention every
    token-counting operator here uses); re-derive offsets after a real
    BPE pass if you need exact subword masks.
    """
    out = df.withColumn(
        output_col,
        _render_expr(F.col(messages_col), role_sep, turn_sep),
    )
    if assistant_spans_col is None:
        return out
    msgs = F.col(messages_col)
    # Tokens contributed by message i in the rendered text: the chunk
    # "role<role_sep>content" split on whitespace. turn_sep glues onto
    # the FOLLOWING chunk's first token only when it contains no
    # whitespace itself — with the default "\n\n" separator the chunks
    # join into "...hello\n\nassistant: ..." where "hello\n\nassistant:"
    # is ONE whitespace token; that would make spans tokenizer-ambiguous,
    # so token accounting here treats the separator as whitespace (the
    # split pattern below includes it), matching split() on the cleaned
    # text (clean_text collapses the separator to a space anyway).
    chunk_tokens = lambda m: F.size(  # noqa: E731
        F.split(
            F.concat(m.getField("role"), F.lit(role_sep), m.getField("content")),
            r"\s+",
        )
    )
    folded = F.aggregate(
        msgs,
        F.struct(
            F.lit(0).alias("cur"),
            F.array()
            .cast("array<struct<start: int, end: int>>")
            .alias("spans"),
        ),
        lambda acc, m: F.struct(
            (acc.cur + chunk_tokens(m)).alias("cur"),
            F.when(
                m.getField("role") == assistant_role,
                F.concat(
                    acc.spans,
                    F.array(
                        F.struct(
                            acc.cur.cast("int").alias("start"),
                            (acc.cur + chunk_tokens(m) - 1)
                            .cast("int")
                            .alias("end"),
                        )
                    ),
                ),
            )
            .otherwise(acc.spans)
            .alias("spans"),
        ),
        lambda acc: acc.spans,
    )
    return out.withColumn(assistant_spans_col, folded)


def conversation_stats(
    df: DataFrame,
    messages_col: str = "messages",
    user_role: str = "user",
    assistant_role: str = "assistant",
    system_role: str = "system",
) -> DataFrame:
    """Append structural features of each conversation (map-only).

    Adds: ``n_turns``; ``n_user`` / ``n_assistant`` turn counts;
    ``first_role`` / ``last_role``; ``has_empty_content`` (any message
    with null/blank content); ``alternates`` — true when, after an
    optional leading system message, the roles strictly alternate
    user/assistant starting with ``user_role`` (the well-formedness
    invariant SFT trainers assume).
    """
    msgs = F.col(messages_col)
    role_of = lambda m: m.getField("role")  # noqa: E731
    body = F.when(
        (F.size(msgs) > 0)
        & (role_of(F.element_at(msgs, 1)) == system_role),
        F.slice(msgs, 2, F.greatest(F.size(msgs) - 1, F.lit(0))),
    ).otherwise(msgs)
    # Alternation: message i (1-based) of the post-system body must be
    # user on odd i, assistant on even i. zip_with against the index
    # sequence keeps this a single array expression.
    idx = F.sequence(F.lit(1), F.greatest(F.size(body), F.lit(1)))
    ok_flags = F.zip_with(
        body,
        idx,
        lambda m, i: F.when(
            i % 2 == 1, role_of(m) == user_role
        ).otherwise(role_of(m) == assistant_role),
    )
    alternates = (F.size(body) > 0) & F.forall(ok_flags, lambda x: x)
    blank = lambda m: m.getField("content").isNull() | (  # noqa: E731
        F.trim(m.getField("content")) == ""
    )
    count_role = lambda role: F.size(  # noqa: E731
        F.filter(msgs, lambda m: role_of(m) == role)
    )
    return (
        df.withColumn("n_turns", F.size(msgs))
        .withColumn("n_user", count_role(user_role))
        .withColumn("n_assistant", count_role(assistant_role))
        .withColumn(
            "first_role",
            F.when(F.size(msgs) > 0, role_of(F.element_at(msgs, 1))),
        )
        .withColumn(
            "last_role",
            F.when(F.size(msgs) > 0, role_of(F.element_at(msgs, -1))),
        )
        .withColumn("has_empty_content", F.exists(msgs, blank))
        .withColumn("alternates", alternates)
    )


def filter_conversations(
    df: DataFrame,
    messages_col: str = "messages",
    min_turns: int = 2,
    max_turns: Optional[int] = None,
    require_alternation: bool = True,
    require_last_assistant: bool = True,
    drop_empty_content: bool = True,
    user_role: str = "user",
    assistant_role: str = "assistant",
    system_role: str = "system",
) -> DataFrame:
    """The structural SFT gate (map-only, composes with the text gates).

    Keeps conversations with ``min_turns``–``max_turns`` messages whose
    roles alternate (after an optional system prefix), that end on an
    assistant turn (a trailing user message has no training target),
    and with no empty message bodies. The stat columns are transient —
    output schema equals input schema.
    """
    stats = conversation_stats(
        df,
        messages_col=messages_col,
        user_role=user_role,
        assistant_role=assistant_role,
        system_role=system_role,
    )
    cond = F.col("n_turns") >= min_turns
    if max_turns is not None:
        cond = cond & (F.col("n_turns") <= max_turns)
    if require_alternation:
        cond = cond & F.col("alternates")
    if require_last_assistant:
        cond = cond & (F.col("last_role") == assistant_role)
    if drop_empty_content:
        cond = cond & ~F.col("has_empty_content")
    return stats.filter(cond).select(*df.columns)


def dedup_conversations(
    df: DataFrame,
    id_col: str = "conv_id",
    messages_col: str = "messages",
    ignore_roles: Union[bool, Sequence[str]] = ("system",),
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup on a normalized conversation key (keep min-id).

    The key is the rendered conversation with (by default) system
    messages excluded — two conversations differing only in system
    prompt are the same teaching example — and, under ``normalize``,
    case-folded with whitespace collapsed, so formatting-only variants
    collapse too. One hash aggregate + one co-keyed self-join (the
    :func:`..dedup.dedup_exact` shape); near-dup conversation dedup is
    :func:`render_conversations` + the standard MinHash operators.

    ``ignore_roles`` — iterable of roles excluded from the key, or
    ``False`` to key on every message verbatim.
    """
    msgs = F.col(messages_col)
    if ignore_roles:
        roles = [str(r) for r in ignore_roles]
        msgs = F.filter(
            msgs,
            lambda m: ~m.getField("role").isin(roles),
        )
    key = F.array_join(
        F.transform(
            msgs,
            lambda m: F.concat(
                m.getField("role"), F.lit("\x00"), m.getField("content")
            ),
        ),
        "\x01",
    )
    if normalize:
        key = F.lower(F.regexp_replace(F.trim(key), r"\s+", " "))
    keyed = df.withColumn("__key", key)
    winners = keyed.groupBy("__key").agg(F.min(id_col).alias(id_col))
    return (
        keyed.join(winners, on=[id_col, "__key"], how="inner")
        .drop("__key")
    )
