"""End-to-end chat/SFT pipeline: raw message lists -> structural gate
-> exact dedup -> rendered text with loss-mask spans -> sequence
packing with doc offsets -> token-budgeted shards. Pins that the
conversation operators compose with the generic packing/shard layers
and that the loss-mask and offset geometries line up."""

from pyspark.sql import functions as F

from patito_spark.operators.conversations import (
    dedup_conversations,
    filter_conversations,
    render_conversations,
)
from patito_spark.operators.packing import pack_sequences
from patito_spark.sources import write_training_shards


def _msgs(*turns):
    return [{"role": r, "content": c} for r, c in turns]


def test_chat_pipeline_end_to_end(spark, tmp_path):
    rows = [
        # 20 valid conversations (distinct content)
        *[
            (i, _msgs(("user", f"question number {i} about spark"),
                      ("assistant", f"answer number {i} with details")))
            for i in range(20)
        ],
        # an exact duplicate of conversation 0 under a different id
        (100, _msgs(("user", "question number 0 about spark"),
                    ("assistant", "answer number 0 with details"))),
        # structurally broken: assistant speaks first
        (101, _msgs(("assistant", "hello"), ("user", "hi"))),
        # blank assistant body
        (102, _msgs(("user", "hi"), ("assistant", "   "))),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id long, messages array<struct<role string, content string>>",
    )

    ok = filter_conversations(df)
    deduped = dedup_conversations(ok, id_col="conv_id")
    rendered = render_conversations(
        deduped, assistant_spans_col="loss_spans"
    )
    docs = rendered.select(
        "conv_id", "text", "loss_spans",
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    collected = {r["conv_id"]: r for r in docs.collect()}
    assert len(collected) == 20           # 101/102 gated, 100 deduped
    assert 101 not in collected and 102 not in collected
    assert (0 in collected) != (100 in collected)  # exactly one survivor
    import re

    for r in collected.values():
        # loss-mask spans index \s+-split tokens (the operator's
        # documented convention) and cover the assistant turn
        toks = re.split(r"\s+", r["text"].strip())
        for sp in r["loss_spans"]:
            assert 0 <= sp["start"] <= sp["end"] < len(toks)
            assert toks[sp["start"]].startswith("assistant")

    packed = pack_sequences(
        docs.select(F.col("conv_id").alias("doc_id"), "n_tok"),
        length_col="n_tok", max_len=64, emit_offsets=True,
    )
    agg = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
    ).first()
    assert agg["docs"] == 20
    assert agg["toks"] == sum(r["n_tok"] for r in collected.values())

    out_dir = str(tmp_path / "sft_shards")
    write_training_shards(
        docs.select("conv_id", "text"), out_dir,
        target_tokens_per_shard=100, text_col="text", id_col="conv_id",
    )
    manifest = spark.read.parquet(f"{out_dir}/_manifest")
    m = manifest.agg(F.sum("n_docs").alias("d"),
                     F.sum("n_tokens").alias("t")).first()
    assert m["d"] == 20
    assert m["t"] == agg["toks"]
