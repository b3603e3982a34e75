"""Context-window preparation: document chunking and sequence packing.

The last mile of a training-data pipeline: documents become fixed-budget
token windows (``chunk_documents``), and short documents are packed
together to fill the context window instead of wasting it on padding
(``pack_sequences`` — the standard "sequence packing" trick).

Scale shapes:

* ``chunk_documents`` is a pure projection + explode — map-only, no
  shuffle, whole-stage codegen except the per-chunk slice/join (bounded
  by chunks-per-doc, not tokens).
* ``pack_sequences`` packs **per partition** via ``mapInPandas`` — greedy
  best-fit inside each Arrow batch stream. Packing is a bin-packing
  heuristic by nature; partition-local packing loses at most one
  underfull sequence per partition versus a global pass, and in exchange
  needs NO shuffle and no driver state. At 100 TB a global pack would
  serialize the corpus through one node — never acceptable.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
    min_chunk_tokens: int = 1,
    boundary: str = "token",
) -> DataFrame:
    """Split documents into whitespace-token windows of ``max_tokens``.

    Returns ``<id_col>, chunk_id, chunk_text, n_tokens`` — one row per
    chunk, ``chunk_id`` 0-based within the document. ``overlap`` tokens
    are repeated between consecutive chunks (context continuity for
    retrieval indexing); trailing chunks shorter than
    ``min_chunk_tokens`` are dropped.

    ``boundary="token"`` (default) cuts at exact token positions —
    map-only: tokens come from one ``split``, chunk starts from one
    ``sequence``, and each chunk is a ``slice`` + ``array_join`` — cost
    is O(chunks) interpreted ops per document, the token stream itself
    never leaves the row. ``boundary="sentence"`` packs whole
    sentences greedily up to the budget instead (retrieval/RAG
    chunking: a window that ends mid-sentence embeds and reads worse);
    a single sentence over the budget is hard-split at token
    boundaries. Sentence mode is a data-dependent fold, so it runs as
    one map-only Arrow ``mapInPandas`` stage (still no shuffle);
    ``overlap`` is token-mode only.
    """
    if boundary not in ("token", "sentence"):
        raise ValueError(
            f"boundary must be 'token' or 'sentence', got {boundary!r}"
        )
    if boundary == "sentence":
        if overlap:
            raise ValueError("overlap is only supported with boundary='token'")
        return _chunk_by_sentence(
            df, id_col, text_col, max_tokens, min_chunk_tokens
        )
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_tokens "
            f"({max_tokens}) or chunking cannot advance"
        )
    step = max_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # chunk starts: 0, step, 2*step, ... — capped so every chunk after
    # the first contains at least one token its predecessor did not
    # (start + overlap < n); otherwise overlap > 0 could emit a trailing
    # chunk entirely contained in the previous one (duplicated training
    # data, e.g. 10 tokens / max 8 / overlap 4 → a chunk at 8 would
    # repeat tokens 8-9 already covered by the chunk at 4).
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1 - F.lit(overlap), F.lit(0)), F.lit(step)
    )
    chunks = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "__start"),
        n.alias("__n"),
        toks.alias("__toks"),
    )
    chunk_toks = F.slice(
        F.col("__toks"), F.col("__start") + 1, F.lit(max_tokens)
    )
    return (
        chunks.select(
            id_col,
            "chunk_id",
            F.array_join(chunk_toks, " ").alias("chunk_text"),
            F.size(chunk_toks).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= min_chunk_tokens)
    )


#: Sentence boundary: split AFTER ./!/? (optionally followed by a
#: closing quote/bracket) and before whitespace — deterministic, no
#: abbreviation model (a heuristic splitter is the corpus-pipeline
#: standard; a wrong split costs one chunk boundary, never data).
#: (two alternated lookbehinds — Python re lookbehind is fixed-width)
_SENTENCE_RE = r"(?:(?<=[.!?])|(?<=[.!?][\"')\]]))\s+"


def _chunk_by_sentence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int,
    min_chunk_tokens: int,
) -> DataFrame:
    import re

    import pandas as pd

    sent_re = re.compile(_SENTENCE_RE)
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("chunk_id", T.IntegerType(), False),
            T.StructField("chunk_text", T.StringType(), True),
            T.StructField("n_tokens", T.LongType(), True),
        ]
    )

    def chunk(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, cids, texts, ntoks = [], [], [], []
            for rid, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                chunks: list = []
                cur: list = []
                cur_n = 0
                for sent in sent_re.split(txt):
                    stoks = sent.split(" ") if sent else []
                    sn = len(stoks)
                    if sn == 0:
                        continue
                    if sn > max_tokens:
                        # oversized sentence: flush, then hard-split it
                        if cur:
                            chunks.append((" ".join(cur), cur_n))
                            cur, cur_n = [], 0
                        for s in range(0, sn, max_tokens):
                            w = stoks[s : s + max_tokens]
                            chunks.append((" ".join(w), len(w)))
                        continue
                    if cur_n + sn > max_tokens and cur:
                        chunks.append((" ".join(cur), cur_n))
                        cur, cur_n = [], 0
                    cur.extend(stoks)
                    cur_n += sn
                if cur:
                    chunks.append((" ".join(cur), cur_n))
                cid = 0
                for text, n in chunks:
                    if n < min_chunk_tokens:
                        continue
                    ids.append(rid)
                    cids.append(cid)
                    texts.append(text)
                    ntoks.append(n)
                    cid += 1
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_id": cids,
                    "chunk_text": texts,
                    "n_tokens": ntoks,
                }
            )

    return df.select(id_col, text_col).mapInPandas(chunk, schema=out_schema)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    length_col: Optional[str] = None,
    text_col: str = "text",
    max_len: int = 2048,
    sort_within_partition: bool = True,
    emit_offsets: bool = False,
) -> DataFrame:
    """Greedy best-fit packing of documents into training sequences.

    Returns ``seq_id, doc_ids (array), total_tokens, n_docs,
    fill_ratio`` — each output row is one packed training sequence whose
    member documents' token counts sum to ≤ ``max_len``.
    ``emit_offsets=True`` appends ``doc_lengths`` and ``doc_offsets``
    (token start of each member within the sequence) — the contract a
    training loader needs to build block-diagonal attention masks /
    reset position ids at document boundaries instead of attending
    across packed neighbors. Documents
    longer than ``max_len`` get a sequence of their own (chunk first via
    :func:`chunk_documents` if that is not what you want).

    ``length_col`` supplies precomputed token counts; otherwise
    whitespace token counts of ``text_col`` are used (codegen, before
    the Python stage).

    Packing runs independently inside each partition (greedy best-fit
    over the partition's rows — bisect on remaining capacity, O(docs ×
    log bins) — sorted by ``id_col`` when ``sort_within_partition`` for
    reproducibility given a fixed partitioning). Per-partition waste is
    at most one underfull tail sequence; global packing would need a
    full shuffle (or a driver pass) for a ~1/partition-count fill
    improvement — the wrong trade at scale. ``seq_id`` is globally
    unique (partition id in the high bits).
    """
    import pandas as pd

    if length_col is None:
        src = df.select(
            F.col(id_col).alias("__id"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("__len"),
        )
    else:
        src = df.select(
            F.col(id_col).alias("__id"),
            F.col(length_col).cast("long").alias("__len"),
        )
    src = src.withColumn("__pid", F.spark_partition_id())

    out_schema = T.StructType(
        [
            T.StructField("seq_id", T.LongType(), False),
            T.StructField(
                "doc_ids", T.ArrayType(df.schema[id_col].dataType), False
            ),
            T.StructField("total_tokens", T.LongType(), False),
            T.StructField("n_docs", T.LongType(), False),
            T.StructField("fill_ratio", T.DoubleType(), False),
        ]
        + (
            [
                T.StructField(
                    "doc_lengths", T.ArrayType(T.LongType(), False), False
                ),
                T.StructField(
                    "doc_offsets", T.ArrayType(T.LongType(), False), False
                ),
            ]
            if emit_offsets
            else []
        )
    )

    def pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        parts = [p for p in batches if len(p)]
        if not parts:  # empty partition: no sequences
            return
        rows = pd.concat(parts, ignore_index=True)
        if sort_within_partition:
            rows = rows.sort_values("__id")
        pid = int(rows["__pid"].iloc[0])
        # Best-fit over open bins via bisect on remaining capacity:
        # each doc goes to the tightest bin that still fits it —
        # O(docs × log bins) instead of first-fit's linear scan
        # (quadratic when a partition holds millions of tiny docs), and
        # typically a better fill. Docs longer than max_len become
        # singleton sequences (callers chunk first when that matters).
        import bisect

        bins: list[tuple[list, list, int]] = []  # (ids, lens, total)
        order: list[tuple[int, int]] = []  # sorted (remaining, bin idx)
        for doc, ln in zip(rows["__id"], rows["__len"]):
            ln = int(ln)
            if ln <= max_len:
                j = bisect.bisect_left(order, (ln, -1))
                if j < len(order):
                    rem, bi = order.pop(j)
                    ids, lens, tot = bins[bi]
                    ids.append(doc)
                    lens.append(ln)
                    bins[bi] = (ids, lens, tot + ln)
                    bisect.insort(order, (rem - ln, bi))
                    continue
            bins.append(([doc], [ln], ln))
            bisect.insort(order, (max(max_len - ln, 0), len(bins) - 1))
        out = {
            "seq_id": [(pid << 32) | i for i in range(len(bins))],
            "doc_ids": [ids for ids, _, _ in bins],
            "total_tokens": [tot for _, _, tot in bins],
            "n_docs": [len(ids) for ids, _, _ in bins],
            "fill_ratio": [min(tot / max_len, 1.0) for _, _, tot in bins],
        }
        if emit_offsets:
            out["doc_lengths"] = [lens for _, lens, _ in bins]
            offsets = []
            for _, lens, _ in bins:
                acc, run = [], 0
                for ln in lens:
                    acc.append(run)
                    run += ln
                offsets.append(acc)
            out["doc_offsets"] = offsets
        yield pd.DataFrame(out)

    return src.mapInPandas(pack, schema=out_schema)
