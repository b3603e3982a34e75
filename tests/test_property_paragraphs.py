"""Property tests: dedup_paragraphs vs a naive Python re-implementation."""

import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from patito_spark.operators.paragraphs import dedup_paragraphs

# Small paragraph alphabet forces heavy cross-doc duplication; spacing
# and case variants exercise key normalization.
PARA = st.sampled_from(
    ["alpha beta", "Alpha  Beta", "gamma", "delta epsilon", "zeta"]
)
DOC = st.lists(PARA, min_size=1, max_size=5).map("\n\n".join)
CORPUS = st.lists(DOC, min_size=1, max_size=6)


def _norm(p):
    return re.sub(r"\s+", " ", p.strip()).lower()


def _naive(texts):
    seen = set()
    out = {}
    for doc_id, text in enumerate(texts):
        kept = []
        for p in text.split("\n\n"):
            k = _norm(p)
            if not k:
                continue
            if k not in seen:
                seen.add(k)
                kept.append(p)
        if kept:
            out[doc_id] = "\n\n".join(kept)
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
def test_corpus_keep_first_matches_python(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df, drop_empty=True).collect()
    }
    assert got == _naive(texts)
