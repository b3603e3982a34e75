"""Property tests: build_vocab / tf_idf vs a naive Python recount."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

WORD = st.text(alphabet="abcde", min_size=1, max_size=3)
DOC = st.lists(WORD, min_size=1, max_size=12).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=8)


def _naive_vocab(texts):
    counts: Counter = Counter()
    doc_freq: Counter = Counter()
    for t in texts:
        toks = t.split(" ")
        counts.update(toks)
        doc_freq.update(set(toks))
    return counts, doc_freq


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
def test_build_vocab_matches_python(spark, texts):
    from patito_spark.operators.text import build_vocab

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["token"]: (r["count"], r["doc_freq"])
        for r in build_vocab(df).collect()
    }
    counts, doc_freq = _naive_vocab(texts)
    assert got == {t: (counts[t], doc_freq[t]) for t in counts}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
def test_tf_sums_to_one_per_doc(spark, texts):
    """Over the full (min_count=1) vocab, each document's tf sums to 1."""
    from patito_spark.operators.text import tf_idf

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = tf_idf(df).collect()
    per_doc: dict[int, float] = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + r["tf"]
    assert set(per_doc) == set(range(len(texts)))
    for doc_id, total in per_doc.items():
        assert total == pytest.approx(1.0, abs=1e-9)


# --- fix_mojibake round-trip ------------------------------------------- #

def _sloppy_cp1252(s: str) -> str:
    out = []
    for b in s.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def _moji_alphabet():
    from patito_spark.operators.text import _MOJIBAKE_CHARS

    return "abc XY.,!?'\"0-" + "".join(_MOJIBAKE_CHARS)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    text=st.text(
        alphabet=st.sampled_from(list(_moji_alphabet())),
        min_size=0,
        max_size=40,
    )
)
def test_fix_mojibake_round_trip(spark, text):
    """fix_mojibake(double_encode(text)) == text for any text over the
    repaired alphabet — i.e. the replace chain's ORDER never corrupts
    adjacent artifacts (each artifact replaces independently even when
    artifacts of neighboring characters touch)."""
    import pytest as _pytest
    from patito_spark.operators.text import fix_mojibake

    # nbsp deliberately repairs to a plain space, so normalize the
    # expectation the same way
    expected = text.replace(" ", " ")
    broken = _sloppy_cp1252(text)
    got = (
        spark.createDataFrame([(broken,)], "t string")
        .select(fix_mojibake("t").alias("f"))
        .first()["f"]
    )
    if got != expected:
        _pytest.fail(f"{text!r} -> {broken!r} -> {got!r}")
