"""Winnowing fingerprints: the paper's guarantee, a bit-exact pure
reference, bucketed pairing, and the degenerate-bucket guard."""

import random

import pytest

from patito_spark.operators.winnow import (
    _doc_fingerprints,
    winnow_fingerprints,
    winnow_pairs,
)


def _reference_winnow(tokens, k, w):
    """Independent reference: build gram hashes the slow way, take the
    rightmost-min of every length-w window explicitly."""
    import zlib

    n = len(tokens)
    if n < k:
        return set()
    th = [zlib.crc32(t.encode("utf-8")) for t in tokens]
    mod = 1 << 64
    grams = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h = (h + th[i + j] * pow(1_000_003, k - 1 - j, mod)) % mod
        grams.append(h)
    sel = set()
    n_windows = max(len(grams) - w + 1, 1)
    for i in range(n_windows):
        win = grams[i : i + w]
        m = min(win)
        # rightmost minimum
        p = i + max(j for j, v in enumerate(win) if v == m)
        sel.add((grams[p], p))
    return sel


def test_selection_matches_reference_randomized():
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(40):
        n = rng.randint(1, 60)
        toks = [rng.choice(vocab) for _ in range(n)]
        k = rng.randint(1, 6)
        w = rng.randint(1, 6)
        got = set(_doc_fingerprints(toks, k, w))
        want = _reference_winnow(toks, k, w)
        assert got == want, (trial, toks, k, w)


def test_winnowing_guarantee_shared_runs_always_detected():
    """Theorem 1: a shared run of >= w + k - 1 tokens yields at least
    one shared fingerprint, wherever it sits in either document."""
    rng = random.Random(21)
    vocab = [f"a{i}" for i in range(200)]
    k, w = 4, 5
    run_len = w + k - 1
    for trial in range(30):
        shared = [rng.choice(vocab) for _ in range(run_len)]
        d1 = (
            [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
            + shared
            + [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        )
        d2 = (
            [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
            + shared
            + [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        )
        f1 = {fp for fp, _ in _doc_fingerprints(d1, k, w)}
        f2 = {fp for fp, _ in _doc_fingerprints(d2, k, w)}
        assert f1 & f2, (trial, shared)


def test_noise_threshold_short_matches_invisible():
    """Matches shorter than k tokens never produce a shared gram."""
    k, w = 5, 4
    d1 = [f"x{i}" for i in range(30)]
    d2 = [f"y{i}" for i in range(30)]
    # plant a k-1 token overlap
    d2[10:14] = d1[10:14]
    f1 = {fp for fp, _ in _doc_fingerprints(d1, k, w)}
    f2 = {fp for fp, _ in _doc_fingerprints(d2, k, w)}
    assert not (f1 & f2)


def test_distributed_matches_local(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a completely different document with other words entirely here"),
        (3, None),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.fp, r.pos)
        for r in winnow_fingerprints(df, k=3, w=3).collect()
    }
    want = set()
    for d, t in rows:
        if t is None:
            continue
        for fp, pos in _doc_fingerprints(t.split(" "), 3, 3):
            want.add((d, fp - (1 << 64) if fp >= 1 << 63 else fp, pos))
    assert got == want
    # doc 4 has < k tokens -> no rows
    assert not any(d == 4 for d, _, _ in got)


def test_pairs_detect_partial_overlap(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, "intro words " + base + " closing remarks here"),
        (2, "other opening " + base + " different ending text"),
        (3, "nothing in common with anybody else at all whatsoever truly"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.shared_fps
        for r in winnow_pairs(df, k=3, w=3, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_degenerate_bucket_guard(spark):
    """A fingerprint shared by every document (boilerplate) must be
    dropped by the count guard, not expanded into n^2 pairs."""
    boiler = "call one eight hundred now for your free quote today friends"
    rows = [(i, boiler) for i in range(20)] + [
        (100, "unique text that matches nothing else in this corpus here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_pairs(df, k=3, w=3, min_shared=1, max_bucket_size=5)
    assert out.count() == 0  # every shared bucket exceeds the cap


def test_pair_plan_no_cartesian(spark):
    from patito_spark.plans import executed_plan

    df = spark.createDataFrame(
        [(i, f"w{i} " * 10) for i in range(8)], "doc_id long, text string"
    )
    plan = executed_plan(winnow_pairs(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # bucket guard fused as a window over partitionBy(fp) — the
    # hamming_pairs shape; the count+semi-join spelling cost an extra
    # aggregate exchange plus a join
    assert "Window" in plan


def test_winnow_against_decontamination(spark):
    from patito_spark.operators.winnow import winnow_against
    from patito_spark.plans import executed_plan

    bench_item = "which year did the treaty of westphalia end the thirty years war"
    corpus = spark.createDataFrame(
        [
            (1, "some page quoting: " + bench_item + " trailing commentary"),
            (2, "clean document about cooking pasta with fresh tomatoes daily"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, bench_item)], "qid long, question string"
    )
    hits = winnow_against(
        corpus, bench, ref_text_col="question", ref_id_col="qid",
        k=3, w=3, min_shared=1,
    )
    got = {(r.doc_id, r.ref_id) for r in hits.collect()}
    assert got == {(1, 900)}
    # the reference fingerprint side must broadcast
    assert "BroadcastHashJoin" in executed_plan(
        winnow_against(corpus, bench, ref_text_col="question",
                       ref_id_col="qid", k=3, w=3)
    )


def test_winnow_against_degenerate_reference_guard(spark):
    from patito_spark.operators.winnow import winnow_against

    boiler = "answer the following question to the best of your ability now"
    bench = spark.createDataFrame(
        [(i, boiler) for i in range(50)], "qid long, question string"
    )
    corpus = spark.createDataFrame(
        [(1, "a page that embeds " + boiler + " somewhere in its body")],
        "doc_id long, text string",
    )
    out = winnow_against(
        corpus, bench, ref_text_col="question", ref_id_col="qid",
        k=3, w=3, min_shared=1, max_bucket_size=5,
    )
    assert out.count() == 0


def test_winnow_admission_batch_and_stream(spark, tmp_path):
    from patito_spark.operators.winnow import winnow_admission

    bench_item = "what is the capital city of the ancient kingdom of lydia"
    bench = spark.createDataFrame([(1, bench_item)], "qid long, question string")
    rows = [
        (1, "prefix text then " + bench_item + " suffix commentary words"),
        (2, "a perfectly clean document about gardening in early spring"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_shared_fps, r.admitted)
        for r in winnow_admission(
            df, bench, ref_text_col="question", ref_id_col="qid",
            k=3, w=3, min_shared=1,
        ).collect()
    }
    assert out[1][0] >= 1 and not out[1][1]
    assert out[2] == (0, True)
    assert out[3] == (0, True)  # null text: nothing shared, admitted

    # identical semantics on a stream (stateless map, append mode)
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    stream = spark.readStream.schema("doc_id long, text string").parquet(path)
    gated = winnow_admission(
        stream, bench, ref_text_col="question", ref_id_col="qid",
        k=3, w=3, min_shared=1,
    ).filter("admitted")
    assert gated.isStreaming
    q = (
        gated.writeStream.format("memory").queryName("t_winnow_admit")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    kept = {r.doc_id for r in spark.sql("select doc_id from t_winnow_admit").collect()}
    assert kept == {2, 3}


def test_winnow_admission_reference_cap(spark):
    from patito_spark.operators.winnow import winnow_admission

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(20)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="join form"):
        winnow_admission(docs, docs, k=2, w=2, max_reference_fps=3)


def test_pairs_containment_score(spark):
    from patito_spark.operators.winnow import (
        _doc_fingerprints,
        winnow_pairs,
    )

    quote = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    long_doc = (
        "opening words here " + quote + " and a much longer tail that "
        "keeps going with many additional tokens to dilute the overlap"
    )
    rows = [(1, quote), (2, long_doc)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_pairs(
        df, k=3, w=3, min_shared=1, with_containment=True
    ).collect()
    assert len(out) == 1
    r = out[0]
    n1 = len(_doc_fingerprints(quote.split(" "), 3, 3))
    assert (r.id_a, r.id_b) == (1, 2)
    # doc 1 IS the quote: every one of its fingerprints appears in doc 2
    assert r.containment == pytest.approx(r.shared_fps / n1)
    assert r.containment >= 0.8


def test_containment_exact_under_bucket_pruning(spark):
    """A quote whose fingerprints partly land in pruned boilerplate
    buckets must still report full containment: the with_containment
    path recomputes shared_fps from the UNPRUNED sets of surviving
    pairs (advice r12 — the pruned numerator biased the score down)."""
    from patito_spark.operators.winnow import winnow_pairs

    boiler = "standard footer text repeated on every single page here"
    unique = "rare shared passage linking exactly these two documents"
    # docs 1 and 2 share boiler AND unique; docs 3..14 carry boiler
    # only, making its fingerprint buckets degenerate (> max 10)
    rows = [
        (1, unique + " " + boiler),
        (2, "prefix words then " + unique + " " + boiler + " tail end"),
    ] + [
        (i, f"filler {i} opening remark " + boiler + f" closing {i}")
        for i in range(3, 15)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(k=3, w=3, min_shared=1, max_bucket_size=10)
    pruned = {
        (r.id_a, r.id_b): r.shared_fps
        for r in winnow_pairs(df, **kw).collect()
    }
    exact = {
        (r.id_a, r.id_b): (r.shared_fps, r.containment)
        for r in winnow_pairs(df, with_containment=True, **kw).collect()
    }
    assert (1, 2) in pruned and (1, 2) in exact
    # the boilerplate fingerprints were invisible to the pruned count
    assert exact[(1, 2)][0] > pruned[(1, 2)]
    # and containment uses the same unpruned sets on both sides
    assert 0 < exact[(1, 2)][1] <= 1.0
