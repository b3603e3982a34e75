"""End-to-end training-corpus preparation pipeline."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.pipeline import prepare_training_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    body = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"<p>{body} one</p>"),            # html to strip
        (2, f"{body} one"),                    # near-dup of 1 post-clean
        (3, "completely different sentence about spark pipelines at scale"),
        (4, "tiny"),                           # fails min_tokens
        (5, "benchmark overlap " + "shared eval gram text " * 4),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_training_corpus_stages(spark, corpus):
    benchmark = spark.createDataFrame(
        [(100, "benchmark overlap " + "shared eval gram text " * 4)],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus,
        benchmark=benchmark,
        min_tokens=5,
        dedup_threshold=0.5,
        contamination_ngram=5,
        max_tokens_per_chunk=6,
        pack_max_len=12,
    )
    docs = out["documents"]
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    # 4 dropped (short), 5 dropped (contaminated), 1/2 deduped to one
    assert 3 in ids
    assert 4 not in ids and 5 not in ids
    assert len([i for i in ids if i in (1, 2)]) == 1
    # cleaning stripped the html tags from the survivor
    surviving_text = {r.doc_id: r.text for r in docs.collect()}
    for t in surviving_text.values():
        assert "<p>" not in t

    chunks = out["chunks"].collect()
    assert all(r.n_tokens <= 6 for r in chunks)
    assert {r.doc_id for r in chunks} == set(ids)

    seqs = out["sequences"].collect()
    packed = sorted(k for r in seqs for k in r.doc_ids)
    assert packed == sorted(r.chunk_key for r in chunks)
    for r in seqs:
        assert r.total_tokens <= 12 or r.n_docs == 1


def test_prepare_minimal_call_is_lazy_until_dedup(spark, corpus):
    out = prepare_training_corpus(corpus, dedup_threshold=None)
    # no dedup/benchmark: fully lazy; stage snapshots are lazy too
    assert set(out) == {"documents", "stages"}
    assert set(out["stages"]) == {"clean", "gates"}
    ids = sorted(r.doc_id for r in out["documents"].select("doc_id").collect())
    assert ids == [1, 2, 3, 5]  # only the short doc is gated


def test_prepare_training_corpus_on_testdata(spark):
    """Integration over the real documents table at sf0.001: the full
    stack runs, shrinks the corpus, and emits within-budget sequences."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_in = docs.count()
    out = prepare_training_corpus(
        docs,
        min_tokens=3,
        dedup_threshold=0.7,
        max_tokens_per_chunk=64,
        pack_max_len=256,
    )
    n_docs = out["documents"].count()
    assert 0 < n_docs <= n_in
    seqs = out["sequences"]
    rows = seqs.collect()
    assert all(r.total_tokens <= 256 or r.n_docs == 1 for r in rows)
    # chunking to 64 tokens means nothing is oversize for a 256 budget
    assert all(r.total_tokens <= 256 for r in rows)
    n_chunks = out["chunks"].count()
    assert sum(r.n_docs for r in rows) == n_chunks


def test_prepare_neardup_decontamination(spark):
    """Leaks no verbatim n-gram can catch (gram longer than any shared
    run) survive exact decontamination but fall to the near-dup pass."""
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo").split()
    leak = " ".join(words[1:] + words[:1])  # rotated: near-dup, not equal
    rows = [
        (1, " ".join(words)),  # verbatim benchmark copy
        (2, leak),             # paraphrased leak
        (3, "entirely unrelated text with completely novel vocabulary here"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    benchmark = spark.createDataFrame(
        [(9, " ".join(words))], "doc_id long, text string"
    )
    # contamination_ngram longer than the text: short docs gram as their
    # WHOLE text, so the exact pass catches the verbatim copy (doc 1)
    # but cannot see the rotated leak (doc 2).
    exact_only = prepare_training_corpus(
        corpus, benchmark=benchmark, dedup_threshold=None,
        contamination_ngram=25, min_tokens=3,
    )["documents"]
    assert {r["doc_id"] for r in exact_only.collect()} == {2, 3}

    both = prepare_training_corpus(
        corpus, benchmark=benchmark, dedup_threshold=None,
        contamination_ngram=25, min_tokens=3,
        contamination_neardup_threshold=0.6,
    )["documents"]
    assert {r["doc_id"] for r in both.collect()} == {3}


def test_prepare_perplexity_gate(spark):
    """Documents unlike the reference LM fall to the perplexity gate."""
    from patito_spark.operators.text import build_vocab

    reference = spark.createDataFrame(
        [(1, "spark runs queries over columnar data with hash joins"),
         (2, "queries shuffle columnar data between hash partitions")],
        "doc_id long, text string",
    )
    lm = build_vocab(reference)
    corpus = spark.createDataFrame(
        [(10, "spark queries shuffle columnar data with hash joins"),
         (11, "xylophone quokka terrarium bizarre unrelated gibberish words")],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus, dedup_threshold=None, min_tokens=3,
        max_perplexity=20.0, perplexity_lm=lm,
    )["documents"]
    assert {r["doc_id"] for r in out.collect()} == {10}


def test_prepare_semantic_dedup_stage(spark):
    """Docs 10/11 are semantic duplicates (near-identical embeddings,
    different wording — MinHash can't see it); 12 is distinct; 13 has NO
    embedding row and must survive untouched."""
    import numpy as np

    def unit(v):
        return (v / np.linalg.norm(v)).tolist()

    rng = np.random.RandomState(1)
    a = rng.normal(size=8)
    b = rng.normal(size=8)
    corpus = spark.createDataFrame(
        [
            (10, "the cat sat quietly on the warm windowsill today"),
            (11, "a feline rested peacefully upon the sunny ledge there"),
            (12, "completely unrelated discussion of distributed query engines"),
            (13, "document that was never embedded but is long enough"),
        ],
        "doc_id long, text string",
    )
    embeddings = spark.createDataFrame(
        [
            (10, unit(a)),
            (11, unit(a + 0.01 * rng.normal(size=8))),
            (12, unit(b)),
        ],
        "doc_id long, embedding array<double>",
    )
    out = prepare_training_corpus(
        corpus,
        dedup_threshold=None,
        semantic_threshold=0.95,
        embeddings=embeddings,
        semantic_keep="min_id",
    )
    ids = sorted(r.doc_id for r in out["documents"].collect())
    assert ids == [10, 12, 13]

    with pytest.raises(ValueError, match="embeddings"):
        prepare_training_corpus(corpus, semantic_threshold=0.9)


def test_prepare_paragraph_stages(spark):
    footer = "subscribe to our newsletter for updates"
    corpus = spark.createDataFrame(
        [
            (20, f"unique article about spark internals\n\n{footer}"),
            (21, f"another piece on duckdb oracle testing\n\n{footer}"),
            (22, f"third story covering minhash dedup tricks\n\n{footer}"),
            (23, f"shared paragraph body appears twice here\n\nfresh tail content for doc"),
            (24, "shared paragraph body appears twice here\n\ndifferent ending for this one"),
        ],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus,
        min_tokens=2,
        dedup_threshold=None,
        boilerplate_min_docs=3,
        paragraph_dedup="corpus",
    )
    texts = {r.doc_id: r.text for r in out["documents"].collect()}
    # The 3-doc footer is boilerplate: removed everywhere, incl. first copy.
    assert all(footer not in t for t in texts.values())
    # Corpus paragraph dedup keeps the first copy (doc 23), drops doc 24's.
    assert "shared paragraph body" in texts[23]
    assert "shared paragraph body" not in texts[24]
    assert "different ending" in texts[24]


def test_prepare_span_dedup_stage(spark):
    run = "copied disclaimer text repeated across the whole site verbatim"
    corpus = spark.createDataFrame(
        [
            (30, f"original reporting on spark shuffles {run}"),
            (31, f"{run} plus a genuinely new analysis section"),
            (32, "fully independent document with its own words"),
        ],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus, min_tokens=2, dedup_threshold=None, dedup_span_tokens=5
    )
    texts = {r.doc_id: r.text for r in out["documents"].collect()}
    # Doc 30 carries the first occurrence and keeps it; doc 31's copy of
    # the duplicated run is cut, its novel tail survives the gates.
    assert run in texts[30]
    assert run not in texts[31]
    assert "genuinely new analysis section" in texts[31]
    assert texts[32] == "fully independent document with its own words"


def test_prepare_paragraph_scope_validated(spark):
    corpus = spark.createDataFrame(
        [(1, "one paragraph only")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="scope"):
        prepare_training_corpus(
            corpus, dedup_threshold=None, paragraph_dedup="everywhere"
        )


def test_prepare_shared_gram_gate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [
            (30, base),
            (31, base),
            (32, base),
            (33, "totally original writing with its own words here"),
        ],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus, min_tokens=2, dedup_threshold=None,
        max_shared_gram_frac=0.5,
    )
    assert sorted(r.doc_id for r in out["documents"].collect()) == [33]


def test_prepare_learned_quality_gate(spark):
    from patito_spark.operators.quality_model import train_quality_classifier

    good = "the quick brown fox jumps over the lazy dog again and again"
    junk = "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10 zq11 zq12"
    labeled = spark.createDataFrame(
        [(i, good + f" v{i}", 1.0) for i in range(60)]
        + [(100 + i, junk + f" v{i}", 0.0) for i in range(60)],
        "doc_id long, text string, label double",
    )
    model = train_quality_classifier(labeled)
    corpus = spark.createDataFrame(
        [(1, good + " fresh"), (2, junk + " fresh")],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus, min_tokens=2, dedup_threshold=None,
        quality_model=model, min_model_prob=0.5,
    )
    ids = [r.doc_id for r in out["documents"].collect()]
    assert ids == [1]


def test_prepare_contamination_scrub_action(spark):
    leak = "name the largest planet jupiter obviously"
    corpus = spark.createDataFrame(
        [
            (40, f"useful context paragraph {leak} plus novel discussion"),
            (41, "completely clean article with original content"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(900, leak)], "doc_id long, text string")
    out = prepare_training_corpus(
        corpus,
        benchmark=bench,
        contamination_ngram=4,
        contamination_action="scrub",
        min_tokens=2,
        dedup_threshold=None,
    )["documents"]
    texts = {r.doc_id: r.text for r in out.collect()}
    # The leaked span is cut, the rest of doc 40 survives (the default
    # "drop" action would remove the whole doc).
    assert 40 in texts
    assert leak not in texts[40]
    assert "useful context paragraph" in texts[40]
    assert "novel discussion" in texts[40]
    assert texts[41] == "completely clean article with original content"
    with pytest.raises(ValueError, match="contamination_action"):
        prepare_training_corpus(
            corpus, benchmark=bench, contamination_action="purge",
            dedup_threshold=None,
        )


def test_prepare_contamination_winnow_action(spark):
    """contamination_action='winnow' (round 13): the MOSS partial-
    overlap gate drops a document embedding a benchmark run of at
    least contamination_ngram tokens while a clean doc survives; k/w
    derive from contamination_ngram so the winnowing guarantee matches
    the n-gram contract."""
    leak = "name the largest planet jupiter obviously said the proctor"
    corpus = spark.createDataFrame(
        [
            (50, f"long introduction text then {leak} and some closing"),
            (51, "completely clean article with original content here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, f"quiz item preamble {leak} answer key")],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus,
        benchmark=bench,
        contamination_ngram=8,
        contamination_action="winnow",
        min_tokens=2,
        dedup_threshold=None,
    )
    ids = {r.doc_id for r in out["documents"].collect()}
    assert ids == {51}
    assert "decontamination" in out["stages"]


def test_prepare_arpa_perplexity_gate(spark, tmp_path):
    """perplexity_order=5 with a pretrained .arpa artifact (round 13,
    the CCNet shape): in-model docs survive, out-of-model gibberish
    gates out; a path string loads through load_arpa."""
    arpa = tmp_path / "tiny.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=4\nngram 2=3\n\n"
        "\\1-grams:\n-3.0\t<unk>\n-0.3\t<s>\t-0.2\n"
        "-0.4\tgood\t-0.1\n-0.4\ttext\n\n"
        "\\2-grams:\n-0.1\t<s> good\n-0.1\tgood text\n-0.2\ttext good\n\n"
        "\\end\\\n"
    )
    corpus = spark.createDataFrame(
        [
            (1, "good text good text good text"),
            (2, "zz qq ww rr tt yy uu ii oo pp"),
        ],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus,
        max_perplexity=50.0,
        perplexity_order=5,
        perplexity_arpa=str(arpa),
        min_tokens=2,
        dedup_threshold=None,
    )
    ids = {r.doc_id for r in out["documents"].collect()}
    assert ids == {1}
    assert "perplexity_gate" in out["stages"]
    with pytest.raises(ValueError, match="perplexity_arpa"):
        prepare_training_corpus(
            corpus, max_perplexity=50.0, perplexity_order=5,
            dedup_threshold=None,
        )


def test_prepare_ccnet_buckets_stage(spark, tmp_path):
    """ccnet_buckets=True appends the Wenzek head/middle/tail label
    from the same perplexity pass: per-language terciles (30 docs per
    lang split 10/10/10), composes with AND without the hard gate, and
    raises clearly when the group column is missing."""
    arpa = tmp_path / "tiny.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=3\n\n"
        "\\1-grams:\n-3.0\t<unk>\n-0.3\t<s>\t-0.2\n-0.4\tw\n\n"
        "\\end\\\n"
    )
    rows = []
    for lang in ("en", "de"):
        for i in range(30):
            # perplexity rises with i: i tokens of OOV gibberish
            # appended to a fixed in-model prefix
            text = " ".join(["w"] * 30 + [f"zz{j}" for j in range(i)])
            rows.append((("en" == lang) * 1000 + i, lang, text))
    corpus = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = prepare_training_corpus(
        corpus,
        perplexity_order=5,
        perplexity_arpa=str(arpa),
        ccnet_buckets=True,
        min_tokens=2,
        dedup_threshold=None,
    )
    docs = out["documents"].collect()
    assert "ccnet_buckets" in out["stages"]
    assert "perplexity_gate" not in out["stages"]  # no hard gate asked
    counts = {}
    for r in docs:
        counts[(r.lang, r.ccnet_bucket)] = counts.get(
            (r.lang, r.ccnet_bucket), 0
        ) + 1
    for lang in ("en", "de"):
        for b in ("head", "middle", "tail"):
            # ~equal thirds (sketch breakpoints land on discrete
            # values, so exact 10/10/10 is not guaranteed)
            assert 8 <= counts[(lang, b)] <= 12, counts
    # head really is the low-perplexity third: the gibberish-free docs
    by_id = {r.doc_id: r.ccnet_bucket for r in docs}
    assert by_id[1000] == "head" and by_id[1029] == "tail"

    # with a REAL hard gate (cuts the top-perplexity third): the label
    # must ride the survivors but the ladder stays CORPUS-WIDE (Wenzek
    # 2020 percentiles are over the full scored population, not the
    # post-gate survivors) — survivor labels must equal the ungated
    # run's labels for the same ids
    from patito_spark.operators.arpa import arpa_logloss, load_arpa

    lm = load_arpa(spark, str(arpa))
    ppls = sorted(
        r.arpa_ppl
        for r in arpa_logloss(
            corpus, lm, text_col="text", id_col="doc_id", order=5
        ).collect()
        if r.doc_id >= 1000  # the en half; texts (and ppls) mirror de
    )
    # threshold between the 20th and 21st doc: keeps i=0..19 per lang
    cut = (ppls[19] + ppls[20]) / 2.0
    gated = prepare_training_corpus(
        corpus,
        max_perplexity=cut,
        perplexity_order=5,
        perplexity_arpa=str(arpa),
        ccnet_buckets=True,
        min_tokens=2,
        dedup_threshold=None,
    )
    assert "perplexity_gate" in gated["stages"]
    gated_docs = gated["documents"].collect()
    assert len(gated_docs) == 40  # 20 survivors per lang
    # a post-gate ladder would re-split the survivors into thirds and
    # relabel middle docs as tail; the corpus-wide ladder keeps labels
    for r in gated_docs:
        assert r.ccnet_bucket == by_id[r.doc_id], (
            r.doc_id,
            r.ccnet_bucket,
            by_id[r.doc_id],
        )

    with pytest.raises(ValueError, match="ccnet_group_cols"):
        prepare_training_corpus(
            corpus.drop("lang"),
            perplexity_order=5,
            perplexity_arpa=str(arpa),
            ccnet_buckets=True,
            dedup_threshold=None,
        )


def test_prepare_domain_cap_stage(spark):
    # 30 docs in domain A (quality rises with id), 3 in domain B;
    # cap at 5 keeping best quality -> A's top-5 ids, B untouched.
    rows = [
        (i, "a", float(i), f"domain a document number {i} with plenty of words here")
        for i in range(30)
    ] + [
        (100 + i, "b", 1.0, f"domain b document number {i} with plenty of words here")
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, q double, text string")
    out = prepare_training_corpus(
        df,
        min_tokens=3,
        dedup_threshold=None,
        domain_col="domain",
        max_docs_per_domain=5,
        domain_cap_order_col="q",
    )["documents"]
    got = sorted(r.doc_id for r in out.collect())
    assert got == [25, 26, 27, 28, 29, 100, 101, 102]
    with pytest.raises(ValueError, match="domain_col"):
        prepare_training_corpus(df, max_docs_per_domain=5)


def test_prepare_bigram_perplexity_gate(spark):
    """perplexity_order=2: a scrambled copy of in-domain text gates out
    while the unigram gate (order=1) is blind to it."""
    from patito_spark.operators.text import build_bigram_lm, build_vocab

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(30)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "dog the lazy fox quick jumps brown the over")],
        "doc_id long, text string",
    )
    u_lm, b_lm = build_vocab(ref), build_bigram_lm(ref)

    def kept(order):
        out = prepare_training_corpus(
            probe,
            min_tokens=3,
            dedup_threshold=None,
            max_perplexity=10.0,
            perplexity_lm=u_lm,
            perplexity_order=order,
            perplexity_bigram_lm=b_lm if order == 2 else None,
        )["documents"]
        return sorted(r.doc_id for r in out.collect())

    assert kept(1) == [1, 2]   # unigram: scramble indistinguishable
    assert kept(2) == [1]      # bigram: scramble gates out
    # order 3 is supported since round 12 (self-LM only); unsupported
    # orders still fail loudly
    with pytest.raises(ValueError, match="perplexity_order"):
        prepare_training_corpus(probe, max_perplexity=10.0,
                                perplexity_order=4)


def test_prepare_repair_encoding_stage(spark):
    # mojibake of "l’été à paris" built via the real byte path
    def broken(s):
        out = []
        for b in s.encode("utf-8"):
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
        return "".join(out)

    df = spark.createDataFrame(
        [(1, broken("l’été à paris correspond bien à une saison chaude"))],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        df, min_tokens=3, dedup_threshold=None, repair_encoding=True,
    )["documents"].first()
    assert "’été à" in out["text"]
    assert "Ã" not in out["text"]


def test_prepare_stage_snapshots(spark, corpus):
    benchmark = spark.createDataFrame(
        [(100, "benchmark overlap " + "shared eval gram text " * 4)],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        corpus, benchmark=benchmark, min_tokens=5,
        dedup_threshold=0.5, contamination_ngram=5,
    )
    st = out["stages"]
    assert {"clean", "gates", "near_dedup", "decontamination"} <= set(st)
    # attrition is monotone non-increasing through the gate chain
    n_clean = st["clean"].count()
    n_gates = st["gates"].count()
    n_dedup = st["near_dedup"].count()
    n_final = out["documents"].count()
    assert n_clean >= n_gates >= n_dedup >= n_final
    assert n_final == st["decontamination"].count()


def test_attrition_report_counts_and_order(spark):
    from patito_spark.operators.pipeline import (
        attrition_report,
        prepare_training_corpus,
    )

    rows = [
        (i, "the quick brown fox jumps over the lazy dog number %d ok" % i)
        for i in range(40)
    ]
    rows += [(100 + i, "x") for i in range(10)]      # fails min_tokens
    rows += [(200, rows[0][1]), (201, rows[1][1])]   # near-dups of 0/1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_corpus(df, min_tokens=5, dedup_threshold=0.7)
    rep = attrition_report(out["stages"], input_df=df)
    got = {r.stage: r for r in rep.collect()}
    assert {"clean", "gates", "near_dedup"} <= set(got)
    # gates dropped exactly the 10 short docs
    assert got["gates"].dropped == 10
    assert got["gates"].drop_frac == pytest.approx(10 / 52)
    # dedup dropped the two planted near-dups
    assert got["near_dedup"].rows == 40
    # ordering matches execution order
    idx = [r.stage_index for r in sorted(got.values(), key=lambda r: r.stage_index)]
    assert idx == sorted(idx)
    # final stage row count equals the documents frame
    last = max(got.values(), key=lambda r: r.stage_index)
    assert last.rows == out["documents"].count()


def test_attrition_report_empty_stages_raises(spark):
    from patito_spark.operators.pipeline import attrition_report

    with pytest.raises(ValueError, match="stages is empty"):
        attrition_report({})


def test_pipeline_sentence_boundary_chunking(spark):
    from patito_spark.operators.pipeline import prepare_training_corpus

    rows = [
        (i, "First sentence here. Second one follows. Third is last.")
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_corpus(
        df,
        min_tokens=2,
        dedup_threshold=None,
        max_tokens_per_chunk=5,
        chunk_boundary="sentence",
    )
    chunks = out["chunks"].collect()
    assert all(r.n_tokens <= 5 for r in chunks)
    assert all(r.chunk_text.rstrip()[-1] in ".!?" for r in chunks)


def test_prepare_image_dedup_stage(spark):
    """Multimodal corpora: docs 20/21 carry byte-identical image blobs
    (one pHash -> one survives, min id); 22 has a distinct image; 23
    has NO image and must survive untouched. Attrition is monotone."""
    from patito_spark.operators.pipeline import attrition_report

    corpus = spark.createDataFrame(
        [
            (20, "a photo of a mountain lake at dawn with mist rising",
             bytearray(b"image-bytes-A")),
            (21, "the very same photograph reposted on another site ok",
             bytearray(b"image-bytes-A")),
            (22, "an entirely different picture of a city street corner",
             bytearray(b"image-bytes-B")),
            (23, "a text-only document with no attached image at all",
             None),
        ],
        "doc_id long, text string, blob binary",
    )
    out = prepare_training_corpus(
        corpus,
        dedup_threshold=None,   # isolate the image stage
        image_blob_col="blob",
    )
    ids = sorted(r.doc_id for r in out["documents"].collect())
    assert ids == [20, 22, 23]
    assert "image_dedup" in out["stages"]
    report = attrition_report(out["stages"], input_df=corpus)
    rows = {r.stage: r for r in report.collect()}
    assert rows["image_dedup"].dropped == 1
    counts = [r.rows for r in report.orderBy("stage_index").collect()]
    assert counts == sorted(counts, reverse=True)  # monotone attrition
