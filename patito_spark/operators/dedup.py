"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB / 1000 executors):

* exact: one shuffle on the dedup key (window row_number / hash agg with
  map-side combine).
* MinHash: one-permutation hashing — shingle-hash rows through codegen
  hash aggregates (per-bin mins, map-side combined), then a *band-bucket*
  self-join: candidates only meet inside (band, bucket) groups, never the
  O(n²) cross product. Oversized buckets are capped to bound skew.
* SimHash: 64 bit-vote conditional sums in one codegen hash aggregate;
  candidate pairs by pigeonhole on 16-bit chunks (hamming ≤ 3 guarantees
  one equal chunk), verified with bit_count(xor).
* embeddings: exact pair verify as expressions, or LSH buckets + BLAS
  verification via Arrow batches for the full-table path.
* Jaccard / cosine verification only ever runs on candidate pairs, in the
  SAME feature space that generated the candidates.
* No interpreted higher-order-function lambdas on any per-pair hot path
  (Spark evaluates them interpreted, ~1000× slower than codegen).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from patito_spark.functions.cache import cache_scope, tracked_persist

# ---------------------------------------------------------------------- #
# Exact dedup                                                             #
# ---------------------------------------------------------------------- #


def exact_dedup_keys(
    df: DataFrame,
    subset: Sequence[str],
    id_col: str,
) -> DataFrame:
    """One hash-agg pass: for every distinct key, the minimum id to keep.

    Returns columns ``<subset...>, keep_id``.
    """
    return df.groupBy(*subset).agg(F.min(id_col).alias("keep_id"))


def dedup_exact(
    df: DataFrame,
    subset: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Keep exactly one row (minimum ``id_col``) per distinct ``subset`` key.

    Window ``row_number`` + ``rn == 1``: one shuffle, no join-back, and
    the ``rn <= k`` shape makes Spark plan a PARTIAL WindowGroupLimit
    before the exchange (plan-asserted) — each map partition forwards at
    most one row per key after a slice-bounded local sort, so a hot key
    collapses map-side exactly like a mergeable min aggregate would
    (this is why this window is NOT the keep-first anti-pattern the
    round-10 fixes removed elsewhere: those filtered ``rn > 1`` or
    needed a full count, which WindowGroupLimit cannot serve).
    Deterministic keep-first semantics (unlike ``dropDuplicates`` which
    keeps an arbitrary row).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*subset).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__pt_rn", F.row_number().over(w))
        .filter(F.col("__pt_rn") == 1)
        .drop("__pt_rn")
    )


# ---------------------------------------------------------------------- #
# Shingling + MinHash LSH                                                 #
# ---------------------------------------------------------------------- #


def shingles(text: Union[str, Column], n: int = 3) -> Column:
    """Distinct word n-grams of a text column (pure expressions)."""
    text = F.col(text) if isinstance(text, str) else text
    toks = F.split(text, " ")
    k = F.size(toks) - F.lit(n - 1)
    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def _minhash_seeds(num_hashes: int, seed: int = 42) -> list[int]:
    """Deterministic 63-bit xor constants for the permutation family."""
    import random

    rng = random.Random(seed)
    return [rng.getrandbits(63) for _ in range(num_hashes)]


def minhash_perms_expr(num_hashes: int = 64, seed: int = 42) -> Column:
    """Literal array of (rotation, xor-constant) permutation params.

    Materialized as its own column so the 64-element literal is built once
    per row, not once per (hash, shingle) evaluation.
    """
    seeds = _minhash_seeds(num_hashes, seed)
    entries = ", ".join(
        f"named_struct('r', {(i * 7) % 63 + 1}, 'c', {c}L)"
        for i, c in enumerate(seeds)
    )
    return F.expr(f"array({entries})")


def minhash_signature_expr(base_col: str, perms_col: str = "__perms") -> Column:
    """MinHash signature from a column of base hashes (``array<bigint>``).

    Hash family: bijective rotate-then-xor permutations of the base
    xxhash64 — one real hash evaluation per shingle total, then cheap
    bit-op permutations (no multiply, so no ANSI overflow). One
    higher-order expression; cost is |perms| × |shingles| bit-ops per row.
    """
    return F.expr(
        f"transform({perms_col}, p -> array_min(transform("
        f"{base_col}, h -> (shiftleft(h, p.r) | "
        f"shiftrightunsigned(h, 64 - p.r)) ^ p.c)))"
    )


def gram_array(
    text: Union[str, Column], n: int, distinct: bool = False
) -> Column:
    """All word ``n``-grams of a text column as an array (map-only).

    Like :func:`shingles` but keeps duplicate grams by default (repetition
    statistics need occurrence counts). Documents shorter than ``n``
    tokens contribute their whole text as the single gram.
    """
    text = F.col(text) if isinstance(text, str) else text
    toks = F.split(text, " ")
    k = F.size(toks) - F.lit(n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(grams) if distinct else grams


def shingle_hash_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_mode: str = "xxhash64",
    distinct: bool = True,
    gram_mode: str = "window",
) -> DataFrame:
    """(``__id``, ``__h``) rows: 64-bit hash of each distinct word n-gram.

    Three formulations, selected by ``gram_mode``:

    * ``"zip"`` (round 10) — ``arrays_zip`` of ``n`` parallel token
      slices, exploded and hashed row-level: ALL codegen AND zero
      exchanges (no per-doc lead()-window sort, no interpreted lambda
      — the :mod:`.spans` gram-build trick). The short-doc whole-text
      fallback falls out of ``concat_ws`` null-skipping over the
      padded zip struct. ``distinct=True`` on this path costs a
      dropDuplicates exchange — prefer ``distinct=False`` with a
      duplicate-insensitive consumer (bin-min signatures, collect_set
      verify arrays), which is how the MinHash family calls it.
    * ``"window"`` (default) — tokens explode to rows and n-grams build
      with ``lead()`` windows: everything stays codegen, at the cost of
      one exchange+sort of the token stream (partitioned by document) and,
      with ``distinct=True``, a second exchange for the dedup.
    * ``"map"`` — n-grams build per row with an interpreted
      ``transform``/``slice`` lambda (:func:`gram_array`) and explode:
      ZERO exchanges — ``distinct`` resolves per row via
      ``array_distinct`` (per-document distinct ≡ the (id, gram)
      distinct the window path shuffles for). Interpreted lambdas cost
      more CPU per gram, but no shuffle: kept for consumers that need
      per-row distinct without any exchange (contamination tallies).

    ``hash_mode="portable"`` (md5-derived, engine-reproducible — see
    :mod:`patito_spark.functions.hashing`) lets a SQL oracle replay the
    whole MinHash pipeline; the default ``xxhash64`` is the fast path.
    """
    from pyspark.sql import Window

    from patito_spark.functions.hashing import hash64

    if gram_mode == "zip":
        toks = F.split(F.col(text_col), " ")
        # length max(size-n+1, 1): >= n tokens -> every gram start;
        # shorter docs -> ONE padded struct whose concat_ws (null-
        # skipping) is exactly the whole text — the gram_array fallback.
        k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
        zipped = F.arrays_zip(
            *[F.slice(toks, F.lit(j + 1), k) for j in range(n)]
        )
        g = F.col("__g")
        out = df.select(
            F.col(id_col).alias("__id"), F.explode(zipped).alias("__g")
        ).select(
            "__id",
            hash64(
                F.concat_ws(" ", *[g.getField(str(j)) for j in range(n)]),
                mode=hash_mode,
            ).alias("__h"),
        )
        return out.dropDuplicates(["__id", "__h"]) if distinct else out

    if gram_mode == "map":
        # Hash INSIDE the array and distinct the hash array per row:
        # identical semantics to the window path's (__id, __h) distinct
        # (distinct-by-hash), with zero exchanges. Consumers can then
        # treat a document's hash stream as already-unique — e.g.
        # count(*) after a join ≡ count_distinct (distinctness survives
        # filtering).
        hashes = F.transform(
            gram_array(F.col(text_col), n, distinct=False),
            lambda g: hash64(g, mode=hash_mode),
        )
        if distinct:
            hashes = F.array_distinct(hashes)
        return df.select(
            F.col(id_col).alias("__id"),
            F.explode(hashes).alias("__h"),
        )

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("__pos", "__tok"),
    )
    w = Window.partitionBy("__id").orderBy("__pos")
    gram_cols = [F.col("__tok")] + [
        F.lead("__tok", i).over(w) for i in range(1, n)
    ]
    is_full_gram = gram_cols[-1].isNotNull() if n > 1 else F.lit(True)
    is_short_doc = (F.col("__pos") == 0) & (
        F.size(F.split(F.col("__text"), " ")) < n
    )
    grams = toks.select(
        "__id",
        # documents shorter than n tokens contribute their whole text as
        # the single shingle (otherwise they could never be candidates)
        F.when(is_full_gram, F.concat_ws(" ", *gram_cols))
        .when(is_short_doc, F.col("__text"))
        .alias("__gram"),
    ).filter(F.col("__gram").isNotNull())
    out = grams.select("__id", hash64("__gram", mode=hash_mode).alias("__h"))
    # ``distinct=False`` skips the dedup shuffle for consumers whose
    # downstream aggregate is duplicate-insensitive (min, count_distinct):
    # at 100 TB the distinct exchanges the full gram stream a second time.
    return out.distinct() if distinct else out


def _minhash_doc_features_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    densify: bool,
) -> DataFrame:
    """Per-document MinHash features as ONE map-only Arrow stage.

    Emits one row per non-null-text document: ``__id``, ``__jtokens``
    (the sorted DISTINCT portable gram hashes — exactly
    ``array_sort(collect_set(__h))`` of the zip-mode shingle rows) and
    ``__bands`` (one ``{band, __key}`` struct per band, where
    ``__key`` is the same ``'bin:min,bin:min'`` string
    :func:`banded_signatures` builds — callers apply ``xxhash64`` to
    it JVM-side so bucket values are bit-identical).

    Round 15, the simhash/tf_idf precedent: every stage of the
    signature build is doc-local — gram construction (zip semantics:
    ``k = max(len - n + 1, 1)`` grams, short docs contribute their
    whole text), the md5 gram hash (memoized per distinct gram per
    batch via ``pd.factorize`` — the JVM lane pays md5-hex + base-16
    ``conv`` per gram occurrence), the OPH bin mins, rotation
    densification (Shrivastava & Li 2014: an empty bin borrows the
    next occupied bin's value, circularly — ``np.searchsorted`` over
    the occupied bins) and the band keys. The exploded gram stream,
    its persist, and BOTH per-doc aggregates (bin-min + collect_set)
    disappear; the only exchange left in the LSH pipeline is the
    (band, bucket) stage, which is inherent. Rows are documents:
    duplicate ids are the caller's contract, as with the groupBy lane.
    """
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    assert num_hashes % bands == 0
    r = num_hashes // bands
    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("__id", id_type),
            StructField("__jtokens", ArrayType(LongType())),
            StructField(
                "__bands",
                ArrayType(
                    StructType(
                        [
                            StructField("band", IntegerType()),
                            StructField("__key", StringType()),
                        ]
                    )
                ),
            ),
        ]
    )

    def kernel(batches):
        from itertools import chain

        import numpy as np
        import pandas as pd

        from patito_spark.functions.hashing import portable_hash64_np

        k = num_hashes
        for pdf in batches:
            texts = pdf[text_col]
            valid = texts.notna()
            ids = pdf[id_col][valid].to_numpy()
            if not len(ids):
                continue
            tok_lists = texts[valid].str.split(" ")
            lens = tok_lists.str.len().to_numpy(dtype=np.int64)
            flat = np.asarray(
                list(chain.from_iterable(tok_lists)), dtype=object
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            pos = np.arange(len(flat), dtype=np.int64) - starts[doc_idx]
            # zip-mode grams: docs with >= n tokens emit len-n+1 grams;
            # shorter docs emit their whole text as the single gram
            # (" ".join inverts the single-space split exactly).
            long_start = (lens[doc_idx] >= n) & (pos <= lens[doc_idx] - n)
            gidx = np.nonzero(long_start)[0]
            if len(gidx):
                grams = flat[gidx]
                for j in range(1, n):
                    grams = grams + " "
                    grams = grams + flat[gidx + j]
            else:
                grams = np.empty(0, dtype=object)
            gdoc = doc_idx[gidx]
            short = np.nonzero(lens < n)[0]
            if len(short):
                grams = np.concatenate(
                    [grams, texts[valid].to_numpy()[short]]
                )
                gdoc = np.concatenate([gdoc, short])
            codes, uniques = pd.factorize(grams)
            h = portable_hash64_np(np.asarray(uniques, dtype=object))[codes]
            # distinct (doc, hash) pairs — the verify arrays AND the
            # bin-min input in one sorted pass over (doc, code) keys
            n_u = max(len(uniques), 1)
            keys = gdoc * n_u + codes
            order = np.argsort(keys, kind="stable")
            sk = keys[order]
            first = np.ones(len(sk), dtype=bool)
            first[1:] = sk[1:] != sk[:-1]
            d = (sk[first] // n_u).astype(np.int64)
            dh = h[order][first]
            # per-doc sorted distinct hash lists (__jtokens): dh within
            # a doc is sorted because keys encode (doc, code) and we
            # need value-sorted — sort per doc by (doc, hash)
            o2 = np.lexsort((dh, d))
            d2, dh2 = d[o2], dh[o2]
            doc_bounds = np.nonzero(
                np.concatenate(([True], d2[1:] != d2[:-1]))
            )[0]
            jtok_lists = np.split(dh2, doc_bounds[1:])
            jdocs = d2[doc_bounds]
            # OPH bin mins over distinct hashes: group by (doc, bin),
            # min = first of each group under (doc, bin, hash) sort
            bins = dh2 % k
            o3 = np.lexsort((dh2, bins, d2))
            d3, b3, h3 = d2[o3], bins[o3], dh2[o3]
            gfirst = np.ones(len(d3), dtype=bool)
            gfirst[1:] = (d3[1:] != d3[:-1]) | (b3[1:] != b3[:-1])
            gd, gb, gm = d3[gfirst], b3[gfirst], h3[gfirst]
            gb_bounds = np.nonzero(
                np.concatenate(([True], gd[1:] != gd[:-1]))
            )[0]
            occ_bins = np.split(gb, gb_bounds[1:])
            occ_mins = np.split(gm, gb_bounds[1:])
            occ_docs = gd[gb_bounds]
            # assemble rows doc by doc (numpy per doc is <= k elements)
            rows_id, rows_jt, rows_bands = [], [], []
            jt_by_doc = dict(zip(jdocs.tolist(), jtok_lists))
            for di, ob, om in zip(occ_docs.tolist(), occ_bins, occ_mins):
                if densify:
                    idx = np.searchsorted(ob, np.arange(k), side="left")
                    idx[idx == len(ob)] = 0
                    # searchsorted gives first occupied bin >= i; when
                    # none remains above, wrap to the first occupied
                    # (the scan seed in the SQL spelling)
                    dense = om[idx % len(ob)]
                    pairs = [
                        f"{i}:{dense[i]}" for i in range(k)
                    ]
                    bands_list = [
                        {
                            "band": b,
                            "__key": ",".join(pairs[b * r: (b + 1) * r]),
                        }
                        for b in range(bands)
                    ]
                else:
                    bands_list = []
                    bb = (ob // r).astype(np.int64)
                    for b in np.unique(bb):
                        sel = bb == b
                        bands_list.append(
                            {
                                "band": int(b),
                                "__key": ",".join(
                                    f"{bi}:{mi}"
                                    for bi, mi in zip(ob[sel], om[sel])
                                ),
                            }
                        )
                rows_id.append(di)
                rows_jt.append(jt_by_doc[di])
                rows_bands.append(bands_list)
            yield pd.DataFrame(
                {
                    "__id": ids[np.asarray(rows_id, dtype=np.int64)],
                    "__jtokens": rows_jt,
                    "__bands": rows_bands,
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def banded_signatures(
    shingle_rows: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    densify: bool = True,
) -> DataFrame:
    """``(__id, band, bucket)`` banded OPH keys from shingle-hash rows.

    One-permutation hashing (Li/Owen/Zhang 2012): instead of k permutation
    passes per shingle (O(k·|shingles|) interpreted higher-order-function
    evals — the slow path), hash each shingle ONCE, route it to bin
    h mod k, and take the per-bin min via a codegen hash aggregate.
    Map-side combine reduces each partition to ≤ k rows per doc before the
    shuffle, so at 100 TB the exchanged data is ~k·n_docs longs, not the
    shingle stream.

    ``densify=True`` (default) applies rotation densification
    (Shrivastava & Li 2014): empty bins borrow the value of the next
    occupied bin, circularly. Without it a band whose key holds only one
    or two occupied bins has effective signature length r < rows-per-band,
    and its false-positive collision rate degrades from j^r to ~j^1-j^2.
    On a corpus whose n-gram space saturates (boilerplate-heavy web text,
    or any fixed-vocabulary synthetic set), those weak bands dominate:
    measured at sf0.1→sf1 (10× docs, 31-word vocabulary), non-densified
    candidates grew 88× (5.9k → 519k) while true duplicates stayed flat;
    densified growth is ~linear — see docs/scaling.md §Densification.

    Densification is computed IN PLACE on the one row per document that
    the per-doc aggregate already produces: a single right-to-left
    ``aggregate`` scan over a fixed ``num_hashes``-slot array (seeded
    with the wrap value — the first occupied bin's min, which is just
    the first entry of the bin-sorted map), then ``bands`` band keys are
    emitted directly. No 64-row explode, no window sort, nothing extra
    shuffled: the whole fill is a map-side expression over
    ``n_docs`` rows.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    bin_mins = (
        shingle_rows.withColumn(
            "__bin", F.pmod(F.col("__h"), F.lit(num_hashes))
        )
        .groupBy("__id", "__bin")
        .agg(F.min("__h").alias("__min"))
    )
    if densify:
        k, r = num_hashes, rows_per_band
        per_doc = bin_mins.groupBy("__id").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("__bin", "__min")))
            ).alias("__m")
        )
        # Dense 64-slot array: scan the reversed raw grid left-to-right so
        # each empty slot takes the value of the next occupied bin; the
        # accumulator starts at the wrap value (first occupied bin's min =
        # first value of the bin-sorted map), which is exactly the
        # circular borrow for trailing empty bins. O(k) per doc.
        dense = (
            "reverse(aggregate("
            f" reverse(transform(sequence(0, {k - 1}),"
            "   i -> element_at(__m, cast(i as bigint)))),"
            " struct(cast(array() as array<bigint>) as out,"
            "        element_at(map_values(__m), 1) as last),"
            " (acc, x) -> struct(array_append(acc.out, coalesce(x, acc.last)),"
            "                    coalesce(x, acc.last)),"
            " acc -> acc.out))"
        )
        # One (band, bucket) row per band, keyed by the same
        # 'bin:min,bin:min' string the sparse path builds — so bucket
        # equality (all the LSH join sees) is identical by construction.
        band_rows = (
            f"transform(sequence(0, {bands - 1}), b -> struct("
            " cast(b as int) as band,"
            " xxhash64(array_join(transform("
            f"  sequence(cast(b*{r} as bigint), cast(b*{r}+{r - 1} as bigint)),"
            "  i -> concat(i, ':', element_at(__d, cast(i+1 as int)))), ','))"
            " as bucket))"
        )
        return (
            per_doc.withColumn("__d", F.expr(dense))
            .select("__id", F.explode(F.expr(band_rows)).alias("__bb"))
            .select("__id", "__bb.band", "__bb.bucket")
        )
    return (
        bin_mins.withColumn(
            "band", (F.col("__bin") / F.lit(rows_per_band)).cast("int")
        )
        .groupBy("__id", "band")
        .agg(
            F.sort_array(F.collect_list(F.struct("__bin", "__min"))).alias(
                "__pairs"
            )
        )
        .select(
            "__id",
            "band",
            F.xxhash64(
                F.expr(
                    "array_join(transform(__pairs, "
                    "p -> concat(p.__bin, ':', p.__min)), ',')"
                )
            ).alias("bucket"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    max_bucket_size: int = 1000,
    shingle_rows: Optional[DataFrame] = None,
    hash_mode: str = "xxhash64",
    densify: bool = True,
    banded_rows: Optional[DataFrame] = None,
) -> DataFrame:
    """Candidate duplicate pairs via banded MinHash LSH.

    Returns ``id_a < id_b`` pairs that share at least one band bucket.
    ``max_bucket_size`` drops degenerate buckets (e.g. empty documents) to
    bound the quadratic blow-up inside a single bucket at scale.
    ``shingle_rows`` lets callers reuse a precomputed
    :func:`shingle_hash_rows` output (avoids re-shingling the corpus);
    ``banded_rows`` a precomputed ``(__id, band, bucket)`` frame (the
    round-15 Arrow feature path), which skips the signature build here
    entirely.
    ``densify`` — see :func:`banded_signatures`; the default keeps the
    band collision probability on the designed j^r curve, which is what
    bounds candidate growth on gram-dense corpora.
    """
    if banded_rows is not None:
        banded = banded_rows
    else:
        exploded = (
            shingle_rows
            if shingle_rows is not None
            else shingle_hash_rows(
                df, id_col=id_col, text_col=text_col, n=shingle_size,
                hash_mode=hash_mode,
            )
        )
        banded = banded_signatures(
            exploded, num_hashes=num_hashes, bands=bands, densify=densify
        )
    # The skew guard runs BEFORE any member list materializes, fused
    # into the bucket stage's ONE exchange (round 14, the
    # hamming_pairs discipline): a window count over
    # partitionBy(band, bucket) — WindowExec buffers spillably —
    # filters to 1 < n <= max_bucket_size, and the collect_list
    # aggregate rides the window's own partitioning and sort as a
    # streaming sort-aggregate. A degenerate hot bucket (thousands of
    # empty/identical docs sharing a banded signature) is therefore
    # dropped by a counter, never buffered whole in one aggregation
    # buffer (collect_list buffers cannot spill — round-10 advice),
    # and the guard bounds every collected array at max_bucket_size.
    # The old count + semi-join spelling cost two extra exchanges and
    # needed `banded` persisted for its two branches; this shape has
    # one consumer and no cache. Pair expansion is a codegen double
    # explode over the sorted arrays (a < b keeps each in-bucket pair
    # once) — the interpreted transform/slice lambda it replaces ran
    # per bucket element; the cross-band distinct stays (a pair shares
    # up to `bands` buckets).
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    guarded = (
        banded.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter((F.col("__n") > 1) & (F.col("__n") <= max_bucket_size))
        .drop("__n")
    )
    buckets = guarded.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list("__id")).alias("__ids")
    )
    pairs = (
        buckets.select(F.explode("__ids").alias("id_a"), "__ids")
        .select("id_a", F.explode("__ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return pairs.distinct()


def jaccard(tokens_a: Column, tokens_b: Column) -> Column:
    """Jaccard similarity of two (deduplicated) token-array columns."""
    intersection = F.size(F.array_intersect(tokens_a, tokens_b)).cast("double")
    union = (
        F.size(tokens_a) + F.size(tokens_b)
    ).cast("double") - intersection
    return F.when(union == 0, F.lit(1.0)).otherwise(intersection / union)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    shingle_size: int = 3,
    hash_mode: str = "xxhash64",
    materialize_shingles: bool = True,
    broadcast_verify_max_docs: Optional[int] = 100_000,
    engine: str = "auto",
    **lsh_kwargs,
) -> DataFrame:
    """Verified duplicate pairs: LSH candidates filtered by true Jaccard.

    ``engine="auto"`` (default) runs the per-document feature build —
    shingles, gram hashes, OPH bin mins, densification, band keys AND
    the verify gram-sets — as ONE map-only Arrow stage when
    ``hash_mode="portable"`` (:func:`_minhash_doc_features_arrow`; the
    JVM md5 + base-16 conv per gram occurrence was the pipeline's
    dominant cost, and every one of those stages is doc-local). The
    cached frame is then one row per document instead of the exploded
    gram stream. ``engine="sql"`` keeps the codegen spelling;
    xxhash64 mode always uses it (no numpy xxhash64).

    Verification uses the SAME shingle space as the signatures (so the
    threshold means what the MinHash collision probability estimates), and
    only touches candidate pairs — cost proportional to the number of
    near-duplicates, not n². Both stages share one shingle-hash pipeline:
    verification intersects the per-doc hash-gram arrays (sorted bigint
    arrays, cheap JVM set ops) instead of re-shingling text per pair.

    The shared shingle rows feed BOTH branches, and Catalyst does not
    share common subplans — without materialization the corpus is
    re-shingled per branch. ``materialize_shingles`` (default) caches
    them (memory-and-disk, ~tokens × 16 bytes); disable it to trade
    recomputation for zero cache footprint.

    The verify join attaches each doc's hash-gram array to its candidate
    pairs. While the per-doc array table has ≤
    ``broadcast_verify_max_docs`` rows (default 100k ≈ 50 MB of sorted
    bigint arrays) it is BROADCAST, so candidate pairs never shuffle —
    the whole verify is map-side against the (Spark-reused) broadcast.
    Above the bound it falls back to two shuffle joins, the only shape
    that scales to web-corpus doc counts; the probe count runs on the
    persisted array table so the aggregate is not paid twice. Pass
    ``broadcast_verify_max_docs=None`` to force the shuffle shape.
    """
    if engine not in ("auto", "sql", "arrow"):
        raise ValueError(f"engine must be 'auto', 'sql' or 'arrow', got {engine!r}")
    if engine == "auto":
        engine = "arrow" if hash_mode == "portable" else "sql"
    if engine == "arrow":
        if hash_mode != "portable":
            raise ValueError(
                "engine='arrow' requires hash_mode='portable' (xxhash64 "
                "has no numpy equivalent; the JVM lane is already fast)"
            )
        feats = _minhash_doc_features_arrow(
            df, id_col, text_col, n=shingle_size,
            num_hashes=lsh_kwargs.get("num_hashes", 64),
            bands=lsh_kwargs.get("bands", 16),
            densify=lsh_kwargs.get("densify", True),
        )
        if materialize_shingles:
            feats = tracked_persist(feats)
        banded = (
            feats.select("__id", F.explode("__bands").alias("__b"))
            .select(
                "__id",
                F.col("__b.band").alias("band"),
                F.xxhash64(F.col("__b.__key")).alias("bucket"),
            )
        )
        candidates = minhash_lsh_candidates(
            df, id_col=id_col, text_col=text_col,
            shingle_size=shingle_size, banded_rows=banded, **lsh_kwargs,
        )
        toks = feats.select(
            F.col("__id").alias("__jid"), "__jtokens"
        )
    else:
        # gram_mode="zip" + distinct=False (round 10): the zero-exchange
        # codegen gram build. Every consumer is duplicate-insensitive —
        # the bin-min signature aggregate is idempotent under repeats,
        # and the verify arrays below use collect_set — so the dedup
        # exchange the distinct would cost is skipped entirely.
        shingle_rows = shingle_hash_rows(
            df, id_col=id_col, text_col=text_col, n=shingle_size,
            hash_mode=hash_mode, distinct=False, gram_mode="zip",
        )
        if materialize_shingles:
            shingle_rows = tracked_persist(shingle_rows)
        candidates = minhash_lsh_candidates(
            df,
            id_col=id_col,
            text_col=text_col,
            shingle_size=shingle_size,
            shingle_rows=shingle_rows,
            **lsh_kwargs,
        )
        toks = shingle_rows.groupBy(F.col("__id").alias("__jid")).agg(
            F.array_sort(F.collect_set("__h")).alias("__jtokens")
        )
    if broadcast_verify_max_docs is not None:
        toks = tracked_persist(toks)
        if toks.count() <= broadcast_verify_max_docs:
            toks = F.broadcast(toks)
    verified = (
        candidates.join(
            toks.withColumnsRenamed({"__jid": "id_a", "__jtokens": "tokens_a"}),
            on="id_a",
        )
        .join(
            toks.withColumnsRenamed({"__jid": "id_b", "__jtokens": "tokens_b"}),
            on="id_b",
        )
        .withColumn("jaccard", jaccard(F.col("tokens_a"), F.col("tokens_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    ngram: int = 1,
    scope: Optional[Column] = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all in-scope pairs.

    This is the brute-force verifier (O(n²) in scope size): restrict with
    ``scope`` or use :func:`minhash_dedup_pairs` at scale.
    """
    base = df.filter(scope) if scope is not None else df
    feats = base.select(
        F.col(id_col),
        (
            F.array_distinct(F.split(F.col(text_col), " "))
            if ngram == 1
            else shingles(text_col, n=ngram)
        ).alias("__grams"),
    )
    feats = tracked_persist(feats)  # feeds both sides of the pair join
    a = feats.select(
        F.col(id_col).alias("id_a"), F.col("__grams").alias("grams_a")
    )
    b = feats.select(
        F.col(id_col).alias("id_b"), F.col("__grams").alias("grams_b")
    )
    return (
        a.join(b, on=[a.id_a < b.id_b])
        .withColumn("jaccard", jaccard(F.col("grams_a"), F.col("grams_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------- #
# SimHash                                                                 #
# ---------------------------------------------------------------------- #


def _simhash_signatures_arrow(
    df: DataFrame, id_col: str, text_col: str, bits: int
) -> DataFrame:
    """Map-only Arrow lane for portable-mode SimHash signatures.

    Bit-identical to the sql lane: tokens are ``split(text, ' ')`` with
    empty strings kept (pandas ``str.split(' ')`` matches Java
    ``split(re, -1)`` for the single-space pattern), null text yields
    no row (split(null) explodes to nothing), the hash is the first 15
    md5 hex chars as an int (= digest[:8] big-endian >> 4), and bit i
    votes positive iff ``2*ones_i > n`` (ties excluded, exactly the
    sql lane's predicate). Only bits 0-59 can ever set (the portable
    hash's top 4 bits are constant 0), so the loop stops at
    ``min(bits, 60)`` — identical output for any ``bits``.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [StructField("__id", id_type), StructField("__sig", LongType())]
    )
    n_bits = min(bits, 60)

    def kernel(batches):
        from itertools import chain

        import numpy as np
        import pandas as pd

        from patito_spark.functions.hashing import portable_hash64_np

        for pdf in batches:
            texts = pdf[text_col]
            valid = texts.notna()
            ids_v = pdf[id_col][valid]
            if not len(ids_v):
                continue
            tok_lists = texts[valid].str.split(" ")
            lens = tok_lists.str.len().to_numpy(dtype=np.int64)
            flat = np.asarray(
                list(chain.from_iterable(tok_lists)), dtype=object
            )
            codes, uniques = pd.factorize(flat)
            h = portable_hash64_np(
                np.asarray(uniques, dtype=object)
            ).view(np.uint64)[codes]
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sig = np.zeros(len(lens), dtype=np.uint64)
            for b in range(n_bits):
                ones = np.add.reduceat(
                    ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64),
                    starts,
                )
                sig |= (ones * 2 > lens).astype(np.uint64) << np.uint64(b)
            yield pd.DataFrame(
                {"__id": ids_v.to_numpy(), "__sig": sig.astype(np.int64)}
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_mode: str = "xxhash64",
    engine: str = "auto",
) -> DataFrame:
    """SimHash signatures (``__id``, ``__sig`` bigint).

    Two execution lanes, identical output:

    - ``engine="sql"`` — codegen hash agg: explode token hashes to
      rows, then ONE hash aggregate with ``ceil(bits/2)`` packed vote
      counters (two 32-bit ones-count lanes per 64-bit sum; each
      token's hash votes per bit). Everything stays in whole-stage
      codegen — higher-order array functions are interpreted in Spark
      and ~1000× slower per op. Map-side combine reduces each
      partition to one partial-vote row per doc before the shuffle.
    - ``engine="arrow"`` (portable mode only) — ONE map-only
      Arrow-batched stage, ZERO exchanges (round 15; the
      repetition_stats/document_profile precedent): each batch
      tokenizes in pandas, `pd.factorize`s the tokens and runs md5
      ONCE PER DISTINCT token in the batch (the JVM lane pays
      md5 + base-16 `conv` per token OCCURRENCE — measured 6× the
      oracle's vectorized md5 at sf1), then computes the per-doc bit
      votes with C-speed numpy `reduceat` over the doc-contiguous
      token stream and packs the signature in-kernel. Per-batch
      memoization degrades gracefully with vocabulary size (a
      web-scale batch still amortizes natural-text token repetition);
      the stage stays map-only at any scale.

    ``engine="auto"`` (default) picks arrow for ``hash_mode=
    "portable"`` (the md5 lane, where the JVM constant dominates) and
    sql for ``xxhash64`` (already JVM-vectorized, and xxhash64 has no
    numpy equivalent).

    ``hash_mode="portable"`` (60-bit md5-derived) makes signatures
    engine-reproducible for SQL oracles; its top 4 bits are constant 0 so
    the effective signature is 60 bits — fine for near-dup voting.
    """
    from patito_spark.functions.hashing import hash64

    if engine not in ("auto", "sql", "arrow"):
        raise ValueError(f"engine must be 'auto', 'sql' or 'arrow', got {engine!r}")
    if engine == "auto":
        engine = "arrow" if hash_mode == "portable" else "sql"
    if engine == "arrow":
        if hash_mode != "portable":
            raise ValueError(
                "engine='arrow' requires hash_mode='portable' (xxhash64 "
                "has no numpy equivalent; the JVM lane is already fast)"
            )
        return _simhash_signatures_arrow(df, id_col, text_col, bits)

    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).select("__id", hash64("__tok", mode=hash_mode).alias("__h"))
    # Packed vote counters: two 32-bit lanes per 64-bit accumulator —
    # lane k of accumulator j counts the tokens whose hash bit 2j+k is
    # set. Halves the aggregation-buffer updates of the naive
    # one-sum-per-bit shape (measured ~25% off the signature stage at
    # sf1) and replaces the ±1 branch with straight-line bit
    # arithmetic. Bit i then votes positive iff ones_i > n/2, i.e.
    # 2*ones_i > n — identical (ties included) to sum(±1) > 0. The
    # binding overflow is the odd lane's (<<32) contributions saturating
    # the signed int64 SUM at 2^31 tokens in ONE document — still far
    # beyond Spark's 2 GiB string limit, so the packing is safe at any
    # reachable document size.
    n_acc = (bits + 1) // 2
    aggs = [F.count(F.lit(1)).alias("__n")]
    for j in range(n_acc):
        b0, b1 = 2 * j, 2 * j + 1
        if b1 < bits:
            lane_expr = f"((__h >> {b0}) & 1L) + (((__h >> {b1}) & 1L) << 32)"
        else:
            lane_expr = f"((__h >> {b0}) & 1L)"
        aggs.append(F.sum(F.expr(lane_expr)).alias(f"__p{j}"))
    votes = exploded.groupBy("__id").agg(*aggs)
    terms = []
    for i in range(bits):
        j, k = divmod(i, 2)
        lane = f"((__p{j} >> {32 * k}) & 4294967295L)"
        terms.append(f"if(({lane} * 2) > __n, shiftleft(1L, {i}), 0L)")
    return votes.select("__id", F.expr(" | ".join(terms)).alias("__sig"))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: Union[int, str] = "auto",
    hash_mode: str = "xxhash64",
    max_bucket_size: Optional[int] = 100_000,
    expand: str = "full",
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance.

    Candidates meet in :func:`hamming_pairs`' combination-keyed
    pigeonhole buckets (never a cross join) and verify with
    ``bit_count(a XOR b)``. ``chunks="auto"`` (default) sizes the block
    count from the corpus's distinct-signature count — Manku et al.'s
    (WWW 2007) fixed ``chunks=8`` is the multi-billion-document
    configuration; pass it explicitly at that scale. NOTE auto mode is
    EAGER: it runs one count job on the (persisted) signature table at
    plan-build time; callers composing plans speculatively should pass
    an int ``chunks`` to stay fully lazy (the quantile_bins
    convention).

    ``max_bucket_size`` semantics (since the canonical-combination
    dedup): a pair survives only if its CANONICAL combination's bucket
    passes the guard — a pair whose canonical bucket is pruned is
    dropped even when the pair co-occurs in another surviving bucket.
    Recall is sacrificed only inside pathological (guard-dropped)
    buckets, e.g. massively templated corpora; raise or disable the
    guard (``None``) if those pairs matter.
    """
    sigs = simhash_signatures(
        df, id_col=id_col, text_col=text_col, hash_mode=hash_mode
    )
    # The signature table feeds the distinct-signature collapse AND the
    # pair expansion; Catalyst would otherwise run the 64-sum
    # aggregation twice.
    sigs = tracked_persist(sigs)
    return hamming_pairs(
        sigs, max_hamming=max_hamming, chunks=chunks,
        max_bucket_size=max_bucket_size, expand=expand,
    )


def auto_chunk_count(n_sigs: int, max_hamming: int) -> int:
    """Pick the pigeonhole block count for ``n_sigs`` distinct
    signatures: the smallest ``b > max_hamming`` whose combination keys
    are wide enough that the expected bucket population stays sparse
    (``key_bits >= log2(n) + 4``, i.e. <= 1/16 signatures per bucket),
    capped at 256 combination tables.

    Manku's fixed ``chunks=8`` (WWW 2007) is sized for multi-billion-row
    crawls; at smaller corpora its C(8, 8-h) tables pay 4-14x more
    exploded rows than the recall theorem needs (any pair within ``h``
    differing bits agrees on EXACTLY some ``b - h`` of ``b`` blocks, for
    ANY ``b > h``). Auto-sizing keeps the exchange linear in what the
    corpus actually requires; past ~2^32 distinct signatures the combo
    cap binds and callers should tune ``chunks`` explicitly."""
    import math

    need = max(1, (max(n_sigs, 2) - 1).bit_length()) + 4
    best = max_hamming + 1
    for b in range(max_hamming + 1, 17):
        agree = b - max_hamming
        if math.comb(b, agree) > 256:
            break
        best = b
        if agree * (64 // b) >= need:
            return b
    return best


def hamming_combination_masks(chunks: int, max_hamming: int) -> list:
    """The Manku-2007 combination masks: one signed-64 mask per way of
    choosing ``chunks - max_hamming`` of the ``chunks`` equal bit
    slices (all chunks when ``max_hamming >= chunks``, which degrades
    recall to single-chunk agreement — callers should keep
    ``max_hamming < chunks``)."""
    from itertools import combinations

    bits_per_chunk = 64 // chunks
    agree = max(1, chunks - max_hamming)
    masks = []
    for combo in combinations(range(chunks), agree):
        m = 0
        for c in combo:
            m |= ((1 << bits_per_chunk) - 1) << (c * bits_per_chunk)
        masks.append(m - (1 << 64) if m >= (1 << 63) else m)
    if len(masks) > 1024:
        raise ValueError(
            f"hamming pigeonhole would need C({chunks}, {agree}) = "
            f"{len(masks)} combination tables; lower `chunks` or "
            "`max_hamming` (e.g. chunks=8 keeps the table count <= 70)"
        )
    return masks


def hamming_pairs(
    sigs: DataFrame,
    id_col: str = "__id",
    sig_col: str = "__sig",
    max_hamming: int = 3,
    chunks: Union[int, str] = "auto",
    max_bucket_size: Optional[int] = 100_000,
    expand: str = "full",
    broadcast_members_max: Optional[int] = 1_000_000,
) -> DataFrame:
    """Pairs of 64-bit signatures within ``max_hamming`` differing bits.

    The pigeonhole self-join shared by SimHash text dedup and pHash
    image dedup (any 64-bit fingerprint family), built to survive
    web-scale corpora (Manku et al., WWW 2007 — the construction behind
    Google's simhash crawl dedup):

    1. **Distinct-signature collapse.** The join runs over DISTINCT
       signatures only; identical signatures (the degenerate hot case —
       empty docs, blank images) collapse to ONE row before any join
       and pair up in a separate linear exact-duplicate pass.
    2. **Combination keys.** A pair within ``h`` differing bits differs
       in at most ``h`` of the ``c = chunks`` equal slices, so it
       agrees EXACTLY on some combination of ``c - h`` slices. Each of
       the ``C(c, c-h)`` combinations becomes one bucket key — the
       signature ANDed with that combination's bit mask — of width
       ``(c-h) * 64/c`` bits (the old single-chunk scheme keyed on
       64/c bits, quadratic at 1B rows). Pairs expand WITHIN each
       bucket (one aggregate + double explode — no self-join). Recall
       is exact for ``max_hamming < chunks`` at ANY block count.
       ``chunks="auto"`` (default) sizes the block count from the
       DISTINCT-signature count (:func:`auto_chunk_count`) — Manku's
       fixed 8 is the multi-billion-row setting and pays 4-14x more
       exploded rows than smaller corpora need (sf1 measured: 70
       combos -> 15, pair machinery 3.4 s -> 1.4 s, identical output).
       Auto mode runs ONE eager count job on ``sigs`` at plan-build
       time (member count upper-bounds the distinct-signature count —
       oversizing only widens keys, never loses recall); pass an int
       to keep plan construction fully lazy.
    3. **Bucket pre-prune.** A cheap map-side-combined count per
       (combination, key) keeps only ``1 < n <= max_bucket_size``
       buckets (same backstop as the MinHash LSH path): a pathological
       key collision among distinct signatures is dropped by a counter
       instead of detonating the join. ``None`` disables the guard.
    4. **Canonical-combination dedup.** Each qualifying pair is kept
       only in the combination holding its smallest agreeing chunk
       indices — a codegen bit predicate on ``sig_a ^ sig_b`` — so the
       ~C(|agreeing|, agree)-fold redundant candidate stream never
       shuffles into a distinct. Under the guard this means a pair
       needs its canonical bucket (not any bucket) to survive.
    5. **Broadcast expansion joins (auto mode only).** The near-pair
       edges rejoin the member table twice to recover doc ids; when the
       member count (known from the same eager step) is at most
       ``broadcast_members_max`` (default 1M rows ~ 16 MB), the member
       side is broadcast so the edge stream never shuffles. Above the
       bound — web-corpus doc counts — the joins shuffle on the
       signature, the only shape that scales. With explicit ``chunks``
       no count runs and AQE decides.

    ``expand`` controls the output contract:

    - ``"full"`` (default): every qualifying pair — ``id_a, id_b,
      hamming`` with ``id_a < id_b``. Within an exact-duplicate group
      of g members this is g*(g-1)/2 rows: inherent to the contract,
      not to the join (candidates stay sub-quadratic).
    - ``"star"``: a linear-size edge set with the SAME connected
      components — each member links to its signature group's min-id
      representative (hamming 0), and near signatures link
      representative-to-representative. Use this at corpus scale when
      the pairs feed :func:`..graph.connected_components`.

    Callers persist ``sigs`` if computing it is expensive (the collapse
    and the expansion both read it).
    """
    if expand not in ("full", "star"):
        raise ValueError(f"expand must be 'full' or 'star', got {expand!r}")
    if isinstance(chunks, str) and chunks != "auto":
        raise ValueError(f"chunks must be an int or 'auto', got {chunks!r}")

    members = sigs.select(
        F.col(id_col).alias("__mid"), F.col(sig_col).alias("__msig")
    )
    usigs = tracked_persist(members.select(F.col("__msig").alias("__usig")).distinct())
    broadcast_members = False
    if chunks == "auto":
        # The eager step of auto mode: ONE count job on `sigs` (cheap
        # when the caller persisted it — the documented contract;
        # simhash_dedup_pairs/image_dedup_pairs do). The member count
        # upper-bounds the distinct-signature count, so sizing from it
        # only ever widens keys (never loses recall); counting the
        # distinct table itself would cost an extra eager
        # exchange+persist pass (~0.7 s at sf1 vs 0.15 s for this
        # count). Corpora where members vastly outnumber distinct
        # signatures should pass `chunks` explicitly.
        n_members = sigs.count()
        chunks = auto_chunk_count(n_members, max_hamming)
        if broadcast_members_max is not None:
            broadcast_members = n_members <= broadcast_members_max
    masks = hamming_combination_masks(chunks, max_hamming)

    def keyed(sig_alias: str):
        # Map-only over the persisted distinct signatures: one AND per
        # combination, exploded to (combo_id, key) rows.
        return usigs.select(
            F.col("__usig").alias(sig_alias),
            F.posexplode(
                F.array(
                    *[
                        F.col("__usig").bitwiseAND(F.lit(m).cast("long"))
                        for m in masks
                    ]
                )
            ).alias("__combo", "__key"),
        )

    left = keyed("sig_a")
    if max_bucket_size is not None:
        # Skew guard fused into the pair stage's ONE exchange: the
        # bucket count is a window over partitionBy(__combo, __key) —
        # the exact partitioning the bucket aggregate below needs — so
        # the guard adds ZERO exchanges (the earlier count+semi-join
        # shape cost two more). Only 1 < n <= max_bucket_size buckets
        # survive; a pathological key collision among distinct
        # signatures is dropped by a counter, never materialized (the
        # giant group sorts SPILLABLY in one partition — WindowExec's
        # external row buffer — and dies at the filter). Crucially the
        # guard also BOUNDS the bucket arrays collected below at
        # max_bucket_size entries each, keeping the pair expansion
        # memory-safe under adversarial keys.
        from pyspark.sql import Window

        w = Window.partitionBy("__combo", "__key")
        left = (
            left.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter((F.col("__n") > 1) & (F.col("__n") <= max_bucket_size))
            .drop("__n")
        )
    # Canonical-combination dedup (Manku §4's duplicate-suppression
    # idea): a pair within max_hamming agrees on >= (chunks - h)
    # chunks, so the pigeonhole join finds it once per agreeing
    # combination — ~C(|S|, agree) times (13x average on templated
    # corpora). Instead of shuffling that redundant stream into a
    # .distinct(), keep the pair ONLY in its canonical combination:
    # the one holding its `agree` SMALLEST agreeing chunk indices.
    # Combination C (sorted, max element cm) is canonical iff every
    # agreeing chunk below cm is in C — i.e. every chunk j < cm with
    # j not in C DISAGREES. That is a per-combo bit predicate on
    # sig_a ^ sig_b (codegen CASE over __combo), and each qualifying
    # pair survives in exactly one combo — the distinct exchange is
    # gone. Under the bucket guard, a pair now needs its CANONICAL
    # combination's bucket to survive (before: any combination's);
    # both variants sacrifice recall only inside pathological buckets,
    # which is the guard's documented contract.
    from itertools import combinations as _combinations

    bpc = 64 // chunks
    chunk_mask = (1 << bpc) - 1
    agree = max(1, chunks - max_hamming)
    branches = []
    for ci, combo in enumerate(_combinations(range(chunks), agree)):
        must_disagree = [j for j in range(combo[-1]) if j not in combo]
        if must_disagree:
            cond = " AND ".join(
                f"(((sig_a ^ sig_b) >> {j * bpc}) & {chunk_mask}L) != 0L"
                for j in must_disagree
            )
        else:
            cond = "true"
        branches.append(f"WHEN {ci} THEN ({cond})")
    canonical = F.expr(
        "CASE __combo " + " ".join(branches) + " ELSE false END"
    )
    # Pair expansion WITHOUT a self-join: aggregate each guarded bucket
    # to one array (a streaming sort-aggregate over the window's own
    # partitioning+sort — zero extra exchanges) and double-explode the
    # within-bucket pairs. Measured ~35% faster at sf1 than both the
    # sort-merge self-join (exchange reuse) and AQE's broadcast
    # variant, which each re-pay an exchange/sort or a full-stream
    # broadcast for the probe side. With the guard on, every collected
    # array is bounded at max_bucket_size entries; with the guard OFF
    # (max_bucket_size=None) a pathological bucket materializes as ONE
    # in-memory array — keep the guard on at corpus scale.
    buckets = left.groupBy("__combo", "__key").agg(
        F.collect_list("sig_a").alias("__bucket")
    )
    if max_bucket_size is None:
        buckets = buckets.filter(F.size("__bucket") > 1)
    near_sigs = (
        buckets.select(
            "__combo", F.explode("__bucket").alias("sig_a"), "__bucket"
        )
        .select("__combo", "sig_a", F.explode("__bucket").alias("sig_b"))
        .filter(F.col("sig_a") < F.col("sig_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .filter(canonical)
        .select("sig_a", "sig_b", "hamming")
    )

    if expand == "full":
        # Exact-duplicate pairs (hamming 0) ride the SAME two expansion
        # joins as the near pairs, as diagonal (sig, sig) edges — one
        # fused pipeline instead of a separate members self-join (the
        # extra join was pure stage tax: exact groups are output-sized
        # either way). A diagonal edge expands to BOTH orders of every
        # member pair plus the self-pairs, so those rows keep only the
        # strictly-ordered half; off-diagonal pairs keep the
        # least/greatest ordering (each appears exactly once).
        edges = near_sigs.unionByName(
            usigs.select(
                F.col("__usig").alias("sig_a"),
                F.col("__usig").alias("sig_b"),
                F.lit(0).alias("hamming"),
            )
        )
        if broadcast_members:
            members = F.broadcast(members)
        out = (
            edges.join(
                members.select(
                    F.col("__mid").alias("__ida"),
                    F.col("__msig").alias("sig_a"),
                ),
                on="sig_a",
            )
            .join(
                members.select(
                    F.col("__mid").alias("__idb"),
                    F.col("__msig").alias("sig_b"),
                ),
                on="sig_b",
            )
            .filter(
                (F.col("sig_a") != F.col("sig_b"))
                | (F.col("__ida") < F.col("__idb"))
            )
            .select(
                F.least("__ida", "__idb").alias("id_a"),
                F.greatest("__ida", "__idb").alias("id_b"),
                "hamming",
            )
        )
    else:
        # Star edges: same connected components, linear output. reps =
        # min id per signature; members link to their rep, near
        # signatures link rep-to-rep.
        groups = tracked_persist(
            members.groupBy("__msig").agg(F.min("__mid").alias("__rep"))
        )
        if broadcast_members:
            # groups has one row per distinct signature <= member count,
            # so the same gate bounds it
            groups = F.broadcast(groups)
        exact = (
            members.join(groups, on="__msig")
            .filter(F.col("__mid") != F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"),
                F.col("__mid").alias("id_b"),
                F.lit(0).alias("hamming"),
            )
        )
        near = (
            near_sigs.join(
                groups.select(
                    F.col("__msig").alias("sig_a"),
                    F.col("__rep").alias("__ida"),
                ),
                on="sig_a",
            )
            .join(
                groups.select(
                    F.col("__msig").alias("sig_b"),
                    F.col("__rep").alias("__idb"),
                ),
                on="sig_b",
            )
            .select(
                F.least("__ida", "__idb").alias("id_a"),
                F.greatest("__ida", "__idb").alias("id_b"),
                "hamming",
            )
        )
        out = exact.unionByName(near)
    return out.withColumn("hamming", F.col("hamming").cast("int"))


# ---------------------------------------------------------------------- #
# Embedding near-dup                                                      #
# ---------------------------------------------------------------------- #


def embedding_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    scope: Optional[Column] = None,
    n_blocks: int = 8,
) -> DataFrame:
    """Pairs of near-identical embeddings by cosine ≥ threshold.

    Exact all-pairs within ``scope``, executed as a *blocked* cross
    product: rows are hashed into ``n_blocks`` blocks, each row is routed
    to the ``n_blocks`` block-pairs it participates in (one explode — no
    pair join), and each (block_a, block_b) task scores its pair of blocks
    as one numpy matrix op. Data movement is ``O(n × n_blocks)`` vector
    rows instead of ``O(n²)`` materialized vector pairs; compute is still
    exact O(n²) flops — at 100 TB bucket first with
    :func:`patito_spark.operators.similarity.hyperplane_lsh_buckets` and
    run this verifier per bucket.

    Accumulation is sequential-fold over dimensions (bit-exact vs the
    DuckDB ``list_dot_product`` oracle); products and norm multiplies are
    commutative so symmetric pairs score identically.
    """
    import numpy as np
    import pandas as pd

    from patito_spark.functions.vector_numpy import (
        _as_matrix,
        seq_dot_matrix,
        seq_norm,
    )

    base = df.filter(scope) if scope is not None else df
    feats = base.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("__blk"),
    )
    # Route each row to every block-pair it belongs to: row in block b
    # participates in pairs (min(b,i), max(b,i)) for all i — n_blocks
    # groups per row, built with one explode (no join).
    routed = feats.withColumn(
        "__bp",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                lambda i: F.struct(
                    F.least(F.col("__blk"), i).alias("pa"),
                    F.greatest(F.col("__blk"), i).alias("pb"),
                ),
            )
        ),
    ).select("id", "vec", "__blk", F.col("__bp.pa").alias("pa"), F.col("__bp.pb").alias("pb"))

    out_schema = T.StructType(
        [
            T.StructField("id_a", base.schema[id_col].dataType, True),
            T.StructField("id_b", base.schema[id_col].dataType, True),
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )

    def score_blocks(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        blk_a, blk_b = key
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        rows_a = pdf[pdf["__blk"] == blk_a]
        mat_a = _as_matrix(rows_a["vec"]) if len(rows_a) else None
        if mat_a is None:
            return empty
        ids_a = rows_a["id"].to_numpy()
        if blk_a == blk_b:
            # Triangular within one block.
            if len(rows_a) < 2:
                return empty
            cos = seq_dot_matrix(mat_a, mat_a) / (
                seq_norm(mat_a)[:, None] * seq_norm(mat_a)[None, :]
            )
            ia, ib = np.triu_indices(len(ids_a), k=1)
            mask = cos[ia, ib] >= threshold
            ia, ib = ia[mask], ib[mask]
            # Triangular indices order by *row position*, not id value —
            # normalize so id_a < id_b holds regardless of pandas row order.
            xa, xb = ids_a[ia], ids_a[ib]
            lo, hi = np.minimum(xa, xb), np.maximum(xa, xb)
        else:
            rows_b = pdf[pdf["__blk"] == blk_b]
            if len(rows_b) == 0:
                return empty
            mat_b = _as_matrix(rows_b["vec"])
            ids_b = rows_b["id"].to_numpy()
            cos = seq_dot_matrix(mat_a, mat_b) / (
                seq_norm(mat_a)[:, None] * seq_norm(mat_b)[None, :]
            )
            ia, ib = np.nonzero(cos >= threshold)
            xa, xb = ids_a[ia], ids_b[ib]
            lo, hi = np.minimum(xa, xb), np.maximum(xa, xb)
        out = pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[ia, ib]})
        return out.sort_values(["id_a", "id_b"])

    return routed.groupBy("pa", "pb").applyInPandas(score_blocks, out_schema)


def embedding_dedup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: Optional[int] = None,
    dim: int = 64,
    seed: int = 42,
    n_tables: Union[int, str] = 1,
    index=None,
    target_bucket_size: int = 200,
    n_vectors: Optional[int] = None,
) -> DataFrame:
    """Scalable embedding near-dup: LSH buckets + vectorized verification.

    The 100 TB path for :func:`embedding_dedup_pairs`:

    1. ``mapInPandas`` assigns each vector a sign-random-projection bucket —
       one numpy pass per Arrow batch (per-row expression evaluation of
       64-dim dots is Spark-interpreted and ~1000× slower).
    2. ``applyInPandas`` per bucket computes the exact pairwise cosine
       matrix and emits only pairs ≥ threshold.

    Candidates never leave their bucket, so total work is Σ bucket² instead
    of n²; recall follows the hyperplane collision bound.

    ``n_planes=None`` (default) auto-sizes the plane count from the
    corpus count via :func:`~patito_spark.operators.similarity.auto_n_planes`
    so the EXPECTED bucket size — and with it the quadratic in-bucket
    verification cost per vector — stays constant as the corpus grows.
    A FIXED plane count makes total verify work grow as n²/2^planes
    (the round-6 scaling audit measured 3.7×-per-10×-data on exactly
    this); auto-sizing restores the ~linear marginal at the price of
    one count() job — an UNCACHED full scan paid on EVERY call that
    reaches auto-sizing. Callers who already know the corpus size pass
    ``n_vectors`` to skip it; callers who dedup the same corpus
    repeatedly should build an :class:`~patito_spark.operators.similarity.LshIndex`
    once and pass ``index=`` (the entry points do), which amortizes
    both the count and the bucketing. Pass an explicit ``n_planes`` for
    reproducible bucketing (the oracle-replayed bench entries do,
    deriving the same auto-sized count on both engines).

    Recall levers:
    fewer planes (bigger buckets) or ``n_tables > 1`` — L independent
    hash tables OR-ed together (a dup pair is missed only if split in
    EVERY table, miss^L), with cross-table duplicate pairs collapsed by
    a distinct on (id_a, id_b). For DEDUP recall is the one that
    matters — a missed duplicate is contamination. Measured against
    planted ground truth at cosine U[0.92, 0.99], threshold 0.9
    (tools/recall_embedding_lsh.py, docs/scaling.md §LSH-dedup recall):

    ======================  =====  =====  =====  =====
    corpus (auto planes)     L=1    L=2    L=4    L=8
    ======================  =====  =====  =====  =====
    4k vectors (5 planes)   0.626  0.854  0.977  1.000
    40k vectors (8 planes)  0.470  0.707  0.904  0.987
    ======================  =====  =====  =====  =====

    Pairing policy: ``n_tables ≈ planes/2`` holds recall ≈ 0.85–0.90 at
    any corpus size (``n_tables="auto"`` applies exactly this);
    ``n_tables ≈ planes`` holds ≈ 0.98+. Cost is linear in L, so the
    auto pairing keeps total work ~linear in n while recall stays flat
    as :func:`~patito_spark.operators.similarity.auto_n_planes` grows
    the plane count with log(n). The default stays ``n_tables=1``
    (bit-reproducible single-table behavior, replayed by the SQL
    oracle); dedup pipelines where a miss is contamination should pass
    ``"auto"`` or an explicit count from the table.

    Both stages use sequential-fold accumulation, so a SQL oracle can
    replay the pipeline exactly from the same plane constants (bucket =
    sign bits of ``list_dot_product``; cosine = dot/(norm·norm)).
    """
    import numpy as np
    import pandas as pd

    from patito_spark.functions.vector_numpy import (
        _as_matrix,
        seq_dot_matrix,
        seq_norm,
        sign_projection_buckets,
    )
    from patito_spark.operators.similarity import _deterministic_hyperplanes

    if index is not None:
        if n_tables == "auto" or n_tables > 1:
            # The index branch would silently win and deliver single-table
            # recall; refuse, matching ann_lsh_topk's contract.
            raise ValueError(
                "n_tables > 1 cannot be combined with a prebuilt index; "
                "build the index with the desired n_tables instead"
            )
        # Prebuilt LshIndex (see similarity.build_lsh_index): reuse its
        # bucket assignments — one corpus scan serves dedup AND ann search.
        bucketed = index.table.select(
            F.col("neighbor_id").alias("id"),
            F.col("__cvec").alias("vec"),
            "bucket",
        )
    else:
        if n_planes is None:
            from patito_spark.operators.similarity import auto_n_planes

            n_planes = auto_n_planes(
                n_vectors if n_vectors is not None else df.count(),
                target_bucket_size=target_bucket_size,
            )
        if n_tables == "auto":
            # The measured pairing (docstring table): L = p/2 holds
            # planted-pair recall ≈ 0.85–0.90 at any auto-sized corpus.
            n_tables = max(1, n_planes // 2)
        pruned = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        )
        if n_tables > 1:
            from patito_spark.operators.similarity import (
                _multi_table_buckets,
            )

            planes = _deterministic_hyperplanes(
                dim, n_planes * n_tables, seed
            )
            # (tbl, bucket) fan-out; groups below key on both so each
            # table contributes its own buckets.
            bucketed = _multi_table_buckets(
                pruned, planes, n_planes, n_tables, "vec"
            ).withColumn(
                "bucket", F.concat_ws(":", "tbl", "bucket")
            ).drop("tbl")
        else:
            planes = _deterministic_hyperplanes(dim, n_planes, seed)
            bucketed = sign_projection_buckets(pruned, planes, vec_col="vec")

    pair_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType, False),
            T.StructField("id_b", df.schema[id_col].dataType, False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        mat = _as_matrix(pdf["vec"])
        cos = seq_dot_matrix(mat, mat) / (
            seq_norm(mat)[:, None] * seq_norm(mat)[None, :]
        )
        ia, ib = np.triu_indices(n, k=1)
        keep = cos[ia, ib] >= threshold
        ids = pdf["id"].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cosine": cos[ia, ib][keep],
            }
        )

    pairs = bucketed.groupBy("bucket").applyInPandas(bucket_pairs, pair_schema)
    if n_tables > 1 and index is None:
        # the same dup pair can surface from several tables
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return pairs


# ---------------------------------------------------------------------- #
# End-to-end corpus dedup                                                 #
# ---------------------------------------------------------------------- #


def dedup_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    hash_mode: str = "xxhash64",
    **minhash_kwargs,
) -> DataFrame:
    """The user-facing operation: near-duplicate-free corpus, one call.

    Composes the scale pipeline end-to-end: MinHash+LSH candidate pairs →
    true-Jaccard verification → connected components over the verified
    pairs → keep each cluster's minimum-id representative, drop the rest.
    Returns ``df``'s rows minus non-representative near-duplicates (all
    original columns).

    Scale shape: everything upstream is the banded/bucketed pipeline
    (never O(n²)); the final step is a LEFT ANTI join against the drop
    set, whose size is the number of duplicates — broadcastable in the
    common case where duplicates are a small fraction of the corpus.
    """
    from patito_spark.operators.graph import connected_components

    # connected_components materializes eagerly (checkpointed label loop),
    # so every intermediate the minhash pipeline persists is consumed by
    # the time it returns — release them here; the caller sees no cache
    # residue from this call.
    with cache_scope():
        pairs = minhash_dedup_pairs(
            df,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            hash_mode=hash_mode,
            **minhash_kwargs,
        )
        components = connected_components(pairs, id_a="id_a", id_b="id_b")
    drop = (
        components.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(drop, on=id_col, how="left_anti")


def minhash_dedup_against(
    df: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: Optional[str] = None,
    ref_text_col: Optional[str] = None,
    threshold: float = 0.7,
    shingle_size: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hash_mode: str = "xxhash64",
    broadcast_reference: bool = True,
    densify: bool = True,
) -> DataFrame:
    """Corpus documents that near-duplicate a REFERENCE corpus.

    Cross-corpus MinHash+LSH: decontamination by near-dup — drop training
    documents that are near-copies of benchmark/eval documents even when
    no exact n-gram survives verbatim (paraphrased leaks, whitespace
    mangling), the case :func:`..contamination.ngram_contamination`'s
    exact-gram overlap misses. Returns verified pairs
    ``(<id_col>, ref_id, jaccard)``; drop with a LEFT ANTI join on
    ``id_col``.

    Scale shape: the corpus side is never self-joined — each side's
    banded bucket keys are computed independently (the same
    OPH-bin-min pipeline as :func:`minhash_lsh_candidates`, so one
    shuffle each), and candidates come from the corpus⋈reference bucket
    equi-join. With ``broadcast_reference`` (the common case: benchmarks
    are tiny next to a 100 TB corpus) the reference's buckets AND its
    verification token arrays broadcast, so the bucket join never
    shuffles the corpus. Verification aggregates per-doc token arrays
    from the shared (persisted) shingle rows — one map-side-combined
    shuffle of the corpus shingle stream, same cost class as the
    signature pipeline itself.
    """
    ref_id_col = ref_id_col or id_col
    ref_text_col = ref_text_col or text_col
    assert num_hashes % bands == 0

    corpus_sh = tracked_persist(
        shingle_hash_rows(
            df, id_col=id_col, text_col=text_col, n=shingle_size,
            hash_mode=hash_mode, distinct=False, gram_mode="zip",
        )
    )
    ref_sh = tracked_persist(
        shingle_hash_rows(
            reference, id_col=ref_id_col, text_col=ref_text_col,
            n=shingle_size, hash_mode=hash_mode, distinct=False,
            gram_mode="zip",
        )
    )

    def banded(sh: DataFrame) -> DataFrame:
        return banded_signatures(
            sh, num_hashes=num_hashes, bands=bands, densify=densify
        )

    left = banded(corpus_sh).select(
        F.col("__id").alias("__cid"), "band", "bucket"
    )
    right = banded(ref_sh).select(
        F.col("__id").alias("__rid"), "band", "bucket"
    )
    ref_toks = ref_sh.groupBy(F.col("__id").alias("__rtid")).agg(
        F.array_sort(F.collect_set("__h")).alias("__rtokens")
    )
    if broadcast_reference:
        right = F.broadcast(right)
        ref_toks = F.broadcast(ref_toks)

    candidates = (
        left.join(right, on=["band", "bucket"])
        .select("__cid", "__rid")
        .distinct()
    )
    corpus_toks = corpus_sh.groupBy(F.col("__id").alias("__ctid")).agg(
        F.array_sort(F.collect_set("__h")).alias("__ctokens")
    )
    return (
        candidates.join(
            corpus_toks, candidates["__cid"] == corpus_toks["__ctid"]
        )
        .join(ref_toks, candidates["__rid"] == ref_toks["__rtid"])
        .withColumn(
            "jaccard", jaccard(F.col("__ctokens"), F.col("__rtokens"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("__cid").alias(id_col),
            F.col("__rid").alias("ref_id"),
            "jaccard",
        )
    )


def embedding_dedup_against(
    df: DataFrame,
    reference: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ref_id_col: Optional[str] = None,
    ref_vec_col: Optional[str] = None,
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """Corpus vectors that near-duplicate a REFERENCE set (semantic
    decontamination — the embedding-space counterpart of
    :func:`minhash_dedup_against`).

    Returns ``(<id_col>, ref_id, cosine)`` pairs with cosine ≥
    ``threshold``. Both sides are LSH-bucketed (``n_tables`` independent
    tables OR-ed for recall — see docs/ann_quality.md); candidates come
    from the corpus⋈reference bucket equi-join with the reference side
    broadcast (benchmarks/eval sets are tiny next to the corpus, so the
    corpus is never shuffled), and exact cosine verification runs only
    on candidates — cost proportional to near-dupes, never |corpus|×|ref|.
    """
    from patito_spark.functions.vector_numpy import sign_projection_buckets
    from patito_spark.operators.similarity import (
        _deterministic_hyperplanes,
        _multi_table_buckets,
        cosine_score_pairs,
    )

    ref_id_col = ref_id_col or id_col
    ref_vec_col = ref_vec_col or vec_col
    planes = _deterministic_hyperplanes(dim, n_planes * n_tables, seed)

    corpus_side = df.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec")
    )
    ref_side = reference.select(
        F.col(ref_id_col).alias("ref_id"), F.col(ref_vec_col).alias("__rvec")
    )
    if n_tables > 1:
        c = _multi_table_buckets(corpus_side, planes, n_planes, n_tables, "__cvec")
        r = _multi_table_buckets(ref_side, planes, n_planes, n_tables, "__rvec")
        on = ["tbl", "bucket"]
    else:
        c = sign_projection_buckets(corpus_side, planes, vec_col="__cvec")
        r = sign_projection_buckets(ref_side, planes, vec_col="__rvec")
        on = ["bucket"]

    candidates = c.join(F.broadcast(r), on=on)
    if n_tables > 1:
        candidates = candidates.dropDuplicates(["__cid", "ref_id"])
    scored = cosine_score_pairs(
        candidates,
        vec_a="__cvec",
        vec_b="__rvec",
        keep_cols=["__cid", "ref_id"],
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        F.col("__cid").alias(id_col), "ref_id", "cosine"
    )
