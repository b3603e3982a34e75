"""Sampling determinism + statistical sanity."""

import pytest

from patito_spark.operators import sampling


@pytest.fixture(scope="module")
def data(spark):
    return spark.range(10_000).selectExpr(
        "id", "cast(id % 4 as string) as label"
    )


def test_deterministic_sample_reproducible(data):
    s1 = sampling.deterministic_sample(data, 0.2, key_col="id", seed=7)
    s2 = sampling.deterministic_sample(data, 0.2, key_col="id", seed=7)
    ids1 = {r.id for r in s1.collect()}
    ids2 = {r.id for r in s2.collect()}
    assert ids1 == ids2
    assert 0.15 < len(ids1) / 10_000 < 0.25
    # different seed -> different sample
    s3 = sampling.deterministic_sample(data, 0.2, key_col="id", seed=8)
    assert {r.id for r in s3.collect()} != ids1


def test_train_test_split_partitions(data):
    train, test = sampling.train_test_split(data, "id", test_fraction=0.25)
    train_ids = {r.id for r in train.collect()}
    test_ids = {r.id for r in test.collect()}
    assert train_ids.isdisjoint(test_ids)
    assert len(train_ids) + len(test_ids) == 10_000
    assert 0.2 < len(test_ids) / 10_000 < 0.3


def test_stratified_sample(data):
    out = sampling.stratified_sample(
        data, "label", {"0": 1.0, "1": 0.5, "2": 0.0}, key_col="id"
    )
    counts = {r.label: r["count"] for r in out.groupBy("label").count().collect()}
    assert counts.get("0") == 2500
    assert 1000 < counts.get("1", 0) < 1500
    assert "2" not in counts
    assert "3" not in counts  # unlisted strata excluded


def test_balance_classes(spark):
    df = spark.range(1100).selectExpr(
        "id", "if(id < 1000, 'big', 'small') as label"
    )
    out = sampling.balance_classes(df, "label", key_col="id")
    counts = {r.label: r["count"] for r in out.groupBy("label").count().collect()}
    assert counts["small"] == 100
    assert 60 < counts["big"] < 140  # ~100 expected


def test_shuffle_rows_is_permutation(data):
    out = sampling.shuffle_rows(data, "id", seed=3)
    rows = [r.id for r in out.toLocalIterator()]
    assert sorted(rows) == list(range(10_000))
    assert rows != list(range(10_000))  # order actually changed
    again = [r.id for r in sampling.shuffle_rows(data, "id", seed=3).toLocalIterator()]
    assert rows == again  # reproducible


def test_weighted_sample_proportional(spark):
    from patito_spark.operators.sampling import weighted_sample

    # 20k rows, half weight 0.8 and half weight 0.2: kept fractions must
    # track the weights (hash is uniform; binomial sd ~0.4%).
    df = spark.range(20_000).selectExpr(
        "id", "if(id % 2 = 0, 0.8d, 0.2d) as w"
    )
    out = weighted_sample(df, weight_col="w", key_col="id")
    kept = {r[0]: r[1] for r in out.groupBy("w").count().collect()}
    assert abs(kept[0.8] / 10_000 - 0.8) < 0.02
    assert abs(kept[0.2] / 10_000 - 0.2) < 0.02


def test_weighted_sample_target_fraction(spark):
    from patito_spark.operators.sampling import weighted_sample

    df = spark.range(20_000).selectExpr(
        "id", "if(id % 2 = 0, 3.0d, 1.0d) as w"
    )
    out = weighted_sample(df, weight_col="w", key_col="id",
                          target_fraction=0.5)
    n = out.count()
    # mean weight 2.0, scale 0.25 -> p = 0.75 / 0.25, expected 0.5.
    assert abs(n / 20_000 - 0.5) < 0.02
    ratios = {r[0]: r[1] for r in out.groupBy("w").count().collect()}
    assert abs(ratios[3.0] / ratios[1.0] - 3.0) < 0.3


def test_weighted_sample_determinism_and_edges(spark):
    import pytest as _pytest

    from patito_spark.operators.sampling import weighted_sample

    df = spark.range(1_000).selectExpr(
        "id",
        "case when id % 10 = 0 then cast(null as double) "
        "when id % 10 = 1 then -0.5d else 0.5d end as w",
    )
    a = sorted(r["id"] for r in weighted_sample(df, "w", "id").collect())
    b = sorted(r["id"] for r in weighted_sample(df, "w", "id").collect())
    assert a == b and len(a) > 0
    # null/negative weights never pass
    assert all(i % 10 not in (0, 1) for i in a)
    with _pytest.raises(ValueError, match="target_fraction"):
        weighted_sample(df, "w", "id", target_fraction=1.5)
    # all-null weights -> empty, stable schema
    empty = weighted_sample(
        spark.range(5).selectExpr("id", "cast(null as double) as w"),
        "w", "id", target_fraction=0.5,
    )
    assert empty.count() == 0 and empty.columns == ["id", "w"]


def test_weighted_sample_negative_and_null_mean_handling(spark):
    """Regression: avg() over raw weights let negatives cancel positive
    mass (empty sample despite eligible rows) and ignored nulls
    (deflating the kept fraction). The mean now counts ineligible rows
    as weight 0."""
    from patito_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(0, 5.0), (1, -6.0), (2, 1.0)], "id long, w double"
    )
    out = weighted_sample(df, "w", "id", target_fraction=0.5)
    # avg(w) would be 0 -> old code returned empty; eligible rows remain.
    assert out.count() > 0

    # Half null weights, target 0.5: expected kept fraction of ALL rows
    # is 0.5 (nulls count as 0 in the mean), not 0.25.
    big = spark.range(20_000).selectExpr(
        "id", "if(id % 2 = 0, 1.0d, cast(null as double)) as w"
    )
    n = weighted_sample(big, "w", "id", target_fraction=0.5).count()
    assert abs(n / 20_000 - 0.5) < 0.02


class TestQuantileBins:
    def test_equal_mass_bins_on_uniform_scores(self, spark):
        from patito_spark.operators.sampling import quantile_bins

        df = spark.range(10_000).selectExpr(
            "id", "cast(id as double) / 10000 as score"
        )
        out = quantile_bins(df, "score", n_bins=4)
        sizes = {
            r["bin"]: r["n"]
            for r in out.groupBy("bin").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert set(sizes) == {0, 1, 2, 3}
        for n in sizes.values():
            assert 2300 < n < 2700  # ~2500 each at 0.001 relative error

    def test_bins_monotone_in_score(self, spark):
        from patito_spark.operators.sampling import quantile_bins
        from pyspark.sql import functions as F

        df = spark.range(1000).selectExpr(
            "id", "cast(pmod(id * 37, 1000) as double) as score"
        )
        rows = quantile_bins(df, "score", n_bins=5).orderBy("score").collect()
        bins = [r["bin"] for r in rows]
        assert bins == sorted(bins)

    def test_null_scores_get_null_bin(self, spark):
        from patito_spark.operators.sampling import quantile_bins

        df = spark.createDataFrame(
            [(1, 0.2), (2, None), (3, 0.9)], "id long, score double"
        )
        out = {r["id"]: r["bin"] for r in quantile_bins(df, "score", 2).collect()}
        assert out[2] is None
        assert out[1] is not None and out[3] is not None

    def test_precomputed_breakpoints_and_validation(self, spark):
        import pytest

        from patito_spark.operators.sampling import quantile_bins

        df = spark.createDataFrame(
            [(1, 0.1), (2, 0.5), (3, 0.9)], "id long, score double"
        )
        out = {
            r["id"]: r["bin"]
            for r in quantile_bins(
                df, "score", n_bins=3, breakpoints=[0.3, 0.7]
            ).collect()
        }
        assert out == {1: 0, 2: 1, 3: 2}
        with pytest.raises(ValueError, match="breakpoints"):
            quantile_bins(df, "score", n_bins=3, breakpoints=[0.3])
        with pytest.raises(ValueError, match="ascending"):
            quantile_bins(df, "score", n_bins=3, breakpoints=[0.7, 0.3])
        with pytest.raises(ValueError, match="at least 2"):
            quantile_bins(df, "score", n_bins=1)

    def test_assignment_is_shuffle_free(self, spark):
        from patito_spark.operators.sampling import quantile_bins
        from patito_spark.plans.explain import executed_plan

        df = spark.range(100).selectExpr("id", "cast(id as double) as score")
        plan = executed_plan(
            quantile_bins(df, "score", n_bins=4, breakpoints=[25.0, 50.0, 75.0])
        )
        assert "Exchange" not in plan

    def test_feeds_stratified_sample(self, spark):
        from patito_spark.operators.sampling import (
            quantile_bins,
            stratified_sample,
        )

        df = spark.range(8000).selectExpr(
            "id", "cast(pmod(id * 13, 8000) as double) as score"
        )
        binned = quantile_bins(df, "score", n_bins=4)
        sampled = stratified_sample(
            binned, strata_col="bin",
            fractions={0: 0.25, 1: 0.25, 2: 0.25, 3: 0.25},
            key_col="id",
        )
        sizes = {
            r["bin"]: r["n"]
            for r in sampled.groupBy("bin").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        for n in sizes.values():
            assert 350 < n < 650  # ~500 per stratum


def test_quantile_bins_precomputed_on_stream(spark, tmp_path):
    """With precomputed breakpoints the assignment is a pure projection,
    so it applies to a readStream unchanged — e.g. binning incoming
    docs against the history's score distribution."""
    import uuid as _uuid

    from patito_spark.operators.sampling import quantile_bins

    path = str(tmp_path / "scored")
    spark.createDataFrame(
        [(1, 0.1), (2, 0.5), (3, 0.9)], "id long, score double"
    ).coalesce(1).write.parquet(path)
    stream = spark.readStream.schema("id long, score double").parquet(path)
    out = quantile_bins(stream, "score", n_bins=3, breakpoints=[0.3, 0.7])
    name = f"t_qb_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r["bin"] for r in spark.table(name).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


class TestCapPerGroup:
    def test_cap_respected_and_under_cap_untouched(self, spark):
        from patito_spark.operators.sampling import cap_per_group

        # group 0: 50 rows, group 1: 7 rows, group 2: 10 rows
        df = spark.range(67).selectExpr(
            "case when id < 50 then 0 when id < 57 then 1 else 2 end as g",
            "id",
        )
        out = cap_per_group(df, "g", 10, key_col="id")
        sizes = {r["g"]: r["count"]
                 for r in out.groupBy("g").count().collect()}
        assert sizes == {0: 10, 1: 7, 2: 10}

    def test_hash_selection_is_smallest_hashes_and_deterministic(self, spark):
        from pyspark.sql import functions as F
        from patito_spark.operators.sampling import cap_per_group

        df = spark.range(100).selectExpr("id % 2 as g", "id")
        out = cap_per_group(df, "g", 5, key_col="id", seed=7)
        got = sorted(r["id"] for r in out.collect())
        # expected: the 5 smallest xxhash64(id, 7) per group
        hashed = df.withColumn("h", F.xxhash64("id", F.lit(7))).collect()
        want = []
        for g in (0, 1):
            rows = sorted((r["h"], r["id"]) for r in hashed if r["g"] == g)
            want += [i for _, i in rows[:5]]
        assert got == sorted(want)
        again = sorted(r["id"] for r in cap_per_group(
            df, "g", 5, key_col="id", seed=7).collect())
        assert got == again

    def test_order_by_keeps_best_with_stable_ties(self, spark):
        from patito_spark.operators.sampling import cap_per_group

        # quality has ties; key_col hash breaks them reproducibly
        df = spark.range(20).selectExpr(
            "0 as g", "id", "cast(id % 4 as double) as quality"
        )
        out1 = cap_per_group(df, "g", 6, key_col="id",
                             order_by="quality", descending=True)
        rows1 = sorted((r["quality"], r["id"]) for r in out1.collect())
        assert len(rows1) == 6
        assert all(q >= 2.0 for q, _ in rows1)  # top two quality bands
        out2 = cap_per_group(df, "g", 6, key_col="id",
                             order_by="quality", descending=True)
        assert rows1 == sorted((r["quality"], r["id"]) for r in out2.collect())

    def test_multi_group_cols_and_errors(self, spark):
        import pytest
        from patito_spark.operators.sampling import cap_per_group

        df = spark.range(40).selectExpr("id % 2 as a", "id % 2 as b", "id")
        out = cap_per_group(df, ["a", "b"], 3, key_col="id")
        assert out.count() == 6
        with pytest.raises(ValueError, match="max_rows"):
            cap_per_group(df, "a", 0, key_col="id")
        with pytest.raises(ValueError, match="key_col"):
            cap_per_group(df, "a", 3)

    def test_plan_has_partial_window_group_limit(self, spark):
        from patito_spark.operators.sampling import cap_per_group
        from patito_spark.plans import executed_plan

        df = spark.range(1000).selectExpr("id % 7 as g", "id")
        out = cap_per_group(df, "g", 5, key_col="id")
        plan = executed_plan(out)
        # map-side partial limit BEFORE the exchange: the hot-group
        # defense — each input partition ships at most K rows per group
        idx_partial = plan.find("WindowGroupLimit")
        assert idx_partial != -1 and "Partial" in plan
        assert plan.count("WindowGroupLimit") == 2  # partial + final

    def test_portable_mode_matches_md5_replay(self, spark):
        import hashlib

        from patito_spark.operators.sampling import cap_per_group

        df = spark.range(60).selectExpr("id % 3 as g", "id")
        out = cap_per_group(df, "g", 4, key_col="id", seed=9,
                            hash_mode="portable")
        got = sorted(r["id"] for r in out.collect())

        def phash(key):
            return int(hashlib.md5(f"{key}:9".encode()).hexdigest()[:15], 16)

        want = []
        for g in range(3):
            members = sorted(range(g, 60, 3), key=phash)
            want += members[:4]
        assert got == sorted(want)


class TestLeakageSafeSplit:
    def test_near_dup_families_never_straddle(self, spark):
        from patito_spark.operators.sampling import leakage_safe_split

        # 60 near-dup PAIRS (2i, 2i+1 share a long text, tiny suffix
        # diff) + 80 unique singletons.
        base = ("a long shared document body that repeats across the "
                "pair with enough shingles to match reliably ")
        rows = []
        for i in range(60):
            rows.append((2 * i, base + f"family {i} variant one"))
            rows.append((2 * i + 1, base + f"family {i} variant two"))
        for j in range(80):
            rows.append((1000 + j,
                         f"completely unique document number {j} about "
                         f"topic {j} with its own words and phrasing"))
        df = spark.createDataFrame(rows, "doc_id long, text string")

        train, test = leakage_safe_split(df, test_fraction=0.3,
                                         threshold=0.5)
        train_ids = {r["doc_id"] for r in train.collect()}
        test_ids = {r["doc_id"] for r in test.collect()}
        assert train_ids.isdisjoint(test_ids)
        assert train_ids | test_ids == {r[0] for r in rows}
        for i in range(60):  # every family moves together
            fam = {2 * i, 2 * i + 1}
            assert fam <= train_ids or fam <= test_ids
        assert 10 < len(test_ids) < 90  # ~30% of clusters

        again_train, _ = leakage_safe_split(df, test_fraction=0.3,
                                            threshold=0.5)
        assert {r["doc_id"] for r in again_train.collect()} == train_ids

    def test_precomputed_pairs_skip_minhash(self, spark):
        from patito_spark.operators.sampling import leakage_safe_split

        df = spark.range(100).selectExpr(
            "id as doc_id", "concat('short ', id) as text")
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (50, 51)], "id_a long, id_b long")
        train, test = leakage_safe_split(df, pairs=pairs,
                                         test_fraction=0.4)
        tr = {r["doc_id"] for r in train.collect()}
        te = {r["doc_id"] for r in test.collect()}
        chain = {0, 1, 2}
        assert chain <= tr or chain <= te  # transitive family together
        assert ({50, 51} <= tr) or ({50, 51} <= te)
        assert tr.isdisjoint(te) and tr | te == set(range(100))

    def test_order_by_without_key_col_is_deterministic(self, spark):
        from patito_spark.operators.sampling import cap_per_group

        # every row ties on quality; selection must still be stable
        # across replans (full-row hash tiebreak)
        df = spark.range(40).selectExpr(
            "0 as g", "id", "1.0 as quality"
        )
        runs = [
            sorted(r["id"] for r in cap_per_group(
                df.repartition(p), "g", 5, order_by="quality",
                descending=True).collect())
            for p in (2, 8, 32)
        ]
        assert runs[0] == runs[1] == runs[2]
        assert len(runs[0]) == 5


def test_leakage_safe_split_matches_python_replay(spark):
    """Full independent replay: union-find over the pair graph +
    the portable md5 keep fraction, per split key."""
    import hashlib

    from patito_spark.operators.sampling import leakage_safe_split

    pairs_py = [(0, 1), (1, 2), (5, 6), (10, 11), (11, 12), (30, 40)]
    df = spark.range(60).selectExpr(
        "id as doc_id", "concat('short doc ', id) as text")
    pairs = spark.createDataFrame(pairs_py, "id_a long, id_b long")
    train, test = leakage_safe_split(
        df, pairs=pairs, test_fraction=0.35, seed=11,
        hash_mode="portable",
    )
    got_test = sorted(r["doc_id"] for r in test.collect())

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # engine labels components by MIN id; mirror that
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    for a, b in pairs_py:
        union(a, b)

    def frac(key):
        h = int(hashlib.md5(f"{key}:11".encode()).hexdigest()[:15], 16)
        return (h % 1_000_000) / 1_000_000

    want_test = sorted(
        i for i in range(60)
        if frac(find(i) if i in parent else i) < 0.35
    )
    assert got_test == want_test
    got_train = sorted(r["doc_id"] for r in train.collect())
    assert got_train == sorted(set(range(60)) - set(want_test))


class TestSampleExactN:
    def test_exact_count_deterministic_and_nested_growth(self, spark):
        from pyspark.sql import functions as F

        from patito_spark.operators.sampling import sample_exact_n

        df = spark.range(500).selectExpr("id as doc_id", "id * 2 as v")
        s1 = sorted(r["doc_id"] for r in
                    sample_exact_n(df, 50, key_col="doc_id").collect())
        assert len(s1) == 50
        again = sorted(r["doc_id"] for r in
                       sample_exact_n(df, 50, key_col="doc_id").collect())
        assert s1 == again
        # exactly the 50 smallest hashes
        hashed = sorted(
            (r["h"], r["doc_id"]) for r in df.select(
                "doc_id", F.xxhash64("doc_id", F.lit(42)).alias("h")
            ).collect()
        )
        assert s1 == sorted(i for _, i in hashed[:50])
        # a sample from a GROWN corpus nests consistently: survivors
        # of the old sample stay unless displaced by smaller hashes
        grown = spark.range(1000).selectExpr("id as doc_id", "id * 2 as v")
        s2 = set(r["doc_id"] for r in
                 sample_exact_n(grown, 50, key_col="doc_id").collect())
        hashed2 = sorted(
            (r["h"], r["doc_id"]) for r in grown.select(
                "doc_id", F.xxhash64("doc_id", F.lit(42)).alias("h")
            ).collect()
        )
        assert s2 == {i for _, i in hashed2[:50]}
        assert df.columns == sample_exact_n(df, 5, key_col="doc_id").columns

    def test_duplicate_keys_keep_deterministic_key_multiset(self, spark):
        """Equal keys hash identically; the secondary sort on the key
        keeps the kept KEY multiset stable across partitionings even
        when duplicates sit on the cut line."""
        from patito_spark.operators.sampling import sample_exact_n

        df = spark.range(400).selectExpr("(id % 100) as k", "id as payload")
        keys1 = sorted(r["k"] for r in
                       sample_exact_n(df, 150, key_col="k").collect())
        keys2 = sorted(
            r["k"] for r in sample_exact_n(
                df.repartition(7), 150, key_col="k"
            ).collect()
        )
        assert len(keys1) == 150
        assert keys1 == keys2

    def test_plan_is_take_ordered(self, spark):
        import pytest as _pytest

        from patito_spark.operators.sampling import sample_exact_n
        from patito_spark.plans import executed_plan

        df = spark.range(1000).selectExpr("id as doc_id")
        plan = executed_plan(sample_exact_n(df, 10, key_col="doc_id"))
        assert "TakeOrderedAndProject" in plan  # partial top-n per partition
        with _pytest.raises(ValueError, match="n must"):
            sample_exact_n(df, -1, key_col="doc_id")

    def test_portable_mode_matches_md5_order(self, spark):
        import hashlib

        from patito_spark.operators.sampling import sample_exact_n

        df = spark.range(100).selectExpr("id as doc_id")
        got = sorted(r["doc_id"] for r in sample_exact_n(
            df, 7, key_col="doc_id", seed=3, hash_mode="portable"
        ).collect())

        def phash(k):
            return int(hashlib.md5(f"{k}:3".encode()).hexdigest()[:15], 16)

        want = sorted(sorted(range(100), key=phash)[:7])
        assert got == want


class TestGroupedQuantileBins:
    def test_per_group_terciles(self, spark):
        """Each group bins against ITS OWN distribution: two languages
        with disjoint perplexity ranges still split ~equal thirds
        within themselves (a global ladder would put all of lang B in
        the top bin)."""
        from patito_spark.operators.sampling import quantile_bins

        rows = [(i, "a", float(i)) for i in range(90)] + [
            (1000 + i, "b", 1000.0 + i) for i in range(90)
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
        out = quantile_bins(
            df, "ppl", n_bins=3, group_cols=["lang"]
        )
        counts = {
            (r.lang, r.bin): r["count"]
            for r in out.groupBy("lang", "bin").count().collect()
        }
        for lang in ("a", "b"):
            for b in (0, 1, 2):
                assert 20 <= counts[(lang, b)] <= 40, counts
        # monotone within group: bin 0 holds the smallest scores
        rows_a = {
            r.doc_id: r.bin for r in out.filter("lang = 'a'").collect()
        }
        assert rows_a[0] == 0 and rows_a[89] == 2

    def test_null_handling_and_exclusivity(self, spark):
        from patito_spark.operators.sampling import quantile_bins

        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", None), (3, "z", None)],
            "doc_id long, lang string, ppl double",
        )
        out = {r.doc_id: r.bin for r in quantile_bins(
            df, "ppl", n_bins=2, group_cols=["lang"]
        ).collect()}
        assert out[2] is None and out[3] is None
        with pytest.raises(ValueError, match="mutually exclusive"):
            quantile_bins(
                df, "ppl", n_bins=2, group_cols=["lang"],
                breakpoints=[0.5],
            )

    def test_null_group_key_bins_in_its_own_group(self, spark):
        """Rows with a NULL group key form their own group (groupBy
        semantics) and bin against that group's ladder — the join is
        null-safe, so a valid score under a null key gets a real
        bucket, not a silent null."""
        from patito_spark.operators.sampling import quantile_bins

        rows = [(i, "a", float(i)) for i in range(30)] + [
            (100 + i, None, float(i)) for i in range(30)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, ppl double"
        )
        out = {r.doc_id: r.bin for r in quantile_bins(
            df, "ppl", n_bins=3, group_cols=["lang"]
        ).collect()}
        assert out[100] == 0 and out[129] == 2
        assert all(out[100 + i] is not None for i in range(30))

    def test_grouped_broadcast_gate(self, spark):
        """Above max_broadcast_groups the breakpoint join falls back to
        a shuffle join instead of broadcasting; results are identical."""
        from patito_spark.operators.sampling import quantile_bins
        from patito_spark.plans import executed_plan

        rows = [(i, f"g{i % 7}", float(i)) for i in range(140)]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, ppl double"
        )
        small = quantile_bins(df, "ppl", n_bins=2, group_cols=["lang"])
        big = quantile_bins(
            df, "ppl", n_bins=2, group_cols=["lang"],
            max_broadcast_groups=3,
        )
        assert "BroadcastHashJoin" in executed_plan(small)
        a = {r.doc_id: r.bin for r in small.collect()}
        b = {r.doc_id: r.bin for r in big.collect()}
        assert a == b

    def test_ccnet_buckets_labels_and_plan(self, spark):
        from pyspark.sql import functions as F

        from patito_spark.operators.sampling import ccnet_buckets
        from patito_spark.plans import executed_plan

        rows = [(i, "en", float(i % 30)) for i in range(90)] + [
            (100 + i, "de", float(50 + i % 30)) for i in range(90)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, perplexity double"
        )
        out = ccnet_buckets(df)
        got = out.groupBy("lang", "ccnet_bucket").count().collect()
        langs = {(r.lang, r.ccnet_bucket) for r in got}
        for lang in ("en", "de"):
            assert {(lang, "head"), (lang, "middle"), (lang, "tail")} <= langs
        # head = the LOWEST-perplexity third of each language
        en_head_max = (
            out.filter("lang = 'en' and ccnet_bucket = 'head'")
            .agg(F.max("perplexity")).first()[0]
        )
        en_tail_min = (
            out.filter("lang = 'en' and ccnet_bucket = 'tail'")
            .agg(F.min("perplexity")).first()[0]
        )
        assert en_head_max < en_tail_min
        # breakpoint side broadcasts; the data stream never shuffles
        plan = executed_plan(out)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
