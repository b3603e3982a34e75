"""SemDeDup semantic dedup: exactness within cells, keep rules, routing.

The planted corpus has well-separated direction clusters with duplicate
cohorts inside them, so with fixed centroids the within-cluster pair set
EQUALS the global exact pair set (embedding_dedup_pairs, already
value-oracled) — the strongest equivalence available without an oracle
slot.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patito_spark.operators.dedup import embedding_dedup_pairs
from patito_spark.operators.semdedup import semantic_dedup, semantic_dedup_pairs
from patito_spark.operators.similarity import build_ivf_index

DIM = 8
N_CLUSTERS = 4


def _unit(v):
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def corpus(spark):
    """4 orthogonal-ish direction clusters x 6 members; within each
    cluster members 0-2 are a tight duplicate cohort (cosine > 0.99 to
    each other), members 3-5 are spread (cosine < 0.8 to everything)."""
    rng = np.random.RandomState(7)
    base = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0][:N_CLUSTERS]
    rows = []
    for c in range(N_CLUSTERS):
        for m in range(6):
            if m < 3:
                v = _unit(base[c] + 0.02 * rng.normal(size=DIM))
            else:
                v = _unit(base[c] + 0.9 * rng.normal(size=DIM))
            rows.append((c * 10 + m, v.tolist()))
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(c, base[c].tolist()) for c in range(N_CLUSTERS)],
        schema="vec_id long, embedding array<double>",
    )
    return df, cents, base


@pytest.fixture(scope="module")
def index(corpus):
    df, cents, _ = corpus
    idx = build_ivf_index(
        df, centroids_df=cents, assign_metric="cosine", materialize=True
    )
    yield idx
    idx.unpersist()


def test_pairs_match_exact_allpairs(corpus, index):
    df, _, _ = corpus
    got = semantic_dedup_pairs(df, threshold=0.9, index=index)
    exact = embedding_dedup_pairs(df, threshold=0.9)
    g = {(r.id_a, r.id_b): r.cosine for r in got.collect()}
    e = {(r.id_a, r.id_b): r.cosine for r in exact.collect()}
    # Separated clusters: the cell restriction loses nothing.
    assert set(g) == set(e) and len(g) > 0
    for k in g:  # sequential-fold on both paths -> bit-equal
        assert g[k] == e[k]
    # Each cluster's tight cohort forms C(3,2)=3 pairs.
    assert len(g) == 3 * N_CLUSTERS


def test_blocked_routing_equals_single_block(corpus, index):
    df, _, _ = corpus
    one = semantic_dedup_pairs(df, threshold=0.9, index=index, n_blocks=1)
    four = semantic_dedup_pairs(df, threshold=0.9, index=index, n_blocks=4)
    as_set = lambda d: {
        (r.id_a, r.id_b, r.cosine, r.cent_sim_a, r.cent_sim_b)
        for r in d.collect()
    }
    assert as_set(one) == as_set(four)


def test_cent_sim_is_cosine_to_own_centroid(corpus, index):
    df, _, base = corpus
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    for r in semantic_dedup_pairs(df, threshold=0.9, index=index).collect():
        for node, sim in ((r.id_a, r.cent_sim_a), (r.id_b, r.cent_sim_b)):
            c = base[node // 10]
            expect = float(
                np.dot(vecs[node], c)
                / (np.linalg.norm(vecs[node]) * np.linalg.norm(c))
            )
            assert sim == pytest.approx(expect, abs=1e-9)


def test_keep_outlier_keeps_least_central(corpus, index):
    df, _, base = corpus
    out = semantic_dedup(df, threshold=0.9, keep="outlier", index=index)
    kept = {r.vec_id for r in out.select("vec_id").collect()}
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    # Per cluster: 3 spread members survive untouched, cohort keeps
    # exactly the member LEAST similar to the centroid.
    assert len(kept) == N_CLUSTERS * 4
    for c in range(N_CLUSTERS):
        cohort = [c * 10 + m for m in range(3)]
        sims = {
            i: float(np.dot(_unit(vecs[i]), _unit(base[c]))) for i in cohort
        }
        survivor = min(cohort, key=lambda i: (sims[i], i))
        assert kept & set(cohort) == {survivor}
        assert {c * 10 + m for m in range(3, 6)} <= kept


def test_keep_central_and_min_id(corpus, index):
    df, _, base = corpus
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    central = semantic_dedup(df, threshold=0.9, keep="central", index=index)
    kept_c = {r.vec_id for r in central.select("vec_id").collect()}
    for c in range(N_CLUSTERS):
        cohort = [c * 10 + m for m in range(3)]
        sims = {
            i: float(np.dot(_unit(vecs[i]), _unit(base[c]))) for i in cohort
        }
        survivor = max(cohort, key=lambda i: (sims[i], -i))
        assert kept_c & set(cohort) == {survivor}

    min_id = semantic_dedup(df, threshold=0.9, keep="min_id", index=index)
    kept_m = {r.vec_id for r in min_id.select("vec_id").collect()}
    for c in range(N_CLUSTERS):
        assert kept_m & {c * 10 + m for m in range(3)} == {c * 10}


def test_keep_validation(corpus, index):
    df, _, _ = corpus
    with pytest.raises(ValueError, match="keep must be"):
        semantic_dedup(df, keep="best", index=index)


def test_self_fit_index_path(corpus):
    """index=None fits KMeans internally; the duplicate cohorts are so
    tight that any quantizer keeps each cohort in one cell — all 4
    cohorts collapse regardless of the learned cells."""
    df, _, _ = corpus
    out = semantic_dedup(
        df, threshold=0.99, keep="min_id", n_centroids=N_CLUSTERS, seed=3
    )
    assert out.count() == N_CLUSTERS * 4
    kept = {r.vec_id for r in out.select("vec_id").collect()}
    assert {c * 10 for c in range(N_CLUSTERS)} <= kept


def test_no_duplicates_is_identity(spark):
    rng = np.random.RandomState(5)
    rows = [
        (i, _unit(rng.normal(size=DIM)).tolist()) for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>"
    )
    out = semantic_dedup(df, threshold=0.999, n_centroids=4, keep="outlier")
    assert out.count() == 30


def test_on_driver_embeddings_table(spark, sf_dir):
    """Real table shape (vec_id, embedding from testdata parquet):
    within-cell pairs are a SUBSET of the global exact pairs (the cell
    restriction can only remove pairs, never invent or rescore them),
    with bit-equal cosines on the shared ones."""
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    thr = 0.35  # synthetic embeddings are near-orthogonal; lower thr -> pairs exist
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in semantic_dedup_pairs(df, threshold=thr, n_centroids=4).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dedup_pairs(df, threshold=thr).collect()
    }
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert v == exact[k]
    out = semantic_dedup(df, threshold=thr, n_centroids=4, keep="outlier")
    assert out.count() == df.count() - len(
        {n for pair in got for n in pair}
    ) + _n_components(got)


def _n_components(pairs):
    """Union-find over the pair keys (tiny, test-side only)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    nodes = {n for p in pairs for n in p}
    return len({find(n) for n in nodes})


def test_zero_centroid_nan_cent_sim_deterministic(spark):
    """A zero-norm CENTROID makes cent_sim NaN for every member of its
    cell (0/0 in the cosine); the keep rules must still pick the
    window-era representative (NaN ranks as the old `cent_sim DESC`
    placement, ties -> min node) instead of erroring or going
    nondeterministic. Reachable via caller-fixed centroids + l2
    assignment; per-node NaN (zero-norm member) cannot reach the keep
    rule because its pair cosines are NaN and fail the threshold."""
    eps = 1e-3
    rows = [
        (1, [eps, 0.0, 0.0, 0.0]),
        (2, [eps, eps * 1e-4, 0.0, 0.0]),
        (3, [eps, 0.0, eps * 1e-4, 0.0]),
        (10, [5.0, 5.0, 5.0, 5.0]),
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [5.0, 5.0, 5.0, 5.0])],
        schema="vec_id long, embedding array<double>",
    )
    idx = build_ivf_index(df, centroids_df=cents, assign_metric="l2")
    pairs = semantic_dedup_pairs(df, threshold=0.99, index=idx)
    got = pairs.collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2), (1, 3), (2, 3)}
    # The NaN crosses the Arrow boundary as NULL (pandas' null sentinel
    # IS NaN); the keep rule must tolerate both spellings.
    assert all(
        r.cent_sim_a is None or np.isnan(r.cent_sim_a) for r in got
    )
    for keep in ("central", "outlier", "min_id"):
        out = semantic_dedup(df, threshold=0.99, keep=keep, index=idx)
        assert {r.vec_id for r in out.select("vec_id").collect()} == {1, 10}
