"""Property-based checks: temporal operators vs naive python replays.

Each operator is compared against an obviously-correct O(n·m) python
implementation on small random inputs — the strongest guard against
boundary bugs (equal timestamps, empty sides, duplicate keys) that
hand-picked fixtures miss.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from patito_spark.operators.temporal import apply_changes, asof_join, range_join

KEYS = st.sampled_from(["a", "b"])
TS = st.integers(min_value=0, max_value=40)

LEFT_ROWS = st.lists(
    st.tuples(KEYS, TS), min_size=0, max_size=8, unique=True
)
# unique (key, ts) on the right: as-of is undefined for duplicates there
RIGHT_ROWS = st.lists(
    st.tuples(KEYS, TS), min_size=0, max_size=8, unique_by=lambda r: (r[0], r[1])
)


def naive_asof(left, right, direction):
    out = {}
    for lk, lt in left:
        candidates = [rt for rk, rt in right if rk == lk]
        back = [rt for rt in candidates if rt <= lt]
        fwd = [rt for rt in candidates if rt >= lt]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        if direction == "backward":
            out[(lk, lt)] = b
        elif direction == "forward":
            out[(lk, lt)] = f
        else:
            if b is None:
                out[(lk, lt)] = f
            elif f is None:
                out[(lk, lt)] = b
            else:
                out[(lk, lt)] = b if (lt - b) <= (f - lt) else f
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=LEFT_ROWS, right=RIGHT_ROWS,
       direction=st.sampled_from(["backward", "forward", "nearest"]))
def test_asof_matches_naive(spark, left, right, direction):
    if not left:
        return
    ldf = spark.createDataFrame([(k, t, 1) for k, t in left], "k string, t long, lv long")
    rdf = spark.createDataFrame(
        [(k, t, t * 100) for k, t in right] or [("zz", 0, 0)],
        "k string, t long, rv long",
    )
    if not right:
        rdf = rdf.filter("k != 'zz'")
    out = asof_join(ldf, rdf, on="t", by=["k"], direction=direction)
    got = {(r["k"], r["t"]): r["right_t"] for r in out.collect()}
    assert got == naive_asof(left, right, direction)


INTERVALS = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 10)),
    min_size=0, max_size=6,
)
POINTS = st.lists(st.integers(-5, 45), min_size=0, max_size=8, unique=True)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(intervals=INTERVALS, points=POINTS, width=st.integers(1, 12))
def test_range_join_matches_naive(spark, intervals, points, width):
    if not points or not intervals:
        return
    ivs = [(i, s, s + length) for i, (s, length) in enumerate(intervals)]
    idf = spark.createDataFrame(ivs, "iv_id long, s long, e long")
    pdf = spark.createDataFrame([(p,) for p in points], "p long")
    out = range_join(pdf, idf, "p", "s", "e", bucket_width=width)
    got = sorted((r["p"], r["iv_id"]) for r in out.collect())
    want = sorted(
        (p, i) for p in points for i, s, e in ivs if s <= p < e
    )
    assert got == want


CHANGES = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.booleans()),
    min_size=1, max_size=10, unique_by=lambda c: (c[0], c[1]),
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=CHANGES)
def test_apply_changes_matches_naive(spark, changes):
    cdf = spark.createDataFrame(
        [(k, s, f"v{k}_{s}", "D" if d else "U") for k, s, d in changes],
        "k long, seq long, v string, op string",
    )
    out = apply_changes(None, cdf, key_cols=["k"], seq_col="seq")
    got = {(r["k"], r["v"]) for r in out.collect()}

    state = {}
    for k, s, d in sorted(changes, key=lambda c: c[1]):
        state[k] = None if d else f"v{k}_{s}"
    want = {(k, v) for k, v in state.items() if v is not None}
    assert got == want


# --- sketch / rollup properties ----------------------------------------- #

VALUES = st.lists(st.integers(0, 500), min_size=1, max_size=60)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=VALUES, k=st.sampled_from([4, 16, 64]))
def test_kmv_exact_when_under_k(spark, values, k):
    from patito_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(v,) for v in values], "v long")
    row = kmv_distinct(df, "v", k=k).first()
    n_true = len(set(values))
    if n_true < k:
        assert row["distinct_est"] == float(n_true)  # exact below k
    else:
        assert row["n_kept"] == k
        assert row["distinct_est"] > 0


EVENTS = st.lists(
    st.tuples(st.integers(0, 7200), st.integers(0, 2)),
    min_size=1, max_size=40,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS)
def test_cascade_rollup_levels_consistent(spark, events):
    """Every coarse bucket must equal the sum/max of its fine buckets,
    and the finest level must match a direct aggregation."""
    from patito_spark.operators.timeseries import cascade_rollup

    df = spark.createDataFrame(
        [(t, float(g)) for t, g in events], "ts long, v double"
    )
    rolled = cascade_rollup(
        df, "ts", widths=[60, 3600],
        aggs={"n": ("v", "count"), "mx": ("v", "max")},
    ).collect()
    fine = {r["bucket_start"]: r for r in rolled if r["resolution"] == 60}
    coarse = {r["bucket_start"]: r for r in rolled if r["resolution"] == 3600}
    # consistency: coarse n = sum of member fine n; coarse mx = max
    for cb, cr in coarse.items():
        members = [r for b, r in fine.items() if b // 3600 * 3600 == cb]
        assert cr["n"] == sum(m["n"] for m in members)
        assert cr["mx"] == max(m["mx"] for m in members)
    # finest matches direct
    direct = {}
    for t, g in events:
        b = t // 60 * 60
        direct.setdefault(b, []).append(float(g))
    assert {b: r["n"] for b, r in fine.items()} == {
        b: len(vs) for b, vs in direct.items()
    }
