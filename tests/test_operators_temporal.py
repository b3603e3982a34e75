"""asof_join / range_join / apply_changes vs hand-checked inputs."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.temporal import apply_changes, asof_join, range_join


def canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def quotes(spark):
    # (sym, t, px)
    return spark.createDataFrame(
        [
            ("A", 10, 1.0),
            ("A", 20, 2.0),
            ("A", 30, 3.0),
            ("B", 15, 10.0),
        ],
        "sym string, t long, px double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", 5, 100),   # before any quote -> NULL
            ("A", 20, 200),  # equal timestamp -> matches the t=20 quote
            ("A", 25, 300),  # between -> t=20 quote
            ("A", 99, 400),  # after all -> t=30 quote
            ("B", 14, 500),  # before B's only quote -> NULL
            ("C", 50, 600),  # key with no quotes -> NULL
        ],
        "sym string, t long, qty long",
    )


def test_asof_join_backward(trades, quotes):
    out = asof_join(trades, quotes, on="t", by=["sym"])
    got = {
        (r["sym"], r["t"]): (r["right_px"], r["right_t"])
        for r in out.collect()
    }
    assert got == {
        ("A", 5): (None, None),
        ("A", 20): (2.0, 20),
        ("A", 25): (2.0, 20),
        ("A", 99): (3.0, 30),
        ("B", 14): (None, None),
        ("C", 50): (None, None),
    }
    assert out.count() == trades.count()  # left rows always preserved


def test_asof_join_tolerance(trades, quotes):
    out = asof_join(trades, quotes, on="t", by=["sym"], tolerance=5)
    got = {(r["sym"], r["t"]): r["right_px"] for r in out.collect()}
    # A@99 matched quote t=30, but 99-30 > 5 -> nulled out
    assert got[("A", 99)] is None
    assert got[("A", 25)] == 2.0  # 25-20 <= 5 stays


def test_asof_join_no_key(spark):
    left = spark.createDataFrame([(10,), (25,)], "t long")
    right = spark.createDataFrame([(5, "x"), (20, "y")], "t long, tag string")
    out = asof_join(left, right, on="t")
    got = {r["t"]: r["right_tag"] for r in out.collect()}
    assert got == {10: "x", 25: "y"}


@pytest.fixture()
def intervals(spark):
    return spark.createDataFrame(
        [(1, 0, 10), (2, 5, 15), (3, 100, 101)],
        "iv_id long, s long, e long",
    )


def test_range_join_inner(spark, intervals):
    points = spark.createDataFrame(
        [(7, "a"), (12, "b"), (100, "c"), (50, "d")], "p long, tag string"
    )
    out = range_join(points, intervals, "p", "s", "e", bucket_width=4)
    got = sorted((r["p"], r["iv_id"]) for r in out.collect())
    # 7 in [0,10) and [5,15); 12 in [5,15); 100 in [100,101); 50 nowhere
    assert got == [(7, 1), (7, 2), (12, 2), (100, 3)]


def test_range_join_left_keeps_unmatched(spark, intervals):
    points = spark.createDataFrame([(7, "a"), (50, "d")], "p long, tag string")
    out = range_join(points, intervals, "p", "s", "e", bucket_width=4, how="left")
    rows = {(r["p"], r["iv_id"]) for r in out.collect()}
    assert (50, None) in rows
    assert {(7, 1), (7, 2)} <= rows


def test_range_join_boundaries(spark, intervals):
    # start inclusive, end exclusive — points exactly on the edges
    points = spark.createDataFrame([(0,), (10,), (15,)], "p long")
    out = range_join(points, intervals, "p", "s", "e", bucket_width=4)
    got = sorted((r["p"], r["iv_id"]) for r in out.collect())
    assert got == [(0, 1), (10, 2)]  # 10 not in [0,10); 15 not in [5,15)


def test_range_join_auto_bucket_width(spark, intervals):
    points = spark.createDataFrame([(7,)], "p long")
    out = range_join(points, intervals, "p", "s", "e")  # inferred width
    assert sorted(r["iv_id"] for r in out.collect()) == [1, 2]


def test_range_join_keyed(spark):
    intervals = spark.createDataFrame(
        [("u1", 1, 0, 10), ("u2", 2, 0, 10)], "u string, iv_id long, s long, e long"
    )
    points = spark.createDataFrame([("u1", 5)], "u string, p long")
    out = range_join(points, intervals, "p", "s", "e", by=["u"], bucket_width=4)
    assert [(r["u"], r["iv_id"]) for r in out.collect()] == [("u1", 1)]


def test_apply_changes_upsert_delete(spark):
    base = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "new1a", 10, "U"),
            (1, "new1b", 20, "U"),   # later seq wins
            (2, None, 15, "D"),      # delete key 2
            (4, "new4", 5, "I"),     # insert new key
            (5, "ghost", 1, "U"),
            (5, None, 2, "D"),       # insert then delete -> absent
        ],
        "k long, v string, seq long, op string",
    )
    out = apply_changes(base, changes, key_cols=["k"], seq_col="seq")
    assert canon(out.select("k", "v")) == [
        (1, "new1b"),
        (3, "old3"),
        (4, "new4"),
    ]


def test_apply_changes_snapshot_from_stream(spark):
    changes = spark.createDataFrame(
        [(1, "a", 1, "U"), (1, "b", 2, "U"), (2, "x", 1, "D")],
        "k long, v string, seq long, op string",
    )
    out = apply_changes(None, changes, key_cols=["k"], seq_col="seq")
    assert canon(out.select("k", "v")) == [(1, "b")]


def test_asof_join_forward(trades, quotes):
    out = asof_join(trades, quotes, on="t", by=["sym"], direction="forward")
    got = {
        (r["sym"], r["t"]): (r["right_px"], r["right_t"])
        for r in out.collect()
    }
    assert got == {
        ("A", 5): (1.0, 10),    # earliest quote at/after 5
        ("A", 20): (2.0, 20),   # equality matches forward too
        ("A", 25): (3.0, 30),
        ("A", 99): (None, None),  # nothing after 99
        ("B", 14): (10.0, 15),
        ("C", 50): (None, None),
    }


def test_asof_join_nearest(trades, quotes):
    out = asof_join(trades, quotes, on="t", by=["sym"], direction="nearest")
    got = {(r["sym"], r["t"]): r["right_t"] for r in out.collect()}
    assert got[("A", 5)] == 10    # only forward exists
    assert got[("A", 20)] == 20   # exact
    assert got[("A", 25)] == 20   # backward dist 5 <= forward dist 5 -> tie, backward
    assert got[("A", 99)] == 30   # only backward exists
    assert got[("B", 14)] == 15


def test_asof_join_nearest_tolerance(trades, quotes):
    out = asof_join(
        trades, quotes, on="t", by=["sym"], direction="nearest", tolerance=4
    )
    got = {(r["sym"], r["t"]): r["right_t"] for r in out.collect()}
    assert got[("A", 5)] is None   # forward dist 5 > 4
    assert got[("A", 25)] is None  # both dists 5 > 4
    assert got[("B", 14)] == 15    # dist 1

def test_asof_join_bad_direction(trades, quotes):
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="t", direction="sideways")


def test_range_join_negative_coordinates(spark):
    """Bucket ids must floor (not truncate): points below zero."""
    intervals = spark.createDataFrame([(1, -10, -2)], "iv_id long, s long, e long")
    points = spark.createDataFrame([(-5,), (-2,), (-11,)], "p long")
    out = range_join(points, intervals, "p", "s", "e", bucket_width=4)
    got = sorted(r["p"] for r in out.collect())
    assert got == [-5]  # -2 excluded (end), -11 outside


def test_asof_join_null_right_timestamps_ignored(spark):
    left = spark.createDataFrame([(10,)], "t long")
    right = spark.createDataFrame(
        [(None, "ghost"), (5, "real")], "t long, tag string"
    )
    out = asof_join(left, right, on="t")
    assert out.first()["right_tag"] == "real"


def test_apply_changes_base_with_composite_seq(spark):
    base = spark.createDataFrame([(1, "old")], "k long, v string")
    changes = spark.createDataFrame(
        [
            (1, 10, 1, "a", "U"),
            (1, 10, 2, "b", "U"),   # same ts, higher tiebreak wins
            (2, 5, 1, "c", "U"),
        ],
        "k long, ts long, sub long, v string, op string",
    )
    out = apply_changes(base, changes, key_cols=["k"], seq_col=["ts", "sub"])
    got = {(r["k"], r["v"]) for r in out.collect()}
    assert got == {(1, "b"), (2, "c")}


def test_asof_join_both_directions(trades, quotes):
    """direction='both' equals backward + forward run separately."""
    out = asof_join(trades, quotes, on="t", by=["sym"], direction="both")
    got = {
        (r["sym"], r["t"]): (r["right_px"], r["right_t"], r["fwd_px"], r["fwd_t"])
        for r in out.collect()
    }
    assert got == {
        ("A", 5): (None, None, 1.0, 10),
        ("A", 20): (2.0, 20, 2.0, 20),   # equality matches both directions
        ("A", 25): (2.0, 20, 3.0, 30),
        ("A", 99): (3.0, 30, None, None),
        ("B", 14): (None, None, 10.0, 15),
        ("C", 50): (None, None, None, None),
    }
    assert out.count() == trades.count()


def test_asof_join_both_matches_separate_passes(trades, quotes):
    both = asof_join(trades, quotes, on="t", by=["sym"], direction="both")
    back = asof_join(trades, quotes, on="t", by=["sym"], direction="backward")
    fwd = asof_join(trades, quotes, on="t", by=["sym"], direction="forward")
    b = {(r["sym"], r["t"]): (r["right_px"], r["right_t"]) for r in back.collect()}
    f = {(r["sym"], r["t"]): (r["right_px"], r["right_t"]) for r in fwd.collect()}
    for r in both.collect():
        key = (r["sym"], r["t"])
        assert (r["right_px"], r["right_t"]) == b[key]
        assert (r["fwd_px"], r["fwd_t"]) == f[key]


def test_asof_join_both_tolerance(trades, quotes):
    out = asof_join(
        trades, quotes, on="t", by=["sym"], direction="both", tolerance=5
    )
    got = {
        (r["sym"], r["t"]): (r["right_t"], r["fwd_t"]) for r in out.collect()
    }
    # backward match valid iff left-right <= 5; forward iff right-left <= 5
    assert got == {
        ("A", 5): (None, 10),
        ("A", 20): (20, 20),
        ("A", 25): (20, 30),
        ("A", 99): (None, None),
        ("B", 14): (None, 15),
        ("C", 50): (None, None),
    }


def test_asof_join_both_single_shuffle(trades, quotes):
    """Both directions must reuse ONE exchange (the design contract)."""
    out = asof_join(trades, quotes, on="t", by=["sym"], direction="both")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
