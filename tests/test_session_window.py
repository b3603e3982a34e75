"""Native session_window aggregation: batch truth + streaming equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patito_spark.streaming import session_window_aggregate

GAP_S = 100


def _reference_sessions(events):
    """Native-semantics reference (probed in the module under test):
    split only when delta > gap; session end is last event + gap.
    events: list[(user, ts_seconds)]."""
    out = {}
    by_user = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        sessions = []
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > GAP_S:
                sessions.append((start, prev + GAP_S, n))
                start, n = t, 0
            prev = t
            n += 1
        sessions.append((start, prev + GAP_S, n))
        out[u] = sessions
    return {
        (u, s, e, n) for u, ss in out.items() for (s, e, n) in ss
    }


@pytest.fixture(scope="module")
def events():
    rng = np.random.RandomState(42)
    rows = []
    for u in range(8):
        t = 1_000_000
        for _ in range(200):
            t += int(rng.randint(1, 300))
            rows.append((u, t))
    # boundary cases: delta == GAP_S merges, delta == GAP_S + 1 splits
    rows += [(99, 5000), (99, 5000 + GAP_S), (99, 5000 + 2 * GAP_S + 1)]
    return rows


def _got_set(df):
    return {
        (
            r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events,
        )
        for r in df.collect()
    }


def test_batch_matches_reference(spark, events):
    df = spark.createDataFrame(events, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    got = _got_set(
        session_window_aggregate(df, "user_id", "ts", f"{GAP_S} seconds")
    )
    assert got == _reference_sessions(events)
    # boundary pin: (99, 5000+GAP) MERGES with (99, 5000); the
    # GAP_S+1 delta then splits
    assert (99, 5000, 5000 + 2 * GAP_S, 2) in got
    assert (99, 5000 + 2 * GAP_S + 1, 5000 + 3 * GAP_S + 1, 1) in got


def test_extra_aggs_and_batch_mode(spark):
    df = spark.createDataFrame(
        [(1, 10, 2.0), (1, 20, 3.0), (1, 500, 4.0)],
        "user_id long, sec long, value double",
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "value")
    out = session_window_aggregate(
        df, "user_id", "ts", "60 seconds", F.sum("value").alias("total")
    ).orderBy("session_start")
    rows = out.collect()
    assert [r.n_events for r in rows] == [2, 1]
    assert [r.total for r in rows] == [5.0, 4.0]
    assert out.columns == [
        "user_id", "session_start", "session_end", "n_events", "total",
    ]


def test_streaming_equals_batch(spark, events, tmp_path):
    """availableNow drain over the same rows; a far-future sentinel per
    user pushes the final watermark past every real session so append
    mode emits them all."""
    max_sec = max(t for _, t in events)
    sentinel_sec = max_sec + 1_000_000
    users = sorted({u for u, _ in events})
    with_sentinels = events + [(u, sentinel_sec) for u in users]

    src = str(tmp_path / "events")
    spark.createDataFrame(
        with_sentinels, "user_id long, sec long"
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, sec long")
        .parquet(src)
        .select("user_id", F.timestamp_seconds("sec").alias("ts"))
    )
    sessions = session_window_aggregate(
        stream, "user_id", "ts", f"{GAP_S} seconds", watermark="0 seconds"
    )
    sink = f"tbl_session_eq_{abs(hash(src)) % 10**8}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _got_set(spark.table(sink))
    # sentinel sessions are withheld (their windows end after the final
    # watermark), so the emitted set is exactly the real sessions
    assert got == _reference_sessions(events)
