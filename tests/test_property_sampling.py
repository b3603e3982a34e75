"""Property tests: cap_per_group vs a naive Python recount."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

ROWS = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 10_000)),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[1],  # unique ids
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS, k=st.integers(1, 6), seed=st.integers(0, 3))
def test_cap_per_group_is_k_smallest_hashes(spark, rows, k, seed):
    from pyspark.sql import functions as F

    from patito_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(rows, "g long, id long")
    got = sorted(
        (r["g"], r["id"])
        for r in cap_per_group(df, "g", k, key_col="id", seed=seed).collect()
    )
    hashed = {
        r["id"]: r["h"]
        for r in df.select(
            "id", F.xxhash64("id", F.lit(seed)).alias("h")
        ).collect()
    }
    want = []
    for g in {r[0] for r in rows}:
        members = sorted(
            (i for gg, i in rows if gg == g), key=lambda i: hashed[i]
        )
        want += [(g, i) for i in members[:k]]
    assert got == sorted(want)
