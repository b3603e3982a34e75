"""Connected-components correctness on known graph shapes.

Every shape runs through BOTH paths: the adaptive driver-side
union-find (default for small edge lists) and the distributed
min-label loop (forced with driver_threshold=0). Labels must agree.
"""

import pytest

from patito_spark.operators import graph


@pytest.fixture(params=[1_000_000, 0], ids=["driver", "distributed"])
def connected_components(request):
    def run(pairs, **kw):
        kw.setdefault("driver_threshold", request.param)
        return graph.connected_components(pairs, **kw)

    return run


def components_map(df):
    return {r.node: r.component for r in df.collect()}


def test_simple_chain(spark, connected_components):
    # 1-2-3 chain plus isolated pair 10-11: two components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], schema="id_a long, id_b long"
    )
    got = components_map(connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges(spark, connected_components):
    # path 0-1-2-...-19: diameter 19, needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], schema="id_a long, id_b long"
    )
    got = components_map(connected_components(pairs))
    assert set(got.values()) == {0}
    assert len(got) == 20


def test_cycle_and_star(spark, connected_components):
    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5), (100, 101), (100, 102), (100, 103)],
        schema="id_a long, id_b long",
    )
    got = components_map(connected_components(pairs))
    assert {got[5], got[6], got[7]} == {5}
    assert {got[100], got[101], got[102], got[103]} == {100}


def test_reversed_edge_direction(spark, connected_components):
    # min id on the right side of the pair must still win
    pairs = spark.createDataFrame([(9, 1)], schema="id_a long, id_b long")
    got = components_map(connected_components(pairs))
    assert got == {9: 1, 1: 1}


def test_probe_is_count_gated(spark, monkeypatch):
    """An edge list over driver_threshold must NEVER ship rows to the
    driver before falling back to the distributed loop: the probe is a
    count() on the persisted edges, not a limit(N+1).toPandas()."""
    # patch the CONCRETE class (pyspark 4 routes pyspark.sql.DataFrame to
    # an abstract base whose toPandas the classic subclass overrides;
    # pyspark 3 has no classic module — resolve the class from a live df)
    SparkDataFrame = type(spark.range(1))

    calls = []
    original = SparkDataFrame.toPandas
    monkeypatch.setattr(
        SparkDataFrame,
        "toPandas",
        lambda self: calls.append(1) or original(self),
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], schema="id_a long, id_b long"
    )
    # 10 edges > threshold 5 -> distributed path, zero toPandas calls
    got = components_map(graph.connected_components(pairs, driver_threshold=5))
    assert not calls
    assert set(got.values()) == {0} and len(got) == 11

    # under the threshold the Arrow probe fires exactly once
    small = spark.createDataFrame([(1, 2), (2, 3)], schema="id_a long, id_b long")
    got_small = components_map(
        graph.connected_components(small, driver_threshold=5)
    )
    assert len(calls) == 1
    assert got_small == {1: 1, 2: 1, 3: 1}
