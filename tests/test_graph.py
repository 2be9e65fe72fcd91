"""Connected components / dedup clusters over near-dup pair lists."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    s = (SparkSession.builder.master("local[4]")
         .appName("graph-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _cc(spark, pairs):
    from geomesa_spark.operators.graph import connected_components
    df = spark.createDataFrame(pairs, "a string, b string")
    return {r["node"]: r["comp"]
            for r in connected_components(df).collect()}


class TestConnectedComponents:
    def test_two_components_and_transitivity(self, spark):
        got = _cc(spark, [("b", "c"), ("a", "b"), ("x", "y")])
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_long_chain_converges(self, spark):
        n = 40  # pointer jumping: rounds ~ log2(n), well under max_iter
        pairs = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
        got = _cc(spark, pairs)
        assert set(got.values()) == {"n000"} and len(got) == n + 1

    def test_cycle_and_self_edge(self, spark):
        got = _cc(spark, [("p", "q"), ("q", "r"), ("r", "p"), ("s", "s")])
        assert got == {"p": "p", "q": "p", "r": "p", "s": "s"}

    def test_dedup_clusters_summary(self, spark):
        from geomesa_spark.operators.graph import dedup_clusters
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")], "a string, b string")
        got = {r["keeper"]: r["n_members"]
               for r in dedup_clusters(df).collect()}
        assert got == {"a": 3, "x": 2}


def test_unconverged_raises(spark):
    """max_iter exhaustion must raise, not return partially-merged
    labels (a silent partial merge would make dedup delete against
    wrong keepers)."""
    import pytest
    from geomesa_spark.operators.graph import connected_components
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
