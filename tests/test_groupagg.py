"""with_group_stats: the sharded Window.partitionBy replacement.

Pins the exact contract the strategy/guards/actions/pipeline refactor relies
on (verdict r3 #1): value-equivalence with the window formulation, including
the null-key grouping semantics, and the physical properties (partial
map-side aggregation, no WindowExec)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import Window
from pyspark.sql import functions as F

from pysparkdedup.groupagg import with_group_stats


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_matches_window_semantics(spark):
    df = spark.createDataFrame(
        [("k1", 1), ("k1", 5), ("k2", 7), ("k3", 2), ("k3", 2)],
        "key string, v int")
    got = with_group_stats(df, "key", [
        F.count(F.lit(1)).alias("_n"),
        F.min("v").alias("_mn"),
        F.max("v").alias("_mx"),
    ])
    w = Window.partitionBy("key")
    want = (df.withColumn("_n", F.count(F.lit(1)).over(w))
            .withColumn("_mn", F.min("v").over(w))
            .withColumn("_mx", F.max("v").over(w)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_null_keys_group_together_like_a_window(spark):
    """Window.partitionBy puts all null keys in ONE partition; a plain
    equi-join would drop them. The eqNullSafe join must reproduce the
    window's null-grouping exactly."""
    df = spark.createDataFrame(
        [(None, 1), (None, 9), ("k", 4)], "key string, v int")
    got = {(r["key"], r["_n"], r["_mx"]) for r in with_group_stats(
        df, "key", [F.count(F.lit(1)).alias("_n"),
                    F.max("v").alias("_mx")]).collect()}
    assert (None, 2, 9) in got
    assert ("k", 1, 4) in got
    assert len(got) == 2


def test_no_window_and_partial_agg_in_plan(spark):
    df = spark.createDataFrame([("k", 1)], "key string, v int")
    plan = _plan(with_group_stats(df, "key", [F.max("v").alias("_mx")]))
    assert "Window" not in plan
    # the stats branch must show a map-side partial phase (skew sharding)
    assert "partial_max" in plan


def test_conditional_aggregates_over_participants(spark):
    """The cascade's when(p, col) pattern: aggregates range over a subset
    while every row still receives the group stats."""
    df = spark.createDataFrame(
        [("k", 1, True), ("k", 100, False), ("k", 3, True)],
        "key string, v int, p boolean")
    out = with_group_stats(df, "key", [
        F.max(F.when(F.col("p"), F.col("v"))).alias("_pmax"),
    ])
    assert {r["_pmax"] for r in out.collect()} == {3}
    assert out.count() == 3
