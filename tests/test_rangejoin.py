"""Bucketed interval join: must produce exactly the nested-loop
semantics while planning as a hash equi-join (the whole point is that
the naive non-equi join compiles to BroadcastNestedLoopJoin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trx_spark.operators.rangejoin import interval_point_join


def _frames(spark):
    iv = spark.createDataFrame(
        [
            # (key, start, end)  — half-open [start, end)
            (1, 100, 200),
            (1, 150, 250),
            (2, 0, 50),
            (3, 900, 1000),
        ],
        "k long, s long, e long",
    )
    pt = spark.createDataFrame(
        [
            (1, 100),  # == start: in
            (1, 199),  # in first, in second? 199 >= 150 yes
            (1, 200),  # == end: out of first, in second
            (1, 250),  # == second end: out
            (2, 49),
            (2, 50),
            (3, 899),
            (9, 100),  # key with no interval
        ],
        "k long, p long",
    )
    return iv, pt


def test_matches_nested_loop_semantics(spark):
    iv, pt = _frames(spark)
    got = interval_point_join(iv, pt, on=["k"], start="s", end="e", point="p",
                              bucket_width=100)
    naive = iv.join(pt, "k").filter((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
    assert sorted(map(tuple, got.select("k", "s", "e", "p").collect())) == sorted(
        map(tuple, naive.select("k", "s", "e", "p").collect())
    )


def test_plan_is_equi_join_not_nested_loop(spark):
    iv, pt = _frames(spark)
    got = interval_point_join(iv, pt, on=["k"], start="s", end="e", point="p",
                              bucket_width=100)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_left_join_count_semantics(spark):
    # count-per-interval via how="left": null rows from matchless probe
    # buckets must not inflate the count, and matchless intervals must
    # survive with count 0
    iv, pt = _frames(spark)
    got = (
        interval_point_join(iv, pt, on=["k"], start="s", end="e", point="p",
                            bucket_width=100, how="left")
        .groupBy("k", "s", "e")
        .agg(F.count("p").alias("n"))
    )
    naive = (
        iv.join(pt, "k", "left")
        .withColumn(
            "hit",
            F.when((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")), 1),
        )
        .groupBy("k", "s", "e")
        .agg(F.count("hit").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
