"""Bucketed co-located join: the pay-once-shuffle layout contract.

The value of ``bucketBy`` is a PLAN property — the join must read
bucket-to-bucket with no Exchange on either input — so the test pins
the executed plan, not just the rows (row parity is the oracle gate's
job)."""

from __future__ import annotations

from trx_spark.queries.bucketing import (
    N_BUCKETS,
    bucketed_join,
    bucketed_join_stats,
    bucketed_tables,
)


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(bucketed_join(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle either input"
    # AQE renders the plan twice (final + initial): 2 scans per rendering
    assert plan.count("Bucketed: true") >= 2
    assert f"SelectedBucketsCount: {N_BUCKETS} out of {N_BUCKETS}" in plan


def test_gate_aggregate_single_data_shuffle(spark, sf_dir):
    """The whole gate query pays exactly one data shuffle pair — the
    groupBy on priority (partial + final exchange under AQE); the join
    itself contributes none."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(bucketed_join_stats(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_tables_memoized_and_one_file_per_bucket(spark, sf_dir):
    first = bucketed_tables(spark, sf_dir)
    assert bucketed_tables(spark, sf_dir) == first  # memo hit, no rewrite
    for name in first:
        files = spark.table(name).inputFiles()
        assert len(files) == N_BUCKETS, (
            "repartition(N, key) before bucketBy must yield exactly one "
            "file per bucket"
        )


def test_layout_is_row_exact(spark, sf_dir):
    li_name, _ = bucketed_tables(spark, sf_dir)
    from trx_spark.tables import load_table

    raw = load_table(spark, sf_dir, "lineitem")
    assert spark.table(li_name).count() == raw.count()
