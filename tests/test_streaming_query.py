"""The oracle-less streaming gate entry must still run and agree with
the equivalent batch aggregation (rows-only driver check, but we hold
it to batch equivalence locally)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trx_spark.queries.streamingq import streaming_incremental_stats
from trx_spark.tables import load_table


def test_streaming_query_matches_batch(spark, sf_dir):
    got = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in streaming_incremental_stats(spark, sf_dir).collect()
    }
    batch = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 1e6).cast("long")).cast("double") / 1e6).alias(
                "sum_value"
            ),
        )
        .collect()
    }
    assert got == batch
