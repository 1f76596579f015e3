"""Temporal interval-join query: for every click event, how many
purchases did the same user make in the following 15 minutes?

The naive formulation is a non-equi join (``p.ts BETWEEN c.ts AND
c.ts + 15min``) which Spark executes as BroadcastNestedLoopJoin —
O(clicks x purchases) per user at best. The engine's
:func:`trx_spark.operators.rangejoin.interval_point_join` quantizes
time into 15-minute buckets and turns it into a hash equi-join on
(user_id, bucket); the oracle keeps the naive inequality-join SQL, so
the gate proves the bucketed plan computes exactly the nested-loop
semantics. All comparisons are on integer MICROSECONDS (``ts_ns DIV
1000`` == DuckDB ``epoch_us``): the events parquet carries true nanos
but DuckDB's view truncates to micros, so micros is the precision both
engines share (same convention as ``sessionize_events``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.operators.rangejoin import interval_point_join
from trx_spark.tables import load_table

_WIN_US = 15 * 60 * 1_000_000  # 15 minutes, in micros


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.expr("ts_ns DIV 1000").alias("t_us"),
        F.expr("ts_ns DIV 1000").alias("w_start"),
        (F.expr("ts_ns DIV 1000") + _WIN_US).alias("w_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.expr("ts_ns DIV 1000").alias("p_us")
    )
    # how="left": zero-match clicks keep one null row per probe bucket;
    # the groupBy collapses them — ONE join, ONE agg, no join-back
    matched = interval_point_join(
        clicks,
        purchases,
        on=["user_id"],
        start="w_start",
        end="w_end",
        point="p_us",
        bucket_width=_WIN_US,
        how="left",
    )
    return matched.groupBy("event_id", "user_id", "t_us").agg(
        F.count("p_us").alias("n_purchases_15m")
    )


_RANGE_JOIN_SQL = f"""
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS t_us,
       CAST(COUNT(p.user_id) AS BIGINT) AS n_purchases_15m
FROM events c
LEFT JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(c.ts)
 AND epoch_us(p.ts) < epoch_us(c.ts) + {_WIN_US}
WHERE c.event_type = 'click'
GROUP BY c.event_id, c.user_id, epoch_us(c.ts)
"""


QUERIES = {"events_range_join": events_range_join}
ORACLES = {"events_range_join": _RANGE_JOIN_SQL}
