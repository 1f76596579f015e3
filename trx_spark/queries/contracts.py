"""Data contracts: declarative expectations auditing and the SCD2
dimension merge — the warehouse-side operations a 100 TB platform runs
on every drop before and after it reaches the lake.

- ``table_expectations_audit``: the Great-Expectations / dbt-test idea
  (public knowledge) as one query — each expectation (not-null,
  uniqueness, accepted values, range, referential integrity) evaluates
  to a (checked, violations) row, so the contract result is DATA the
  pipeline can gate on, alert from, and trend.
- ``scd2_customer_versions``: the type-2 slowly-changing-dimension
  merge (Kimball, public): apply an update batch to a dimension while
  preserving history — close the superseded version, open the new one,
  append inserts. Spelled as ONE full outer join plus a union of
  classified legs (the MERGE pattern without a table format; Delta/
  Iceberg MERGE INTO compiles to the same join shape).

Scale notes: every expectation leg is a single-pass aggregate over one
scan except referential integrity, which is one LEFT ANTI join
(broadcast when the dimension is small, shuffle otherwise — no hint,
AQE decides); the SCD2 merge is one full outer join on the business
key plus map-side classification — history never re-shuffles, and at
100 TB the join key is the dimension's bucket/cluster key so the
exchange is elided on the dimension side.

The update batch derives deterministically from ``customer`` (same
trick as the record-linkage dirty roster): custkey % 10 == 3 rows get
a changed acctbal, custkey % 10 == 7 rows reappear keyed +1_000_000 as
inserts — both engines build the identical batch from pure expressions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.tables import load_table

# ---------------------------------------------------------------------
# Expectations audit
# ---------------------------------------------------------------------

_ACCEPTED_STATUS = ("F", "O", "P")


def table_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five contract checks over ``orders`` → one row per check:
    (check_name, n_checked, n_violations, passed)."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    # single-pass legs: one scan, four aggregates
    base = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.sum(
            (~F.col("o_orderstatus").isin(*_ACCEPTED_STATUS)).cast("long")
        ).alias("bad_status"),
        F.sum((~(F.col("o_totalprice") > 0)).cast("long")).alias("bad_price"),
    )
    legs = [
        base.select(
            F.lit("orderkey_not_null").alias("check_name"),
            F.col("n").alias("n_checked"),
            F.col("nn_key").alias("n_violations"),
        ),
        base.select(
            F.lit("orderkey_unique").alias("check_name"),
            F.col("n").alias("n_checked"),
            (F.col("n") - F.col("nd_key")).alias("n_violations"),
        ),
        base.select(
            F.lit("orderstatus_accepted_values").alias("check_name"),
            F.col("n").alias("n_checked"),
            F.col("bad_status").alias("n_violations"),
        ),
        base.select(
            F.lit("totalprice_positive").alias("check_name"),
            F.col("n").alias("n_checked"),
            F.col("bad_price").alias("n_violations"),
        ),
    ]
    # referential integrity: the one join-shaped expectation
    fk = (
        o.join(cust, o.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(base.select(F.col("n").alias("n_checked"))))
        .select(
            F.lit("custkey_references_customer").alias("check_name"),
            "n_checked",
            "n_violations",
        )
    )
    audit = reduce(DataFrame.unionByName, legs + [fk])
    return audit.select(
        "check_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def _expectations_sql() -> str:
    accepted = ", ".join(f"'{s}'" for s in _ACCEPTED_STATUS)
    return f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS nn_key,
    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_key,
    CAST(SUM(CASE WHEN o_orderstatus NOT IN ({accepted})
             THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
    CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT)
      AS bad_price
  FROM orders
),
fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_violations
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
audit AS (
  SELECT 'orderkey_not_null' AS check_name, n AS n_checked,
         nn_key AS n_violations FROM base
  UNION ALL
  SELECT 'orderkey_unique', n, n - nd_key FROM base
  UNION ALL
  SELECT 'orderstatus_accepted_values', n, bad_status FROM base
  UNION ALL
  SELECT 'totalprice_positive', n, bad_price FROM base
  UNION ALL
  SELECT 'custkey_references_customer', base.n, fk.n_violations
  FROM base CROSS JOIN fk
)
SELECT check_name, n_checked, n_violations,
  CAST(n_violations = 0 AS INTEGER) AS passed
FROM audit
"""


# ---------------------------------------------------------------------
# SCD2 merge
# ---------------------------------------------------------------------

_SCD_NEW_KEY_OFFSET = 1_000_000
_SCD_BAL_DELTA = 100.0


def _update_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 3).select(
        F.col("c_custkey").alias("b_key"),
        (F.col("c_acctbal") + F.lit(_SCD_BAL_DELTA)).alias("b_acctbal"),
    )
    inserts = cust.filter(F.col("c_custkey") % 10 == 7).select(
        (F.col("c_custkey") + F.lit(_SCD_NEW_KEY_OFFSET)).alias("b_key"),
        F.col("c_acctbal").alias("b_acctbal"),
    )
    return updates.unionByName(inserts)


def scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 merge of the deterministic update batch into the customer
    dimension: one full outer join, three classified legs."""
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("acctbal")
    )
    batch = _update_batch(spark, sf_dir)
    j = dim.join(batch, dim.key == batch.b_key, "full_outer").localCheckpoint()
    unchanged = j.filter(F.col("b_key").isNull()).select(
        "key",
        "acctbal",
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit("unchanged").alias("change_type"),
    )
    closed = j.filter(F.col("key").isNotNull() & F.col("b_key").isNotNull()).select(
        "key",
        "acctbal",
        F.lit(1).alias("valid_from"),
        F.lit(2).alias("valid_to"),
        F.lit("superseded").alias("change_type"),
    )
    opened = j.filter(F.col("key").isNotNull() & F.col("b_key").isNotNull()).select(
        "key",
        F.col("b_acctbal").alias("acctbal"),
        F.lit(2).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit("updated").alias("change_type"),
    )
    inserted = j.filter(F.col("key").isNull()).select(
        F.col("b_key").alias("key"),
        F.col("b_acctbal").alias("acctbal"),
        F.lit(2).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit("inserted").alias("change_type"),
    )
    return reduce(
        DataFrame.unionByName, [unchanged, closed, opened, inserted]
    )


_SCD2_SQL = f"""
WITH batch AS (
  SELECT c_custkey AS b_key, c_acctbal + {_SCD_BAL_DELTA} AS b_acctbal
  FROM customer WHERE c_custkey % 10 = 3
  UNION ALL
  SELECT c_custkey + {_SCD_NEW_KEY_OFFSET}, c_acctbal
  FROM customer WHERE c_custkey % 10 = 7
),
j AS (
  SELECT d.c_custkey AS key, d.c_acctbal AS acctbal, b.b_key, b.b_acctbal
  FROM customer d FULL OUTER JOIN batch b ON d.c_custkey = b.b_key
)
SELECT key, acctbal, 1 AS valid_from, CAST(NULL AS INTEGER) AS valid_to,
       'unchanged' AS change_type
FROM j WHERE b_key IS NULL
UNION ALL
SELECT key, acctbal, 1, 2, 'superseded'
FROM j WHERE key IS NOT NULL AND b_key IS NOT NULL
UNION ALL
SELECT key, b_acctbal, 2, CAST(NULL AS INTEGER), 'updated'
FROM j WHERE key IS NOT NULL AND b_key IS NOT NULL
UNION ALL
SELECT b_key, b_acctbal, 2, CAST(NULL AS INTEGER), 'inserted'
FROM j WHERE key IS NULL
"""


# ---------------------------------------------------------------------
# CDC apply (last-write-wins upsert/delete merge)
# ---------------------------------------------------------------------
#
# The change-data-capture apply every lakehouse runs on a Debezium-style
# change log: per key, the HIGHEST-sequence operation wins; a final
# delete removes the key, anything else upserts its value. Spelled as
# union(base-as-seq-0 ⊎ log) → one partitioned window (row_number by
# seq desc) → filter. The log derives deterministically from customer:
# keys %4==1 get two successive updates (pinning last-write-wins, not
# first), %4==2 a delete, and a +2M-offset insert wave. One keyed
# shuffle for the window; at 100 TB the log is tiny relative to the
# base and the same plan applies per micro-batch.

_CDC_INS_OFFSET = 2_000_000


def _change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    upd1 = cust.filter(F.col("c_custkey") % 4 == 1).select(
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.col("c_custkey").alias("key"),
        (F.col("c_acctbal") + F.lit(10.0)).alias("val"),
    )
    upd2 = cust.filter(F.col("c_custkey") % 4 == 1).select(
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        F.col("c_custkey").alias("key"),
        (F.col("c_acctbal") + F.lit(20.0)).alias("val"),
    )
    dels = cust.filter(F.col("c_custkey") % 4 == 2).select(
        F.lit(1).alias("seq"),
        F.lit("D").alias("op"),
        F.col("c_custkey").alias("key"),
        F.lit(None).cast("double").alias("val"),
    )
    ins = cust.filter(F.col("c_custkey") % 4 == 3).select(
        F.lit(2).alias("seq"),
        F.lit("I").alias("op"),
        (F.col("c_custkey") + F.lit(_CDC_INS_OFFSET)).alias("key"),
        F.col("c_acctbal").alias("val"),
    )
    return reduce(DataFrame.unionByName, [upd1, upd2, dels, ins])


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the deterministic change log over customer with
    last-write-wins semantics; returns the resulting current table."""
    from pyspark.sql import Window

    base = load_table(spark, sf_dir, "customer").select(
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("val"),
    )
    log = _change_log(spark, sf_dir)
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    latest = (
        base.unionByName(log)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return latest.filter(F.col("op") != "D").select(
        "key", "val", F.col("seq").alias("last_seq"), F.col("op").alias("last_op")
    )


_CDC_SQL = f"""
WITH log AS (
  SELECT 1 AS seq, 'U' AS op, c_custkey AS key, c_acctbal + 10.0 AS val
  FROM customer WHERE c_custkey % 4 = 1
  UNION ALL
  SELECT 2, 'U', c_custkey, c_acctbal + 20.0
  FROM customer WHERE c_custkey % 4 = 1
  UNION ALL
  SELECT 1, 'D', c_custkey, CAST(NULL AS DOUBLE)
  FROM customer WHERE c_custkey % 4 = 2
  UNION ALL
  SELECT 2, 'I', c_custkey + {_CDC_INS_OFFSET}, c_acctbal
  FROM customer WHERE c_custkey % 4 = 3
),
allrows AS (
  SELECT 0 AS seq, 'I' AS op, c_custkey AS key, c_acctbal AS val FROM customer
  UNION ALL
  SELECT * FROM log
),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM allrows
)
SELECT key, val, seq AS last_seq, op AS last_op
FROM latest WHERE rn = 1 AND op <> 'D'
"""

# ---------------------------------------------------------------------
# A/B experiment analysis (two-proportion z-score)
# ---------------------------------------------------------------------
#
# The product-analytics staple: deterministic hash assignment of users
# to arms, a conversion predicate, and the pooled two-proportion
# z-statistic. Conversion = "heavy purchaser" (>= _AB_CONV_MIN purchase
# events) — the synthetic feed gives every user ~13 purchases, so a
# >=1 predicate is degenerate (pool=1, se=0); the 14 cut splits the
# population near 50 % at every SF. Counts are exact integers from ONE
# per-user collapse of the event stream; the z is pure IEEE arithmetic
# (one sqrt) over those integers — bit-portable, unlike a p-value
# (erf is libm). The whole query is two aggregations; nothing scales
# beyond the first groupBy.

_AB_CONV_MIN = 14


def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: per-arm user and conversion counts plus the pooled
    two-proportion z-score of arm B vs arm A."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            >= _AB_CONV_MIN
        )
        .cast("int")
        .alias("conv")
    )
    arms = per_user.select(
        (F.col("user_id") % 2).alias("arm"), "conv"
    ).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (1 - pool)
        * (
            1 / F.col("n_a").cast("double")
            + 1 / F.col("n_b").cast("double")
        )
    )
    return arms.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        ((p_b - p_a) / se).alias("z_score"),
    )


_AB_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              >= {_AB_CONV_MIN} AS INTEGER) AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT)
      AS conv_a,
    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT)
      AS conv_b
  FROM per_user
)
SELECT n_a, conv_a, n_b, conv_b,
  (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
   - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
  / sqrt(
      (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      * (1 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE))
    ) AS z_score
FROM arms
"""


# ---------------------------------------------------------------------
# Ops health report (capstone composition)
# ---------------------------------------------------------------------
#
# The one-table pipeline-health dashboard an operator reads first:
# every r8 monitoring/contract signal reduced to one (metric, value)
# row — EWMA spike count, failed expectations, per-format quarantined
# ingest rows, unresolved linkage records, declining event series.
# Pure composition: each leg is ONE aggregate over an already-gated
# (and where applicable memoized) query; the oracle inlines the same
# component SQLs as subqueries, so the report is exactly as trusted as
# its parts.


def ops_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven (metric, value) health rows composed from the gated
    monitoring, contract, ingest, and linkage queries."""
    from trx_spark.queries.dataops import (
        event_trend_robust,
        ewma_anomaly,
    )
    from trx_spark.queries.linkage import record_linkage_pairs
    from trx_spark.sources.textio import (
        csv_ingest_stats,
        jsonl_ingest_stats,
        xml_ingest_stats,
    )

    def leg(metric: str, df: DataFrame, value) -> DataFrame:
        return df.agg(
            F.lit(metric).alias("metric"),
            F.coalesce(value, F.lit(0)).cast("long").alias("value"),
        )

    legs = [
        leg(
            "ewma_anomalies",
            ewma_anomaly(spark, sf_dir),
            F.sum(F.coalesce(F.col("is_anomaly"), F.lit(0))),
        ),
        leg(
            "failed_expectations",
            table_expectations_audit(spark, sf_dir),
            F.sum(1 - F.col("passed")),
        ),
        leg(
            "corrupt_jsonl_rows",
            jsonl_ingest_stats(spark, sf_dir),
            F.sum("n_corrupt"),
        ),
        leg(
            "corrupt_csv_rows",
            csv_ingest_stats(spark, sf_dir),
            F.sum("n_corrupt"),
        ),
        leg(
            "corrupt_xml_rows",
            xml_ingest_stats(spark, sf_dir),
            F.sum("n_corrupt"),
        ),
        leg(
            "linkage_unmatched",
            record_linkage_pairs(spark, sf_dir),
            F.sum(F.col("matched_key").isNull().cast("long")),
        ),
        leg(
            "declining_series",
            event_trend_robust(spark, sf_dir),
            F.sum((F.col("trend_slope") < 0).cast("long")),
        ),
    ]
    return reduce(DataFrame.unionByName, legs)


def _health_sql() -> str:
    from trx_spark.queries.dataops import _TREND_SQL, _ewma_sql
    from trx_spark.queries.linkage import _LINKAGE_SQL
    from trx_spark.sources.textio import _INGEST_SQL

    def scalar(inner: str, value_expr: str) -> str:
        return (
            f"(SELECT COALESCE(CAST({value_expr} AS BIGINT), 0)"
            f" FROM ({inner}))"
        )

    legs = [
        ("ewma_anomalies", scalar(_ewma_sql(), "SUM(COALESCE(is_anomaly, 0))")),
        (
            "failed_expectations",
            scalar(_expectations_sql(), "SUM(1 - passed)"),
        ),
        ("corrupt_jsonl_rows", scalar(_INGEST_SQL, "SUM(n_corrupt)")),
        ("corrupt_csv_rows", scalar(_INGEST_SQL, "SUM(n_corrupt)")),
        ("corrupt_xml_rows", scalar(_INGEST_SQL, "SUM(n_corrupt)")),
        (
            "linkage_unmatched",
            scalar(
                _LINKAGE_SQL,
                "SUM(CASE WHEN matched_key IS NULL THEN 1 ELSE 0 END)",
            ),
        ),
        (
            "declining_series",
            scalar(
                _TREND_SQL,
                "SUM(CASE WHEN trend_slope < 0 THEN 1 ELSE 0 END)",
            ),
        ),
    ]
    return " UNION ALL ".join(
        f"SELECT '{m}' AS metric, {s} AS value" for m, s in legs
    )


# ---------------------------------------------------------------------
# CUPED variance-reduced A/B readout
# ---------------------------------------------------------------------
#
# CUPED (Deng et al. 2013, public): adjust each unit's experiment
# metric by its PRE-period covariate — adj = post − θ·(pre − mean(pre))
# with θ = cov(pre, post)/var(pre) — which removes the between-user
# variance the randomization already balanced. Everything here is
# exact: the per-user pre/post metrics are INTEGER unit sums
# (floor(value) — units, not cents, so Σx² stays far inside int64 at
# 100× SF), θ and the adjusted means are IEEE arithmetic over those
# exact integers with identical expression trees on both engines.
# Arms are the same deterministic user_id % 2 as ab_test_zscore.

_CUPED_CUTOFF = "2024-01-15"  # pre-period strictly before; post on/after


def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: per-arm unit counts and exact pre/post sums, the CUPED
    θ, and the adjusted per-arm means + adjusted difference."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    is_pre = F.col("ts") < F.lit(_CUPED_CUTOFF)
    unit = F.floor(F.col("value")).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(is_pre, unit).otherwise(F.lit(0))).alias("pre"),
        F.sum(F.when(~is_pre, unit).otherwise(F.lit(0))).alias("post"),
    )
    d = F.col  # shorthand
    stats = per_user.select((d("user_id") % 2).alias("arm"), "pre", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").alias("s_pre"),
        F.sum("post").alias("s_post"),
        F.sum(d("pre") * d("pre")).alias("s_pre2"),
        F.sum(d("pre") * d("post")).alias("s_prepost"),
        F.sum(F.when(d("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(d("arm") == 0, d("pre")).otherwise(0)).alias("pre_a"),
        F.sum(F.when(d("arm") == 0, d("post")).otherwise(0)).alias("post_a"),
        F.sum(F.when(d("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(d("arm") == 1, d("pre")).otherwise(0)).alias("pre_b"),
        F.sum(F.when(d("arm") == 1, d("post")).otherwise(0)).alias("post_b"),
    )
    nd = d("n").cast("double")
    theta = (
        nd * d("s_prepost").cast("double")
        - d("s_pre").cast("double") * d("s_post").cast("double")
    ) / (
        nd * d("s_pre2").cast("double")
        - d("s_pre").cast("double") * d("s_pre").cast("double")
    )
    pre_mean = d("s_pre").cast("double") / nd

    def adj(post_s, pre_s, n_s):
        nn = d(n_s).cast("double")
        return d(post_s).cast("double") / nn - d("theta") * (
            d(pre_s).cast("double") / nn - d("pre_mean")
        )

    return (
        stats.withColumn("theta", theta)
        .withColumn("pre_mean", pre_mean)
        .select(
            "n_a",
            "n_b",
            d("pre_a").cast("long").alias("pre_a"),
            d("post_a").cast("long").alias("post_a"),
            d("pre_b").cast("long").alias("pre_b"),
            d("post_b").cast("long").alias("post_b"),
            "theta",
            adj("post_a", "pre_a", "n_a").alias("adj_mean_a"),
            adj("post_b", "pre_b", "n_b").alias("adj_mean_b"),
            (
                adj("post_b", "pre_b", "n_b") - adj("post_a", "pre_a", "n_a")
            ).alias("adj_diff"),
        )
    )


_CUPED_SQL = f"""
WITH per_user AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOFF}'
             THEN CAST(FLOOR(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS pre,
    CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOFF}'
             THEN 0 ELSE CAST(FLOOR(value) AS BIGINT) END) AS BIGINT) AS post
  FROM events GROUP BY user_id
),
stats AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(pre) AS BIGINT) AS s_pre,
    CAST(SUM(post) AS BIGINT) AS s_post,
    CAST(SUM(pre * pre) AS BIGINT) AS s_pre2,
    CAST(SUM(pre * post) AS BIGINT) AS s_prepost,
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN pre ELSE 0 END) AS BIGINT) AS pre_a,
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN post ELSE 0 END) AS BIGINT) AS post_a,
    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN pre ELSE 0 END) AS BIGINT) AS pre_b,
    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN post ELSE 0 END) AS BIGINT) AS post_b
  FROM per_user
),
withtheta AS (
  SELECT *,
    (CAST(n AS DOUBLE) * CAST(s_prepost AS DOUBLE)
       - CAST(s_pre AS DOUBLE) * CAST(s_post AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(s_pre2 AS DOUBLE)
       - CAST(s_pre AS DOUBLE) * CAST(s_pre AS DOUBLE)) AS theta,
    CAST(s_pre AS DOUBLE) / CAST(n AS DOUBLE) AS pre_mean
  FROM stats
)
SELECT n_a, n_b, pre_a, post_a, pre_b, post_b, theta,
  CAST(post_a AS DOUBLE) / CAST(n_a AS DOUBLE)
    - theta * (CAST(pre_a AS DOUBLE) / CAST(n_a AS DOUBLE) - pre_mean)
    AS adj_mean_a,
  CAST(post_b AS DOUBLE) / CAST(n_b AS DOUBLE)
    - theta * (CAST(pre_b AS DOUBLE) / CAST(n_b AS DOUBLE) - pre_mean)
    AS adj_mean_b,
  (CAST(post_b AS DOUBLE) / CAST(n_b AS DOUBLE)
    - theta * (CAST(pre_b AS DOUBLE) / CAST(n_b AS DOUBLE) - pre_mean))
  - (CAST(post_a AS DOUBLE) / CAST(n_a AS DOUBLE)
    - theta * (CAST(pre_a AS DOUBLE) / CAST(n_a AS DOUBLE) - pre_mean))
    AS adj_diff
FROM withtheta
"""

QUERIES = {
    "table_expectations_audit": table_expectations_audit,
    "scd2_customer_versions": scd2_customer_versions,
    "cdc_apply_changes": cdc_apply_changes,
    "ab_test_zscore": ab_test_zscore,
    "cuped_adjusted_ab": cuped_adjusted_ab,
    "ops_health_report": ops_health_report,
}

ORACLES = {
    "table_expectations_audit": _expectations_sql(),
    "scd2_customer_versions": _SCD2_SQL,
    "cdc_apply_changes": _CDC_SQL,
    "ab_test_zscore": _AB_SQL,
    "cuped_adjusted_ab": _CUPED_SQL,
    "ops_health_report": _health_sql(),
}
