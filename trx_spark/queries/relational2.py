"""TPC-H-shaped relational queries, second wave: the join/agg shapes
the first wave (queries/relational.py) does not exercise — a
twice-aliased dimension join (Q7 volume shipping), a ratio-of-sums
market share (Q8), a conditional-share rollup (Q14 promo revenue), and
a correlated-argmin join-back (Q2's min-cost-supplier shape).

Scale design notes (local[32] tests correctness; plans target a
1000-executor cluster):

- ``volume_shipping``: nation joins twice under two aliases — both are
  FIXED 25-row dims, so both carry explicit broadcast hints; the
  customer/supplier joins scale with data and carry none (AQE
  broadcasts them at test scale, shuffles at 100 TB). The nation-pair
  filter applies to the broadcast dims' output, so Catalyst pushes it
  into the join; the only corpus-scale shuffles are the
  lineitem⋈orders equi-join and the final 3-key groupBy.
- ``national_market_share`` / ``promo_revenue_share``: the share is a
  division of two fixed-point BIGINT sums computed in the SAME
  aggregate pass (a conditional dsum next to the unconditional one) —
  never two scans, never a self-join of the aggregate against itself.
- ``cheapest_supplier_per_part``: the Q2 correlated subquery
  re-expressed as agg + join-back: one groupBy(partkey) computes the
  min unit price, an equi-join on (partkey, unit=min) recovers the
  achieving rows, and a second tiny agg breaks ties deterministically
  (min suppkey). Both shuffles are on partkey, so AQE coalesces them
  onto one exchange; no window over the full lineitem table, no
  cross join. The unit price is one IEEE double division with an
  identical expression tree in both engines — exact, like the min
  over it.

Money columns use the repo-wide fixed-point contract
(:mod:`trx_spark.exact`): sums are exact BIGINTs at 1e6 scale, ratios
are one double division of two such BIGINTs — bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.exact import dsum, sql_dsum
from trx_spark.tables import load_table

_NATION_A = "NATION_1"
_NATION_B = "NATION_2"
_SHARE_REGION = "ASIA"
_SHARE_NATION = "NATION_3"

# ---------------------------------------------------------------------
# Q7: volume shipping between two nations by ship year
# ---------------------------------------------------------------------


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flowing between two nations (supplier side vs customer
    side, both directions) per ship year — TPC-H Q7's shape."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == _NATION_A) & (F.col("cust_nation") == _NATION_B)
    ) | ((F.col("supp_nation") == _NATION_B) & (F.col("cust_nation") == _NATION_A))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("s_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


_VOLUME_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
  {sql_dsum('volume')} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE (n2.n_name = '{_NATION_A}' AND n1.n_name = '{_NATION_B}')
     OR (n2.n_name = '{_NATION_B}' AND n1.n_name = '{_NATION_A}')
)
GROUP BY supp_nation, cust_nation, l_year
"""

# ---------------------------------------------------------------------
# Q8: national market share within a region by ship year
# ---------------------------------------------------------------------


def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ship year: the share of one region's revenue supplied by one
    nation — TPC-H Q8's ratio, as one conditional dsum over the same
    aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == _SHARE_NATION, rev).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_c), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(n_s), supp.s_nationkey == F.col("sn_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == _SHARE_REGION)),
            F.col("cr_key") == F.col("r_regionkey"),
        )
        .groupBy(F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            dsum(nat_rev).alias("nation_rev_fp"),
            dsum(rev).alias("total_rev_fp"),
        )
        .select(
            "l_year",
            "nation_rev_fp",
            "total_rev_fp",
            (
                F.col("nation_rev_fp").cast("double")
                / F.col("total_rev_fp").cast("double")
            ).alias("mkt_share"),
        )
    )


_SHARE_SQL = f"""
WITH base AS (
  SELECT year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume,
         CASE WHEN n2.n_name = '{_SHARE_NATION}'
              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS nat_volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE r_name = '{_SHARE_REGION}'
)
SELECT l_year,
  {sql_dsum('nat_volume')} AS nation_rev_fp,
  {sql_dsum('volume')} AS total_rev_fp,
  CAST({sql_dsum('nat_volume')} AS DOUBLE)
    / CAST({sql_dsum('volume')} AS DOUBLE) AS mkt_share
FROM base GROUP BY l_year
"""

# ---------------------------------------------------------------------
# Q14: promo revenue share by ship year
# ---------------------------------------------------------------------


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ship year: revenue share of PROMO-type parts — TPC-H Q14
    rolled up by year instead of one month."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            dsum(promo).alias("promo_rev_fp"),
            dsum(rev).alias("total_rev_fp"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "l_year",
            "promo_rev_fp",
            "total_rev_fp",
            "n_lines",
            (
                F.col("promo_rev_fp").cast("double")
                / F.col("total_rev_fp").cast("double")
            ).alias("promo_share"),
        )
    )


_PROMO_SQL = f"""
SELECT year(l_shipdate) AS l_year,
  {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    AS promo_rev_fp,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_rev_fp,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST({sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS DOUBLE)
    / CAST({sql_dsum('l_extendedprice * (1 - l_discount)')} AS DOUBLE)
    AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY year(l_shipdate)
"""

# ---------------------------------------------------------------------
# Q2 shape: cheapest supplier per part (correlated argmin)
# ---------------------------------------------------------------------


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part: the minimum observed unit price across lineitems and
    the supplier achieving it (min suppkey among ties) — the Q2
    correlated-subquery shape as agg + join-back."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    mins = li.groupBy("l_partkey").agg(
        F.min("unit_price").alias("min_unit_price")
    ).withColumnRenamed("l_partkey", "m_partkey")
    best = (
        li.join(
            mins,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("unit_price") == F.col("min_unit_price")),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"), "min_unit_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return best.join(supp, best.best_suppkey == supp.s_suppkey).select(
        "p_partkey", "min_unit_price", "best_suppkey", "s_name"
    )


_CHEAPEST_SQL = """
WITH unit AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
),
mins AS (
  SELECT l_partkey, MIN(unit_price) AS min_unit_price FROM unit GROUP BY l_partkey
),
best AS (
  SELECT unit.l_partkey AS p_partkey, min_unit_price,
         MIN(l_suppkey) AS best_suppkey
  FROM unit JOIN mins
    ON unit.l_partkey = mins.l_partkey AND unit.unit_price = mins.min_unit_price
  GROUP BY unit.l_partkey, min_unit_price
)
SELECT p_partkey, min_unit_price, best_suppkey, s_name
FROM best JOIN supplier ON best_suppkey = s_suppkey
"""


QUERIES = {
    "volume_shipping": volume_shipping,
    "national_market_share": national_market_share,
    "promo_revenue_share": promo_revenue_share,
    "cheapest_supplier_per_part": cheapest_supplier_per_part,
}

ORACLES = {
    "volume_shipping": _VOLUME_SQL,
    "national_market_share": _SHARE_SQL,
    "promo_revenue_share": _PROMO_SQL,
    "cheapest_supplier_per_part": _CHEAPEST_SQL,
}
