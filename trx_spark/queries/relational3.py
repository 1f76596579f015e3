"""TPC-H-shaped relational queries, third wave: the remaining classic
shapes not yet exercised — an EXISTS-driven priority census (Q4), a
conditional-count pivot on a line attribute (Q12), a left-outer
histogram-of-counts (Q13), and a scalar-subquery + anti-join screen
(Q22). Columns the synthetic schema lacks (l_commitdate, l_shipmode,
c_phone) are substituted with equivalents that keep the plan shape
(documented per query).

Scale design notes (local[32] tests correctness; plans target a
1000-executor cluster):

- ``order_priority_check``: the EXISTS is a LEFT SEMI equi-join on
  orderkey — the late-line predicate is pushed below the join, so the
  semi-join's build side is only the late lines, and the orderdate
  window prunes the probe side at the scan. No DISTINCT, no COUNT
  over a joined fan-out.
- ``linestatus_priority``: one scan of each table, one equi-join, and
  the high/low split is a conditional SUM in the SAME aggregate pass —
  never two scans or a pivot shuffle.
- ``customer_order_distribution``: the Q13 double-aggregate. The first
  groupBy(custkey) runs on the orders side BEFORE the join, so the
  left-outer join against customer is agg-sized (one row per customer
  with orders), and COALESCE supplies the zero bucket. The second
  groupBy is over ≤ max-order-count distinct keys — tiny.
- ``sales_opportunity_by_nation``: Q22's scalar average is ONE 1-row
  broadcast cross join (the repo's audited scalar pattern), the
  "no orders" screen is a LEFT ANTI equi-join, and the nation name
  arrives via a broadcast of the fixed 25-row dim.

Money sums use the fixed-point contract (:mod:`trx_spark.exact`); the
Q22 threshold is a single double division compared with identical
expression trees on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.exact import dsum, sql_dsum
from trx_spark.tables import load_table

# Q4 window: one quarter of order dates; a line is "late" when it ships
# more than _LATE_DAYS after the order date (the schema has no
# l_commitdate/l_receiptdate — shipdate lag keeps the EXISTS shape).
_Q4_LO, _Q4_HI = "1995-01-01", "1995-04-01"
_LATE_DAYS = 75

_HIGH_PRio = ("1-URGENT", "2-HIGH")


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders in one
    quarter have at least one late line (EXISTS → left-semi join)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO))
        & (F.col("o_orderdate") < F.lit(_Q4_HI))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q4_SQL = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q4_LO}'
  AND o_orderdate < TIMESTAMP '{_Q4_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
"""


def linestatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line status (standing in for l_shipmode),
    how many 1995-shipped lines belong to high- vs low-priority orders
    — both counts in one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(*_HIGH_PRio)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, F.lit(1)).otherwise(F.lit(0))).alias(
                "high_line_count"
            ),
            F.sum(F.when(high, F.lit(0)).otherwise(F.lit(1))).alias(
                "low_line_count"
            ),
        )
    )


_Q12_SQL = f"""
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_linestatus
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the histogram of per-customer open-order
    counts, zero bucket included (aggregate-before-join + left outer +
    COALESCE + second aggregate)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT COALESCE(o.c_count, 0) AS c_count
  FROM customer
  LEFT JOIN (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c_count
    FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_custkey
  ) o ON c_custkey = o.o_custkey
)
GROUP BY c_count
"""


def sales_opportunity_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per nation, count and total balance of
    above-average-balance customers who have never ordered (scalar
    subquery → 1-row broadcast; NOT EXISTS → left-anti join). The
    schema has no c_phone, so the country grouping is the real nation
    dim instead of phone-prefix country codes."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("nk"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


_Q22_SQL = f"""
WITH avg_bal AS (
  SELECT {sql_dsum('c_acctbal')} / CAST(COUNT(*) AS BIGINT) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name,
  CAST(COUNT(*) AS BIGINT) AS numcust,
  {sql_dsum('c_acctbal')} AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg_bal FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""

_Q10_LO, _Q10_HI = "1995-01-01", "1995-07-01"
_Q10_K = 20


def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the top customers by revenue lost to returned
    lineitems in a half-year window — join through orders to customer,
    broadcast nation name, TakeOrderedAndProject top-k (per-partition
    top-k, never a global sort). Ordering key is the exact fixed-point
    revenue (bit-identical across engines); ties break on custkey."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO))
        & (F.col("o_orderdate") < F.lit(_Q10_HI))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("nk"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(_Q10_K)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{_Q10_LO}'
  AND o_orderdate < TIMESTAMP '{_Q10_HI}'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT {_Q10_K}
"""

_Q17_BRANDS = ("Brand#1", "Brand#2", "Brand#3")
_Q17_FRAC = 0.2


def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per brand, revenue and line count of lineitems
    whose quantity is below ``0.2 × avg quantity for that part`` — the
    correlated scalar subquery re-expressed as an aggregate + join-back
    on partkey. The per-part average is one exact-sum/count division
    and the 0.2× threshold one IEEE multiply — identical expression
    trees on both engines, so the < comparison is bit-portable."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*_Q17_BRANDS)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.lit(_Q17_FRAC) * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q17_SQL = f"""
WITH per_part AS (
  SELECT l_partkey AS pk,
    {sql_dsum('l_quantity')} / CAST(COUNT(*) AS BIGINT) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
  {sql_dsum('l_extendedprice')} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand IN {_Q17_BRANDS!r}
  AND l_quantity < CAST({_Q17_FRAC} AS DOUBLE) * avg_qty
GROUP BY p_brand
"""

def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue of discounts in a band —
    ONE scan, every predicate pushed to parquet (`PushedFilters` shows
    all three), one 1-row aggregate. The canonical
    scan-efficiency probe: no join, no window, nothing to shuffle but
    the partial sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q6_SQL = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
"""

_Q21_K = 10


def suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier in a
    multi-supplier order.  The double-correlated EXISTS / NOT EXISTS is
    algebraically a pair of per-order COUNTS: a late (order, supplier)
    row survives iff the order has ≥ 2 distinct participating suppliers
    (EXISTS another participant) and exactly 1 distinct late supplier
    (NOT EXISTS another late one) — in which case that sole supplier is
    min(l_suppkey) over the order's late rows.  So two partial-
    aggregatable countDistincts replace the former distinct + left-semi
    + left-anti chain (guide §2.4): both aggregates hash-partition by
    l_orderkey, the sole⋈n_supp join reuses that partitioning with no
    further Exchange, and the non-equi (suppkey != suppkey) join
    conditions disappear entirely.  Same (order, supplier) multiset —
    the DuckDB oracle keeps the original EXISTS form.  "Late" is the
    Q4 shipdate-lag predicate (the schema has no commit/receipt
    dates).  Top-k suppliers by blocked-order count, tie-broken on
    name."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    sole_late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_late"),
            F.min("l_suppkey").alias("sk"),
        )
        .filter(F.col("n_late") == 1)
    )
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") >= 2)
    )
    blocked = sole_late.join(multi_supp, "l_orderkey", "left_semi")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blocked.join(supp, F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(_Q21_K)
    )


_Q21_SQL = f"""
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
),
participants AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM participants p
    WHERE p.l_orderkey = l1.l_orderkey AND p.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {_Q21_K}
"""

def disjunctive_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides (brand × size-band × quantity-band). The part-side
    conjuncts reach the part scan and the common quantity bound reaches
    the lineitem scan (Catalyst factors the disjunction's common
    terms); the join is a plain partkey equi-join with the residual
    disjunction evaluated post-join. One row out."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    pred = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1.0, 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20.0, 30.0)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(pred).agg(
        dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


_Q19_SQL = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1.0 AND 11.0)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10.0 AND 20.0)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20.0 AND 30.0)
"""


def parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, size),
    excluding "complained-about" suppliers (negative account balance —
    the schema has no comment column) via a left-anti join BEFORE the
    distinct count, and excluding one brand at the part scan. The
    count-distinct funnels through the (brand, size, suppkey) distinct
    — partial-aggregatable — never a global set."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#5"
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_size,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p_brand, p_size
"""

_Q9_COST_FRAC = 0.8  # synthetic supply cost: 0.8 × retail price


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per ship year over
    the 4-way lineitem⋈part⋈supplier⋈nation join. The schema has no
    partsupp, so supply cost is the deterministic 0.8 × p_retailprice
    (one IEEE multiply — identical trees). Profit folds to fixed-point
    BIGINTs in the same aggregate pass; nation is the explicit 25-row
    broadcast; the only corpus-scale shuffles are the two fact
    equi-joins and the final 2-key groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("a")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        _Q9_COST_FRAC
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("nk"))
        .groupBy(
            "n_name", F.year("l_shipdate").cast("long").alias("o_year")
        )
        .agg(dsum(profit).alias("sum_profit"), F.count(F.lit(1)).alias("n_lines"))
    )


_Q9_SQL = f"""
SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
  {sql_dsum(f'l_extendedprice * (1 - l_discount) - {_Q9_COST_FRAC} * p_retailprice * l_quantity')}
    AS sum_profit,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, year(l_shipdate)
"""

_Q18_MIN_QTY = 150.0


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold (the HAVING-filtered IN-subquery), joined back to the
    customer. The big-order set is an aggregate (partial-combined on
    orderkey) filtered BEFORE any join, so the customer join input is
    threshold-sized, not corpus-sized."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "total_qty", "o_totalprice"
        )
    )


_Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, total_qty, o_totalprice
FROM (
  SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  ) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > {_Q18_MIN_QTY}
"""

QUERIES = {
    "order_priority_check": order_priority_check,
    "linestatus_priority": linestatus_priority,
    "customer_order_distribution": customer_order_distribution,
    "sales_opportunity_by_nation": sales_opportunity_by_nation,
    "returned_item_revenue": returned_item_revenue,
    "small_qty_order_revenue": small_qty_order_revenue,
    "forecast_revenue_change": forecast_revenue_change,
    "suppliers_kept_waiting": suppliers_kept_waiting,
    "disjunctive_discount_revenue": disjunctive_discount_revenue,
    "parts_supplier_relationship": parts_supplier_relationship,
    "product_type_profit": product_type_profit,
    "large_volume_customers": large_volume_customers,
}

ORACLES = {
    "order_priority_check": _Q4_SQL,
    "linestatus_priority": _Q12_SQL,
    "customer_order_distribution": _Q13_SQL,
    "sales_opportunity_by_nation": _Q22_SQL,
    "returned_item_revenue": _Q10_SQL,
    "small_qty_order_revenue": _Q17_SQL,
    "forecast_revenue_change": _Q6_SQL,
    "suppliers_kept_waiting": _Q21_SQL,
    "disjunctive_discount_revenue": _Q19_SQL,
    "parts_supplier_relationship": _Q16_SQL,
    "product_type_profit": _Q9_SQL,
    "large_volume_customers": _Q18_SQL,
}
