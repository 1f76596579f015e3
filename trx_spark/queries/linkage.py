"""Entity resolution (record linkage) as blocking + verification —
the customer-dedup shape every data platform runs when two systems'
rosters must be reconciled without a shared key.

The pipeline shape is the industry-standard two-stage plan (Febrl /
Magellan lineage, public knowledge):

1. **Candidate generation by blocking**: an equi-join on a cheap
   blocking key — never an all-pairs comparison. Quadratic work is
   confined to within-block pairs, and block sizes are what you audit.
2. **Verification**: exact edit distance on the candidates only.
   ``levenshtein`` is JVM-side in Spark and built into DuckDB with
   identical integer semantics, so the gate hashes it bit-for-bit.

The "dirty" side is derived deterministically from ``customer`` (one
character substituted inside the zero-pad region, position keyed by
custkey) so both engines construct the identical roster without a
staged fixture. The blocking key is the last four characters — stable
under the corruption by construction here; real multi-pass blocking
unions several such keys (prefix/suffix/q-gram) so every corruption
class keeps at least one key intact, and the plan below is unchanged
per pass.

Scale notes: both sides shuffle once on the block key; within-block
fan-out is the audited quantity (reported as ``n_candidates``);
verification cost is candidate count, never roster². At 100 TB the
same plan holds — blocking keys are chosen for bounded block sizes,
exactly like the LSH band caps elsewhere in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.tables import load_table

_MAX_DIST = 1


def _dirty_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reconciliation counterpart: custkey-keyed single-character
    substitution at position 10 + custkey % 5 (inside the zero pad)."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = F.concat(
        F.expr("substring(c_name, 1, 10 + cast(c_custkey % 5 as int) - 1)"),
        F.lit("x"),
        F.expr("substring(c_name, 10 + cast(c_custkey % 5 as int) + 1)"),
    )
    return cust.select(
        F.col("c_custkey").alias("d_key"), dirty.alias("d_name")
    )


def record_linkage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link the dirty roster back to ``customer``: block on the stable
    last-4 key, verify by Levenshtein <= 1, resolve each dirty record
    to its minimum-key verified match, and report the block fan-out."""
    clean = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("c_key"),
        "c_name",
        F.substring(F.col("c_name"), -4, 4).alias("bk"),
    )
    dirty = _dirty_customers(spark, sf_dir).withColumn(
        "bk", F.substring(F.col("d_name"), -4, 4)
    )
    cand = dirty.join(clean, "bk")
    verified = cand.withColumn(
        "dist", F.levenshtein(F.col("d_name"), F.col("c_name"))
    )
    return (
        verified.groupBy("d_key")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum((F.col("dist") <= _MAX_DIST).cast("long")).alias(
                "n_verified"
            ),
            F.min(
                F.when(F.col("dist") <= _MAX_DIST, F.col("c_key"))
            ).alias("matched_key"),
            F.min(
                F.when(F.col("dist") <= _MAX_DIST, F.col("dist"))
            ).alias("match_dist"),
        )
    )


_LINKAGE_SQL = f"""
WITH dirty AS (
  SELECT c_custkey AS d_key,
    substring(c_name, 1, 10 + CAST(c_custkey % 5 AS INTEGER) - 1)
      || 'x'
      || substring(c_name, 10 + CAST(c_custkey % 5 AS INTEGER) + 1)
      AS d_name
  FROM customer
),
clean AS (
  SELECT c_custkey AS c_key, c_name, right(c_name, 4) AS bk FROM customer
),
cand AS (
  SELECT d.d_key, d.d_name, c.c_key, c.c_name
  FROM (SELECT *, right(d_name, 4) AS bk FROM dirty) d
  JOIN clean c USING (bk)
),
verified AS (
  SELECT d_key, c_key, levenshtein(d_name, c_name) AS dist FROM cand
)
SELECT d_key,
  CAST(COUNT(*) AS BIGINT) AS n_candidates,
  CAST(SUM(CASE WHEN dist <= {_MAX_DIST} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_verified,
  CAST(MIN(CASE WHEN dist <= {_MAX_DIST} THEN c_key END) AS BIGINT)
    AS matched_key,
  CAST(MIN(CASE WHEN dist <= {_MAX_DIST} THEN dist END) AS INTEGER)
    AS match_dist
FROM verified
GROUP BY d_key
"""


QUERIES = {"record_linkage_pairs": record_linkage_pairs}
ORACLES = {"record_linkage_pairs": _LINKAGE_SQL}
