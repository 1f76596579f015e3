"""URL canonicalization dedup — the very first pass of every web-scale
corpus pipeline (CommonCrawl/C4/RefinedWeb all dedup by canonical URL
before touching content): normalize scheme / ``www.`` / host case /
tracking query / trailing slash, then keep one document per canonical
URL.

The testdata carries no URL column, so raw URLs are synthesized
deterministically from (doc_id) — the same pattern ``pii_scrub`` uses
for spans — with every variant class represented: http vs https,
``www.`` or not, mixed-case host, ``?utm_...`` tracking suffix,
trailing slash. Documents with ``doc_id DIV 3`` equal share a
canonical URL, so the dedup decision is non-trivial and
oracle-checkable.

Scale design: the normalization is a pure per-row regexp chain
(JVM-side, whole-stage codegen — one scan, zero shuffles); the keep
decision is one window over the canonical-URL key, whose partition
size is the duplication multiplicity (bounded by crawl redundancy,
never corpus-sized). All string ops are ASCII regexp classes that
Java util.regex and DuckDB RE2 evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.tables import fan_out_small_scan, load_table

# anchored patterns — at most one match, so Spark's replace-all and
# DuckDB's replace-first semantics coincide
_SCHEME_RE = "^https?://"
_WWW_RE = "^www\\."
_QUERY_RE = "\\?.*$"
_SLASH_RE = "/$"


def _raw_url_col() -> F.Column:
    """Deterministic raw URL per doc: group gid = doc_id DIV 3 picks
    the underlying page; doc_id's residues pick the surface variants."""
    gid = F.col("doc_id") - F.col("doc_id") % 3  # DIV 3 * 3: stable group id
    host = F.concat(
        F.lit("site"), ((gid / 3).cast("long") % 40).cast("string"), F.lit(".example.org")
    )
    host = F.when(F.col("doc_id") % 5 == 0, F.upper(host)).otherwise(host)
    return F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("http://")).otherwise(F.lit("https://")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        host,
        F.lit("/p/"),
        (gid / 3).cast("long").cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("?utm_source=feed&ref="), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )


def url_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical URL, host, duplicate-group size, and the keep verdict
    (lowest doc_id per canonical URL survives) for every document."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    canon = F.lower(F.col("raw_url"))
    for pat in (_SCHEME_RE, _WWW_RE, _QUERY_RE, _SLASH_RE):
        canon = F.regexp_replace(canon, pat, "")
    base = docs.select("doc_id", _raw_url_col().alias("raw_url")).withColumn(
        "canon_url", canon
    )
    w = Window.partitionBy("canon_url")
    return base.select(
        "doc_id",
        "raw_url",
        "canon_url",
        F.regexp_extract("canon_url", "^[^/]+", 0).alias("host"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_dups"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


_URL_SQL = f"""
WITH raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END)
    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
             THEN upper('site' || CAST((doc_id - doc_id % 3) // 3 % 40 AS VARCHAR)
                        || '.example.org')
             ELSE 'site' || CAST((doc_id - doc_id % 3) // 3 % 40 AS VARCHAR)
                  || '.example.org' END)
    || '/p/' || CAST((doc_id - doc_id % 3) // 3 AS VARCHAR)
    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0
             THEN '?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR) ELSE '' END)
    AS raw_url
  FROM documents
),
c AS (
  SELECT doc_id, raw_url,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      lower(raw_url), '{_SCHEME_RE}', ''), '{_WWW_RE}', ''),
      '{_QUERY_RE}', ''), '{_SLASH_RE}', '') AS canon_url
  FROM raw
)
SELECT doc_id, raw_url, canon_url,
  regexp_extract(canon_url, '^[^/]+') AS host,
  CAST(COUNT(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_dups,
  doc_id = MIN(doc_id) OVER (PARTITION BY canon_url) AS keep
FROM c
"""

QUERIES = {"url_dedup_keep": url_dedup_keep}
ORACLES = {"url_dedup_keep": _URL_SQL}
