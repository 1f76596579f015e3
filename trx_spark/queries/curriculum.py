"""Training-order construction: quality-curriculum phase assignment and
weighted (priority) sampling — the stage between corpus curation and
the packed training shards, where a pipeline decides WHAT ORDER and
WITH WHAT PROBABILITY the surviving documents are seen.

Both operators follow the engine's global-statistics discipline
(PLANS invariant 7): corpus-level thresholds are exact-percentile
AGGREGATES whose 1-row result is broadcast back — never a global sort
or a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.queries.curation import _toks_base
from trx_spark.queries.textdata import _P, _TOKEN_RE
from trx_spark.tables import load_table

# ---------------------------------------------------------------------
# Quality-curriculum phases
# ---------------------------------------------------------------------

_CURR_N_SHARDS = 8
_CURR_A, _CURR_B = 1229, 48611  # shard-assignment affine hash
_CURR_CUTS = (0.33, 0.66)


def curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum assignment: split the corpus into three
    phases by a monotone quality proxy (lexical diversity × mean word
    length — rational arithmetic only, so the gate checks it exactly)
    and hash-shard within each phase. A curriculum/annealing schedule
    then trains phase 0 → 1 → 2 (lowest quality first, highest-quality
    data last — the standard annealing order).

    Plan: the score is a zero-shuffle scan projection; the two phase
    cuts are ONE exact-percentile aggregate broadcast back (two-pass
    global statistic, invariant 7); shard assignment is a pure hash —
    the whole query carries no corpus-sized shuffle at all.

    Output: (doc_id, quality_score, phase, shard)."""
    # rides the memoized tokenized base (curation._toks_base) — the
    # regex tokenization runs once per session, shared with the
    # shingle/bigram/token streams and bm25/hll
    docs = _toks_base(spark, sf_dir)
    toks = F.col("toks")
    n = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    tc = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    ).cast("long")
    score = (nd.cast("double") / n.cast("double")) * (
        tc.cast("double") / n.cast("double")
    )
    scored = docs.select("doc_id", n.alias("n"), score.alias("quality_score")).filter(
        F.col("n") > 0
    )
    cuts = scored.agg(
        F.expr(f"percentile(quality_score, {_CURR_CUTS[0]!r})").alias("c1"),
        F.expr(f"percentile(quality_score, {_CURR_CUTS[1]!r})").alias("c2"),
    )
    phase = (
        F.when(F.col("quality_score") <= F.col("c1"), 0)
        .when(F.col("quality_score") <= F.col("c2"), 1)
        .otherwise(2)
        .cast("int")
    )
    shard = (
        ((F.lit(_CURR_A) * F.col("doc_id") + F.lit(_CURR_B)) % F.lit(_P))
        % F.lit(_CURR_N_SHARDS)
    ).cast("int")
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "quality_score",
            phase.alias("phase"),
            shard.alias("shard"),
        )
    )


_CURR_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n,
         CAST(len(list_distinct(toks)) AS BIGINT) AS nd,
         CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS tc
  FROM (SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE}') AS toks FROM documents) t
),
scored AS (
  SELECT doc_id, n,
         (CAST(nd AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(tc AS DOUBLE) / CAST(n AS DOUBLE)) AS quality_score
  FROM m WHERE n > 0
),
cuts AS (
  SELECT quantile_cont(quality_score, CAST({_CURR_CUTS[0]!r} AS DOUBLE)) AS c1,
         quantile_cont(quality_score, CAST({_CURR_CUTS[1]!r} AS DOUBLE)) AS c2
  FROM scored
)
SELECT doc_id, quality_score,
       CAST(CASE WHEN quality_score <= c1 THEN 0
                 WHEN quality_score <= c2 THEN 1
                 ELSE 2 END AS INTEGER) AS phase,
       CAST((({_CURR_A} * doc_id + {_CURR_B}) % {_P}) % {_CURR_N_SHARDS} AS INTEGER) AS shard
FROM scored CROSS JOIN cuts
"""


# ---------------------------------------------------------------------
# Priority sampling (weighted without-replacement, per source)
# ---------------------------------------------------------------------

_PRI_K = 10
_PRI_A, _PRI_B = 2045213, 1013904223  # the deterministic "uniform" draw


def priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted without-replacement sample, k per source, by PRIORITY
    SAMPLING (Duffield–Lund–Thorup 2007): each item draws priority
    w/u with u uniform on (0,1], and the k highest priorities per
    stratum are kept — inclusion probability ∝ weight with strong
    subset-sum estimation guarantees. Here w = n_chars (longer
    documents proportionally more likely) and u is the deterministic
    affine-hash draw u = (h+1)/P — reproducible under retries and
    bit-equal in the oracle.

    The per-source top-k is a row_number window partitioned by source
    (per-stratum reservoirs, no global sort) — the per_source_sample
    discipline.

    Output: (source, doc_id, n_chars, priority, pick_rank)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    h = (F.lit(_PRI_A) * F.col("doc_id") + F.lit(_PRI_B)) % F.lit(_P)
    # priority = w / u = w·P / (h+1): one multiply + one divide, both
    # IEEE-exact-identical across engines
    pri = (F.col("n_chars").cast("double") * F.lit(float(_P))) / (
        (h + 1).cast("double")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("priority"), F.asc("doc_id")
    )
    return (
        docs.withColumn("priority", pri)
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= _PRI_K)
        .select(
            "source",
            "doc_id",
            "n_chars",
            "priority",
            F.col("pick_rank").cast("int").alias("pick_rank"),
        )
    )


_PRI_SQL = f"""
WITH pri AS (
  SELECT source, doc_id, n_chars,
         (CAST(n_chars AS DOUBLE) * CAST({float(_P)!r} AS DOUBLE))
           / CAST((({_PRI_A} * doc_id + {_PRI_B}) % {_P}) + 1 AS DOUBLE) AS priority
  FROM documents
)
SELECT source, doc_id, n_chars, priority, CAST(pick_rank AS INTEGER) AS pick_rank
FROM (
  SELECT source, doc_id, n_chars, priority,
         row_number() OVER (PARTITION BY source ORDER BY priority DESC, doc_id ASC)
           AS pick_rank
  FROM pri) z
WHERE pick_rank <= {_PRI_K}
"""


# ---------------------------------------------------------------------
# Surprisal-bucket curriculum (r11 verdict task 8): the fixed-point
# surprisal twin (lm.lm_surprisal_fix) becomes an OPERATOR — per-doc
# familiarity buckets feed the epoch shuffle, producing the
# Gopher-style easy-first training order instead of a pure random one.
# ---------------------------------------------------------------------


def surprisal_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Easy-first curriculum order: bucket every document by its
    average bigram surprisal (quartiles of ``avg_surprisal_bits`` from
    the hash-checkable fixed-point LM scoring), then re-rank each
    epoch-shuffle shard easy→hard (random WITHIN a bucket — the
    shuffle rank breaks ties), so a training job reads
    ``curriculum_pos`` order to anneal from familiar to surprising
    text.  Documents the LM could not score (fewer than two model
    tokens) land in bucket 4, scheduled last.

    Plan: the three quartile cuts are ONE exact-percentile aggregate
    broadcast back (invariant 7 — the curriculum_phases pattern); the
    bucket is a scan projection against the 1-row cut frame; the
    re-rank window partitions by (epoch, shard) — the SAME key the
    epoch shuffle itself ranks on, so shard sizing keeps both windows
    bounded.  Output: (epoch, shard, doc_id, bucket, pos,
    curriculum_pos)."""
    from trx_spark.queries.lm import lm_surprisal_fix
    from trx_spark.queries.packing import epoch_shuffle

    sup = lm_surprisal_fix(spark, sf_dir).select(
        "doc_id", "avg_surprisal_bits"
    )
    cuts = sup.agg(
        *[
            F.expr(f"percentile(avg_surprisal_bits, {q}D)").alias(f"q{i}")
            for i, q in enumerate((0.25, 0.5, 0.75), start=1)
        ]
    )
    shuf = epoch_shuffle(spark, sf_dir)
    bucket = F.when(F.col("avg_surprisal_bits").isNull(), F.lit(4)).otherwise(
        (F.col("avg_surprisal_bits") > F.col("q1")).cast("int")
        + (F.col("avg_surprisal_bits") > F.col("q2")).cast("int")
        + (F.col("avg_surprisal_bits") > F.col("q3")).cast("int")
    )
    j = (
        shuf.join(sup, "doc_id", "left")
        .crossJoin(F.broadcast(cuts))
        .withColumn("bucket", bucket.cast("long"))
    )
    w = Window.partitionBy("epoch", "shard").orderBy("bucket", "pos")
    return j.select(
        "epoch",
        "shard",
        "doc_id",
        "bucket",
        F.col("pos").cast("long").alias("pos"),
        F.row_number().over(w).cast("long").alias("curriculum_pos"),
    )


def _surprisal_curriculum_sql() -> str:
    from trx_spark.queries.lm import _surprisal_sql
    from trx_spark.queries.packing import _SHUFFLE_SQL

    return f"""
WITH sup AS ({_surprisal_sql()}),
shuf AS ({_SHUFFLE_SQL}),
cuts AS (
  SELECT quantile_cont(avg_surprisal_bits, 0.25) AS q1,
         quantile_cont(avg_surprisal_bits, 0.5) AS q2,
         quantile_cont(avg_surprisal_bits, 0.75) AS q3
  FROM sup
),
j AS (
  SELECT s.epoch, s.shard, s.doc_id,
         CAST(CASE WHEN u.avg_surprisal_bits IS NULL THEN 4
              ELSE CAST(u.avg_surprisal_bits > c.q1 AS INTEGER)
                 + CAST(u.avg_surprisal_bits > c.q2 AS INTEGER)
                 + CAST(u.avg_surprisal_bits > c.q3 AS INTEGER)
              END AS BIGINT) AS bucket,
         CAST(s.pos AS BIGINT) AS pos
  FROM shuf s LEFT JOIN sup u ON u.doc_id = s.doc_id CROSS JOIN cuts c
)
SELECT epoch, shard, doc_id, bucket, pos,
       CAST(row_number() OVER (PARTITION BY epoch, shard
                               ORDER BY bucket, pos) AS BIGINT)
         AS curriculum_pos
FROM j
"""


QUERIES = {
    "curriculum_phases": curriculum_phases,
    "priority_sample": priority_sample,
    "surprisal_curriculum": surprisal_curriculum,
}

ORACLES = {
    "curriculum_phases": _CURR_SQL,
    "priority_sample": _PRI_SQL,
    "surprisal_curriculum": _surprisal_curriculum_sql(),
}
