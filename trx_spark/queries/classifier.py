"""Trained quality classifier (the GPT-3/LLaMA-style curation step:
a linear classifier scores every document's similarity to a trusted
target domain, and the scores drive sampling/filtering — Brown et al.
2020 §A; here logistic regression on hashed-TF features, trained with
full-batch gradient descent inside Spark).

Training is the same iterative-declarative discipline as the Lloyd
trainer and PageRank: the weight vector is a ≤(dim+1)-row DataFrame,
broadcast into each pass; per iteration one map-side margin join, one
keyed gradient aggregation, and a weight update — nothing collected
to the driver, lineage cut per round with localCheckpoint.

- Features: the signed hashing-trick TF triples (ranking.
  hashed_tf_features), L1-normalized per doc so feature scale is
  bounded and the fixed learning rate is stable.
- Labels: y=1 for the DSIR target source (the "trusted domain"), else
  0 — self-supervised from the corpus's own source column, exactly
  how production quality classifiers bootstrap (trusted slice vs the
  rest).
- Scale: per iteration the corpus pass is one broadcast join + two
  partial-aggregatable groupBys; the model state is dim+1 rows
  however large the corpus. exp/log are engine-specific, so no SQL
  oracle; tests/test_quality_classifier.py pins training against a
  pure-numpy implementation and checks the scores separate the
  target source from the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CLF_ITERS = 10
_CLF_LR = 1.0
_BIAS_DIM = -1  # the bias term rides the same (dim, w) table

# trained weights memo per (session, sf_dir)
_CLF_CACHE: dict = {}
# featurized corpus memo per (session, sf_dir): training builds it
# once, scoring reuses the same checkpointed frame instead of paying
# the tokenize + hashed-TF + norm pass a second time
_FEATS_CACHE: dict = {}


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dim, x, y): L1-normalized signed hashed-TF features
    plus the per-doc label (docs with zero tokens emit no rows).
    Checkpointed + memoized per (session, sf_dir)."""
    key = (spark, sf_dir)
    if key in _FEATS_CACHE:
        return _FEATS_CACHE[key]
    from trx_spark.queries.curation import _DSIR_TARGET_SOURCE
    from trx_spark.queries.ranking import hashed_tf_features
    from trx_spark.tables import load_table

    tf = hashed_tf_features(spark, sf_dir)
    norms = tf.groupBy("doc_id").agg(F.sum(F.abs("value")).alias("n1"))
    labels = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("source") == _DSIR_TARGET_SOURCE).cast("double").alias("y"),
    )
    feats = (
        # a doc whose signed features fully cancel (n1 = 0) has an
        # undefined normalization (0/0) — excluded, like zero-token docs
        tf.join(norms.filter(F.col("n1") > 0), "doc_id")
        .join(labels, "doc_id")
        .select(
            "doc_id",
            "dim",
            (F.col("value").cast("double") / F.col("n1").cast("double")).alias("x"),
            "y",
        )
    )
    # the bias rides as a constant feature (dim=_BIAS_DIM, x=1): one
    # margin join and one gradient groupBy cover weights AND bias —
    # no separate bias branch, two fewer stages per GD iteration
    bias_rows = feats.select("doc_id", "y").distinct().select(
        "doc_id", F.lit(_BIAS_DIM).cast("long").alias("dim"),
        F.lit(1.0).alias("x"), "y",
    )
    _FEATS_CACHE[key] = feats.unionByName(bias_rows).localCheckpoint()
    return _FEATS_CACHE[key]


def _train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch GD for _CLF_ITERS rounds; returns (dim, w) with the
    bias at dim=_BIAS_DIM."""
    key = (spark, sf_dir)
    if key in _CLF_CACHE:
        return _CLF_CACHE[key]
    from trx_spark.queries.ranking import _FH_DIM

    feats = _features(spark, sf_dir)
    docs = feats.select("doc_id", "y").distinct().localCheckpoint()
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))

    w = spark.range(_FH_DIM).select(
        F.col("id").cast("long").alias("dim"), F.lit(0.0).alias("w")
    ).unionByName(
        spark.range(1).select(
            F.lit(_BIAS_DIM).cast("long").alias("dim"), F.lit(0.0).alias("w")
        )
    ).localCheckpoint()

    for _ in range(_CLF_ITERS):
        # every doc has the bias row, so margin covers xw + b in one
        # aggregation and the sigmoid error needs no left-join fallback
        err = (
            feats.join(F.broadcast(w), "dim")
            .groupBy("doc_id", "y")
            .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
            .select(
                "doc_id",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y")
                ).alias("e"),
            )
        )
        grad = (
            feats.join(err, "doc_id")
            .groupBy("dim")
            .agg(F.sum(F.col("x") * F.col("e")).alias("g"))
        )
        w = (
            w.join(grad, "dim", "left")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "dim",
                (
                    F.col("w")
                    - F.lit(_CLF_LR)
                    * F.coalesce("g", F.lit(0.0))
                    / F.col("nd").cast("double")
                ).alias("w"),
            )
            .localCheckpoint()
        )
    _CLF_CACHE[key] = w
    return w


def quality_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained model: (dim, weight); bias at dim=-1."""
    return _train(spark, sf_dir).select("dim", F.col("w").alias("weight"))


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every featurizable doc scored by the trained model:
    (doc_id, label, score, predicted) with score = P(target-domain)."""
    w = _train(spark, sf_dir)
    feats = _features(spark, sf_dir)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    return (
        feats.join(F.broadcast(w), "dim")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
        .select(
            "doc_id",
            F.col("y").alias("label"),
            score.alias("score"),
            (score > 0.5).alias("predicted"),
        )
    )


# ---------------------------------------------------------------------
# Round-1 sufficient statistics (the driver-hashable integer core of
# the trainer — the `lm_bigram_counts` pattern applied to GD)
# ---------------------------------------------------------------------

_GD_SCALE = 1e12  # |x| ≤ 1 and ≤ ~1e6 rows/dim at gate sf → no overflow


def classifier_gd_round_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 sufficient statistics of the GD trainer, fixed-point
    exact: at w=0 the sigmoid is exactly 1/2, so the per-row error
    e = 1/2 − y is exact in binary and the round-1 gradient decomposes
    into the two label-conditioned sums of the quantized features —
    g[dim] = (gq_neg − gq_pos) / (2·S·n_docs) up to the fixed-point
    truncation shared by both engines. Hashing (dim, n_rows, n_pos,
    gq_pos, gq_neg) therefore pins the trainer's featurization, L1
    normalization, label join, bias channel and gradient aggregation
    bit-for-bit; only the later rounds' exp() stays outside the gate
    (engine-specific transcendental — covered by the numpy pin in
    tests/test_quality_classifier.py)."""
    from trx_spark.exact import fint

    feats = _features(spark, sf_dir)
    q = fint(F.col("x"), _GD_SCALE)
    return feats.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("y") == 1.0, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("y") == 1.0, q).otherwise(F.lit(0))).alias("gq_pos"),
        F.sum(F.when(F.col("y") == 0.0, q).otherwise(F.lit(0))).alias("gq_neg"),
    )


def _gd_stats_sql() -> str:
    from trx_spark.exact import sql_fint
    from trx_spark.queries.curation import _DSIR_TARGET_SOURCE
    from trx_spark.queries.ranking import _FH_DIM, _FH_SIGN_A, _FH_SIGN_B, _TOKEN_RE
    from trx_spark.queries.textdata import _P, _tok_hash_sql

    tid = _tok_hash_sql("token")
    q = sql_fint("x", _GD_SCALE)
    return f"""
WITH ts AS (
  SELECT doc_id, s.token
  FROM (SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE}') AS toks FROM documents) t,
       UNNEST(toks) AS s(token)
),
hashed AS (
  SELECT doc_id,
         CAST({tid} % {_FH_DIM} AS BIGINT) AS dim,
         CAST(CASE WHEN (({_FH_SIGN_A} * {tid} + {_FH_SIGN_B}) % {_P}) % 2 = 0
                   THEN 1 ELSE -1 END AS BIGINT) AS s
  FROM ts
),
tf AS (
  SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS value
  FROM hashed GROUP BY doc_id, dim
),
norms AS (
  SELECT doc_id, CAST(SUM(ABS(value)) AS BIGINT) AS n1
  FROM tf GROUP BY doc_id
  HAVING CAST(SUM(ABS(value)) AS BIGINT) > 0
),
labels AS (
  SELECT doc_id,
         CASE WHEN source = '{_DSIR_TARGET_SOURCE}'
              THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
  FROM documents
),
feats AS (
  SELECT t.doc_id, t.dim,
         CAST(t.value AS DOUBLE) / CAST(n.n1 AS DOUBLE) AS x, l.y
  FROM tf t JOIN norms n USING (doc_id) JOIN labels l USING (doc_id)
  UNION ALL
  SELECT DISTINCT t.doc_id, CAST({_BIAS_DIM} AS BIGINT) AS dim,
         CAST(1 AS DOUBLE) AS x, l.y
  FROM tf t JOIN norms n USING (doc_id) JOIN labels l USING (doc_id)
),
quant AS (SELECT dim, y, {q} AS q FROM feats)
SELECT dim,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN y = 1.0 THEN q ELSE 0 END) AS BIGINT) AS gq_pos,
       CAST(SUM(CASE WHEN y = 0.0 THEN q ELSE 0 END) AS BIGINT) AS gq_neg
FROM quant GROUP BY dim
"""


QUERIES = {
    "quality_classifier_scores": quality_classifier_scores,
    "classifier_gd_round_stats": classifier_gd_round_stats,
}

ORACLES: dict[str, str] = {
    "classifier_gd_round_stats": _gd_stats_sql(),
}
