"""Pipeline audit & preprocessing readouts (LLM-pipeline extension; no
reference counterpart): the operational reports a 100-TB curation run
publishes alongside its outputs.

- ``dedup_savings_report`` — per source, how much the exact-dedup pass
  actually saves (doc and character counts of the non-keeper copies) —
  the ledger line every dedup stage owes its operators.
- ``minhash_estimate_calibration`` — per verified near-dup pair, the
  MinHash component-match count m (J-hat = m/8) next to the exact
  Jaccard — the estimator-calibration table behind banding-parameter
  choices (complements shingle_minhash_recall, which measures recall;
  this measures estimator bias on the found pairs).
- ``embedding_standardized`` — per (vec, dim) z-scores from the exact
  fixed-point moments — the whitening/standardization preprocessing
  step in front of clustering and ANN.

Scale shapes: savings is two keyed groupBys (hash, then source);
calibration joins the band-capped verified-pair table (bounded by the
cap, not corpus²) against the zero-shuffle signature projection;
standardization is a map-side explode joined against a 64-row
broadcast of per-dimension stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.tables import fan_out_small_scan, load_table


def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: (n_docs, n_dup_docs, chars_total, chars_dup) where
    dup docs are exact-content copies beyond each group's min-doc_id
    keeper (the dedup_exact keeper rule)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    keep = docs.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    flagged = docs.join(keep, "h").withColumn(
        "is_dup", F.col("doc_id") != F.col("keeper")
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup_docs"),
        F.sum("n_chars").alias("chars_total"),
        F.sum(F.when(F.col("is_dup"), F.col("n_chars")).otherwise(0)).alias(
            "chars_dup"
        ),
    )


_SAVINGS_SQL = """
WITH d AS (
  SELECT doc_id, source, n_chars, md5(text) AS h FROM documents
),
k AS (SELECT h, MIN(doc_id) AS keeper FROM d GROUP BY h)
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN d.doc_id <> k.keeper THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_docs,
  CAST(SUM(d.n_chars) AS BIGINT) AS chars_total,
  CAST(SUM(CASE WHEN d.doc_id <> k.keeper THEN d.n_chars ELSE 0 END)
    AS BIGINT) AS chars_dup
FROM d JOIN k USING (h)
GROUP BY d.source
"""


def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per verified LSH pair: exact jaccard, MinHash component matches
    m_match (0..8) and the estimator J-hat = m/8."""
    from trx_spark.queries.textdata import lsh_pairs_verified, minhash_signatures

    pairs = lsh_pairs_verified(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    sigs = minhash_signatures(spark, sf_dir)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(8)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(8)],
    )
    m = None
    for j in range(8):
        term = F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        m = term if m is None else m + term
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            m.cast("long").alias("m_match"),
            (m.cast("double") / F.lit(8.0)).alias("jaccard_est"),
        )
    )


def _calibration_sql() -> str:
    from trx_spark.queries.textdata import _LSH_VERIFIED_SQL, _MINHASH_SQL

    msum = " + ".join(
        f"(CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END)" for j in range(8)
    )
    return f"""
WITH v AS ({_LSH_VERIFIED_SQL}),
sg AS (SELECT * FROM ({_MINHASH_SQL}) s)
SELECT v.doc_a, v.doc_b, v.jaccard,
  CAST({msum} AS BIGINT) AS m_match,
  CAST({msum} AS DOUBLE) / CAST(8.0 AS DOUBLE) AS jaccard_est
FROM v
JOIN sg a ON a.doc_id = v.doc_a
JOIN sg b ON b.doc_id = v.doc_b
"""


def embedding_standardized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dim, z): per-dimension z-scores from the exact
    fixed-point moments (NULL where the dimension is constant)."""
    from trx_spark.queries.embstats import _dims, embedding_moment_stats

    stats = embedding_moment_stats(spark, sf_dir).select(
        "dim", "mean", "std_pop"
    )
    d = _dims(spark, sf_dir)
    return d.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "dim",
        F.when(
            F.col("std_pop") > 0,
            (F.col("v") - F.col("mean")) / F.col("std_pop"),
        ).alias("z"),
    )


def _standardized_sql() -> str:
    from trx_spark.queries.embstats import _MOMENTS_SQL

    return f"""
WITH m AS ({_MOMENTS_SQL}),
d AS (
  SELECT vec_id, u.i AS dim, CAST(embedding[u.i] AS DOUBLE) AS v
  FROM embeddings,
       UNNEST(generate_series(1, len(embedding))) AS u(i)
)
SELECT d.vec_id, d.dim,
  CASE WHEN m.std_pop > 0 THEN (d.v - m.mean) / m.std_pop END AS z
FROM d JOIN m ON m.dim = d.dim
"""


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per exact-top-k row (brute-force cosine, the ground truth):
    whether the single-probe LSH top-k and the multi-probe top-k
    surfaced it — the ANN family's measured-recall table (the
    embedding-side sibling of shingle_minhash_recall). On isotropic
    testdata single-probe recall is near zero BY THEORY (the
    ann_topk_lsh docstring's measured note) — the audit is what makes
    that visible as data instead of a docstring claim.

    Scale shape: three already-bounded top-k tables (each ≤ k rows)
    joined on vec_id — the audit costs nothing beyond the rankers it
    audits."""
    from trx_spark.queries.textdata import (
        ann_cosine_topk,
        ann_topk_lsh,
        ann_topk_multiprobe,
    )

    truth = ann_cosine_topk(spark, sf_dir)
    lsh = ann_topk_lsh(spark, sf_dir).select(
        "vec_id", F.lit(True).alias("in_lsh_topk")
    )
    multi = ann_topk_multiprobe(spark, sf_dir).select(
        "vec_id", F.lit(True).alias("in_multiprobe_topk")
    )
    return (
        truth.join(lsh, "vec_id", "left")
        .join(multi, "vec_id", "left")
        .select(
            "rank",
            "vec_id",
            "cos_sim",
            F.coalesce(F.col("in_lsh_topk"), F.lit(False)).alias(
                "in_lsh_topk"
            ),
            F.coalesce(F.col("in_multiprobe_topk"), F.lit(False)).alias(
                "in_multiprobe_topk"
            ),
        )
    )


def _ann_recall_sql() -> str:
    from trx_spark.queries.textdata import (
        _ANN_SQL,
        _ANN_TOPK_LSH_SQL,
        _ANN_TOPK_MULTIPROBE_SQL,
    )

    return f"""
WITH truth AS (SELECT * FROM ({_ANN_SQL}) a),
l AS (SELECT vec_id FROM ({_ANN_TOPK_LSH_SQL}) b),
m AS (SELECT vec_id FROM ({_ANN_TOPK_MULTIPROBE_SQL}) c)
SELECT t.rank, t.vec_id, t.cos_sim,
  (l.vec_id IS NOT NULL) AS in_lsh_topk,
  (m.vec_id IS NOT NULL) AS in_multiprobe_topk
FROM truth t
LEFT JOIN l ON l.vec_id = t.vec_id
LEFT JOIN m ON m.vec_id = t.vec_id
"""


_FUNNEL_STAGES = [
    ("all_docs", None),
    ("after_exact_dedup", "exact_keeper"),
    ("after_neardup_canonical", "exact_and_canonical"),
    ("after_quality_filter", "keep"),
]


def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation chain's survival ledger: docs and tokens remaining
    after each cumulative stage of the keep-list pipeline (exact dedup
    → near-dup canonical → quality filter) — the one-table funnel a
    100-TB curation run reports to its operators. Composes the
    memoized corpus_keep_list verdicts with the tokenized base; each
    stage is a filtered aggregate over the same joined frame."""
    from trx_spark.queries.corpus import corpus_keep_list
    from trx_spark.queries.curation import _toks_base

    kl = corpus_keep_list(spark, sf_dir).withColumn(
        "exact_and_canonical", F.col("exact_keeper") & F.col("is_canonical")
    )
    nt = _toks_base(spark, sf_dir).select(
        "doc_id", F.size("toks").cast("long").alias("nt")
    )
    j = kl.join(nt, "doc_id")
    parts = []
    for ordn, (stage, flag) in enumerate(_FUNNEL_STAGES, start=1):
        f = j if flag is None else j.filter(F.col(flag))
        parts.append(
            f.agg(
                F.lit(ordn).alias("stage_ord"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("nt"), F.lit(0)).alias("n_tokens"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _funnel_sql() -> str:
    from trx_spark.queries.corpus import _keep_list_sql

    stage_sel = []
    for ordn, (stage, flag) in enumerate(_FUNNEL_STAGES, start=1):
        where = {
            None: "TRUE",
            "exact_keeper": "exact_keeper",
            "exact_and_canonical": "exact_keeper AND is_canonical",
            "keep": "keep",
        }[flag]
        stage_sel.append(
            f"SELECT {ordn} AS stage_ord, '{stage}' AS stage, "
            f"CAST(COUNT(*) AS BIGINT) AS n_docs, "
            f"CAST(COALESCE(SUM(nt), 0) AS BIGINT) AS n_tokens "
            f"FROM j WHERE {where}"
        )
    return f"""
WITH kl AS ({_keep_list_sql().strip()}),
nt AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS nt
  FROM documents
),
j AS (SELECT kl.*, nt.nt FROM kl JOIN nt USING (doc_id))
{" UNION ALL ".join(stage_sel)}
"""


# ---------------------------------------------------------------------
# Modality alignment audit: documents ↔ embeddings coverage
# ---------------------------------------------------------------------


def modality_alignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the join-coverage census between the text corpus and
    its embedding table (doc_id ↔ vec_id) — matched rows, text-only
    docs (missing embeddings: the backfill queue), orphaned vectors
    (stale embeddings: the GC queue), and the coverage ratio. The
    data-integrity gate every multimodal/RAG pipeline runs before
    training: a silent join-coverage drop is how a corpus loses a
    modality without anyone noticing.

    Plan: two narrow key projections, one full-outer equi-join, one
    1-row census — the join is the only data-scale stage."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("d_id")
    )
    vecs = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("v_id")
    )
    j = docs.join(vecs, docs.d_id == vecs.v_id, "full_outer")
    matched = F.sum(
        F.when(
            F.col("d_id").isNotNull() & F.col("v_id").isNotNull(), F.lit(1)
        ).otherwise(F.lit(0))
    )
    return j.agg(
        F.sum(
            F.when(F.col("d_id").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_docs"),
        F.sum(
            F.when(F.col("v_id").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_vecs"),
        matched.alias("n_matched"),
        F.sum(
            F.when(F.col("v_id").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_doc_only"),
        F.sum(
            F.when(F.col("d_id").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_vec_only"),
    ).select(
        "n_docs",
        "n_vecs",
        "n_matched",
        "n_doc_only",
        "n_vec_only",
        (
            F.col("n_matched").cast("double") / F.col("n_docs").cast("double")
        ).alias("coverage"),
    )


_ALIGN_SQL = """
WITH j AS (
  SELECT d.doc_id AS d_id, v.vec_id AS v_id
  FROM documents d FULL OUTER JOIN embeddings v ON d.doc_id = v.vec_id
)
SELECT
  CAST(SUM(CASE WHEN d_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN v_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_vecs,
  CAST(SUM(CASE WHEN d_id IS NOT NULL AND v_id IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
  CAST(SUM(CASE WHEN v_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_only,
  CAST(SUM(CASE WHEN d_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_vec_only,
  CAST(SUM(CASE WHEN d_id IS NOT NULL AND v_id IS NOT NULL
            THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(SUM(CASE WHEN d_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    AS coverage
FROM j
"""

QUERIES = {
    "modality_alignment_audit": modality_alignment_audit,
    "dedup_savings_report": dedup_savings_report,
    "minhash_estimate_calibration": minhash_estimate_calibration,
    "embedding_standardized": embedding_standardized,
    "ann_recall_audit": ann_recall_audit,
    "curation_funnel_report": curation_funnel_report,
}

ORACLES = {
    "modality_alignment_audit": _ALIGN_SQL,
    "dedup_savings_report": _SAVINGS_SQL,
    "minhash_estimate_calibration": _calibration_sql(),
    "embedding_standardized": _standardized_sql(),
    "ann_recall_audit": _ann_recall_sql(),
    "curation_funnel_report": _funnel_sql(),
}
