"""Semantic invariants for the r10 wave-2 queries beyond oracle
parity: the MRR audit's rational identities and the FIM split's exact
conservation laws."""

from __future__ import annotations

from trx_spark.queries.packing import _FIM_MIN_TOKENS, fim_split_stats
from trx_spark.queries.similarity import _MRR_K, _MRR_QMOD, retrieval_mrr_audit


def test_retrieval_mrr_identities(spark, sf_dir):
    rows = retrieval_mrr_audit(spark, sf_dir).collect()
    assert rows, "no eval queries sampled"
    for r in rows:
        assert r["query_id"] % _MRR_QMOD == 0
        if r["first_rel_rank"] is not None:
            # reciprocal rank is the exact rational 1 / first rank
            assert r["reciprocal_rank"] == 1.0 / float(r["first_rel_rank"])
            assert r["n_relevant"] >= 1
            # a hit@k certificate iff the first relevant rank is <= k
            assert r["hit_at_10"] == (1 if r["first_rel_rank"] <= _MRR_K else 0)
        else:
            assert r["reciprocal_rank"] == 0.0
            assert r["n_relevant"] == 0 and r["hit_at_10"] == 0


def test_retrieval_mrr_relevance_counts_match_labels(spark, sf_dir):
    """n_relevant equals the corpus label count minus self."""
    from trx_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    label_counts = {
        r["label"]: r["c"]
        for r in emb.groupBy("label").count().withColumnRenamed("count", "c").collect()
    }
    for r in retrieval_mrr_audit(spark, sf_dir).collect():
        assert r["n_relevant"] == label_counts[r["label"]] - 1


def test_fim_split_conservation(spark, sf_dir):
    """Per source: segment masses + passthrough reassemble the exact
    token total, each doc's middle is within one token of n/3, and
    docs under the threshold never split."""
    from pyspark.sql import functions as F

    from trx_spark.queries.curation import _BPE_RE
    from trx_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)).cast(
        "long"
    )
    truth = {
        r["source"]: (r["total"], r["n_docs"], r["n_short"])
        for r in docs.select("source", n.alias("n"))
        .groupBy("source")
        .agg(
            F.sum("n").alias("total"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("n") < _FIM_MIN_TOKENS, 1).otherwise(0)
            ).alias("n_short"),
        )
        .collect()
    }
    got = {r["source"]: r for r in fim_split_stats(spark, sf_dir).collect()}
    assert set(got) == set(truth)
    for src, (total, n_docs, n_short) in truth.items():
        r = got[src]
        assert r["n_docs"] == n_docs
        assert r["n_fim_docs"] == n_docs - n_short
        reassembled = (
            r["prefix_tokens"]
            + r["middle_tokens"]
            + r["suffix_tokens"]
            + r["passthrough_tokens"]
        )
        assert reassembled == total
        # middle ≈ one third of the FIM mass (each doc within a token)
        fim_total = r["prefix_tokens"] + r["middle_tokens"] + r["suffix_tokens"]
        if fim_total:
            assert abs(3 * r["middle_tokens"] - fim_total) <= 3 * r["n_fim_docs"]
            assert r["middle_frac"] == r["middle_tokens"] / float(fim_total)
