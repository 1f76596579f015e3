"""SimHash near-dup pairs (Manku-style pigeonhole banding): the
PRODUCTION banding join (cap disabled) must EQUAL the brute-force
Hamming ≤ 3 pair set — the pigeonhole guarantees every qualifying pair
shares at least one exact 12-bit band — and identical token sets pair
at Hamming 0."""

from __future__ import annotations

import pandas as pd

from trx_spark.queries import textdata as td


def _pairs_and_hashes(spark, docs, cap):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in td._simhash_pairs_frame(docs, cap=cap).collect()
    }
    sh = {r["doc_id"]: r["sh"] for r in td._simhash48(docs).collect()}
    return pairs, sh


def test_banding_equals_bruteforce_hamming(spark, sf_dir):
    from trx_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    pairs, sh = _pairs_and_hashes(spark, docs, cap=1 << 30)
    brute = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for a in sh
        for b in sh
        if a < b and bin(sh[a] ^ sh[b]).count("1") <= td._SIMHAM_MAX
    }
    assert pairs == brute
    assert len(pairs) > 0  # the small-vocab corpus has near-identical docs


def test_identical_docs_pair_at_zero(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base, "totally different words here now"],
            }
        )
    )
    pairs, _ = _pairs_and_hashes(spark, docs, cap=td._LSH_BUCKET_CAP)
    assert pairs.get((1, 2)) == 0
    assert not any(3 in p for p in pairs)


def test_simhash48_is_48_bits(spark):
    pdf = pd.DataFrame({"doc_id": [1], "text": ["alpha bravo charlie"]})
    sh = td._simhash48(spark.createDataFrame(pdf)).collect()[0]["sh"]
    assert 0 <= sh < (1 << 48)


def test_containment_dominates_jaccard(spark, sf_dir):
    """Broder: max(c(A→B), c(B→A)) ≥ J(A,B) for every candidate pair,
    with equality iff |A| = |B| — pins the two verifiers' shared
    intersection math against each other on the same LSH candidates."""
    from pyspark.sql import functions as F

    from trx_spark.queries.textdata import minhash_containment

    mc = {
        (r["doc_a"], r["doc_b"]): r
        for r in minhash_containment(spark, sf_dir).collect()
    }
    assert mc  # fixture produces candidates
    for (a, b), r in mc.items():
        j = r["n_inter"] / (r["n_a"] + r["n_b"] - r["n_inter"])
        assert max(r["contain_a"], r["contain_b"]) >= j - 1e-12
        if r["n_a"] == r["n_b"]:
            assert r["contain_a"] == r["contain_b"]
