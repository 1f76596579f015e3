"""SimHash near-dup pairs (Manku-style pigeonhole banding): the
banded+verified pair set must EQUAL the brute-force Hamming ≤ 3 pair
set (with no bucket cap, the pigeonhole guarantees every qualifying
pair shares at least one exact 12-bit band), and identical token sets
pair at Hamming 0."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from trx_spark.queries import textdata as td


def _banded_pairs(spark, docs):
    sh = td._simhash48(docs).localCheckpoint()
    mask = (1 << td._SIMHAM_BAND_BITS) - 1
    n_bands = td._SIMHAM_BITS // td._SIMHAM_BAND_BITS
    stack_args = ", ".join(
        f"{b}, shiftright(sh, {b * td._SIMHAM_BAND_BITS}) & {mask}"
        for b in range(n_bands)
    )
    bands = sh.selectExpr("doc_id", "sh", f"stack({n_bands}, {stack_args}) AS (band, v)")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= td._SIMHAM_MAX)
    )
    return (
        {(r["doc_a"], r["doc_b"]): r["hamming"] for r in cand.collect()},
        {r["doc_id"]: r["sh"] for r in sh.collect()},
    )


def test_banding_equals_bruteforce_hamming(spark, sf_dir):
    from trx_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    pairs, sh = _banded_pairs(spark, docs)
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
    pairs, _ = _banded_pairs(spark, docs)
    assert pairs.get((1, 2)) == 0
    assert not any(3 in p for p in pairs)


def test_simhash48_is_48_bits(spark):
    pdf = pd.DataFrame({"doc_id": [1], "text": ["alpha bravo charlie"]})
    sh = td._simhash48(spark.createDataFrame(pdf)).collect()[0]["sh"]
    assert 0 <= sh < (1 << 48)
