"""AllPairs prefix-key saturation guard: a degenerate hot blocking key
(> key_cap docs sharing a prefix shingle) must be dropped-with-
accounting instead of fanning out cap^2 candidates; with the default
cap the results are bit-identical to an uncapped run (exactness holds
wherever the cost model does)."""

from __future__ import annotations

import logging

from trx_spark.queries.textdata import allpairs_jaccard_join


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_hot_key_is_dropped_with_accounting(spark, tmp_path, caplog):
    # 30 near-identical docs -> one hot prefix shingle family, plus two
    # genuinely similar docs on a disjoint vocabulary
    hot = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, hot, "s", "en", len(hot)) for i in range(30)]
    pair = "red orange yellow green blue indigo violet umber"
    rows.append((100, pair, "s", "en", len(pair)))
    rows.append((101, pair + " extra", "s", "en", len(pair)))
    _write_docs(spark, str(tmp_path), rows)

    with caplog.at_level(logging.WARNING, "trx_spark.queries.textdata"):
        got = allpairs_jaccard_join(spark, str(tmp_path), key_cap=8).collect()
    assert any("saturated prefix keys" in r.message for r in caplog.records)
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    # the disjoint-vocabulary pair survives (its keys are not hot) ...
    assert (100, 101) in pairs
    # ... and no hot-cluster pair leaks through a saturated key
    assert not any(a < 30 and b < 30 for a, b in pairs)


def test_default_cap_never_fires_on_gate_corpus(spark, sf_dir, caplog):
    with caplog.at_level(logging.WARNING, "trx_spark.queries.textdata"):
        capped = allpairs_jaccard_join(spark, sf_dir).collect()
        uncapped = allpairs_jaccard_join(spark, sf_dir, key_cap=1 << 40).collect()
    assert not any("saturated" in r.message for r in caplog.records)
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    assert sorted(map(tuple, capped), key=str) == sorted(map(tuple, uncapped), key=str)
