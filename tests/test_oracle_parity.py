"""Every queries() entry must match its oracle_sql() bit-for-bit —
the local version of the driver's correctness gate (run at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare_query, duckdb_con

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


def test_every_query_has_oracle():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    compare_query(df, con, ORACLES[name], name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_bloom_superset(spark, sf_dir):
    """Bloom decontamination has NO false negatives: every doc the
    exact shingle join finds contaminated is flagged by the filter."""
    from trx_spark.queries.curation import contamination_check, decontam_bloom_flags

    truth = {r["doc_id"] for r in contamination_check(spark, sf_dir).collect()}
    flagged = {
        r["doc_id"] for r in decontam_bloom_flags(spark, sf_dir).filter("flagged").collect()
    }
    assert truth <= flagged
