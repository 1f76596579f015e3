"""Property tests for the data-contracts queries: SCD2 merge
invariants and the expectations audit on known-clean data."""

from __future__ import annotations

from pyspark.sql import functions as F

from trx_spark.queries.contracts import (
    _SCD_NEW_KEY_OFFSET,
    scd2_customer_versions,
    table_expectations_audit,
)
from trx_spark.tables import load_table


def test_expectations_all_pass_on_clean_data(spark, sf_dir):
    rows = {r["check_name"]: r for r in table_expectations_audit(spark, sf_dir).collect()}
    assert set(rows) == {
        "orderkey_not_null",
        "orderkey_unique",
        "orderstatus_accepted_values",
        "totalprice_positive",
        "custkey_references_customer",
    }
    n = load_table(spark, sf_dir, "orders").count()
    for r in rows.values():
        assert r["n_checked"] == n
        assert r["n_violations"] == 0
        assert r["passed"] == 1


def test_expectations_detect_injected_violations(spark, sf_dir):
    """The audit is not vacuous: re-run the same checks over a frame
    with known defects and every check must count them."""
    o = load_table(spark, sf_dir, "orders")
    broken = o.unionByName(
        o.limit(1).select(
            F.lit(None).cast("long").alias("o_orderkey"),
            F.lit(-1).cast("long").alias("o_custkey"),
            F.lit("X").alias("o_orderstatus"),
            F.lit(-5.0).alias("o_totalprice"),
            *[F.col(c) for c in o.columns if c not in (
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")],
        ).select(*o.columns)
    )
    n = o.count()
    nn = broken.agg(F.sum(F.col("o_orderkey").isNull().cast("long"))).first()[0]
    assert nn == 1
    bad_status = broken.filter(~F.col("o_orderstatus").isin("F", "O", "P")).count()
    assert bad_status == 1
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    fk_bad = broken.join(
        cust, broken.o_custkey == cust.c_custkey, "left_anti"
    ).count()
    assert fk_bad == 1
    assert broken.count() == n + 1


def test_cdc_apply_last_write_wins(spark, sf_dir):
    from trx_spark.queries.contracts import _CDC_INS_OFFSET, cdc_apply_changes

    dim = load_table(spark, sf_dir, "customer")
    base = {
        r["c_custkey"]: r["c_acctbal"]
        for r in dim.select("c_custkey", "c_acctbal").collect()
    }
    got = {r["key"]: r for r in cdc_apply_changes(spark, sf_dir).collect()}
    for k, bal in base.items():
        if k % 4 == 2:
            assert k not in got  # deleted
        elif k % 4 == 1:
            # TWO updates landed; the seq-2 one must win
            assert got[k]["val"] == bal + 20.0
            assert got[k]["last_seq"] == 2
        else:
            assert got[k]["val"] == bal
            assert got[k]["last_seq"] == 0
        if k % 4 == 3:
            assert got[k + _CDC_INS_OFFSET]["val"] == bal
    n_del = sum(1 for k in base if k % 4 == 2)
    n_ins = sum(1 for k in base if k % 4 == 3)
    assert len(got) == len(base) - n_del + n_ins


def test_ab_zscore_matches_closed_form(spark, sf_dir):
    import math

    from trx_spark.queries.contracts import ab_test_zscore

    r = ab_test_zscore(spark, sf_dir).first()
    p_a, p_b = r["conv_a"] / r["n_a"], r["conv_b"] / r["n_b"]
    pool = (r["conv_a"] + r["conv_b"]) / (r["n_a"] + r["n_b"])
    se = math.sqrt(pool * (1 - pool) * (1 / r["n_a"] + 1 / r["n_b"]))
    if se == 0.0:
        # degenerate arm (every/no user converted): z is IEEE 0/0 or
        # x/0 — both engines agree (that agreement IS the parity gate);
        # the closed form just confirms the degeneracy
        assert math.isnan(r["z_score"]) or math.isinf(r["z_score"])
    else:
        assert r["z_score"] == (p_b - p_a) / se
    assert r["n_a"] > 0 and r["n_b"] > 0


def test_scd2_merge_invariants(spark, sf_dir):
    dim = load_table(spark, sf_dir, "customer")
    n = dim.count()
    n_upd = dim.filter(F.col("c_custkey") % 10 == 3).count()
    n_ins = dim.filter(F.col("c_custkey") % 10 == 7).count()
    out = scd2_customer_versions(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == n + n_upd + n_ins
    by_type = {}
    for r in rows:
        by_type.setdefault(r["change_type"], []).append(r)
    assert len(by_type["unchanged"]) == n - n_upd
    assert len(by_type["superseded"]) == n_upd
    assert len(by_type["updated"]) == n_upd
    assert len(by_type["inserted"]) == n_ins
    # exactly one OPEN version per business key
    open_keys = [r["key"] for r in rows if r["valid_to"] is None]
    assert len(open_keys) == len(set(open_keys)) == n + n_ins
    # every superseded key has its successor, values shifted by the delta
    sup = {r["key"]: r for r in by_type["superseded"]}
    upd = {r["key"]: r for r in by_type["updated"]}
    assert set(sup) == set(upd)
    for k, old in sup.items():
        assert upd[k]["acctbal"] == old["acctbal"] + 100.0
        assert old["valid_to"] == upd[k]["valid_from"] == 2
    # inserted keys live in the synthetic range
    assert all(r["key"] >= _SCD_NEW_KEY_OFFSET for r in by_type["inserted"])
