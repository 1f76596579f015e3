"""Local emulation of the driver's DuckDB-oracle comparison: row count,
schema, and order-insensitive value comparison — stricter than the
driver (bit-exact cell equality after column-name sort) so anything that
passes here passes any reasonable hash scheme."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _type_ok(sp_type: str, dk_type: str) -> bool:
    """Conservative type-family equivalence (DuckDB name vs Spark name)."""
    dk = dk_type.upper()
    families = {
        "double": {"DOUBLE", "FLOAT"},
        "float": {"FLOAT"},
        "bigint": {"BIGINT"},
        "int": {"INTEGER"},
        "smallint": {"SMALLINT"},
        "string": {"VARCHAR"},
        "boolean": {"BOOLEAN"},
        "timestamp": {"TIMESTAMP", "TIMESTAMP_NS"},
    }
    return dk in families.get(sp_type, {dk})


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def compare_query(spark_df, con, sql: str, name: str = "?") -> None:
    """Assert bit-exact match between a Spark result and the oracle."""
    sp_cols = spark_df.columns
    sp_types = dict(spark_df.dtypes)
    sp_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    dk_cols = list(rel.columns)
    dk_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    dk_rows = rel.fetchall()
    assert sorted(sp_cols) == sorted(dk_cols), (
        f"{name}: column mismatch {sorted(sp_cols)} vs {sorted(dk_cols)}"
    )
    for c in sp_cols:
        assert _type_ok(sp_types[c], dk_types[c]), (
            f"{name}: type mismatch on {c}: spark={sp_types[c]} duckdb={dk_types[c]}"
        )
    assert len(sp_rows) == len(dk_rows), (
        f"{name}: row count {len(sp_rows)} vs {len(dk_rows)}"
    )
    a = _canon(sp_rows, sp_cols)
    b = _canon(dk_rows, dk_cols)
    bad = 0
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            bad += 1
            if bad <= 5:
                print(f"{name}: row {i} mismatch\n  spark : {x}\n  duckdb: {y}")
    assert bad == 0, f"{name}: {bad}/{len(a)} canonical rows differ"
