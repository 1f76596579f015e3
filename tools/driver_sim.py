#!/usr/bin/env python
"""Driver-contract simulation (verify-skill recipe): vanilla session,
entry(spark) smoke check, then compare_query for the given names at
sf0.01 (cell-exact vs the DuckDB oracle — stricter than the driver's
hash).  Usage: python tools/driver_sim.py [--sf DIR] [--entry] name...
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--entry", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    if args.entry:
        rows = mod.entry(spark).collect()
        print(f"entry: {len(rows)} rows", flush=True)

    if args.names:
        from oracle_utils import compare_query, duckdb_con

        con = duckdb_con(args.sf)
        queries = mod.queries()
        oracles = mod.oracle_sql()
        names = args.names
        if names == ["ALL"]:
            names = [n for n in queries if n in oracles]
        for name in names:
            try:
                compare_query(queries[name](spark, args.sf), con, oracles[name], name)
                print(f"OK   {name}", flush=True)
            except Exception as e:
                print(f"FAIL {name}: {str(e)[:400]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
