#!/usr/bin/env python
"""Standalone per-query probe (guide §1: measure first, noop sink).

Usage: python tools/probe.py [--sf DIR] [--reps N] [--plans DIR] [--cold]
                             name [name ...]

For each query name, in one warm session:
  * one untimed warm-up execution (memo builds ride it, like the bench's
    amortized pass),
  * N timed noop-sink executions under a per-query job group, so the
    probe reports the Spark JOB COUNT each execution launches (the
    driver-loop diagnostic the wall clock alone hides),
  * optionally the ``explain('formatted')`` plan written to
    ``<plans>/<name>_<tag>.txt``.

Prints one JSON line per query:
  {"name": ..., "warm": [...], "jobs": n, "mean": ..., "min": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trx_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cold", action="store_true", help="clear stage caches before every rep")
    args = ap.parse_args()

    spark = get_spark("trx_probe")
    from trx_spark.queries import QUERIES
    from trx_spark.cache import clear_stage_caches

    sc = spark.sparkContext
    # absorb session/daemon startup like bench.py does
    QUERIES["pricing_summary"](spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args.names:
        fn = QUERIES[name]
        if args.cold:
            clear_stage_caches(spark)
        # warm-up (pays memo builds / codegen)
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        build = time.perf_counter() - t0
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        jobs = None
        for rep in range(args.reps):
            if args.cold:
                clear_stage_caches(spark)
            group = f"probe_{name}_{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("", "")
        print(json.dumps({
            "name": name,
            "build": round(build, 3),
            "warm": times,
            "jobs": jobs,
            "min": min(times),
            "mean": round(sum(times) / len(times), 3),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
