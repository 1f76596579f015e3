"""session_window semantics: gap-merging, the closed boundary (two
events exactly `gap` apart DO merge — Spark merges touching ranges),
and batch-equivalence of the availableNow streaming pass."""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import functions as F

from trx_spark.streaming.sessions import run_session_catchup, session_counts

SCHEMA = "k string, ts timestamp"
T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [r[0] for r in rows],
                "ts": [T0 + datetime.timedelta(minutes=r[1]) for r in rows],
            }
        ),
        SCHEMA,
    )


def _sessions(df):
    out = session_counts(df, ts="ts", keys=["k"], gap="10 minutes")
    return {
        (r["k"], (r["session_start_us"] - _us(T0)) // 60_000_000): (
            (r["session_end_us"] - _us(T0)) // 60_000_000,
            r["n_events"],
        )
        for r in out.collect()
    }


def _us(dt):
    return int(dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


def test_gap_merge_and_boundary(spark):
    rows = [
        ("u1", 0), ("u1", 5), ("u1", 40),   # merge {0,5}; 40 separate
        ("u2", 0), ("u2", 10),              # EXACTLY gap apart: merges
        ("u3", 0), ("u3", 9),               # just inside: merge
    ]
    got = _sessions(_df(spark, rows))
    assert got == {
        ("u1", 0): (15, 2),   # end = last event (5) + gap
        ("u1", 40): (50, 1),
        ("u2", 0): (20, 2),   # touching ranges merge
        ("u3", 0): (19, 2),
    }


def test_streaming_equals_batch(spark, tmp_path):
    rows = [("u1", 0), ("u1", 5), ("u1", 40), ("u2", 3), ("u2", 12)]
    df = _df(spark, rows)
    landing = str(tmp_path / "landing")
    df.coalesce(1).write.parquet(landing)
    batch = {
        (r["k"], r["session_start_us"], r["session_end_us"]): r["n_events"]
        for r in session_counts(df, ts="ts", keys=["k"], gap="10 minutes").collect()
    }
    streamed = {
        (r["k"], r["session_start_us"], r["session_end_us"]): r["n_events"]
        for r in run_session_catchup(
            spark, landing_dir=landing, schema=SCHEMA, ts="ts", keys=["k"],
            gap="10 minutes",
        ).collect()
    }
    assert batch == streamed
