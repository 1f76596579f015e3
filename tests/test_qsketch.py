"""Quantile sketch (hash-level sampling, the KLL sampler component):
merge equals the one-shot sketch BIT-FOR-BIT, per-group state is
bounded at K survivors by construction, the estimator's rank error
stays under the 4·√(n·2^L) sampling bound, and the Spark construction
matches an independent pure-Python twin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trx_spark.queries.sketches import (
    _QS_A,
    _QS_B,
    _QS_JMAX,
    _QS_K,
    qs_kept,
    qs_rows,
)
from trx_spark.queries.textdata import _P
from trx_spark.streaming.sketch import (
    _batch_qsketch_partial,
    compact_qsketch_store,
    make_partial_handler,
    merged_qsketch,
    run_qsketch_catchup,
)
from trx_spark.tables import load_table
from tests.test_streaming_sketch import _write_waves


def _kept_set(df):
    return sorted((r["g"], r["lvl"], r["cv"], r["h"]) for r in df.collect())


def _events_rows(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return qs_rows(
        ev,
        F.col("event_id"),
        F.round(F.col("value") * 100).cast("long"),
        F.col("event_type"),
    )


def test_qsketch_multiwave_equals_batch_and_compacts(spark, sf_dir, tmp_path):
    """Survivor union + level re-selection across 3 waves equals the
    one-shot sketch bit-for-bit; epoch partials stay ≤ groups·K rows;
    compaction (with watermark) preserves the merged sketch."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    pdf = ev.toPandas()
    thirds = [pdf.iloc[i::3].reset_index(drop=True) for i in range(3)]
    waves = _write_waves(tmp_path, thirds)

    merged = run_qsketch_catchup(
        spark,
        landing_dir=str(waves),
        schema="event_id BIGINT, event_type STRING, value DOUBLE",
        sketch_dir=str(tmp_path / "sketch"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # one micro-batch per wave
    )
    want = _kept_set(qs_kept(_events_rows(spark, sf_dir)))
    assert _kept_set(merged) == want

    store = spark.read.parquet(str(tmp_path / "sketch"))
    n_groups = store.select("g").distinct().count()
    sizes = [r["count"] for r in store.groupBy("_epoch").count().collect()]
    assert len(sizes) == 3
    assert all(n <= n_groups * _QS_K for n in sizes)

    compact_qsketch_store(spark, str(tmp_path / "sketch"))
    assert _kept_set(merged_qsketch(spark, str(tmp_path / "sketch"))) == want
    # the folded store is one survivor set, not 3 epochs of history
    folded = spark.read.parquet(str(tmp_path / "sketch"))
    assert [r["_epoch"] for r in folded.select("_epoch").distinct().collect()] == [-1]


def test_qsketch_compact_then_continue_and_replay(spark, sf_dir, tmp_path):
    """After compaction the store holds ONE folded survivor set at its
    own level; further epochs must merge against that floor to the
    one-shot sketch of everything, and a replay of an absorbed epoch
    must stay a no-op (the watermark contract) — the merge-with-floor
    path over a compacted store, end to end."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    pdf = ev.toPandas()
    first, second = pdf.iloc[0::2], pdf.iloc[1::2]
    waves = _write_waves(tmp_path, [first.reset_index(drop=True)])

    kw = dict(
        schema="event_id BIGINT, event_type STRING, value DOUBLE",
        sketch_dir=str(tmp_path / "sketch"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    run_qsketch_catchup(spark, landing_dir=str(waves), **kw)
    compact_qsketch_store(spark, str(tmp_path / "sketch"))

    # second half lands AFTER the compaction; catch-up continues
    import pyarrow as pa
    import pyarrow.parquet as pq

    s2 = second.reset_index(drop=True)
    pq.write_table(pa.Table.from_pandas(s2), waves / "w1.parquet")
    merged = run_qsketch_catchup(spark, landing_dir=str(waves), **kw)
    want = _kept_set(qs_kept(_events_rows(spark, sf_dir)))
    assert _kept_set(merged) == want

    # replaying the ABSORBED epoch's handler is a no-op: the watermark
    # keeps its survivors inside the folded partial only
    handler = make_partial_handler(str(tmp_path / "sketch"), _batch_qsketch_partial)
    handler(spark.createDataFrame(first.reset_index(drop=True)), 0)
    assert _kept_set(merged_qsketch(spark, str(tmp_path / "sketch"))) == want


def _py_qsketch(rows, cap=_QS_K):
    """Independent pure-Python twin of the construction: rows are
    (g, cv, key) triples; returns {g: (level, sorted survivors)}."""
    by_g: dict = {}
    for g, cv, key in rows:
        acc = 0
        for ch in str(key):
            acc = (acc * 31 + ord(ch)) % _P
        h = (_QS_A * acc + _QS_B) % _P
        if h == 0:
            tzc = _QS_JMAX
        else:
            tzc = min((h & -h).bit_length() - 1, _QS_JMAX)
        by_g.setdefault(g, []).append((cv, h, tzc))
    out = {}
    for g, items in by_g.items():
        lvl = 0
        while sum(1 for _, _, t in items if t >= lvl) > cap:
            lvl += 1
        out[g] = (lvl, sorted((cv, h) for cv, h, t in items if t >= lvl))
    return out


def test_qsketch_matches_python_twin_and_bounds(spark):
    """A 20k-row synthetic frame pushes the selection past level 0;
    Spark's survivor sets match the twin exactly, every group stays
    ≤ K survivors, and the estimated quantiles' TRUE rank error stays
    under 4·√(n·2^L) at p ∈ {0.5, 0.9, 0.99}."""
    n = 20_000
    base = spark.range(n).select(
        F.col("id").alias("key"),
        ((F.col("id") * 2654435761) % 99991).alias("cv"),
        (F.col("id") % 4).cast("string").alias("g"),
    )
    rows = qs_rows(base, F.col("key"), F.col("cv"), F.col("g"))
    kept = qs_kept(rows).collect()

    data = [(str(i % 4), (i * 2654435761) % 99991, i) for i in range(n)]
    want = _py_qsketch(data)
    got: dict = {}
    for r in kept:
        got.setdefault(r["g"], (r["lvl"], []))[1].append((r["cv"], r["h"]))
    got = {g: (lvl, sorted(vals)) for g, (lvl, vals) in got.items()}
    assert got == want

    for g, (lvl, survivors) in want.items():
        assert 0 < len(survivors) <= _QS_K
        assert lvl > 0  # 5k rows per group >> K=256: the sampler branch
        vals = sorted(cv for gg, cv, _ in data if gg == g)
        ng = len(vals)
        w = 1 << lvl
        bound = 4.0 * math.sqrt(ng * w)
        svals = sorted(cv for cv, _ in survivors)
        n_est = len(svals) * w
        for p in (0.5, 0.9, 0.99):
            tgt = math.ceil(p * n_est)
            est = next(v for j, v in enumerate(svals) if (j + 1) * w >= tgt)
            true_rank = sum(1 for v in vals if v <= est)
            assert abs(true_rank - math.ceil(p * ng)) <= bound, (g, p)


def test_qsketch_merge_floor_is_required(spark, sf_dir):
    """The partial handler records each epoch's own level and the merge
    re-selects at the max of them — partial levels must never exceed
    the one-shot level (the floor argument's correctness condition)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    partial = _batch_qsketch_partial(ev.filter(F.col("event_id") % 3 == 0))
    one_shot = qs_kept(_events_rows(spark, sf_dir))
    part_lvl = {r["g"]: r["lvl"] for r in partial.select("g", "lvl").distinct().collect()}
    full_lvl = {r["g"]: r["lvl"] for r in one_shot.select("g", "lvl").distinct().collect()}
    for g, lv in part_lvl.items():
        assert lv <= full_lvl[g]
