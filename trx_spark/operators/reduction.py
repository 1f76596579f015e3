"""Time-resolved data reduction: reference interpolation (as-of join) and
scan-point averaging with chi-square statistics.

Semantics mirror the reference implementation exactly
(``trx/dataReduction.py:15-205`` in /root/reference), including its quirks:

- ``interp_references`` (dataReduction.py:15-85): each shot's reference is
  the linear interpolation (by *acquisition index*, not time) between the
  previous and next reference shots. Shots before the first reference clamp
  to the first reference; shots at/after the last reference clamp to the
  last. Reference shots themselves use their *neighbouring* references —
  first ref uses the second, last ref uses the second-last, and (a quirk of
  the reference's loop bounds, dataReduction.py:70-71: the third zip arm is
  ``idx_ref[2:-1]``) the **second-to-last reference keeps its own value**.
  With a single reference, every shot uses it as-is.
- ``averageScanPoints`` (dataReduction.py:88-205): per scan point, noise is
  the population std-dev (numpy ``nanstd`` ddof=0) of the diffs computed
  **before** the every-second-reference subsampling (dataReduction.py:175
  runs before :179); the mean is over the subsampled rows; chi2_0 per repeat
  is ``((diff - mean)/noise)^2 / nQ`` over the subsampled rows; the error of
  the mean divides by sqrt of the **full** per-scan-point row count
  (dataReduction.py:196).

Spark-first design: everything is window functions + one broadcast join of
tiny per-group reference summaries — no UDFs, fully codegen-able, and the
only shuffles are the window partitioning on the group key (at 100 TB:
partition by run; each run's shots are one window partition).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interp_references(
    df: DataFrame,
    *,
    group: list[str] | None = None,
    idx: str = "idx",
    is_ref: str = "is_ref",
    value: str = "i",
    out: str = "iref",
) -> DataFrame:
    """Attach the interpolated reference value for every row.

    ``df`` must have one row per (group, idx) with a boolean ``is_ref``
    column; ``idx`` orders acquisition within each group. Adds ``out``.

    cf. trx/dataReduction.py:15-85 (numpy loop → two window frames + a
    broadcast join of per-group reference edge summaries).
    """
    group = group or []
    w = Window.partitionBy(*group).orderBy(idx) if group else Window.orderBy(idx)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    # "next ref" via the REVERSED ordering with the same cumulative
    # self-excluding frame: Spark evaluates last(...ignorenulls) over
    # (unboundedPreceding, -1) incrementally in O(n), whereas a
    # (1, unboundedFollowing) frame is recomputed per row — O(n²) per
    # partition (measured: 364 s vs 2 s on a 100k-row partition).
    w_rev = (
        Window.partitionBy(*group).orderBy(F.col(idx).desc())
        if group
        else Window.orderBy(F.col(idx).desc())
    )
    w_next = w_rev.rowsBetween(Window.unboundedPreceding, -1)

    ref_idx = F.when(F.col(is_ref), F.col(idx))
    ref_val = F.when(F.col(is_ref), F.col(value))

    # Self-excluding frames give, for ref rows, the *neighbouring* refs —
    # and for non-ref rows the same prev/next refs a (-inf, 0] frame would.
    with_neighbors = (
        df.withColumn("_prev_ref_idx", F.last(ref_idx, ignorenulls=True).over(w_prev))
        .withColumn("_prev_ref_val", F.last(ref_val, ignorenulls=True).over(w_prev))
        .withColumn("_next_ref_idx", F.last(ref_idx, ignorenulls=True).over(w_next))
        .withColumn("_next_ref_val", F.last(ref_val, ignorenulls=True).over(w_next))
        .withColumn(
            "_ref_rank",
            F.sum(F.when(F.col(is_ref), F.lit(1)).otherwise(F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )

    # Tiny per-group summary of the reference ladder's edges (≤1 row/group,
    # broadcast back — no extra shuffle of the big side).
    refs = df.filter(F.col(is_ref))
    rw = Window.partitionBy(*group).orderBy(idx) if group else Window.orderBy(idx)
    ref_edges = (
        refs.withColumn("_rn", F.row_number().over(rw))
        .withColumn("_n", F.count(F.lit(1)).over(rw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .groupBy(*group)
        .agg(
            F.max("_n").alias("_n_refs"),
            F.max(F.when(F.col("_rn") == 1, F.col(value))).alias("_first_ref_val"),
            F.max(F.when(F.col("_rn") == 2, F.col(value))).alias("_second_ref_val"),
            F.max(F.when(F.col("_rn") == F.col("_n"), F.col(value))).alias("_last_ref_val"),
            F.max(F.when(F.col("_rn") == F.col("_n") - 1, F.col(value))).alias("_secondlast_ref_val"),
        )
    )

    joined = (
        with_neighbors.join(F.broadcast(ref_edges), on=group, how="left")
        if group
        else with_neighbors.crossJoin(F.broadcast(ref_edges))
    )

    # slope-first form matches the reference's fp evaluation order
    # (dataReduction.py:58-59: slope = Δref/Δidx; ref_before + slope·Δ).
    slope = (F.col("_next_ref_val") - F.col("_prev_ref_val")) / (
        F.col("_next_ref_idx") - F.col("_prev_ref_idx")
    )
    interp = F.col("_prev_ref_val") + slope * (F.col(idx) - F.col("_prev_ref_idx"))

    iref = (
        F.when(F.col("_n_refs") == 1, F.col("_first_ref_val"))
        .when(
            F.col(is_ref),
            # _ref_rank counts refs up to and including self → self's rank.
            F.when(F.col("_ref_rank") == 1, F.col("_second_ref_val"))
            .when(F.col("_ref_rank") == F.col("_n_refs"), F.col("_secondlast_ref_val"))
            .when(F.col("_ref_rank") == F.col("_n_refs") - 1, F.col(value))
            .otherwise(interp),
        )
        .when(F.col("_prev_ref_idx").isNull(), F.col("_first_ref_val"))
        .when(F.col("_next_ref_idx").isNull(), F.col("_last_ref_val"))
        .otherwise(interp)
    )

    drop = [
        "_prev_ref_idx",
        "_prev_ref_val",
        "_next_ref_idx",
        "_next_ref_val",
        "_ref_rank",
        "_n_refs",
        "_first_ref_val",
        "_second_ref_val",
        "_last_ref_val",
        "_secondlast_ref_val",
    ]
    return joined.withColumn(out, iref).drop(*drop)


def time_resolved_diff(
    df: DataFrame,
    *,
    group: list[str] | None = None,
    idx: str = "idx",
    is_ref: str = "is_ref",
    value: str = "i",
    use_ratio: bool = False,
    lpower: str | None = None,
    out: str = "diff",
) -> DataFrame:
    """diff = value − interp_ref (or ratio; optional laser-power norm).

    cf. trx/dataReduction.py:144-157 (useRatio / lpower branches).
    """
    res = interp_references(df, group=group, idx=idx, is_ref=is_ref, value=value, out="_iref")
    diff: Column = (F.col(value) / F.col("_iref")) if use_ratio else (F.col(value) - F.col("_iref"))
    if lpower is not None:
        diff = ((diff - 1) / F.col(lpower) + 1) if use_ratio else (diff / F.col(lpower))
    return res.withColumn(out, diff).withColumnRenamed("_iref", "iref")


def _mark_subsample(
    df: DataFrame,
    *,
    keys: list[str],
    ref_keys: list[str],
    idx: str,
    is_ref: str,
) -> DataFrame:
    """Row numbers + the every-second-reference use flag (W2).

    The reference subsamples a scan point only when its shot set IS the
    entire reference set — ``np.all(shot_idx == isRef)``
    (trx/dataReduction.py:177): every row of the scan point is a ref AND
    the scan point holds every ref of the ref-set grain (``ref_keys`` —
    the run key, plus the q axis for curve layouts). "All rows are refs"
    alone is not enough: if references ever spanned two scan values,
    neither scan point would equal the full reference set and the
    reference subsamples neither. The second condition needs the
    per-grain total ref count — a tiny agg broadcast back, not a global
    window."""
    w_scan = Window.partitionBy(*keys).orderBy(idx)
    w_full = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ref_int = F.col(is_ref).cast("int")
    totals = (
        df.groupBy(*ref_keys).agg(F.sum(ref_int).alias("_grp_refs"))
        if ref_keys
        else df.agg(F.sum(ref_int).alias("_grp_refs"))
    )
    if ref_keys:
        # NULL-SAFE equi-join: groupBy above places NULL-keyed rows in
        # their own group, so the join back must match them too (a
        # plain equi-join silently drops every shot whose group key is
        # NULL — e.g. a log row with a missing extra_group value)
        t = totals
        for k in ref_keys:
            t = t.withColumnRenamed(k, f"_t_{k}")
        cond = functools.reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.col(f"_t_{k}")) for k in ref_keys],
        )
        joined = df.join(F.broadcast(t), cond).drop(*[f"_t_{k}" for k in ref_keys])
    else:
        joined = df.crossJoin(F.broadcast(totals))
    return (
        joined.withColumn("_rn", F.row_number().over(w_scan))
        .withColumn(
            "_all_ref",
            F.min(ref_int).over(w_full).cast("boolean")
            & (F.sum(ref_int).over(w_full) == F.col("_grp_refs")),
        )
        .withColumn("_use", (~F.col("_all_ref")) | (F.col("_rn") % 2 == 1))
        .drop("_grp_refs")
    )


def average_scan_points(
    df: DataFrame,
    *,
    scan: str = "scan",
    group: list[str] | None = None,
    idx: str = "idx",
    is_ref: str = "is_ref",
    diff: str = "diff",
    n_q: int = 1,
    exact: bool = False,
) -> DataFrame:
    """Per-scan-point aggregation with the reference's exact semantics.

    Input: one row per shot with a precomputed ``diff`` (scalar data,
    n_q=1; for curve data run on the exploded layout and add q to group).
    Output per (group, scan): n_shots, mean_diff, noise (population σ),
    err_of_mean = noise/sqrt(n_shots_full), mean/max chi2_0.

    cf. trx/dataReduction.py:159-196. ONE window pass + ONE groupBy:
    chi2 comes out of the same aggregation via the algebraic identity
    Σ(d−m)² = Σd² − 2mΣd + nm², and max z² via convexity (the max of a
    convex function over a set is at its min or max element), so the
    shot table is scanned/sorted exactly once. (Round 1 joined the
    means back and re-aggregated — a second full window stack over the
    shots; measured 3.4 s → 2.1 s at sf0.1.) The only shuffle is on
    (group, scan), whose post-agg cardinality is tiny at any scale.

    Numerics note: the identity form cancels catastrophically only when
    |mean| ≫ stddev; diffs are difference signals centered near zero,
    where it agrees with the two-pass form to ~1 ulp (golden-tested at
    rtol 1e-9).
    """
    from trx_spark.exact import davg, dstddev_pop, dsum

    group = group or []
    keys = [*group, scan]

    # Subsample decision: per-scan-point row numbers (acquisition order)
    # + the "scan point == entire reference set" test (W2, see
    # _mark_subsample). When it holds, average rows 1,3,5,… only.
    enriched = _mark_subsample(df, keys=keys, ref_keys=group, idx=idx, is_ref=is_ref)

    used = F.when(F.col("_use"), F.col(diff))
    mean_fn = davg if exact else F.avg
    std_fn = dstddev_pop if exact else F.stddev_pop
    sum_fn = dsum if exact else F.sum
    # noise over the FULL scan point (dataReduction.py:175 runs before the
    # [::2] subsampling at :179); mean over the subsampled rows.
    agg = enriched.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_shots"),
        F.sum(F.col("_use").cast("int")).alias("n_used"),
        mean_fn(used).alias("mean_diff"),
        std_fn(F.col(diff)).alias("noise"),
        sum_fn(used).alias("_s1"),
        sum_fn(used * F.col(diff)).alias("_s2"),
        F.max(used).alias("_dmax"),
        F.min(used).alias("_dmin"),
    )
    m = F.col("mean_diff")
    noise = F.col("noise")
    nq = F.lit(float(n_q))
    ss = (F.col("_s2") - (F.lit(2.0) * m) * F.col("_s1")) + (
        F.col("n_used").cast("double") * (m * m)
    )
    zmax = (F.col("_dmax") - m) / noise
    zmin = (F.col("_dmin") - m) / noise
    return (
        agg.withColumn("err_of_mean", noise / F.sqrt(F.col("n_shots")))
        .withColumn(
            "mean_chi2_0",
            ((ss / (noise * noise)) / nq) / F.col("n_used").cast("double"),
        )
        .withColumn("max_chi2_0", F.greatest(zmax * zmax, zmin * zmin) / nq)
        .drop("_s1", "_s2", "_dmax", "_dmin")
    )


def ref_average(
    shots: DataFrame,
    *,
    group: list[str] | None = None,
    is_ref: str = "is_ref",
    value: str = "i",
    out: str = "ref_avg",
    exact: bool = False,
) -> DataFrame:
    """A9: the average of the REFERENCE shots per group (per q for curve
    layouts) — ``ref_average = nanmean(data[isRef], axis=0)``
    (trx/dataReduction.py:137). A tiny agg: one row per (run, q)."""
    from trx_spark.exact import davg

    group = group or []
    mean_fn = davg if exact else F.avg
    agg = mean_fn(F.col(value)).alias(out)
    filtered = shots.filter(F.col(is_ref))
    return filtered.groupBy(*group).agg(agg) if group else filtered.agg(agg)


def diffs_plus_ref(
    scan_points: DataFrame,
    shots: DataFrame,
    *,
    group: list[str] | None = None,
    is_ref: str = "is_ref",
    value: str = "i",
    diff: str = "mean_diff",
    out: str = "diff_plus_ref",
    exact: bool = False,
) -> DataFrame:
    """F-arr5: add the reference average back onto the averaged diffs —
    ``diffs_plus_ref = diffs + ref_average`` (trx/dataReduction.py:199,
    re-used after filtering at trx/filters.py:47 and written by the S11
    sink as diff_plus_ref_av_matrix, trx/dataReduction.py:256-257).

    ``scan_points`` is the per-(group, scan) output of
    :func:`average_scan_points`; ``shots`` is the per-shot table the
    reference average is computed from. The ref average is ≤1 row per
    group → broadcast join, no reshuffle of either side."""
    group = group or []
    ref = ref_average(
        shots, group=group, is_ref=is_ref, value=value, out="ref_avg", exact=exact
    )
    # LEFT join: a group with no reference shots keeps its scan points
    # with a null add-back (the reference propagates NaN there,
    # dataReduction.py:199) — an inner join would silently drop them
    joined = (
        scan_points.join(F.broadcast(ref), on=group, how="left")
        if group
        else scan_points.crossJoin(F.broadcast(ref))
    )
    return joined.withColumn(out, F.col(diff) + F.col("ref_avg"))


def chi2_0_per_shot(
    df: DataFrame,
    *,
    scan: str = "scan",
    group: list[str] | None = None,
    idx: str = "idx",
    is_ref: str = "is_ref",
    diff: str = "diff",
    n_q: int = 1,
    exact: bool = False,
) -> DataFrame:
    """Per-shot chi2_0 (trx/dataReduction.py:187-193) as analytic windows —
    keeps every row, adding ``chi2_0`` (NULL for rows dropped by the
    every-second-reference rule, which the reference never scores),
    plus ``noise`` and ``mean_diff`` context columns."""
    from trx_spark.exact import SCALE, fint

    group = group or []
    keys = [*group, scan]
    w_full = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def wsum(col):
        if exact:
            # fint is THE fixed-point addend — the parity argument
            # rests on this tree staying identical everywhere
            return F.sum(fint(col)).over(w_full).cast("double") / F.lit(SCALE)
        return F.sum(col).over(w_full)

    d = F.col(diff)
    enriched = _mark_subsample(df, keys=keys, ref_keys=group, idx=idx, is_ref=is_ref)
    n = F.count(d).over(w_full)
    s1 = wsum(d)
    s2 = wsum(d * d)
    noise = F.sqrt(F.greatest((s2 - s1 * s1 / n) / n, F.lit(0.0)))
    used = F.when(F.col("_use"), d)
    mean_used = wsum(used) / F.count(used).over(w_full)
    enriched = enriched.withColumn("_noise", noise).withColumn("_mean_used", mean_used)
    z = (d - F.col("_mean_used")) / F.col("_noise")
    # z·z, not pow(z,2): pow is not guaranteed correctly rounded across
    # engines; multiplication is.
    chi2 = F.when(F.col("_use"), z * z / n_q)
    return (
        enriched.withColumn("chi2_0", chi2)
        .withColumn("noise", F.col("_noise"))
        .withColumn("mean_diff", F.col("_mean_used"))
        .withColumnRenamed("_use", "used_in_avg")
        .drop("_rn", "_noise", "_all_ref", "_mean_used")
    )


def chi2_0_per_shot_curves(
    df: DataFrame,
    *,
    shot: str = "file",
    scan: str = "scan",
    q: str = "q_idx",
    group: list[str] | None = None,
    idx: str = "idx",
    is_ref: str = "is_ref",
    diff: str = "diff",
    exact: bool = False,
) -> DataFrame:
    """Per-shot chi2_0 for CURVE data (the reference's true shape):
    chi2_0 = Σ_q ((diff − mean_diff_q)/noise_q)² / nQ per shot
    (trx/dataReduction.py:187-193 with the sum over the q axis at :190).

    Input is the exploded narrow layout — one row per (shot, q). Stats
    are per (group, scan, q) — ``group`` is the run key, so each run's
    statistics window is an independent partition; the q-sum is a
    groupBy(shot). Subsampling (W2) applies per shot, which on
    rectangular curves equals the per-(scan,q) row-number rule used
    here."""
    from trx_spark.exact import SCALE, fint

    group = group or []
    keys = [*group, scan, q]
    w_full = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def wsum(col):
        if exact:
            return F.sum(fint(col)).over(w_full).cast("double") / F.lit(SCALE)
        return F.sum(col).over(w_full)

    d = F.col(diff)
    enriched = _mark_subsample(df, keys=keys, ref_keys=[*group, q], idx=idx, is_ref=is_ref)
    n = F.count(d).over(w_full)
    s1 = wsum(d)
    s2 = wsum(d * d)
    noise = F.sqrt(F.greatest((s2 - s1 * s1 / n) / n, F.lit(0.0)))
    used = F.when(F.col("_use"), d)
    mean_used = wsum(used) / F.count(used).over(w_full)
    z = (d - mean_used) / noise
    per_row = enriched.withColumn("_z2", z * z)
    chi2_sum = (
        (F.sum(fint(F.col("_z2"))).cast("double") / F.lit(SCALE)) if exact else F.sum("_z2")
    )
    # the q-sum groups by (group, shot, scan) — shot identifiers are
    # only unique WITHIN a run (per-run folders reuse img_0001 etc.),
    # so omitting the run key would blend colliding shots across runs
    return (
        per_row.filter(F.col("_use"))
        .groupBy(*group, shot, scan)
        .agg(
            (chi2_sum / F.count(F.lit(1))).alias("chi2_0"),
            F.count(F.lit(1)).alias("n_q"),
        )
    )
