"""Reference-shaped façade: the three entry points a marcocamma/trx
user calls, with the reference's names and knob vocabulary, mapped
onto this engine's Spark-first pipelines. A migration is
``trx.azav.doFolder(folder, ...)`` → ``compat.doFolder(spark, folder,
geometry, ...)`` with the same keyword meanings; everything returns
lazy DataFrames (collect/sink when ready) instead of the reference's
eager numpy containers.

Signature sources: ``doFolder`` ← trx/azav.py:230-290,
``doFolder_dataRed`` ← trx/id9.py:226-303, ``doFolder`` (online loop)
← trx/id9.py:305-335. The poni-file geometry init (trx/azav.py:96-129)
is replaced by an explicit per-pixel geometry DataFrame
(y, x, q, chi, solid_angle, pol_corr) — built once per detector and
broadcast (SURVEY U8); the online loop is Structured Streaming
(trx_spark/streaming/incremental.py) rather than a sleep-poll.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.operators import masks as _masks
from trx_spark.operators.multimodal import decode_image, read_binary_assets
from trx_spark.pipeline import (
    IntegrationConfig,
    ReductionConfig,
    data_reduction,
    integrate_folder,
)


def _as_mask(mask: str | Column | None) -> Column | None:
    """Reference masks arrive as DSL strings ('x>400;y<100' etc.,
    trx/mask.py maskBorder/interpretMask); accept those or a ready
    Column predicate (True = excluded)."""
    if mask is None or isinstance(mask, Column):
        return mask
    return _masks.mask_from_string(mask)


def doFolder(
    spark: SparkSession,
    folder: str,
    geometry: DataFrame,
    *,
    files: str = "*.edf*",
    nQ: int = 1500,
    mask: str | Column | None = None,
    dark: float = 0.0,
    qlims: tuple[float, float] | None = None,
    monitor: tuple[float, float] | None = None,
    dezinger: float | None = None,
) -> DataFrame:
    """trx/azav.py:230 ``doFolder``: folder of detector images →
    per-image I(q) curves. ``files`` is the same glob (gzip-wrapped
    EDF/CBF/TIFF decode transparently via the magic-byte sniffer);
    ``nQ`` → radial bins, ``qlims`` → (q_min, q_max), ``monitor`` →
    the q-window normalization, ``dezinger`` → the percentile knob.

    Returns the lazy curve bank (file, q_bin, q, i, err, ...); persist
    it with sources.sinks.save_with_config for the reference's
    azav.h5-style cached store (F7 config-hash invalidation)."""
    q_min, q_max = qlims if qlims is not None else (0.0, 10.0)
    assets = read_binary_assets(spark, f"{folder.rstrip('/')}/{files}", "image")
    pixels = decode_image(assets, codec="auto").withColumn(
        "file", F.element_at(F.split(F.col("file"), "/"), -1)
    )
    cfg = IntegrationConfig(
        q_min=q_min,
        q_max=q_max,
        n_bins=nQ,
        dark=dark,
        dezinger_percentile=dezinger,
        monitor_q_window=monitor,
        mask=_as_mask(mask),
    )
    return integrate_folder(pixels, geometry, cfg)


# the id9 variant is the same integration with the beamline log read
# alongside (trx/id9.py:191-223 doFolder_azav) — here the log read is
# sources.logfile.read_id9_log and the join happens in dataRed
doFolder_azav = doFolder


def doFolder_dataRed(
    curves: DataFrame,
    log: DataFrame,
    *,
    reference: str | float = "min",
    chi2_threshold: float | None = None,
    extra_group: tuple[str, ...] = (),
    split_angle: bool = False,
) -> dict[str, DataFrame]:
    """trx/id9.py:226 ``doFolder_dataRed``: curve bank ⨝ log →
    reference pick (min/max/value, P9) → as-of interpolation (J2) →
    diffs → per-delay averages with χ² (A4-A7) → non-destructive χ²
    filter (F1) → filtered re-aggregation (F6).

    ``split_angle`` mirrors trx/id9.py:246-263: the reference loops
    ``doFolder_dataRed`` once per unique ``azav.log.angle`` with an
    index mask and stacks the results; here the same semantics is one
    declarative pass with ``angle`` added to the group keys (SURVEY E2)
    — every reference pick, interpolation window, and per-delay
    aggregate partitions by angle, so angles never mix and the engine
    still runs a single shuffle instead of a per-angle driver loop.

    Returns {'shots', 'scan', 'scan_filtered'} lazy frames — the
    reference's data.red container split into its three views (with
    ``split_angle`` each carries the ``angle`` column, the relational
    form of the reference's DataStorage(angles=…, diffs=[…]) stack).
    For a multi-run batch pass the run key in ``extra_group`` (every
    window then partitions by it; see pipeline.data_reduction scale
    note)."""
    groups = list(extra_group)
    if split_angle:
        if "angle" not in log.columns:
            raise ValueError(
                "split_angle=True requires an 'angle' column in the log "
                "(the reference reads azav.log.angle, trx/id9.py:247)"
            )
        if "angle" not in groups:
            groups.append("angle")
    cfg = ReductionConfig(
        reference=reference,
        chi2_threshold=chi2_threshold,
        extra_group=groups,
    )
    return data_reduction(curves, log, cfg)


def doFolder_online(
    spark: SparkSession,
    *,
    poll_seconds: float | None = 30.0,
    **stream_kw,
):
    """trx/id9.py:305 ``doFolder`` online loop (re-scan every 30 s,
    retryMax give-up): expressed as Structured Streaming — the
    landing dir is a file stream, the 30 s cadence the processingTime
    trigger (``poll_seconds=None`` = availableNow catch-up), and read
    retries/atomicity are the stream source's file-completion
    semantics instead of sleep-and-retry. Delegates to
    streaming.incremental.incremental_pipeline (same keywords)."""
    from trx_spark.streaming.incremental import incremental_pipeline

    return incremental_pipeline(spark, poll_seconds=poll_seconds, **stream_kw)
