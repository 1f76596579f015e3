"""ESRF SPEC-file reader (SURVEY S8; trx/utils/spec.py:23-86).

The reference wraps PyMca's SpecFile; the FORMAT itself is public
plain ASCII (the classic SPEC data-file convention):

* file header: ``#F path``, ``#E epoch``, ``#D date``, and motor-name
  lines ``#O0 name  name ...`` (double-space separated, continued in
  ``#O1``, ``#O2``, ...);
* each scan: ``#S <number> <command>``, its own ``#D`` date, motor
  POSITIONS in ``#P0``/``#P1``/... (parallel to the ``#O`` names),
  ``#N <ncols>``, column labels ``#L a  b  c`` (double-space
  separated — labels may contain single spaces), then whitespace
  data rows until the next ``#S``.

Spark-first split of work, same as the log readers: one driver-side
text pass collects ONLY the ``#``-header lines (scan numbers, labels,
motor names/positions — tiny), while the data rows are read
distributed with the deterministic file-order window
(``_metadata.file_block_start`` + in-split monotonic id) and assigned
to their scan by a running count of ``#S`` markers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.functions.strings import ws_parts

_LABEL_SEP = re.compile(r"\s{2,}")


@dataclass
class SpecScanHeader:
    number: int
    command: str
    labels: list[str] = field(default_factory=list)
    motors: dict[str, float] = field(default_factory=dict)
    date: str | None = None


def spec_scan_headers(path: str) -> list[SpecScanHeader]:
    """Driver-side header pass: every scan's number/command/labels and
    its motor-name→position map (``#O`` file-header names zipped with
    the scan's ``#P`` positions). Only ``#`` lines are parsed; data
    volume never hits the driver."""
    motor_names: list[str] = []
    scans: list[SpecScanHeader] = []
    cur: SpecScanHeader | None = None
    positions: list[float] = []

    def close() -> None:
        if cur is not None:
            cur.motors = dict(zip(motor_names, positions))
            scans.append(cur)

    with open(path) as f:
        for line in f:
            s = line.rstrip("\n")
            if s.startswith("#O"):
                motor_names.extend(
                    x for x in _LABEL_SEP.split(s.split(" ", 1)[1].strip()) if x
                )
            elif s.startswith("#S "):
                close()
                num_str, _, cmd = s[3:].strip().partition(" ")
                cur = SpecScanHeader(number=int(num_str), command=cmd.strip())
                positions = []
            elif cur is not None and s.startswith("#P"):
                positions.extend(
                    float(x) for x in s.split(" ", 1)[1].split()
                )
            elif cur is not None and s.startswith("#L "):
                cur.labels = [
                    x for x in _LABEL_SEP.split(s[3:].strip()) if x
                ]
            elif cur is not None and s.startswith("#D "):
                cur.date = s[3:].strip()
    close()
    if not scans:
        raise ValueError(f"no '#S' scan found in {path}")
    return scans


def spec_motors(spark: SparkSession, path: str) -> DataFrame:
    """(scan_no, motor, position) — the reference's per-scan motor
    table (``allmotors``/``allmotorpos``, trx/utils/spec.py:33-43),
    sorted by motor name like its np.argsort display order (O6)."""
    rows = [
        (h.number, m, p)
        for h in spec_scan_headers(path)
        for m, p in sorted(h.motors.items())
    ]
    return spark.createDataFrame(
        rows, "scan_no BIGINT, motor STRING, position DOUBLE"
    )


def read_spec_scan(
    spark: SparkSession, path: str, scan: int | None = None, *, index: bool = False
) -> DataFrame:
    """One scan's data block as a DataFrame with the scan's ``#L``
    labels as DOUBLE columns (SPEC data is numeric). ``scan=None``
    reads the LAST scan (the reference's common interactive default —
    the freshest acquisition). The scan assignment is a running count
    of ``#S`` markers over the deterministic file-line order, so the
    data block read stays distributed. ``index=True`` adds ``_idx``
    (0-based file-order row number within the scan) for positional
    consumers (the reference's ``y[normalize]`` indexing)."""
    headers = spec_scan_headers(path)
    by_no = {h.number: h for h in headers}
    if scan is None:
        header = headers[-1]
    elif scan in by_no:
        header = by_no[scan]
    else:
        raise ValueError(
            f"scan {scan} not in {path} (has {sorted(by_no)})"
        )
    ordinal = headers.index(header) + 1  # nth #S marker in file order

    text = spark.read.text(path)
    # per-file window: the #S running count is a PER-FILE property, so
    # partitioning by file_path is both semantically right (each file's
    # marker count restarts at 0) and scale-safe — a glob of many SPEC
    # files fans out one window task per file instead of funnelling
    # every line through a single unpartitioned-window task
    w = Window.partitionBy(F.col("_metadata.file_path")).orderBy(
        F.col("_metadata.file_block_start"),
        F.monotonically_increasing_id(),
    )
    marked = text.withColumn(
        "_scan_ord",
        F.sum(
            F.when(F.col("value").startswith("#S "), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    rows = marked.filter(
        (F.col("_scan_ord") == ordinal)
        & ~F.col("value").startswith("#")
        & (F.trim("value") != "")
    )
    parts = ws_parts("value")
    cols = [
        parts.getItem(i).cast("double").alias(n)
        for i, n in enumerate(header.labels)
    ]
    if index:
        cols.insert(0, (F.row_number().over(w) - F.lit(1)).cast("long").alias("_idx"))
    return rows.select(*cols)
