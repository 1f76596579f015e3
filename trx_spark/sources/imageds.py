"""First-class Spark data source for detector/web image assets
(PySpark 4 Python Data Source API — the idiomatic alternative to the
``binaryFile`` + ``mapInPandas`` composition in
:mod:`trx_spark.operators.multimodal`):

    register_image_datasource(spark)
    px = (spark.read.format("detector_image")
          .option("path", "/data/run42/*.edf*").load())

Reads every real codec the engine has (EDF stacks, CBF, TIFF, mar345,
MarCCD, Bruker, ADSC, PNG, JPEG, MJPEG-AVI via ``codec="avi"``;
transparent ``.gz``) straight into the pixel-row schema, one Spark
input partition per FILE (a 10k-frame beamline folder parallelizes
across the cluster with no manual glob fan-out).

Filter pushdown (``DataSourceReader.pushFilters``, Spark 4.1):

* predicates on ``file`` (equality, IN, prefix/suffix/contains) prune
  PARTITIONS — pruned files are never opened, the Python-source twin
  of parquet partition pruning;
* predicates on ``frame`` (equality, IN, ranges) are applied at the
  CONTAINER level for multi-frame formats — a skipped AVI/EDF frame
  costs a chunk seek, never an entropy decode (the decode_video
  sampling contract, surfaced through the planner).

Worker imports: the reader's ``read()`` runs in executor Python
workers, which must be able to ``import trx_spark``.
:func:`register_image_datasource` ships the package as a zip via
``SparkContext.addPyFile`` — the same mechanism as ``--py-files`` on a
real cluster — so registration alone makes the source usable from any
driver cwd.

Scale notes: ``partitions()`` lists the glob driver-side (``glob`` on
a POSIX path; on an object store substitute the FileSystem listing —
the partition-per-file shape is unchanged). Rows stream out as Arrow
RecordBatches (one per frame), never a per-row Python loop.
"""

from __future__ import annotations

import glob as _glob
import os
import tempfile
import zipfile

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

PIXEL_SCHEMA = "file string, frame int, y int, x int, intensity double"


def _matches_file(filters, fname: str) -> bool:
    for f in filters:
        if isinstance(f, EqualTo) and fname != f.value:
            return False
        if isinstance(f, In) and fname not in f.value:
            return False
        if isinstance(f, StringStartsWith) and not fname.startswith(f.value):
            return False
        if isinstance(f, StringEndsWith) and not fname.endswith(f.value):
            return False
        if isinstance(f, StringContains) and f.value not in fname:
            return False
    return True


def _matches_frame(filters, idx: int) -> bool:
    for f in filters:
        if isinstance(f, EqualTo) and idx != f.value:
            return False
        if isinstance(f, In) and idx not in f.value:
            return False
        if isinstance(f, LessThan) and not idx < f.value:
            return False
        if isinstance(f, LessThanOrEqual) and not idx <= f.value:
            return False
        if isinstance(f, GreaterThan) and not idx > f.value:
            return False
        if isinstance(f, GreaterThanOrEqual) and not idx >= f.value:
            return False
    return True


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class DetectorImageReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("detector_image requires .option('path', <glob>)")
        self.path = path
        self.codec = options.get("codec", "auto")
        self.file_filters: list = []
        self.frame_filters: list = []

    def pushFilters(self, filters):
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("file",) and isinstance(
                f,
                (EqualTo, In, StringStartsWith, StringEndsWith, StringContains),
            ):
                self.file_filters.append(f)
            elif attr == ("frame",) and isinstance(
                f,
                (EqualTo, In, LessThan, LessThanOrEqual, GreaterThan,
                 GreaterThanOrEqual),
            ):
                self.frame_filters.append(f)
            elif isinstance(f, IsNotNull) and attr in (("file",), ("frame",)):
                pass  # file/frame are never null in this source
            else:
                yield f  # unsupported → Spark evaluates post-scan

    def partitions(self):
        files = sorted(_glob.glob(self.path))
        files = [f for f in files if _matches_file(self.file_filters, f)]
        # empty scans are legal: one no-op partition keeps the contract
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        import numpy as np
        import pyarrow as pa

        from trx_spark.operators.multimodal import (
            decode_any,
            decode_avi_frames,
            decode_edf_frames,
            decode_jpeg,
            maybe_gunzip,
            png_luma,
            sniff_codec,
        )

        with open(partition.path, "rb") as fh:
            buf = maybe_gunzip(fh.read())
        fmt = sniff_codec(buf) if self.codec == "auto" else self.codec
        if fmt == "avi":
            blobs, _ = decode_avi_frames(buf)
            frames = [
                (k, None if not _matches_frame(self.frame_filters, k) else blobs[k])
                for k in range(len(blobs))
            ]
            decoded = [
                (k, png_luma(decode_jpeg(b)[0]))
                for k, b in frames
                if b is not None  # skipped frames: no entropy decode
            ]
        elif fmt == "edf":
            stack = decode_edf_frames(buf)
            decoded = [
                (k, img)
                for k, (img, _hdr) in enumerate(stack)
                if _matches_frame(self.frame_filters, k)
            ]
        else:
            if not _matches_frame(self.frame_filters, 0):
                return
            img, _hdr = decode_any(buf)
            decoded = [(0, png_luma(img) if img.ndim == 3 else img)]
        for k, img in decoded:
            iy, ix = np.mgrid[0 : img.shape[0], 0 : img.shape[1]]
            yield pa.RecordBatch.from_pydict(
                {
                    "file": [partition.path] * img.size,
                    "frame": np.full(img.size, k, dtype=np.int32),
                    "y": iy.ravel().astype(np.int32),
                    "x": ix.ravel().astype(np.int32),
                    "intensity": img.ravel().astype(np.float64),
                }
            )


class DetectorImageDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "detector_image"

    def schema(self) -> str:
        return PIXEL_SCHEMA

    def reader(self, schema) -> DetectorImageReader:
        return DetectorImageReader(self.options)


def _package_zip() -> str:
    """Zip the installed trx_spark package to a temp file (cached per
    process) — the addPyFile payload that makes executor Python
    workers able to import the codec module."""
    import trx_spark

    pkg_dir = os.path.dirname(os.path.abspath(trx_spark.__file__))
    out = os.path.join(
        tempfile.gettempdir(), f"trx_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(out):
        with zipfile.ZipFile(out, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "trx_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    return out


_SHIPPED_CONTEXTS: set = set()  # applicationIds already carrying the zip


def ensure_executor_package(spark) -> None:
    """Ship the trx_spark package zip to this session's executors
    (``addPyFile`` — the --py-files path on a real cluster), so worker
    kernels may ``import trx_spark`` regardless of the driver cwd.
    Idempotent per SparkContext (memoized on the applicationId — unique
    per context, unlike ``id()``, which CPython recycles after a
    context restart; re-adding the same path per call would only spam
    addPyFile warnings)."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED_CONTEXTS:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED_CONTEXTS.add(app)


def register_image_datasource(spark) -> None:
    """Register the ``detector_image`` format on this session, enable
    Python-source filter pushdown (off by default in 4.1), and ship
    the package to executors (``addPyFile`` — the --py-files path)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ensure_executor_package(spark)
    spark.dataSource.register(DetectorImageDataSource)
