"""Multimodal (image/audio/video) column plumbing.

Binary payloads travel as opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The reference's detector format
(EDF, read there via fabio, trx/azav.py:29-47) is decoded for REAL by a
pure-numpy codec (:func:`decode_edf` — the public ESRF format is an
ASCII header + raw pixel block, no library needed). Formats whose codec
libraries are genuinely absent here (PIL/ffmpeg for web corpora) use
the deterministic fake (``codec="fake"``, seeded by content hash) with
the real schema, partitioning and batch shape.

Scale design: ``spark.read.format("binaryFile")`` gives (path, content)
with pushdown on path globs; one input row fans out to H·W pixel rows
inside mapInPandas (no driver involvement, no shuffle); downstream is
the integrate_1d groupBy.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PIXEL_SCHEMA = "file string, y int, x int, intensity double"
IMAGE_META_SCHEMA = (
    "path string, modality string, n_bytes long, content_sha256 string"
)

# ---------------------------------------------------------------------
# EDF codec (ESRF Data Format — the reference's detector-image format,
# read there via fabio, trx/azav.py:29-34). The format is public and
# simple: an ASCII '{ key = value ; ... }' header padded with spaces to
# a 512-byte multiple, then the raw pixel block — decodable with pure
# numpy, no external codec library.
# ---------------------------------------------------------------------

_EDF_DTYPES = {
    "UnsignedByte": "u1",
    "SignedByte": "i1",
    "UnsignedShort": "u2",
    "SignedShort": "i2",
    "UnsignedInteger": "u4",
    "SignedInteger": "i4",
    "UnsignedLong": "u4",
    "SignedLong": "i4",
    "Float": "f4",
    "FloatValue": "f4",
    "DoubleValue": "f8",
}


def decode_edf(buf: bytes) -> tuple[np.ndarray, dict]:
    """Decode one EDF blob → (2-D array, header dict).

    Header fields honored: Dim_1 (fast axis / columns), Dim_2 (rows),
    DataType, ByteOrder (LowByteFirst | HighByteFirst). The pixel block
    starts right after the ``}\\n`` terminator of the (space-padded)
    header."""
    end = buf.index(b"}")
    header = buf[: end + 1].decode("ascii", "replace")
    fields: dict[str, str] = {}
    for line in header.strip("{} \r\n").split(";"):
        if "=" in line:
            k, v = line.split("=", 1)
            fields[k.strip()] = v.strip()
    nx, ny = int(fields["Dim_1"]), int(fields["Dim_2"])
    dt = np.dtype(_EDF_DTYPES[fields.get("DataType", "UnsignedShort")])
    order = "<" if fields.get("ByteOrder", "LowByteFirst") == "LowByteFirst" else ">"
    dt = dt.newbyteorder(order)
    start = buf.index(b"}\n") + 2
    img = np.frombuffer(buf, dtype=dt, count=nx * ny, offset=start)
    return img.reshape(ny, nx), fields


def encode_edf(
    img: np.ndarray, *, byte_order: str = "LowByteFirst", extra: dict | None = None
) -> bytes:
    """Encode a 2-D array as a spec-compliant EDF blob (512-byte-padded
    header). Used by tests and as the write side of the S1 seam."""
    inv = {v: k for k, v in _EDF_DTYPES.items()}
    kind = img.dtype.newbyteorder("=").str[1:]
    if kind not in inv:
        raise ValueError(f"unsupported dtype {img.dtype}")
    order = "<" if byte_order == "LowByteFirst" else ">"
    payload = img.astype(img.dtype.newbyteorder(order), copy=False).tobytes()
    fields = {
        "HeaderID": "EH:000001:000000:000000",
        "Image": "1",
        "ByteOrder": byte_order,
        "DataType": inv[kind],
        "Dim_1": str(img.shape[1]),
        "Dim_2": str(img.shape[0]),
        "Size": str(len(payload)),
        **(extra or {}),
    }
    body = "{\n" + "".join(f"{k} = {v} ;\n" for k, v in fields.items())
    # pad with spaces so the header (incl. the closing '}\n') is a
    # multiple of 512 bytes, per the EDF spec
    total = len(body) + 2
    pad = (-total) % 512
    header = body + " " * pad + "}\n"
    return header.encode("ascii") + payload


def read_binary_assets(spark: SparkSession, path_glob: str, modality: str) -> DataFrame:
    """Binary source (SURVEY S1/U1 shape): opaque payload + typed
    metadata. At 100 TB this is the columnar manifest scan; payloads
    stream through executors only."""
    df = spark.read.format("binaryFile").load(path_glob)
    return df.select(
        F.col("path"),
        F.lit(modality).alias("modality"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.col("content"),
    )


def decode_image(
    assets: DataFrame,
    *,
    shape: tuple[int, int] = (32, 32),
    codec: str | None = None,
    real_codec: bool = False,
) -> DataFrame:
    """binary image → pixel rows via mapInPandas (U1: 1 file → H·W rows).

    ``codec``:
      - ``"edf"`` — REAL decode of the reference's detector format
        (pure-numpy :func:`decode_edf`; the reference goes through
        fabio, trx/azav.py:29-34, whose default beamline output is EDF).
      - ``"fake"`` (default) — deterministic intensity pattern seeded by
        the content hash: same schema/partitioning/batch shape, stable
        golden values, for formats whose codec libraries (PIL/ffmpeg)
        are not in this environment.
    ``real_codec=True`` is the former spelling of ``codec="edf"``.
    """
    ny, nx = shape
    codec = codec or ("edf" if real_codec else "fake")
    if codec not in ("edf", "fake"):
        raise ValueError(f"unknown codec {codec!r}")
    edf_dtypes = dict(_EDF_DTYPES)  # plain dict → pickled by value

    def _parse_edf(buf, _np):
        # nested (pickled by value) twin of decode_edf: worker kernels
        # must not reference trx_spark module symbols — executors may
        # not have the repo on their import path
        end = buf.index(b"}")
        fields = {}
        for line in buf[: end + 1].decode("ascii", "replace").strip("{} \r\n").split(";"):
            if "=" in line:
                k, v = line.split("=", 1)
                fields[k.strip()] = v.strip()
        nx_, ny_ = int(fields["Dim_1"]), int(fields["Dim_2"])
        dt = _np.dtype(edf_dtypes[fields.get("DataType", "UnsignedShort")])
        order = "<" if fields.get("ByteOrder", "LowByteFirst") == "LowByteFirst" else ">"
        start = buf.index(b"}\n") + 2
        img = _np.frombuffer(buf, dtype=dt.newbyteorder(order), count=nx_ * ny_, offset=start)
        return img.reshape(ny_, nx_)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # closure-self-contained (workers may not have trx_spark on path)
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if codec == "edf":
                    img = _parse_edf(bytes(row["content"]), _np).astype(float)
                else:
                    seed = int.from_bytes(
                        _hl.sha256(bytes(row["content"])).digest()[:4], "big"
                    )
                    rng = _np.random.default_rng(seed)
                    img = rng.poisson(100.0, size=(ny, nx)).astype(float)
                iy, ix = _np.mgrid[0 : img.shape[0], 0 : img.shape[1]]
                out.append(
                    _pd.DataFrame(
                        {
                            "file": row["file"],
                            "y": iy.ravel().astype("int32"),
                            "x": ix.ravel().astype("int32"),
                            "intensity": img.ravel(),
                        }
                    )
                )
            yield _pd.concat(out) if out else _pd.DataFrame(
                {"file": [], "y": [], "x": [], "intensity": []}
            )

    return assets.select("path", "content").withColumnRenamed("path", "file").mapInPandas(
        decode, schema=PIXEL_SCHEMA
    )


def frame_sample(
    assets: DataFrame,
    *,
    every_n: int = 10,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling plumbing: emit (file, frame_idx) rows for the
    frames a decoder would extract — the schedule is computed relationally
    (no codec needed); the per-frame decode plugs in as decode_image."""
    idx = F.sequence(F.lit(0), F.lit((max_frames - 1) * every_n), F.lit(every_n))
    return assets.select(
        F.col("path").alias("file"), F.explode(idx).alias("frame_idx")
    )


def resize_pixels(
    pixels: DataFrame,
    *,
    factor: int,
    agg: str = "mean",
) -> DataFrame:
    """Block downsample of decoded pixel rows — the image-resize stage
    of a multimodal pipeline, expressed RELATIONALLY: output pixel
    (y//f, x//f) aggregates its f×f source block. No UDF, one keyed
    shuffle on (file, y, x); at 100 TB this is a map-side partial agg
    exactly like azimuthal integration (the engine's centerpiece plan).

    ``agg``: 'mean' (area-average, the usual anti-aliased downsample),
    'max' (max-pool) or 'sum'.
    """
    if agg not in ("mean", "max", "sum"):
        raise ValueError(f"unknown agg {agg!r}")
    fn = {"mean": F.avg, "max": F.max, "sum": F.sum}[agg]
    return (
        pixels.groupBy(
            "file",
            (F.col("y") / factor).cast("int").alias("y"),
            (F.col("x") / factor).cast("int").alias("x"),
        )
        .agg(fn("intensity").alias("intensity"))
    )


def image_features(pixels: DataFrame) -> DataFrame:
    """Per-image feature extraction from decoded pixel rows: pixel
    count, intensity mean/min/max, population std, and the
    intensity-weighted centroid (the beam-center proxy). One
    groupBy(file) — map-side partials, a tiny shuffle, no UDF; the
    feature vector for downstream similarity/clustering stages.
    """
    w = F.col("intensity")
    return pixels.groupBy("file").agg(
        F.count(F.lit(1)).alias("n_px"),
        F.avg(w).alias("mean_i"),
        F.min(w).alias("min_i"),
        F.max(w).alias("max_i"),
        F.stddev_pop(w).alias("std_i"),
        (F.sum(F.col("x") * w) / F.sum(w)).alias("centroid_x"),
        (F.sum(F.col("y") * w) / F.sum(w)).alias("centroid_y"),
    )
