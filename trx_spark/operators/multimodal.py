"""Multimodal (image/audio/video) column plumbing.

Binary payloads travel as opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The actual codecs (fabio for the
reference's EDF detector images, trx/azav.py:29-47; PIL/ffmpeg for
web-scale corpora) are NOT in this container, so the decode kernel is
stubbed: ``decode_image(real_codec=False)`` produces a deterministic
fake (seeded by content hash) with the REAL schema, partitioning and
batch shape, and ``real_codec=True`` raises NotImplementedError where
the fabio call would go.

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
    real_codec: bool = False,
) -> DataFrame:
    """binary image → pixel rows via mapInPandas (U1: 1 file → H·W rows).

    ``real_codec=True`` is where fabio.open / PIL.Image.open would run
    (not installed here → NotImplementedError). The fake path emits a
    deterministic intensity pattern seeded by the content hash so
    downstream operators (masks, integration, center-finding) are
    exercised with stable golden values.
    """
    ny, nx = shape

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if real_codec:
                    raise NotImplementedError(
                        "image codec (fabio/PIL) not available in this "
                        "environment; plumbing is exercised via the "
                        "deterministic fake (real_codec=False)"
                    )
                seed = int.from_bytes(
                    hashlib.sha256(bytes(row["content"])).digest()[:4], "big"
                )
                rng = np.random.default_rng(seed)
                img = rng.poisson(100.0, size=(ny, nx)).astype(float)
                yy, xx = np.mgrid[0:ny, 0:nx]
                out.append(
                    pd.DataFrame(
                        {
                            "file": row["file"],
                            "y": yy.ravel().astype("int32"),
                            "x": xx.ravel().astype("int32"),
                            "intensity": img.ravel(),
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
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
