""".chi text-curve reader and folder averaging (SURVEY S9/A13).

trx/azav.py:576-578 ``chiRead`` (2-column whitespace text, optional
scale) and azav.py:589-619 ``chiAverage``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.functions.strings import basename, ws_parts


def chi_read(spark: SparkSession, path_glob: str, *, scale: float = 1.0) -> DataFrame:
    """Read one or many .chi files into (file, q, i). The filename rides
    along via input_file_name so a whole folder is one distributed scan
    (the reference loops file-by-file, azav.py:596-603)."""
    text = spark.read.text(path_glob).withColumn("_path", F.input_file_name())
    rows = text.filter(~F.col("value").startswith("#")).filter(F.trim("value") != "")
    parts = ws_parts("value")
    return rows.select(
        basename("_path").alias("file"),
        parts.getItem(0).cast("double").alias("q"),
        (parts.getItem(1).cast("double") * F.lit(scale)).alias("i"),
    )


def chi_average(
    spark: SparkSession,
    path_glob: str,
    *,
    norm_q_window: tuple[float, float] | None = None,
) -> DataFrame:
    """Average a folder of .chi curves on their shared q-grid, with
    optional per-curve q-window normalization first (SURVEY A13;
    azav.py:589-619)."""
    curves = chi_read(spark, path_glob)
    if norm_q_window is not None:
        lo, hi = norm_q_window
        from pyspark.sql import Window

        w = Window.partitionBy("file")
        # STRICT bounds — the reference's chiAverage uses
        # (q>norm[0]) & (q<norm[1]) (azav.py:599), so a grid point
        # landing exactly on the window edge is EXCLUDED from the
        # monitor mean (unlike the inclusive azav q-window monitor,
        # dataReduction.py:236, which is a different operator)
        sel = F.when((F.col("q") > lo) & (F.col("q") < hi), F.col("i"))
        curves = curves.withColumn("_mon", F.avg(sel).over(w)).withColumn(
            "i", F.col("i") / F.col("_mon")
        )
    return curves.groupBy("q").agg(
        F.avg("i").alias("i"), F.count(F.lit(1)).alias("n_curves")
    ).orderBy("q")
