"""trx_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of marcocamma/trx (time-resolved X-ray
scattering dataflow), re-designed Spark-first.

Reference (read-only, studied for semantics only): /root/reference/
The module map mirrors SURVEY.md:

- :mod:`trx_spark.session`    — tuned SparkSession factory
- :mod:`trx_spark.tables`     — driver testdata loaders / view registry
- :mod:`trx_spark.functions`  — scalar expression library (no UDFs):
  delay-string codec, scattering math, absorption math (trx utils/*)
- :mod:`trx_spark.operators`  — the operator inventory of SURVEY §2:
  azimuthal integration (azav), reference interpolation + scan-point
  reduction (reduction), outlier filters (filters), masks, cell
  reflections, plus the large-scale training-data suite (dedup, text,
  similarity, multimodal)
- :mod:`trx_spark.sources`    — log/chi readers and golden-text sinks
- :mod:`trx_spark.streaming`  — incremental (online-mode) processing

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, and join strategy; Pandas UDFs appear only where semantics
require imperative kernels (curve fits, wavelet background, decode).
"""

__version__ = "0.1.0"
