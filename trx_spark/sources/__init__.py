"""Sources and sinks (SURVEY §2.1): log/curve readers, golden text and
parquet writers."""
