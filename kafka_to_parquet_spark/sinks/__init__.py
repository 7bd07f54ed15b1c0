"""Sinks: the reference-layout Parquet batch sink (one file per
(partition, batch)) and the Structured Streaming parquet/foreachBatch
writers."""
