"""kafka_to_parquet_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference project
``d1eg0/kafka-to-parquet`` (a ~395-LoC Rust Kafka→Parquet ETL,
/root/reference/src/main.rs), re-expressed Spark-first:

- the reference's streaming ETL core (Kafka source → UTF-8 decode →
  count-based batching → single-column Parquet sink) as Structured
  Streaming + DataFrame ops (see ``sources/`` and ``sinks/``);
- a full relational operator surface (projections, filters, joins,
  aggregations, window functions, sorts, set ops, scalar function
  families) the reference lacks, as pure Catalyst-optimized DataFrame
  plans (``operators/``, ``functions/``);
- event-time streaming semantics (tumbling/sliding/session windows,
  watermarks, streaming dedup) via Structured Streaming (``streaming/``);
- LLM-data-pipeline operators (exact/near dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB scale
  (``llm/``).

Every operator is a pure ``DataFrame -> DataFrame`` composition of
built-in functions where possible, so Catalyst gets predicate pushdown,
column pruning, join selection, and whole-stage codegen for free.
Python UDFs appear only where built-ins genuinely can't express the
semantics (multimodal decode stubs), and then only as Arrow-batched
``mapInPandas``.
"""

from kafka_to_parquet_spark.session import get_spark
from kafka_to_parquet_spark.registry import QUERIES, ORACLE_SQL

__all__ = ["get_spark", "QUERIES", "ORACLE_SQL"]
__version__ = "0.1.0"
