"""Scalar function families (string/date/math/conditional/json),
text-analysis functions, and vector (embedding) helpers.

The reference's only scalar computation is string concatenation for
file paths (main.rs:274-283) — covered by q_str_concat in
sources.kafka_analog. Everything here is the (E) extension surface,
built exclusively from pyspark.sql.functions built-ins (JVM-side,
codegen'd; no Python UDFs in any hot path).
"""
