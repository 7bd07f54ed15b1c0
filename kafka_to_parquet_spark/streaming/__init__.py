"""Event-time streaming semantics (SURVEY §2.9).

The reference's only streaming behavior is an unbounded per-partition
recv loop with no event-time notion (its "watermarks" are Kafka offset
watermarks, main.rs:144/191-195 — a different concept). Everything
here is the (E) tier: tumbling/sliding/session windows (windows.py —
batch-equivalent, oracle-checked) and genuine Structured Streaming
runs with watermarks and streaming dedup (stateful.py — executed via
readStream + availableNow trigger into a memory sink).
"""
