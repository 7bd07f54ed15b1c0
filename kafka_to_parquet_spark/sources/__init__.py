"""Sources: Kafka (streaming, broker-gated), a brokerless Kafka-shaped
analog derived from the ``events`` table, parquet scans, and the
synthetic generator (reference producer parity)."""
