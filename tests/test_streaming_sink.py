"""End-to-end Structured Streaming sink run: readStream over the
events parquet → Kafka-record shape → foreachBatch count-batched
parquet sink (the reference's S5 layout) with checkpointing."""

from __future__ import annotations

import glob
import os
import re
import tempfile

from pyspark.sql import functions as F

from kafka_to_parquet_spark.sinks.parquet_batch import streaming_sink
from kafka_to_parquet_spark.sources.kafka_analog import kafka_records
from kafka_to_parquet_spark.streaming.stateful import _stream_events


def test_streaming_sink_end_to_end(spark, sf_dir):
    stream = _stream_events(spark, sf_dir).select(
        F.col("event_id").cast("long").alias("offset"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("props"))
        .alias("value"),
    )
    out = tempfile.mkdtemp(prefix="ktps_stream_sink_")
    ckpt = tempfile.mkdtemp(prefix="ktps_ckpt_")
    q = streaming_sink(stream, out, ckpt, batch_size=100).start()
    q.awaitTermination()

    files = glob.glob(os.path.join(out, "epoch_*", "*.parquet"))
    assert files, "no files written by the streaming sink"
    assert all(
        re.match(r"partition_\d+_batch_\d+\.parquet$", os.path.basename(f)) for f in files
    )
    n_in = kafka_records(spark, sf_dir).count()
    n_out = spark.read.parquet(os.path.join(out, "epoch_*")).count()
    assert n_out == n_in  # lossless incl. final partial batch

    # exactly-once on restart: rerunning with the same checkpoint and no
    # new data must write nothing new
    q2 = streaming_sink(stream, out, ckpt, batch_size=100).start()
    q2.awaitTermination()
    assert spark.read.parquet(os.path.join(out, "epoch_*")).count() == n_in
