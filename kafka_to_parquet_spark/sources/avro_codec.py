"""Confluent-framed Avro decode — retiring the reference's own open
TODO (reference README.md:20 "avro + schema registry decode", never
implemented there) with a pure-Python wire codec.

The container ships no spark-avro module jar (only Avro core), so the
decode is implemented directly against the PUBLIC wire formats:

- Avro binary encoding (Avro 1.11 spec §Binary Encoding): longs are
  zigzag-encoded varints (LSB groups of 7 bits, high bit = continue),
  strings are a zigzag length followed by UTF-8 bytes, doubles are
  8 little-endian IEEE-754 bytes.
- Confluent Schema Registry wire framing (public format): one 0x00
  magic byte, a BIG-endian 4-byte schema id, then the Avro body.

That is everything a fixed-schema Kafka consumer needs; the full
generality spark-avro adds (schema resolution, unions, nested records)
is out of scope for the reference's TODO, which names exactly this
consumer-side decode. The codec is deliberately dependency-free and
per-record stateless so it vectorizes cleanly under Arrow batches —
encode is a pandas UDF, decode a mapInPandas pass, both operating on
``bytes`` cells without any per-row JVM↔Python chatter beyond the
batch transfer itself.

Spec-conformance is pinned by golden byte vectors from the Avro spec
(tests/test_avro_codec.py): zigzag(0)=00, zigzag(-1)=01, zigzag(1)=02,
zigzag(64)=80 01, string "foo" = 06 66 6f 6f, double 1.0 = 8 LE bytes
3f f0.. reversed.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load

# The demo record schema carried on the simulated topic. Field order
# is the schema's field order — Avro binary carries no field names.
#   record Event { long event_id; string event_type; double value; }
SCHEMA_ID = 7  # registry id embedded in the Confluent frame
MAGIC = b"\x00"


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-end first."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, next_pos)."""
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def encode_event(event_id: int, event_type: str, value: float) -> bytes:
    """Confluent frame + Avro binary body in schema field order."""
    et = event_type.encode("utf-8")
    return (
        MAGIC
        + struct.pack(">i", SCHEMA_ID)
        + zigzag_encode(event_id)
        + zigzag_encode(len(et))
        + et
        + struct.pack("<d", value)
    )


def decode_event(frame: bytes) -> tuple[int, str, float]:
    """Inverse of :func:`encode_event`; validates the framing."""
    if frame[0:1] != MAGIC:
        raise ValueError("not a Confluent-framed Avro message")
    (schema_id,) = struct.unpack(">i", frame[1:5])
    if schema_id != SCHEMA_ID:
        raise ValueError(f"unknown schema id {schema_id}")
    pos = 5
    event_id, pos = zigzag_decode(frame, pos)
    slen, pos = zigzag_decode(frame, pos)
    event_type = frame[pos : pos + slen].decode("utf-8")
    pos += slen
    (value,) = struct.unpack("<d", frame[pos : pos + 8])
    return event_id, event_type, value


@query(
    "q_avro_roundtrip",
    oracle="""
SELECT event_id, event_type, value
FROM events
""",
)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10': Avro topic decode (reference README.md:20's unchecked
    TODO). Each event row is serialized to a Confluent-framed Avro
    binary message (exactly what a schema-registry-backed Kafka topic
    carries) and then decoded back to typed columns — the consumer
    path the reference never built. The oracle is the identity
    projection: longs and strings round-trip by construction, and the
    double travels as its 8 IEEE bytes, so the decoded value is
    BIT-identical to the source (no rounding fence needed).

    Plan: encode is an Arrow-batched pandas UDF producing the binary
    column; decode is one mapInPandas pass over those frames — both
    stages are per-row-independent map work with zero shuffles, so at
    100 TB this is scan-bound and embarrassingly parallel, the same
    shape as the reference's decode loop (main.rs:240-247) and the
    multimodal decode family (llm/multimodal.py)."""

    @F.pandas_udf("binary")
    def enc(eid: pd.Series, etype: pd.Series, val: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_event(int(i), str(t), float(v))
                for i, t, v in zip(eid, etype, val)
            ],
            dtype=object,
        )

    frames = (
        load(spark, sf_dir, "events")
        .select(enc("event_id", "event_type", "value").alias("frame"))
    )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_event(bytes(b)) for b in pdf["frame"]]
            yield pd.DataFrame(
                rows, columns=["event_id", "event_type", "value"]
            )

    return frames.mapInPandas(
        dec, schema="event_id long, event_type string, value double"
    )
