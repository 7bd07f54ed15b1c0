"""Avro wire-codec conformance + the q_avro_roundtrip query.

The golden vectors below come straight from the Avro 1.11 spec's
Binary Encoding section (zigzag varint table) and the Confluent wire
format description — they pin the codec to the PUBLIC formats, not to
its own inverse.
"""

from __future__ import annotations

import struct

import pytest

from kafka_to_parquet_spark.sources.avro_codec import (
    MAGIC,
    SCHEMA_ID,
    decode_event,
    encode_event,
    zigzag_decode,
    zigzag_encode,
)

# (value, avro zigzag-varint bytes) — the spec's own example table,
# plus multi-byte and 64-bit boundary cases.
GOLDEN_ZIGZAG = [
    (0, b"\x00"),
    (-1, b"\x01"),
    (1, b"\x02"),
    (-2, b"\x03"),
    (2, b"\x04"),
    (-64, b"\x7f"),
    (64, b"\x80\x01"),
    (-65, b"\x81\x01"),
    (8192, b"\x80\x80\x01"),
    (-(2**63), b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
    (2**63 - 1, b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
]


@pytest.mark.parametrize("value,enc", GOLDEN_ZIGZAG)
def test_zigzag_golden_vectors(value, enc):
    assert zigzag_encode(value) == enc
    got, pos = zigzag_decode(enc, 0)
    assert got == value
    assert pos == len(enc)


def test_string_and_double_encoding_match_spec():
    # string "foo": zigzag(3)=0x06 then UTF-8 bytes; double 1.0: the
    # 8 little-endian IEEE-754 bytes.
    frame = encode_event(0, "foo", 1.0)
    body = frame[5:]
    assert body[0:1] == b"\x00"  # event_id 0
    assert body[1:2] == b"\x06"  # length 3
    assert body[2:5] == b"foo"
    assert body[5:13] == struct.pack("<d", 1.0)
    assert struct.pack("<d", 1.0) == bytes.fromhex("000000000000f03f")


def test_confluent_framing():
    frame = encode_event(42, "x", 2.5)
    assert frame[0:1] == MAGIC
    assert struct.unpack(">i", frame[1:5])[0] == SCHEMA_ID
    assert decode_event(frame) == (42, "x", 2.5)


def test_roundtrip_properties():
    for eid in (0, 1, -1, 63, 64, 10**12, -(10**12)):
        for et in ("", "click", "тип", "a" * 200):
            for v in (0.0, -0.0, 1.5, -2.25e300, float("inf")):
                assert decode_event(encode_event(eid, et, v)) == (eid, et, v)
    # NaN round-trips bit-wise but compares unequal — check bits.
    f = encode_event(1, "n", float("nan"))
    _, _, v = decode_event(f)
    assert v != v


def test_decode_rejects_bad_framing():
    with pytest.raises(ValueError):
        decode_event(b"\x01\x00\x00\x00\x07\x00")
    with pytest.raises(ValueError):
        decode_event(MAGIC + struct.pack(">i", SCHEMA_ID + 1) + b"\x00")


def test_avro_roundtrip_query_is_identity(run, spark, sf_dir):
    from kafka_to_parquet_spark.tables import load

    got = {
        r.event_id: (r.event_type, r.value)
        for r in run("q_avro_roundtrip").collect()
    }
    want = {
        r.event_id: (r.event_type, r.value)
        for r in load(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .collect()
    }
    assert got == want
