"""Unit tests for the vendored minimal proto3 runtime
(mapreduce_itwiki_spark/_vendor/google/protobuf) — the wire-format
layer under streaming_running_stats_tws. The true conformance test is
the live tws query (the JVM's real protobuf parses every request this
runtime serializes); these tests pin the pure-Python layer so a
regression fails fast without a streaming query in the loop."""

from __future__ import annotations

import sys


def _pb2():
    import mapreduce_itwiki_spark  # noqa: F401  (installs vendor path)

    assert "google.protobuf" in sys.modules or True
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_statemessage_pb2_imports_and_builds():
    sm = _pb2()
    # module-level enum constants (generated-code contract the api
    # client relies on)
    assert sm.PRE_INIT == 0 and sm.CREATED == 1 and sm.CLOSED == 5
    assert sm.HandleState.Value("INITIALIZED") == 2
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"


def test_wire_roundtrip_nested_oneof():
    sm = _pb2()
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    data = req.SerializeToString()
    # canonical encoding: field 1 varint 2, field 2 len-delimited
    assert data[:2] == b"\x08\x02"
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.version == 2
    assert back.statefulProcessorCall.setHandleState.state == sm.CREATED


def test_wire_roundtrip_repeated_and_bool():
    sm = _pb2()
    msg = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(msg.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back.requireNextFetch is True


def test_wire_negative_ints_two_complement():
    sm = _pb2()
    msg = sm.StateResponseWithLongTypeVal(statusCode=-5, value=-(2**40))
    raw = msg.SerializeToString()
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(raw)
    assert back.statusCode == -5 and back.value == -(2**40)
    # negative varints occupy 10 bytes (64-bit two's complement)
    assert len(raw) > 12


def test_defaults_and_unknown_fields():
    sm = _pb2()
    empty = sm.StateResponse()
    assert empty.statusCode == 0
    assert empty.errorMessage == ""
    assert empty.value == b""
    # unknown field numbers are skipped, not fatal (forward compat):
    # field 1000, varint 1 → tag (1000<<3)|0 = 8000 → varint bytes
    from mapreduce_itwiki_spark._vendor.google.protobuf._mini_runtime import (
        encode_varint,
    )

    buf = bytearray()
    encode_varint(buf, 1000 << 3)
    encode_varint(buf, 1)
    payload = sm.StateResponse(statusCode=7).SerializeToString() + bytes(buf)
    back = sm.StateResponse()
    back.ParseFromString(payload)
    assert back.statusCode == 7


def test_string_utf8():
    sm = _pb2()
    msg = sm.StateResponseWithStringTypeVal(statusCode=1, value="héllo wörld")
    back = sm.StateResponseWithStringTypeVal()
    back.ParseFromString(msg.SerializeToString())
    assert back.value == "héllo wörld"
