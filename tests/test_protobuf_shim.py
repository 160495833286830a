"""The vendored mini-protobuf runtime: wire-format codec, descriptor
bootstrap, and the generated-module surface the transformWithState clients
use. These tests exercise the shim directly; the live end-to-end proof is
stateful_user_rollup_tws running against the JVM state server
(test_streaming_multimodal / test_oracle_parity TWS tests, no longer
env-skipped)."""

from __future__ import annotations

import pytest

from mapreduce_simulation_spark.vendor import ensure_protobuf

ensure_protobuf()

from mapreduce_simulation_spark.vendor.pypath.google.protobuf import (  # noqa: E402
    _mini as M,
)


def test_varint_round_trip():
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, 2**64 - 1):
        buf = bytearray()
        M.write_varint(buf, v)
        got, pos = M.read_varint(bytes(buf), 0)
        assert got == v and pos == len(buf)


def test_varint_canonical_bytes():
    # spec examples: 1 -> 0x01, 300 -> 0xAC 0x02
    buf = bytearray()
    M.write_varint(buf, 300)
    assert bytes(buf) == b"\xac\x02"


def test_zigzag():
    pairs = [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4)]
    for v, enc in pairs:
        assert M._zigzag_encode(v) == enc
        assert M._zigzag_decode(enc) == v


def test_state_message_descriptor_bootstrap():
    """AddSerializedFile must correctly parse the real protoc-serialized
    FileDescriptorProto embedded in Spark's generated module — message
    names, field numbers/types, oneofs, and the enum."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    d = sm.StateRequest.DESCRIPTOR
    assert d.full_name.endswith("state.StateRequest")
    assert sorted(d.fields_by_name) == [
        "implicitGroupingKeyRequest",
        "stateVariableRequest",  # ASCII: capital V sorts before 'f'
        "statefulProcessorCall",
        "timerRequest",
        "utilsRequest",
        "version",
    ]
    assert d.fields_by_name["version"].type == M.TYPE_INT32
    assert d.fields_by_name["statefulProcessorCall"].type == M.TYPE_MESSAGE
    assert "method" in d.oneofs
    # enum constants exposed as module globals, proto3 zero-first
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("CLOSED") == 5


def test_message_round_trip_all_scalar_kinds():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    r = sm.StateResponseWithLongTypeVal(
        statusCode=-3, errorMessage="boom", value=-(2**40)
    )
    r2 = sm.StateResponseWithLongTypeVal()
    r2.ParseFromString(r.SerializeToString())
    assert (r2.statusCode, r2.errorMessage, r2.value) == (-3, "boom", -(2**40))

    lg = sm.StateResponseWithListGet(
        statusCode=2, value=[b"a", b"", b"long" * 100], requireNextFetch=True
    )
    l2 = sm.StateResponseWithListGet()
    l2.ParseFromString(lg.SerializeToString())
    assert l2.value == [b"a", b"", b"long" * 100]
    assert l2.requireNextFetch is True

    # unset fields read proto3 defaults
    empty = sm.StateResponse()
    assert empty.statusCode == 0
    assert empty.errorMessage == ""
    assert empty.value == b""


def test_repeated_submessage_round_trip():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    it = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=False,
    )
    i2 = sm.StateResponseWithMapIterator()
    i2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in i2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_oneof_set_clears_siblings_and_empty_member_hits_wire():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"x")
    )
    assert req.WhichOneof("method") == "setImplicitKey"
    req.removeImplicitKey = sm.RemoveImplicitKey()
    assert req.WhichOneof("method") == "removeImplicitKey"
    assert not req.HasField("setImplicitKey")
    # an empty oneof submessage must still be encoded (tag + len 0) so the
    # JVM sees which member is set
    assert req.SerializeToString() == b"\x12\x00"


def test_canonical_encoding_matches_protoscope():
    """Hand-checked canonical bytes for the handshake message the client
    sends first: StateRequest{statefulProcessorCall{setHandleState{state:
    INITIALIZED}}} == 12 04 0a 02 08 02."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020802")


def test_unknown_fields_skipped():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # KeyAndValuePair has fields 1 and 2; append an unknown field 7
    # (varint) and an unknown field 9 (length-delimited)
    payload = (
        sm.KeyAndValuePair(key=b"k", value=b"v").SerializeToString()
        + b"\x38\x2a"  # field 7 varint 42
        + b"\x4a\x03abc"  # field 9 bytes "abc"
    )
    p = sm.KeyAndValuePair()
    p.ParseFromString(payload)
    assert (p.key, p.value) == (b"k", b"v")


def test_packed_repeated_scalar_decode():
    """proto3 parsers must accept packed encoding for repeated scalars —
    synthesize a message type with a repeated int64 field and feed it a
    packed payload."""
    desc = M.MiniDescriptor(
        "Fake",
        "test.Fake",
        [
            M.MiniFieldDescriptor(
                "xs", 1, M.TYPE_INT64, M.LABEL_REPEATED
            )
        ],
        [],
    )
    cls = M.build_message_class(desc, M.default_pool())
    buf = bytearray()
    M.write_varint(buf, (1 << 3) | 2)  # field 1, LEN
    inner = bytearray()
    for v in (1, 300, 2**40):
        M.write_varint(inner, v)
    M.write_varint(buf, len(inner))
    buf.extend(inner)
    m = cls()
    m.ParseFromString(bytes(buf))
    assert m.xs == [1, 300, 2**40]


def test_unknown_attribute_raises():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    with pytest.raises(AttributeError):
        sm.StateResponse().nope
    with pytest.raises(AttributeError):
        sm.StateResponse().nope = 1


def test_shim_never_shadows_real_protobuf(monkeypatch):
    """ensure_protobuf returns False (and adds nothing) when google.protobuf
    already imports — the real wheel always wins."""
    import sys

    assert "google.protobuf" in sys.modules  # shim active in this container
    assert ensure_protobuf() is False
