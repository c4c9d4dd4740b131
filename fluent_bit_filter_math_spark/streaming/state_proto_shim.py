"""Pure-Python wire-format twin of Spark's ``StateMessage_pb2``.

``transformWithStateInPandas`` — Spark 4's typed-state successor to
``applyInPandasWithState`` (SPARK-49564) — talks to the JVM state
server over a socket protocol whose messages are protocol buffers.
PySpark ships only generated code (``pyspark/sql/streaming/proto/
StateMessage_pb2.py``) that requires the ``google.protobuf`` runtime,
which this container does not have and cannot install. The messages
themselves are tiny and fixed, and the protobuf WIRE FORMAT is a
public, stable spec (varint + length-delimited fields) — so this
module reimplements exactly the message set StateMessage.proto
declares, from scratch, against that spec.

Fidelity is enforced, not hoped for: ``tests/test_streaming.py::
test_state_proto_shim_matches_descriptor`` decodes the serialized
FileDescriptorProto embedded in the installed pb2 file and asserts
every message/field/number/type/label in this module matches it, so a
PySpark upgrade that changes the protocol fails loudly.

``install()`` places this module at
``sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"]`` ONLY
when the real ``google.protobuf`` is unavailable — with a working
protobuf install, PySpark's own generated module is used untouched.
The client code (``stateful_processor_api_client.py`` and the
value/list/map state clients) imports the pb2 module lazily inside
methods, so installing at import time of this module (which workers
reach by unpickling the stateful processor) is always early enough.

Proto3 semantics implemented (the subset the protocol uses):
* scalars (int32/int64/bool/string/bytes/enum) have implicit
  presence — serialized only when != default;
* message-typed fields have explicit presence — serialized when set,
  even if empty (``StateRequest(implicitGroupingKeyRequest=...)``
  wrapping an empty ``RemoveImplicitKey`` must still put field 4 on
  the wire, length 0, or the JVM sees no method);
* sub-message auto-vivification: ``cmd.ttl.durationMs = 5`` creates
  ``ttl`` on first attribute access and marks it present once it
  holds any data (matching generated-code behavior for the one place
  the client relies on it);
* repeated scalar/message fields (list get/put, timer lists);
* negative int32/int64 encode as 10-byte two's-complement varints.
"""

from __future__ import annotations

import struct
import sys

# ---------------------------------------------------------------------------
# wire-format primitives
# ---------------------------------------------------------------------------

_U64 = (1 << 64) - 1


def _enc_varint(value: int) -> bytes:
    value &= _U64  # negative int32/int64 → 64-bit two's complement
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


class Field:
    __slots__ = ("number", "name", "kind", "repeated", "msg", "oneof")

    def __init__(self, number, name, kind, repeated=False, msg=None,
                 oneof=False):
        self.number = number
        self.name = name
        self.kind = kind  # int32|int64|bool|string|bytes|enum|message
        self.repeated = repeated
        self.msg = msg  # lambda: message class, for kind == "message"
        self.oneof = oneof


_SCALAR_DEFAULTS = {
    "int32": 0,
    "int64": 0,
    "bool": False,
    "enum": 0,
    "string": "",
    "bytes": b"",
}


class Message:
    """Declarative protobuf message; subclasses set ``FIELDS``."""

    FIELDS: tuple[Field, ...] = ()

    def __init__(self, **kwargs):
        by_name = {}
        for f in self.FIELDS:
            by_name[f.name] = f
            if f.repeated:
                object.__setattr__(self, f.name, [])
            elif f.kind == "message":
                object.__setattr__(self, f.name, None)
            else:
                object.__setattr__(self, f.name, _SCALAR_DEFAULTS[f.kind])
        object.__setattr__(self, "_by_name", by_name)
        object.__setattr__(self, "_set_msgs", set())
        for name, value in kwargs.items():
            setattr(self, name, value)

    # -- attribute protocol -------------------------------------------------
    def __setattr__(self, name, value):
        f = self._by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if f.oneof:
            # Generated protobuf clears the other members of a oneof
            # when one is assigned; mirror that so a reused request
            # object never serializes two members of the same group
            # (every message here declares at most one oneof group).
            for sib in self.FIELDS:
                if sib.oneof and sib.name != name:
                    object.__setattr__(self, sib.name, None)
                    self._set_msgs.discard(sib.name)
        if f.kind == "message" and not f.repeated:
            self._set_msgs.add(name)
        object.__setattr__(self, name, value)

    def __getattr__(self, name):
        # only reached when instance dict lacks `name` — i.e. before
        # __init__ (never) or for auto-vivified access on a message
        # field cleared to None via object.__setattr__ in __init__.
        raise AttributeError(name)

    def __getattribute__(self, name):
        value = object.__getattribute__(self, name)
        if value is None:
            f = object.__getattribute__(self, "_by_name").get(name)
            if f is not None and f.kind == "message" and not f.repeated:
                value = f.msg()()
                object.__setattr__(self, name, value)
        return value

    def _message_field_present(self, f) -> bool:
        if f.name in self._set_msgs:
            return True
        child = object.__getattribute__(self, f.name)
        return child is not None and not child._is_empty()

    def _is_empty(self) -> bool:
        for f in self.FIELDS:
            value = object.__getattribute__(self, f.name)
            if f.repeated:
                if value:
                    return False
            elif f.kind == "message":
                if self._message_field_present(f):
                    return False
            elif value != _SCALAR_DEFAULTS[f.kind]:
                return False
        return True

    # -- serialization ------------------------------------------------------
    def SerializeToString(self) -> bytes:
        out = bytearray()
        for f in sorted(self.FIELDS, key=lambda f: f.number):
            value = object.__getattribute__(self, f.name)
            if f.repeated:
                for item in value:
                    self._emit(out, f, item)
            elif f.kind == "message":
                if self._message_field_present(f):
                    self._emit(out, f, value if value is not None
                               else f.msg()())
            elif value != _SCALAR_DEFAULTS[f.kind]:
                self._emit(out, f, value)
        return bytes(out)

    @staticmethod
    def _emit(out: bytearray, f: Field, value) -> None:
        if f.kind in ("int32", "int64", "enum"):
            out += _enc_varint(f.number << 3 | 0)
            out += _enc_varint(int(value))
        elif f.kind == "bool":
            out += _enc_varint(f.number << 3 | 0)
            out += _enc_varint(1 if value else 0)
        else:
            if f.kind == "string":
                data = value.encode("utf-8")
            elif f.kind == "bytes":
                data = bytes(value)
            else:  # message
                data = value.SerializeToString()
            out += _enc_varint(f.number << 3 | 2)
            out += _enc_varint(len(data))
            out += data

    def ParseFromString(self, data: bytes) -> int:
        self.__init__()
        by_number = {f.number: f for f in self.FIELDS}
        pos = 0
        while pos < len(data):
            tag, pos = _dec_varint(data, pos)
            number, wire = tag >> 3, tag & 7
            if wire == 0:
                raw, pos = _dec_varint(data, pos)
                payload = raw
            elif wire == 2:
                size, pos = _dec_varint(data, pos)
                payload = data[pos : pos + size]
                if len(payload) != size:
                    raise ValueError("truncated length-delimited field")
                pos += size
            elif wire == 5:
                if pos + 4 > len(data):
                    raise ValueError("truncated fixed32 field")
                payload = struct.unpack("<I", data[pos : pos + 4])[0]
                pos += 4
            elif wire == 1:
                if pos + 8 > len(data):
                    raise ValueError("truncated fixed64 field")
                payload = struct.unpack("<Q", data[pos : pos + 8])[0]
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wire}")
            f = by_number.get(number)
            if f is None:
                continue  # unknown field: skip (forward compatibility)
            if f.kind in ("int32", "int64"):
                value = _signed64(payload)
            elif f.kind == "enum":
                value = payload
            elif f.kind == "bool":
                value = bool(payload)
            elif f.kind == "string":
                value = payload.decode("utf-8")
            elif f.kind == "bytes":
                value = bytes(payload)
            else:
                value = f.msg()()
                value.ParseFromString(payload)
            if f.repeated:
                object.__getattribute__(self, f.name).append(value)
            else:
                setattr(self, f.name, value)
        return len(data)

    def CopyFrom(self, other: "Message") -> None:
        self.ParseFromString(other.SerializeToString())

    def __repr__(self) -> str:  # debugging aid only
        parts = [
            f"{f.name}={object.__getattribute__(self, f.name)!r}"
            for f in self.FIELDS
            if (object.__getattribute__(self, f.name) not in (None, [], 0,
                                                              "", b"", False))
        ]
        return f"{type(self).__name__}({', '.join(parts)})"


# ---------------------------------------------------------------------------
# message declarations — numbers/types/labels mirror StateMessage.proto
# (asserted against the installed pb2's serialized descriptor by
# tests/test_streaming.py).
# ---------------------------------------------------------------------------

def _message(name, *fields):
    cls = type(name, (Message,), {"FIELDS": tuple(fields)})
    globals()[name] = cls
    return cls


_message("Exists")
_message("Get")
_message("Clear")
_message("GetProcessingTime")
_message("GetWatermark")
_message("RemoveImplicitKey")
_message("SetImplicitKey", Field(1, "key", "bytes"))
_message("ValueStateUpdate", Field(1, "value", "bytes"))
_message("RegisterTimer", Field(1, "expiryTimestampMs", "int64"))
_message("DeleteTimer", Field(1, "expiryTimestampMs", "int64"))
_message("ListTimers", Field(1, "iteratorId", "string"))
_message("ListStateGet", Field(1, "iteratorId", "string"))
_message("ListStatePut", Field(1, "value", "bytes", repeated=True),
         Field(2, "fetchWithArrow", "bool"))
_message("AppendValue", Field(1, "value", "bytes"))
_message("AppendList", Field(1, "value", "bytes", repeated=True),
         Field(2, "fetchWithArrow", "bool"))
_message("GetValue", Field(1, "userKey", "bytes"))
_message("ContainsKey", Field(1, "userKey", "bytes"))
_message("UpdateValue", Field(1, "userKey", "bytes"),
         Field(2, "value", "bytes"))
_message("Iterator", Field(1, "iteratorId", "string"))
_message("Keys", Field(1, "iteratorId", "string"))
_message("Values", Field(1, "iteratorId", "string"))
_message("RemoveKey", Field(1, "userKey", "bytes"))
_message("SetHandleState", Field(1, "state", "enum"))
_message("TTLConfig", Field(1, "durationMs", "int64"))
_message("ParseStringSchema", Field(1, "schema", "string"))
_message("UtilsRequest",
         Field(1, "parseStringSchema", "message",
               msg=lambda: ParseStringSchema, oneof=True))
_message("StateCallCommand",
         Field(1, "stateName", "string"),
         Field(2, "schema", "string"),
         Field(3, "mapStateValueSchema", "string"),
         Field(4, "ttl", "message", msg=lambda: TTLConfig))
_message("TimerStateCallCommand",
         Field(1, "register", "message", msg=lambda: RegisterTimer,
               oneof=True),
         Field(2, "delete", "message", msg=lambda: DeleteTimer, oneof=True),
         Field(3, "list", "message", msg=lambda: ListTimers, oneof=True))
_message("StatefulProcessorCall",
         Field(1, "setHandleState", "message", msg=lambda: SetHandleState,
               oneof=True),
         Field(2, "getValueState", "message", msg=lambda: StateCallCommand,
               oneof=True),
         Field(3, "getListState", "message", msg=lambda: StateCallCommand,
               oneof=True),
         Field(4, "getMapState", "message", msg=lambda: StateCallCommand,
               oneof=True),
         Field(5, "timerStateCall", "message",
               msg=lambda: TimerStateCallCommand, oneof=True),
         Field(6, "deleteIfExists", "message", msg=lambda: StateCallCommand,
               oneof=True))
_message("ValueStateCall",
         Field(1, "stateName", "string"),
         Field(2, "exists", "message", msg=lambda: Exists, oneof=True),
         Field(3, "get", "message", msg=lambda: Get, oneof=True),
         Field(4, "valueStateUpdate", "message",
               msg=lambda: ValueStateUpdate, oneof=True),
         Field(5, "clear", "message", msg=lambda: Clear, oneof=True))
_message("ListStateCall",
         Field(1, "stateName", "string"),
         Field(2, "exists", "message", msg=lambda: Exists, oneof=True),
         Field(3, "listStateGet", "message", msg=lambda: ListStateGet,
               oneof=True),
         Field(4, "listStatePut", "message", msg=lambda: ListStatePut,
               oneof=True),
         Field(5, "appendValue", "message", msg=lambda: AppendValue,
               oneof=True),
         Field(6, "appendList", "message", msg=lambda: AppendList,
               oneof=True),
         Field(7, "clear", "message", msg=lambda: Clear, oneof=True))
_message("MapStateCall",
         Field(1, "stateName", "string"),
         Field(2, "exists", "message", msg=lambda: Exists, oneof=True),
         Field(3, "getValue", "message", msg=lambda: GetValue, oneof=True),
         Field(4, "containsKey", "message", msg=lambda: ContainsKey,
               oneof=True),
         Field(5, "updateValue", "message", msg=lambda: UpdateValue,
               oneof=True),
         Field(6, "iterator", "message", msg=lambda: Iterator, oneof=True),
         Field(7, "keys", "message", msg=lambda: Keys, oneof=True),
         Field(8, "values", "message", msg=lambda: Values, oneof=True),
         Field(9, "removeKey", "message", msg=lambda: RemoveKey,
               oneof=True),
         Field(10, "clear", "message", msg=lambda: Clear, oneof=True))
_message("StateVariableRequest",
         Field(1, "valueStateCall", "message", msg=lambda: ValueStateCall,
               oneof=True),
         Field(2, "listStateCall", "message", msg=lambda: ListStateCall,
               oneof=True),
         Field(3, "mapStateCall", "message", msg=lambda: MapStateCall,
               oneof=True))
_message("ImplicitGroupingKeyRequest",
         Field(1, "setImplicitKey", "message", msg=lambda: SetImplicitKey,
               oneof=True),
         Field(2, "removeImplicitKey", "message",
               msg=lambda: RemoveImplicitKey, oneof=True))
_message("TimerValueRequest",
         Field(1, "getProcessingTimer", "message",
               msg=lambda: GetProcessingTime, oneof=True),
         Field(2, "getWatermark", "message", msg=lambda: GetWatermark,
               oneof=True))
_message("ExpiryTimerRequest",
         Field(1, "iteratorId", "string"),
         Field(2, "expiryTimestampMs", "int64"))
_message("TimerRequest",
         Field(1, "timerValueRequest", "message",
               msg=lambda: TimerValueRequest, oneof=True),
         Field(2, "expiryTimerRequest", "message",
               msg=lambda: ExpiryTimerRequest, oneof=True))
_message("StateRequest",
         Field(1, "version", "int32"),
         Field(2, "statefulProcessorCall", "message",
               msg=lambda: StatefulProcessorCall, oneof=True),
         Field(3, "stateVariableRequest", "message",
               msg=lambda: StateVariableRequest, oneof=True),
         Field(4, "implicitGroupingKeyRequest", "message",
               msg=lambda: ImplicitGroupingKeyRequest, oneof=True),
         Field(5, "timerRequest", "message", msg=lambda: TimerRequest,
               oneof=True),
         Field(6, "utilsRequest", "message", msg=lambda: UtilsRequest,
               oneof=True))
_message("StateResponse",
         Field(1, "statusCode", "int32"),
         Field(2, "errorMessage", "string"),
         Field(3, "value", "bytes"))
_message("StateResponseWithLongTypeVal",
         Field(1, "statusCode", "int32"),
         Field(2, "errorMessage", "string"),
         Field(3, "value", "int64"))
_message("StateResponseWithStringTypeVal",
         Field(1, "statusCode", "int32"),
         Field(2, "errorMessage", "string"),
         Field(3, "value", "string"))
_message("StateResponseWithListGet",
         Field(1, "statusCode", "int32"),
         Field(2, "errorMessage", "string"),
         Field(3, "value", "bytes", repeated=True),
         Field(4, "requireNextFetch", "bool"))
_message("StateResponseWithMapKeysOrValues",
         Field(1, "statusCode", "int32"),
         Field(2, "errorMessage", "string"),
         Field(3, "value", "bytes", repeated=True),
         Field(4, "requireNextFetch", "bool"))
_message("KeyAndValuePair",
         Field(1, "key", "bytes"),
         Field(2, "value", "bytes"))
_message("StateResponseWithMapIterator",
         Field(1, "statusCode", "int32"),
         Field(2, "errorMessage", "string"),
         Field(3, "kvPair", "message", msg=lambda: KeyAndValuePair,
               repeated=True),
         Field(4, "requireNextFetch", "bool"))
_message("TimerInfo",
         Field(1, "key", "bytes"),
         Field(2, "timestampMs", "int64"))
_message("StateResponseWithTimer",
         Field(1, "statusCode", "int32"),
         Field(2, "errorMessage", "string"),
         Field(3, "timer", "message", msg=lambda: TimerInfo, repeated=True),
         Field(4, "requireNextFetch", "bool"))

# HandleState enum values, exported at module level exactly as the
# generated code does.
PRE_INIT = 0
CREATED = 1
INITIALIZED = 2
DATA_PROCESSED = 3
TIMER_PROCESSED = 4
CLOSED = 5


_PB2_NAME = "pyspark.sql.streaming.proto.StateMessage_pb2"


def install() -> bool:
    """Make ``transformWithStateInPandas`` loadable without protobuf.

    Returns True if this shim is (now) serving as the pb2 module,
    False if the real google.protobuf runtime exists and PySpark's own
    generated module should be used.
    """
    try:
        # `import google.protobuf` alone is NOT a sufficient probe: an
        # empty `google` namespace package satisfies it (observed in
        # the TWS driver-worker environment) while the actual runtime
        # modules the generated code needs are absent. Probe the
        # module the pb2 file imports first.
        from google.protobuf import descriptor  # noqa: F401

        return False
    except ImportError:
        pass
    existing = sys.modules.get(_PB2_NAME)
    if existing is not None and existing is not sys.modules[__name__]:
        return True  # someone imported the real one successfully
    sys.modules[_PB2_NAME] = sys.modules[__name__]
    # `import pyspark.sql.streaming.proto.StateMessage_pb2 as m` first
    # imports the parent packages and then binds via ATTRIBUTE access
    # on the `proto` package — a sys.modules entry alone is not enough
    # (observed: "cannot import name 'proto' from
    # 'pyspark.sql.streaming'"). Import the (empty, protobuf-free)
    # parent package and hang the shim on it.
    try:
        import importlib

        proto_pkg = importlib.import_module("pyspark.sql.streaming.proto")
        setattr(proto_pkg, "StateMessage_pb2", sys.modules[__name__])
    except ImportError:
        pass  # no pyspark here (unit tests of the shim itself)
    return True
