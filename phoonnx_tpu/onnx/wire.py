"""Protobuf wire-format primitives (decode + encode).

Only what the ONNX container needs: varints, length-delimited fields,
fixed32/64, packed repeated scalars. Schema-driven decoding keeps the
message definitions declarative in reader.py.
"""

import struct
from typing import Iterator, List, Tuple

WIRETYPE_VARINT = 0
WIRETYPE_FIXED64 = 1
WIRETYPE_LEN = 2
WIRETYPE_FIXED32 = 5


def read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        byte = data[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def iter_fields(data: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    end = len(data)
    while pos < end:
        tag, pos = read_varint(data, pos)
        field_number = tag >> 3
        wire_type = tag & 0x7
        if wire_type == WIRETYPE_VARINT:
            value, pos = read_varint(data, pos)
        elif wire_type == WIRETYPE_FIXED64:
            value = struct.unpack_from("<Q", data, pos)[0]
            pos += 8
        elif wire_type == WIRETYPE_LEN:
            length, pos = read_varint(data, pos)
            if pos + length > len(data):
                # python slicing would silently CLAMP a truncated field
                # and the caller would fail later with an unrelated
                # shape/frombuffer error — say what actually happened
                raise ValueError(
                    f"truncated protobuf: field {field_number} declares "
                    f"{length} bytes with {len(data) - pos} remaining "
                    "(corrupt or incomplete file?)")
            value = data[pos:pos + length]
            pos += length
        elif wire_type == WIRETYPE_FIXED32:
            value = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
        yield field_number, wire_type, value


def decode_packed_varints(data: bytes) -> List[int]:
    out = []
    pos = 0
    while pos < len(data):
        value, pos = read_varint(data, pos)
        out.append(value)
    return out


def zigzag_to_signed(value: int, bits: int = 64) -> int:
    """Interpret a varint as two's-complement signed.

    Despite the historical name this is two's-complement, not zigzag:
    protobuf int32/int64 fields encode negatives as sign-EXTENDED 64-bit
    varints, so the value must be masked to ``bits`` before the sign
    test (a negative int32 arrives as a 10-byte varint near 2^64).
    """
    value &= (1 << bits) - 1
    if value >= 1 << (bits - 1):
        value -= 1 << bits
    return value


# ---------------------------------------------------------------------------
# Encoding (for export + tests)
# ---------------------------------------------------------------------------


def encode_varint(value: int) -> bytes:
    if value < 0:
        value += 1 << 64
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def encode_tag(field_number: int, wire_type: int) -> bytes:
    return encode_varint((field_number << 3) | wire_type)


def encode_len_field(field_number: int, payload: bytes) -> bytes:
    return (encode_tag(field_number, WIRETYPE_LEN)
            + encode_varint(len(payload)) + payload)


def encode_varint_field(field_number: int, value: int) -> bytes:
    return encode_tag(field_number, WIRETYPE_VARINT) + encode_varint(value)


def encode_string_field(field_number: int, value: str) -> bytes:
    return encode_len_field(field_number, value.encode("utf-8"))
