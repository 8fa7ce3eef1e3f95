"""ONNX model reader: initializers, graph I/O names, nodes, metadata.

Covers the subset of onnx.proto needed to import VITS voices exported by
the reference (phoonnx_train/export_onnx.py: opset 15, initializers keep
torch state_dict names, metadata_props carry voice config). Tensors decode
to numpy arrays from either raw_data or the typed repeated fields.
"""

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from phoonnx_tpu.onnx import wire

# onnx.TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}


@dataclass
class OnnxNode:
    op_type: str
    name: str
    inputs: List[str]
    outputs: List[str]
    attributes: Dict[str, object] = field(default_factory=dict)


@dataclass
class OnnxModel:
    initializers: Dict[str, np.ndarray]
    metadata: Dict[str, str]
    inputs: List[str]
    outputs: List[str]
    nodes: List[OnnxNode]
    ir_version: int = 0
    opset: int = 0
    graph_name: str = ""


def _parse_tensor(data: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    data_type = 1
    name = ""
    raw: Optional[bytes] = None
    float_data: List[float] = []
    int32_data: List[int] = []
    int64_data: List[int] = []
    double_data: List[float] = []
    uint64_data: List[int] = []
    external = False

    for field_number, wire_type, value in wire.iter_fields(data):
        if field_number == 1:  # dims (packed or unpacked varints)
            if wire_type == wire.WIRETYPE_LEN:
                dims.extend(wire.decode_packed_varints(value))
            else:
                dims.append(value)
        elif field_number == 2:
            data_type = value
        elif field_number == 8:
            name = value.decode("utf-8")
        elif field_number == 9:
            raw = value
        elif field_number == 4:  # float_data
            if wire_type == wire.WIRETYPE_LEN:
                float_data.extend(
                    struct.unpack(f"<{len(value) // 4}f", value)
                )
            else:
                float_data.append(struct.unpack("<f", struct.pack("<I", value))[0])
        elif field_number == 5:  # int32_data
            if wire_type == wire.WIRETYPE_LEN:
                int32_data.extend(wire.decode_packed_varints(value))
            else:
                int32_data.append(value)
        elif field_number == 7:  # int64_data
            if wire_type == wire.WIRETYPE_LEN:
                int64_data.extend(wire.decode_packed_varints(value))
            else:
                int64_data.append(value)
        elif field_number == 10:  # double_data
            if wire_type == wire.WIRETYPE_LEN:
                double_data.extend(
                    struct.unpack(f"<{len(value) // 8}d", value)
                )
        elif field_number == 11:  # uint64_data (uint32/uint64 tensors)
            if wire_type == wire.WIRETYPE_LEN:
                uint64_data.extend(wire.decode_packed_varints(value))
            else:
                uint64_data.append(value)
        elif field_number in (13, 14):  # external_data / data_location
            if field_number == 14 and value == 0:
                continue  # DEFAULT location: data is inline
            external = True

    dtype = _DTYPES.get(data_type)
    if dtype is None:
        raise ValueError(f"unsupported tensor data_type {data_type} ({name})")

    if external:
        raise NotImplementedError(
            f"tensor {name!r} stores its data EXTERNALLY "
            "(data_location=EXTERNAL); re-save the model with "
            "all tensors inline (onnx.save with "
            "save_as_external_data=False)")
    if raw is not None:
        array = np.frombuffer(raw, dtype=dtype)
    elif float_data:
        array = np.asarray(float_data, dtype=dtype)
    elif int64_data:
        array = np.asarray(
            [wire.zigzag_to_signed(v) for v in int64_data], dtype=dtype
        )
    elif int32_data:
        if dtype == np.float16:
            # fp16 tensors store uint16 BIT PATTERNS in int32_data —
            # numeric conversion would turn 0x3C00 (1.0) into inf
            array = np.asarray(
                [v & 0xFFFF for v in int32_data], dtype=np.uint16
            ).view(np.float16)
        else:
            array = np.asarray(
                [wire.zigzag_to_signed(v, 32) for v in int32_data],
                dtype=dtype,
            )
    elif double_data:
        array = np.asarray(double_data, dtype=dtype)
    elif uint64_data:
        array = np.asarray(uint64_data, dtype=dtype)
    else:
        array = np.zeros(0, dtype=dtype)

    # always reshape: dims == [] is a RANK-0 tensor, shape (), not (1,)
    return name, array.reshape(dims)


def _parse_value_info_name(data: bytes) -> str:
    for field_number, _, value in wire.iter_fields(data):
        if field_number == 1:
            return value.decode("utf-8")
    return ""


def _parse_attribute(data: bytes):
    """AttributeProto -> (name, python value)."""
    name = ""
    value = None
    attr_type = 0  # AttributeProto.type (field 20)
    floats: List[float] = []
    ints: List[int] = []
    strings: List[str] = []
    for field_number, wire_type, raw in wire.iter_fields(data):
        if field_number == 1:
            name = raw.decode("utf-8")
        elif field_number == 20:
            attr_type = raw
        elif field_number == 2:  # f (float, fixed32)
            value = struct.unpack("<f", struct.pack("<I", raw))[0]
        elif field_number == 3:  # i (int64)
            value = wire.zigzag_to_signed(raw)
        elif field_number == 4:  # s (bytes)
            value = raw.decode("utf-8", errors="replace")
        elif field_number == 5:  # t (tensor)
            _, value = _parse_tensor(raw)
        elif field_number == 6:  # g (GraphProto) — If/Loop subgraphs
            sub = OnnxModel(initializers={}, metadata={}, inputs=[],
                            outputs=[], nodes=[])
            _parse_graph(raw, sub)
            value = sub
        elif field_number == 7:  # floats
            if wire_type == wire.WIRETYPE_LEN:
                floats.extend(struct.unpack(f"<{len(raw) // 4}f", raw))
            else:
                floats.append(struct.unpack("<f", struct.pack("<I", raw))[0])
        elif field_number == 8:  # ints
            if wire_type == wire.WIRETYPE_LEN:
                ints.extend(
                    wire.zigzag_to_signed(v)
                    for v in wire.decode_packed_varints(raw)
                )
            else:
                ints.append(wire.zigzag_to_signed(raw))
        elif field_number == 9:  # strings
            strings.append(raw.decode("utf-8", errors="replace"))
    if value is None:
        if floats:
            value = floats
        elif ints:
            value = ints
        elif strings:
            value = strings
        elif attr_type in (1, 2, 3):
            # proto3 writers omit zero-valued scalars from the wire —
            # a declared FLOAT/INT/STRING attribute with no payload IS
            # the value 0.0 / 0 / "", not "attribute absent" (None
            # would shadow consumer defaults: Gather axis=0 omitted on
            # the wire must read as 0, not fall back to _attr defaults)
            value = {1: 0.0, 2: 0, 3: ""}[attr_type]
        elif attr_type in (6, 7, 8):
            value = []  # declared-but-empty repeated field
    return name, value


def _parse_node(data: bytes) -> OnnxNode:
    inputs: List[str] = []
    outputs: List[str] = []
    name = ""
    op_type = ""
    attributes: Dict[str, object] = {}
    for field_number, _, value in wire.iter_fields(data):
        if field_number == 1:
            inputs.append(value.decode("utf-8"))
        elif field_number == 2:
            outputs.append(value.decode("utf-8"))
        elif field_number == 3:
            name = value.decode("utf-8")
        elif field_number == 4:
            op_type = value.decode("utf-8")
        elif field_number == 5:
            attr_name, attr_value = _parse_attribute(value)
            attributes[attr_name] = attr_value
    return OnnxNode(op_type=op_type, name=name, inputs=inputs,
                    outputs=outputs, attributes=attributes)


def _parse_string_entry(data: bytes) -> Tuple[str, str]:
    key = value = ""
    for field_number, _, raw in wire.iter_fields(data):
        if field_number == 1:
            key = raw.decode("utf-8")
        elif field_number == 2:
            value = raw.decode("utf-8")
    return key, value


def _parse_graph(data: bytes, model: OnnxModel) -> None:
    for field_number, _, value in wire.iter_fields(data):
        if field_number == 1:
            model.nodes.append(_parse_node(value))
        elif field_number == 2:
            model.graph_name = value.decode("utf-8")
        elif field_number == 5:
            name, tensor = _parse_tensor(value)
            model.initializers[name] = tensor
        elif field_number == 11:
            model.inputs.append(_parse_value_info_name(value))
        elif field_number == 12:
            model.outputs.append(_parse_value_info_name(value))


def _parse_opset(data: bytes) -> int:
    """Version of this opset_import entry, or 0 for non-default domains
    (a custom domain's version must not masquerade as the ai.onnx opset
    that governs op semantics)."""
    version = 0
    domain = ""
    for field_number, _, value in wire.iter_fields(data):
        if field_number == 1:
            domain = value.decode("utf-8", errors="replace")
        elif field_number == 2:
            version = value
    return version if domain in ("", "ai.onnx") else 0


def read_onnx(path: str) -> OnnxModel:
    """Parse an .onnx file (weights + names + metadata, not execution)."""
    with open(path, "rb") as f:
        data = f.read()

    model = OnnxModel(initializers={}, metadata={}, inputs=[], outputs=[],
                      nodes=[])
    for field_number, _, value in wire.iter_fields(data):
        if field_number == 1:
            model.ir_version = value
        elif field_number == 7:
            _parse_graph(value, model)
        elif field_number == 8:
            model.opset = max(model.opset, _parse_opset(value))
        elif field_number == 14:
            key, val = _parse_string_entry(value)
            model.metadata[key] = val

    # Graph inputs include initializers in some exporters; the true runtime
    # inputs are those without an initializer.
    model.inputs = [n for n in model.inputs if n not in model.initializers]
    return model
