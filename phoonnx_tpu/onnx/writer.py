"""ONNX container writer: initializers + metadata (+ optional nodes).

Used for exporting trained phoonnx_tpu weights in the reference's checkpoint
container format (initializer names = state_dict names, metadata_props as in
phoonnx_train/export_onnx.py:335-350) and for round-trip tests of the
reader. Graph nodes are optional — a weights-only container is sufficient
for phoonnx_tpu itself to reload a voice.
"""

from typing import Mapping, Optional, Sequence, Tuple

import numpy as np

from phoonnx_tpu.onnx import wire

_NP_TO_ONNX = {
    np.dtype(np.float32): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.int8): 3,
    np.dtype(np.uint16): 4,
    np.dtype(np.int16): 5,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
}


def _encode_tensor(name: str, array: np.ndarray) -> bytes:
    # NOT ascontiguousarray: that helper promotes rank-0 arrays to (1,),
    # silently turning scalar tensors into 1-vectors on the wire
    array = np.asarray(array, order="C")
    onnx_type = _NP_TO_ONNX.get(array.dtype)
    if onnx_type is None:
        raise ValueError(f"unsupported dtype {array.dtype} for {name}")
    out = bytearray()
    for dim in array.shape:
        out += wire.encode_varint_field(1, dim)
    out += wire.encode_varint_field(2, onnx_type)
    out += wire.encode_len_field(8, name.encode("utf-8"))
    out += wire.encode_len_field(9, array.tobytes())
    return bytes(out)


def _encode_value_info(spec) -> bytes:
    """ValueInfoProto from ``name`` or ``(name, dtype, shape)``.

    The ONNX IR requires graph inputs/outputs to carry TypeProto —
    name-only ValueInfoProto is invalid ONNX that onnxruntime refuses to
    load ("Input must have type info"), even though the in-repo reader
    tolerates it. Shape dims may be ints (fixed) or strings (dynamic
    dim_param, e.g. "N"/"T" — the reference exports dynamic batch/time
    axes the same way, export_onnx.py:318-327).
    """
    if isinstance(spec, str):
        return wire.encode_string_field(1, spec)
    name, dtype, shape = spec
    onnx_type = _NP_TO_ONNX.get(np.dtype(dtype))
    if onnx_type is None:
        raise ValueError(f"unsupported dtype {dtype} for {name}")
    shape_proto = bytearray()
    for dim in shape:
        if isinstance(dim, str):
            dim_proto = wire.encode_string_field(2, dim)  # dim_param
        else:
            dim_proto = wire.encode_varint_field(1, int(dim))  # dim_value
        shape_proto += wire.encode_len_field(1, bytes(dim_proto))
    tensor_type = (wire.encode_varint_field(1, onnx_type)
                   + wire.encode_len_field(2, bytes(shape_proto)))
    type_proto = wire.encode_len_field(1, tensor_type)
    return (wire.encode_string_field(1, name)
            + wire.encode_len_field(2, type_proto))


def _encode_attribute(name: str, value) -> bytes:
    out = bytearray()
    out += wire.encode_string_field(1, name)
    if isinstance(value, bool):
        out += wire.encode_varint_field(3, int(value))
        out += wire.encode_varint_field(20, 2)  # INT
    elif isinstance(value, int):
        out += wire.encode_varint_field(3, value)
        out += wire.encode_varint_field(20, 2)  # INT
    elif isinstance(value, float):
        import struct as _struct

        out += wire.encode_tag(2, wire.WIRETYPE_FIXED32)
        out += _struct.pack("<f", value)
        out += wire.encode_varint_field(20, 1)  # FLOAT
    elif isinstance(value, str):
        out += wire.encode_len_field(4, value.encode("utf-8"))
        out += wire.encode_varint_field(20, 3)  # STRING
    elif isinstance(value, np.ndarray):
        out += wire.encode_len_field(5, _encode_tensor("", value))
        out += wire.encode_varint_field(20, 4)  # TENSOR
    elif isinstance(value, dict) and "nodes" in value:
        # subgraph (If/Loop bodies): {"nodes": [...], "inputs": [...],
        # "outputs": [...], "initializers": {...}, "name": str}
        out += wire.encode_len_field(6, _encode_graph(
            value["nodes"],
            value.get("initializers", {}),
            value.get("inputs", ()),
            value.get("outputs", ()),
            value.get("name", "subgraph"),
        ))
        out += wire.encode_varint_field(20, 5)  # GRAPH
    elif isinstance(value, (list, tuple)) and all(
        isinstance(v, int) for v in value
    ):
        for v in value:
            out += wire.encode_varint_field(8, v)
        out += wire.encode_varint_field(20, 7)  # INTS
    elif isinstance(value, (list, tuple)) and all(
        isinstance(v, float) for v in value
    ):
        import struct as _struct

        for v in value:
            out += wire.encode_tag(7, wire.WIRETYPE_FIXED32)
            out += _struct.pack("<f", v)
        out += wire.encode_varint_field(20, 6)  # FLOATS
    else:
        raise ValueError(f"unsupported attribute type for {name}: {value!r}")
    return bytes(out)


def _encode_node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
                 name: str = "", attributes: Optional[dict] = None) -> bytes:
    out = bytearray()
    for inp in inputs:
        out += wire.encode_string_field(1, inp)
    for outp in outputs:
        out += wire.encode_string_field(2, outp)
    if name:
        out += wire.encode_string_field(3, name)
    out += wire.encode_string_field(4, op_type)
    for attr_name, attr_value in (attributes or {}).items():
        out += wire.encode_len_field(5, _encode_attribute(attr_name,
                                                          attr_value))
    return bytes(out)


def _encode_graph(
    nodes: Sequence[Tuple],
    initializers: Mapping[str, np.ndarray],
    inputs: Sequence[str],
    outputs: Sequence[str],
    graph_name: str,
) -> bytes:
    graph = bytearray()
    for node in nodes:
        op_type, node_in, node_out = node[0], node[1], node[2]
        attributes = node[3] if len(node) > 3 else None
        graph += wire.encode_len_field(
            1, _encode_node(op_type, node_in, node_out,
                            attributes=attributes)
        )
    graph += wire.encode_string_field(2, graph_name)
    for name, array in initializers.items():
        graph += wire.encode_len_field(5, _encode_tensor(name, array))
    for name in inputs:
        graph += wire.encode_len_field(11, _encode_value_info(name))
    for name in outputs:
        graph += wire.encode_len_field(12, _encode_value_info(name))
    return bytes(graph)


def write_onnx(
    path: str,
    initializers: Mapping[str, np.ndarray],
    metadata: Optional[Mapping[str, str]] = None,
    inputs: Sequence[str] = (),
    outputs: Sequence[str] = (),
    nodes: Sequence[Tuple[str, Sequence[str], Sequence[str]]] = (),
    graph_name: str = "phoonnx_tpu",
    opset: int = 15,
    producer: str = "phoonnx_tpu",
) -> None:
    graph = _encode_graph(nodes, initializers, inputs, outputs, graph_name)

    opset_entry = wire.encode_varint_field(2, opset)

    model = bytearray()
    model += wire.encode_varint_field(1, 8)  # ir_version
    model += wire.encode_string_field(2, producer)
    model += wire.encode_len_field(7, bytes(graph))
    model += wire.encode_len_field(8, opset_entry)
    for key, value in (metadata or {}).items():
        entry = (wire.encode_string_field(1, key)
                 + wire.encode_string_field(2, value))
        model += wire.encode_len_field(14, entry)

    with open(path, "wb") as f:
        f.write(bytes(model))
