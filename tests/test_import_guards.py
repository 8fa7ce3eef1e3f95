"""Import-layer integrity guards (found by review): foreign leaves must
not inject into the parameter pytree, corrupt containers must fail at
the wire layer with a clear message, and proto3 default-omitted
attribute scalars must read as their defaults."""

import io
import struct

import numpy as np
import pytest

import jax

from phoonnx_tpu.models.vits.load import (
    params_from_flat,
    params_to_flat,
    _route,
)
from phoonnx_tpu.models.vits.model import VitsHParams, random_params

from tests.test_voice_e2e import SMALL_HP


def test_foreign_leaf_names_do_not_inject():
    """A dequant-refused X_quantized triple routes into a real module
    path but its LEAF is not part of the skeleton: importing it used to
    silently inject the int8 junk while the real weight stayed at
    random init (quantize.py would then export a noise voice)."""
    params = random_params(jax.random.PRNGKey(0), SMALL_HP)
    flat = params_to_flat(params)
    name = "enc_p.encoder.attn_layers.0.conv_q.weight"
    junk = dict(flat)
    junk[name + "_quantized"] = np.zeros(
        np.asarray(flat[name]).shape, np.int8)
    with pytest.raises(ValueError, match="not .*part of the model|no slot"):
        params_from_flat(junk, SMALL_HP, strict=False)


def test_flow_flip_slots_are_unroutable():
    """torch flow.flows odd indices are parameterless Flip modules; a
    stray odd-index name used to alias onto idx//2 and overwrite a real
    coupling layer's leaves."""
    assert _route("flow.flows.0.pre.weight") is not None
    assert _route("flow.flows.1.pre.weight") is None
    assert _route("flow.other.2.pre.weight") is None


def test_truncated_container_fails_at_wire_layer(tmp_path):
    from phoonnx_tpu.onnx.reader import read_onnx
    from phoonnx_tpu.onnx.writer import write_onnx

    path = tmp_path / "m.onnx"
    write_onnx(str(path), {"w": np.ones((64, 64), np.float32)})
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])
    with pytest.raises(ValueError, match="truncated protobuf|corrupt"):
        read_onnx(str(path))


def test_external_data_tensor_clear_error(tmp_path):
    from phoonnx_tpu.onnx import wire
    from phoonnx_tpu.onnx.reader import read_onnx

    # hand-build a TensorProto with dims, dtype, name and
    # data_location=EXTERNAL (field 14 = 1), no data
    tensor = bytearray()
    tensor += wire.encode_varint_field(1, 4)
    tensor += wire.encode_varint_field(2, 1)  # float32
    tensor += wire.encode_len_field(8, b"w")
    tensor += wire.encode_varint_field(14, 1)  # EXTERNAL
    graph = wire.encode_len_field(5, bytes(tensor))
    model = (wire.encode_varint_field(1, 8)
             + wire.encode_len_field(7, bytes(graph)))
    path = tmp_path / "ext.onnx"
    open(path, "wb").write(bytes(model))
    with pytest.raises(NotImplementedError, match="EXTERNAL"):
        read_onnx(str(path))


def test_attribute_omitted_scalar_reads_as_default(tmp_path):
    """proto3 writers omit zero-valued scalars: a declared INT attribute
    with no payload IS 0, not attribute-absent (None used to shadow
    consumer defaults like Gather axis=0)."""
    from phoonnx_tpu.onnx import wire
    from phoonnx_tpu.onnx.reader import read_onnx

    attr = bytearray()
    attr += wire.encode_len_field(1, b"axis")
    attr += wire.encode_varint_field(20, 2)  # type INT, value omitted
    node = bytearray()
    node += wire.encode_len_field(1, b"x")
    node += wire.encode_len_field(2, b"y")
    node += wire.encode_len_field(4, b"Gather")
    node += wire.encode_len_field(5, bytes(attr))
    graph = wire.encode_len_field(1, bytes(node))
    model = (wire.encode_varint_field(1, 8)
             + wire.encode_len_field(7, bytes(graph)))
    path = tmp_path / "attr.onnx"
    open(path, "wb").write(bytes(model))
    parsed = read_onnx(str(path))
    assert parsed.nodes[0].attributes["axis"] == 0


def test_dequant_refuses_scalar_scale_vector_zero_point():
    from phoonnx_tpu.onnx.dequant import dequantize_flat

    named = {
        "w_quantized": np.zeros((256, 3), np.int8),
        "w_scale": np.float32(0.1),
        "w_zero_point": np.zeros(3, np.int8),
    }
    out, count = dequantize_flat(named)
    assert count == 0
    assert "w_quantized" in out  # left for the interpreter fallback


def test_custom_domain_opset_does_not_govern(tmp_path):
    from phoonnx_tpu.onnx import wire
    from phoonnx_tpu.onnx.reader import read_onnx

    entry_default = wire.encode_varint_field(2, 9)
    entry_custom = (wire.encode_len_field(1, b"org.custom")
                    + wire.encode_varint_field(2, 20))
    model = (wire.encode_varint_field(1, 8)
             + wire.encode_len_field(7, b"")
             + wire.encode_len_field(8, bytes(entry_default))
             + wire.encode_len_field(8, bytes(entry_custom)))
    path = tmp_path / "opset.onnx"
    open(path, "wb").write(bytes(model))
    assert read_onnx(str(path)).opset == 9
