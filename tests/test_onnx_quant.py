"""Quantized ONNX op tests (int8 exports: QuantizeLinear family).

Integer semantics are checked exactly against independent numpy math;
the end-to-end dynamically-quantized MLP is checked against its float
counterpart within quantization error.
"""

import numpy as np

from phoonnx_tpu.onnx.executor import OnnxExecutor
from phoonnx_tpu.onnx.reader import read_onnx
from phoonnx_tpu.onnx.writer import write_onnx


def build_and_load(tmp_path, initializers, nodes, inputs, outputs):
    path = tmp_path / "model.onnx"
    write_onnx(str(path), initializers, inputs=inputs, outputs=outputs,
               nodes=nodes)
    return OnnxExecutor(read_onnx(str(path)))


def test_quantize_dequantize_roundtrip(tmp_path):
    ex = build_and_load(
        tmp_path,
        {"s": np.float32(0.05), "z": np.uint8(128)},
        nodes=[("QuantizeLinear", ["x", "s", "z"], ["q"]),
               ("DequantizeLinear", ["q", "s", "z"], ["y"])],
        inputs=["x"], outputs=["q", "y"],
    )
    x = np.asarray([[-6.4, -0.07, 0.0, 0.024, 0.025, 3.2, 99.0]],
                   np.float32)
    q, y = ex.run({"x": x})
    assert q.dtype == np.uint8
    # saturation at the ends; round-half-to-even at 0.025/0.05 = 0.5
    np.testing.assert_array_equal(
        q[0], [0, 127, 128, 128, 128, 192, 255])
    np.testing.assert_array_equal(
        y, ((q.astype(np.int32) - 128) * np.float32(0.05)
            ).astype(np.float32))


def test_quantize_linear_per_axis_int8(tmp_path):
    scale = np.asarray([0.1, 0.2], np.float32)
    zp = np.asarray([0, 10], np.int8)
    ex = build_and_load(
        tmp_path, {"s": scale, "z": zp},
        nodes=[("QuantizeLinear", ["x", "s", "z"], ["q"], {"axis": 0})],
        inputs=["x"], outputs=["q"],
    )
    x = np.asarray([[1.0, -1.0], [2.0, -4.0]], np.float32)
    q = ex.run({"x": x})[0]
    assert q.dtype == np.int8
    np.testing.assert_array_equal(q, [[10, -10], [20, -10]])


def test_dynamic_quantize_linear_spec(tmp_path):
    ex = build_and_load(
        tmp_path, {},
        nodes=[("DynamicQuantizeLinear", ["x"], ["q", "s", "z"])],
        inputs=["x"], outputs=["q", "s", "z"],
    )
    x = np.asarray([0.0, 2.0, -1.0, 5.0], np.float32)
    q, s, z = ex.run({"x": x})
    # rmin -1, rmax 5 -> scale 6/255, zp = round(255/6) = 42 (banker's: 42.5 -> 42)
    assert s == np.float32(6.0 / 255.0)
    assert z == np.uint8(np.rint(1.0 / (6.0 / 255.0)))
    expect = np.clip(np.rint(x / s).astype(np.int32) + int(z), 0, 255)
    np.testing.assert_array_equal(q.astype(np.int32), expect)
    # all-zero input must not divide by zero
    q0, s0, z0 = ex.run({"x": np.zeros(3, np.float32)})
    assert s0 == np.float32(1.0) and z0 == np.uint8(0)
    np.testing.assert_array_equal(q0, np.zeros(3, np.uint8))


def test_matmul_integer_exact(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (3, 500), np.uint8)
    b = rng.integers(-128, 128, (500, 4), np.int8)
    ex = build_and_load(
        tmp_path,
        {"b": b, "azp": np.uint8(131), "bzp": np.int8(-7)},
        nodes=[("MatMulInteger", ["a", "b", "azp", "bzp"], ["y"])],
        inputs=["a"], outputs=["y"],
    )
    y = ex.run({"a": a})[0]
    assert y.dtype == np.int32
    want = (a.astype(np.int64) - 131) @ (b.astype(np.int64) + 7)
    np.testing.assert_array_equal(y.astype(np.int64), want)


def test_qlinear_matmul(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (2, 8), np.uint8)
    b = rng.integers(0, 256, (8, 3), np.uint8)
    consts = {
        "as_": np.float32(0.02), "az": np.uint8(120),
        "b_": b, "bs": np.float32(0.01), "bz": np.uint8(128),
        "ys": np.float32(0.1), "yz": np.uint8(100),
    }
    ex = build_and_load(
        tmp_path, consts,
        nodes=[("QLinearMatMul",
                ["a", "as_", "az", "b_", "bs", "bz", "ys", "yz"], ["y"])],
        inputs=["a"], outputs=["y"],
    )
    y = ex.run({"a": a})[0]
    assert y.dtype == np.uint8
    acc = (a.astype(np.int64) - 120) @ (b.astype(np.int64) - 128)
    want = np.clip(np.rint(acc * (0.02 * 0.01 / 0.1)) + 100, 0, 255)
    np.testing.assert_array_equal(y.astype(np.int64), want)


def test_conv_integer_exact_1d(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, (1, 3, 20), np.uint8)
    w = rng.integers(-128, 128, (4, 3, 5), np.int8)
    ex = build_and_load(
        tmp_path, {"w": w, "xz": np.uint8(100)},
        nodes=[("ConvInteger", ["x", "w", "xz"], ["y"],
                {"pads": [2, 2], "dilations": [2]})],
        inputs=["x"], outputs=["y"],
    )
    y = ex.run({"x": x})[0]
    assert y.dtype == np.int32
    # brute-force reference
    xp = np.pad(x.astype(np.int64) - 100, ((0, 0), (0, 0), (2, 2)))
    t_out = xp.shape[2] - (5 - 1) * 2
    want = np.zeros((1, 4, t_out), np.int64)
    for o in range(4):
        for t in range(t_out):
            acc = 0
            for c in range(3):
                for k in range(5):
                    acc += xp[0, c, t + k * 2] * int(w[o, c, k])
            want[0, o, t] = acc
    np.testing.assert_array_equal(y.astype(np.int64), want)


def test_conv_integer_2d_grouped_strided(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (2, 4, 9, 8), np.uint8)
    w = rng.integers(-128, 128, (6, 2, 3, 3), np.int8)
    ex = build_and_load(
        tmp_path, {"w": w},
        nodes=[("ConvInteger", ["x", "w"], ["y"],
                {"pads": [1, 1, 1, 1], "strides": [2, 2], "group": 2})],
        inputs=["x"], outputs=["y"],
    )
    y = ex.run({"x": x})[0]
    # scipy-free reference via float64 (exact for these small sums)
    xp = np.pad(x.astype(np.int64), ((0, 0), (0, 0), (1, 1), (1, 1)))
    oh = (xp.shape[2] - 3) // 2 + 1
    ow = (xp.shape[3] - 3) // 2 + 1
    want = np.zeros((2, 6, oh, ow), np.int64)
    for n in range(2):
        for g in range(2):
            for o in range(3):
                oc = g * 3 + o
                for i in range(oh):
                    for j in range(ow):
                        acc = 0
                        for c in range(2):
                            ic = g * 2 + c
                            for ki in range(3):
                                for kj in range(3):
                                    acc += (xp[n, ic, 2 * i + ki,
                                               2 * j + kj]
                                            * int(w[oc, c, ki, kj]))
                        want[n, oc, i, j] = acc
    np.testing.assert_array_equal(y.astype(np.int64), want)


def test_qlinear_conv_per_channel_scale(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (1, 2, 10), np.uint8)
    w = rng.integers(-128, 128, (3, 2, 3), np.int8)
    w_scale = np.asarray([0.01, 0.02, 0.03], np.float32)
    b = rng.integers(-1000, 1000, (3,), np.int32)
    consts = {
        "xs": np.float32(0.05), "xz": np.uint8(128),
        "w": w, "ws": w_scale, "wz": np.int8(0),
        "ys": np.float32(0.2), "yz": np.uint8(110), "b": b,
    }
    ex = build_and_load(
        tmp_path, consts,
        nodes=[("QLinearConv",
                ["x", "xs", "xz", "w", "ws", "wz", "ys", "yz", "b"],
                ["y"], {"pads": [1, 1]})],
        inputs=["x"], outputs=["y"],
    )
    y = ex.run({"x": x})[0]
    assert y.dtype == np.uint8 and y.shape == (1, 3, 10)
    # reference
    xp = np.pad(x.astype(np.int64) - 128, ((0, 0), (0, 0), (1, 1)))
    acc = np.zeros((1, 3, 10), np.int64)
    for o in range(3):
        for t in range(10):
            s = 0
            for c in range(2):
                for k in range(3):
                    s += xp[0, c, t + k] * int(w[o, c, k])
            acc[0, o, t] = s + int(b[o])
    scale = (0.05 * w_scale / 0.2).reshape(1, 3, 1)
    want = np.clip(np.rint(acc * scale) + 110, 0, 255)
    np.testing.assert_array_equal(y.astype(np.int64), want)


def test_dynamically_quantized_mlp_close_to_float(tmp_path):
    """The standard ort dynamic-quantization graph shape:
    DynamicQuantizeLinear -> MatMulInteger -> Mul (scales) -> Add bias."""
    rng = np.random.default_rng(5)
    w = rng.standard_normal((16, 8)).astype(np.float32) * 0.3
    bias = rng.standard_normal(8).astype(np.float32)
    w_scale = np.float32(np.abs(w).max() / 127.0)
    w_q = np.clip(np.rint(w / w_scale), -127, 127).astype(np.int8)
    ex = build_and_load(
        tmp_path,
        {"wq": w_q, "ws": w_scale, "bias": bias},
        nodes=[
            ("DynamicQuantizeLinear", ["x"], ["xq", "xs", "xz"]),
            ("MatMulInteger", ["xq", "wq", "xz"], ["acc"]),
            ("Cast", ["acc"], ["accf"], {"to": 1}),
            ("Mul", ["xs", "ws"], ["sc"]),
            ("Mul", ["accf", "sc"], ["scaled"]),
            ("Add", ["scaled", "bias"], ["y"]),
        ],
        inputs=["x"], outputs=["y"],
    )
    x = rng.standard_normal((4, 16)).astype(np.float32)
    got = ex.run({"x": x})[0]
    want = x @ w + bias
    err = np.abs(got - want).max()
    assert err < 0.05, err  # within int8 quantization error


# -- weight-only quantization: quantize_flat / dequantize_flat ----------


def test_quantize_dequantize_flat_roundtrip():
    from phoonnx_tpu.onnx.dequant import dequantize_flat, quantize_flat

    rng = np.random.default_rng(7)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    small = rng.standard_normal(32).astype(np.float32)  # below min_size
    named, n = quantize_flat({"enc.weight": w, "enc.bias": small})
    assert n == 1
    assert named["enc.weight_quantized"].dtype == np.int8
    assert "enc.weight" not in named
    np.testing.assert_array_equal(named["enc.bias"], small)

    restored, n_deq = dequantize_flat(named)
    assert n_deq == 1
    assert set(restored) == {"enc.weight", "enc.bias"}
    scale = float(named["enc.weight_scale"])
    assert np.abs(restored["enc.weight"] - w).max() <= scale * 0.5 + 1e-7


def test_quantize_flat_per_channel():
    from phoonnx_tpu.onnx.dequant import dequantize_flat, quantize_flat

    rng = np.random.default_rng(8)
    # wildly different per-channel magnitudes: per-tensor would destroy
    # the small channels, per-channel must preserve them
    w = rng.standard_normal((8, 16, 16)).astype(np.float32)
    w *= np.logspace(-3, 1, 8, dtype=np.float32).reshape(8, 1, 1)
    named, n = quantize_flat({"w": w}, per_channel=True)
    assert n == 1
    assert named["w_scale"].shape == (8,)
    restored, _ = dequantize_flat(named)
    rel = np.abs(restored["w"] - w).max(axis=(1, 2)) / np.abs(w).max(axis=(1, 2))
    assert rel.max() < 0.005  # per-channel: every channel keeps precision


def test_dequantize_flat_uint8_zero_point():
    from phoonnx_tpu.onnx.dequant import dequantize_flat

    q = np.asarray([[0, 128, 255]], np.uint8)
    named, n = dequantize_flat({
        "x_quantized": q,
        "x_scale": np.float32(0.5),
        "x_zero_point": np.uint8(128),
    })
    assert n == 1
    np.testing.assert_allclose(named["x"], [[-64.0, 0.0, 63.5]])


def test_dequantize_flat_leaves_malformed_triples():
    from phoonnx_tpu.onnx.dequant import dequantize_flat

    # scale missing -> untouched (caller falls back to the interpreter)
    named, n = dequantize_flat({"x_quantized": np.zeros((4, 4), np.int8)})
    assert n == 0 and "x_quantized" in named
    # base name collision -> untouched
    named, n = dequantize_flat({
        "y_quantized": np.zeros((4, 4), np.int8),
        "y_scale": np.float32(1.0),
        "y": np.zeros((4, 4), np.float32),
    })
    assert n == 0 and "y_quantized" in named and "y" in named


def test_dequantize_flat_refuses_ambiguous_square_per_channel():
    """A [32,32] per-channel scale matches both axes; the name-triple
    pass cannot know the node's axis, so it must refuse (guessing axis 0
    on a per-column MatMul weight dequantizes to garbage)."""
    from phoonnx_tpu.onnx.dequant import dequantize_flat

    rng = np.random.default_rng(9)
    w = rng.standard_normal((32, 32)).astype(np.float32)
    scale = (np.abs(w).max(axis=0) / 127.0).astype(np.float32)  # per column
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    named, n = dequantize_flat({
        "w_quantized": q, "w_scale": scale,
        "w_zero_point": np.zeros(32, np.int8),
    })
    assert n == 0
    assert "w_quantized" in named and "w" not in named
