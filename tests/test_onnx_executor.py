"""ONNX executor tests: hand-built graphs validated against numpy/torch."""

import numpy as np
import pytest

from phoonnx_tpu.onnx.executor import OnnxExecutor
from phoonnx_tpu.onnx.reader import read_onnx
from phoonnx_tpu.onnx.writer import write_onnx

torch = pytest.importorskip("torch")


def build_and_load(tmp_path, initializers, nodes, inputs, outputs):
    path = tmp_path / "model.onnx"
    write_onnx(str(path), initializers, inputs=inputs, outputs=outputs,
               nodes=nodes)
    return OnnxExecutor(read_onnx(str(path)))


def test_mlp_graph(tmp_path):
    rng = np.random.default_rng(0)
    w1 = rng.standard_normal((4, 8)).astype(np.float32)
    b1 = rng.standard_normal(8).astype(np.float32)
    w2 = rng.standard_normal((8, 3)).astype(np.float32)

    executor = build_and_load(
        tmp_path,
        {"w1": w1, "b1": b1, "w2": w2},
        nodes=[
            ("MatMul", ["x", "w1"], ["h0"]),
            ("Add", ["h0", "b1"], ["h1"]),
            ("Relu", ["h1"], ["h2"]),
            ("MatMul", ["h2", "w2"], ["h3"]),
            ("Softmax", ["h3"], ["y"], {"axis": -1}),
        ],
        inputs=["x"], outputs=["y"],
    )
    x = rng.standard_normal((2, 4)).astype(np.float32)
    got = executor.run({"x": x})[0]
    want = np.maximum(x @ w1 + b1, 0) @ w2
    want = np.exp(want - want.max(-1, keepdims=True))
    want /= want.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attribute_roundtrip(tmp_path):
    path = tmp_path / "attrs.onnx"
    write_onnx(
        str(path), {},
        nodes=[("Transpose", ["x"], ["y"], {"perm": [1, 0, 2]}),
               ("Gemm", ["a", "b"], ["c"],
                {"alpha": 2.0, "transB": 1, "name_s": "hello"})],
        inputs=["x"], outputs=["y"],
    )
    model = read_onnx(str(path))
    assert model.nodes[0].attributes["perm"] == [1, 0, 2]
    assert model.nodes[1].attributes["alpha"] == 2.0
    assert model.nodes[1].attributes["transB"] == 1
    assert model.nodes[1].attributes["name_s"] == "hello"


def test_conv1d_matches_torch(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 20)).astype(np.float32)  # NCH
    w = rng.standard_normal((5, 3, 4)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    executor = build_and_load(
        tmp_path, {"w": w, "b": b},
        nodes=[("Conv", ["x", "w", "b"], ["y"],
                {"strides": [2], "pads": [1, 1], "dilations": [1],
                 "group": 1})],
        inputs=["x"], outputs=["y"],
    )
    got = executor.run({"x": x})[0]
    want = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=1,
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_lstm_matches_torch(tmp_path):
    rng = np.random.default_rng(2)
    t_len, batch, input_size, hidden = 6, 2, 3, 4
    x = rng.standard_normal((t_len, batch, input_size)).astype(np.float32)

    cell = torch.nn.LSTM(input_size, hidden)
    with torch.no_grad():
        want, (want_h, want_c) = cell(torch.from_numpy(x))

    # torch gate order iofc? torch uses ifgo; ONNX uses iofc.
    w_ih = cell.weight_ih_l0.detach().numpy()  # [4H, I] i,f,g,o
    w_hh = cell.weight_hh_l0.detach().numpy()
    b_ih = cell.bias_ih_l0.detach().numpy()
    b_hh = cell.bias_hh_l0.detach().numpy()

    def reorder(m):  # torch i,f,g,o -> onnx i,o,f,c(g)
        i, f, g, o = np.split(m, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    w = reorder(w_ih)[None]
    r = reorder(w_hh)[None]
    b = np.concatenate([reorder(b_ih), reorder(b_hh)])[None]

    executor = build_and_load(
        tmp_path, {"w": w, "r": r, "b": b},
        nodes=[("LSTM", ["x", "w", "r", "b"], ["y", "y_h", "y_c"],
                {"hidden_size": hidden, "direction": "forward"})],
        inputs=["x"], outputs=["y", "y_h", "y_c"],
    )
    y, y_h, y_c = executor.run({"x": x})
    np.testing.assert_allclose(y[:, 0], want.numpy(), atol=1e-5)
    np.testing.assert_allclose(y_h, want_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(y_c, want_c.numpy(), atol=1e-5)


def test_gru_matches_torch(tmp_path):
    rng = np.random.default_rng(3)
    t_len, batch, input_size, hidden = 5, 2, 3, 4
    x = rng.standard_normal((t_len, batch, input_size)).astype(np.float32)

    cell = torch.nn.GRU(input_size, hidden)
    with torch.no_grad():
        want, want_h = cell(torch.from_numpy(x))

    # torch gate order r,z,n -> onnx z,r,h
    def reorder(m):
        r, z, n = np.split(m, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)

    w = reorder(cell.weight_ih_l0.detach().numpy())[None]
    r = reorder(cell.weight_hh_l0.detach().numpy())[None]
    b = np.concatenate([
        reorder(cell.bias_ih_l0.detach().numpy()),
        reorder(cell.bias_hh_l0.detach().numpy()),
    ])[None]

    executor = build_and_load(
        tmp_path, {"w": w, "r": r, "b": b},
        nodes=[("GRU", ["x", "w", "r", "b"], ["y", "y_h"],
                {"hidden_size": hidden, "direction": "forward",
                 "linear_before_reset": 1})],
        inputs=["x"], outputs=["y", "y_h"],
    )
    y, y_h = executor.run({"x": x})
    np.testing.assert_allclose(y[:, 0], want.numpy(), atol=1e-5)
    np.testing.assert_allclose(y_h, want_h.numpy(), atol=1e-5)


def test_shape_ops(tmp_path):
    executor = build_and_load(
        tmp_path, {},
        nodes=[
            ("Shape", ["x"], ["shape"]),
            ("Gather", ["shape", "idx"], ["dim"], {"axis": 0}),
            ("Unsqueeze", ["dim"], ["dim1"], {"axes": [0]}),
            ("Cast", ["dim1"], ["out"], {"to": 1}),
        ],
        inputs=["x", "idx"], outputs=["out"],
    )
    out = executor.run({
        "x": np.zeros((3, 7, 2), np.float32),
        "idx": np.asarray(1, np.int64),
    })[0]
    assert out.dtype == np.float32
    assert out.tolist() == [7.0]


def test_slice_and_concat(tmp_path):
    executor = build_and_load(
        tmp_path, {},
        nodes=[
            ("Slice", ["x", "starts", "ends", "axes"], ["a"]),
            ("Concat", ["a", "a"], ["y"], {"axis": 1}),
        ],
        inputs=["x", "starts", "ends", "axes"], outputs=["y"],
    )
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = executor.run({
        "x": x,
        "starts": np.asarray([1], np.int64),
        "ends": np.asarray([3], np.int64),
        "axes": np.asarray([1], np.int64),
    })[0]
    np.testing.assert_array_equal(out, np.concatenate([x[:, 1:3]] * 2, 1))


def test_trig_mod_einsum_ops(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((2, 4, 5)).astype(np.float32)
    executor = build_and_load(
        tmp_path, {},
        nodes=[
            ("Sin", ["a"], ["sa"]),
            ("Cos", ["a"], ["ca"]),
            ("Einsum", ["a", "b"], ["mm"], {"equation": "bij,bjk->bik"}),
            ("Mod", ["ia", "ib"], ["m0"]),
            ("Mod", ["fa", "fb"], ["m1"], {"fmod": 1}),
        ],
        inputs=["a", "b", "ia", "ib", "fa", "fb"],
        outputs=["sa", "ca", "mm", "m0", "m1"],
    )
    ia = np.asarray([5, -5, 7], np.int64)
    ib = np.asarray([3, 3, -4], np.int64)
    fa = np.asarray([5.5, -5.5], np.float32)
    fb = np.asarray([3.0, 3.0], np.float32)
    sa, ca, mm, m0, m1 = executor.run(
        {"a": a, "b": b, "ia": ia, "ib": ib, "fa": fa, "fb": fb})
    np.testing.assert_allclose(sa, np.sin(a), rtol=1e-6)
    np.testing.assert_allclose(ca, np.cos(a), rtol=1e-6)
    np.testing.assert_allclose(mm, np.einsum("bij,bjk->bik", a, b),
                               rtol=1e-5)
    np.testing.assert_array_equal(m0, np.mod(ia, ib))   # sign of divisor
    np.testing.assert_allclose(m1, np.fmod(fa, fb))     # C fmod semantics


def test_int_div_truncates_toward_zero():
    """ONNX integer Div truncates toward zero; np.floor_divide rounds
    toward -inf (off by one for negative quotients)."""
    from phoonnx_tpu.onnx.executor import _int_div

    assert _int_div(np.int64(-7), np.int64(2)) == -3
    assert _int_div(np.int64(7), np.int64(-2)) == -3
    assert _int_div(np.int64(7), np.int64(2)) == 3
    assert _int_div(np.int64(-8), np.int64(2)) == -4
    np.testing.assert_array_equal(
        _int_div(np.asarray([-7, 7, -8]), np.asarray([2, -2, 4])),
        [-3, -3, -2],
    )


def test_cumsum_exclusive_reverse():
    from phoonnx_tpu.onnx.executor import _op_cumsum
    from phoonnx_tpu.onnx.reader import OnnxNode

    x = np.asarray([1.0, 2.0, 3.0])
    node = OnnxNode(op_type="CumSum", name="c",
                    inputs=["x", "a"], outputs=["y"],
                    attributes={"exclusive": 1})
    np.testing.assert_array_equal(
        _op_cumsum(node, x, np.int64(0)), [0.0, 1.0, 3.0])
    node2 = OnnxNode(op_type="CumSum", name="c", inputs=["x", "a"],
                     outputs=["y"], attributes={"reverse": 1})
    np.testing.assert_array_equal(
        _op_cumsum(node2, x, np.int64(0)), [6.0, 5.0, 3.0])


def test_negative_int32_initializer_roundtrip(tmp_path):
    """Protobuf sign-extends negative int32 to 64-bit varints; the
    decoder must mask before the sign test (raw negatives decoded to
    values near 2^64 and overflowed numpy)."""
    from phoonnx_tpu.onnx.reader import read_onnx
    from phoonnx_tpu.onnx.writer import write_onnx

    path = tmp_path / "neg.onnx"
    arrays = {
        "neg64": np.asarray([-1, -2, 3], np.int64),
        "neg32": np.asarray([-5, 7], np.int32),
    }
    write_onnx(str(path), arrays, metadata={}, inputs=["input"],
               outputs=["output"])
    model = read_onnx(str(path))
    for name, want in arrays.items():
        np.testing.assert_array_equal(model.initializers[name], want)


def test_scalar_initializer_keeps_rank_zero(tmp_path):
    from phoonnx_tpu.onnx.reader import read_onnx
    from phoonnx_tpu.onnx.writer import write_onnx

    path = tmp_path / "scalar.onnx"
    write_onnx(str(path), {"s": np.asarray(2.5, np.float32)},
               metadata={}, inputs=["input"], outputs=["output"])
    model = read_onnx(str(path))
    assert model.initializers["s"].shape == ()
    assert float(model.initializers["s"]) == 2.5
