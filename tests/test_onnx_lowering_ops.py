"""Lowering coverage for recurrent, quantized, and scatter/gather ops.

Extends the plan-based ONNX -> JAX lowering tests
(test_onnx_jax_lowering.py) to the op families the bundled auxiliary
models need on the compiled path: LSTM/GRU (silero VAD, tashkeel),
DynamicQuantizeLinear/MatMulInteger (phonikud int8), scatter/gather and
ReverseSequence (scripted torch exports). Every test pins parity with
the numpy interpreter — bit-exact for integer ops, reassociation-level
for floats — plus the plan-shape invariants (what jits vs what stays
eager).
"""

import numpy as np
import pytest

from phoonnx_tpu.onnx.builder import GraphBuilder
from phoonnx_tpu.onnx.executor import OnnxExecutor
from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner

from tests.test_onnx_jax_lowering import assert_parity, build_model


def _rnn_weights(rng, n_dir, n_gates, hidden, inp):
    w = rng.standard_normal((n_dir, n_gates * hidden, inp)).astype(
        np.float32) * 0.3
    r = rng.standard_normal((n_dir, n_gates * hidden, hidden)).astype(
        np.float32) * 0.3
    b = rng.standard_normal((n_dir, 2 * n_gates * hidden)).astype(
        np.float32) * 0.1
    return w, r, b


# -- LSTM / GRU -------------------------------------------------------------


@pytest.mark.parametrize("direction,n_dir", [
    ("forward", 1), ("reverse", 1), ("bidirectional", 2)])
def test_lstm_directions_with_bias_and_state(direction, n_dir):
    rng = np.random.default_rng(0)
    hidden, inp, t_len, batch = 5, 3, 9, 2
    b = GraphBuilder()
    w, r, bias = _rnn_weights(rng, n_dir, 4, hidden, inp)
    wn, rn, bn = b.init("w", w), b.init("r", r), b.init("b", bias)
    h0 = b.init("h0", rng.standard_normal(
        (n_dir, batch, hidden)).astype(np.float32) * 0.2)
    c0 = b.init("c0", rng.standard_normal(
        (n_dir, batch, hidden)).astype(np.float32) * 0.2)
    y, yh, yc = b.n("LSTM", ["x", wn, rn, bn, "", h0, c0], n_out=3,
                    hidden_size=hidden, direction=direction)
    model = build_model(b, ["x"], [y, yh, yc])
    x = rng.standard_normal((t_len, batch, inp)).astype(np.float32)
    runner = assert_parity(model, {"x": x}, rtol=1e-4, atol=1e-5)
    assert runner.plan_stats()["eager"] == 0


@pytest.mark.parametrize("direction,n_dir", [
    ("forward", 1), ("reverse", 1), ("bidirectional", 2)])
@pytest.mark.parametrize("lbr", [0, 1])
def test_gru_directions(direction, n_dir, lbr):
    rng = np.random.default_rng(1)
    hidden, inp, t_len, batch = 4, 3, 7, 2
    b = GraphBuilder()
    w, r, bias = _rnn_weights(rng, n_dir, 3, hidden, inp)
    wn, rn, bn = b.init("w", w), b.init("r", r), b.init("b", bias)
    y, yh = b.n("GRU", ["x", wn, rn, bn], n_out=2, hidden_size=hidden,
                direction=direction, linear_before_reset=lbr)
    model = build_model(b, ["x"], [y, yh])
    x = rng.standard_normal((t_len, batch, inp)).astype(np.float32)
    runner = assert_parity(model, {"x": x}, rtol=1e-4, atol=1e-5)
    assert runner.plan_stats()["eager"] == 0


@pytest.mark.parametrize("op,n_gates,n_out", [("LSTM", 4, 3),
                                              ("GRU", 3, 2)])
@pytest.mark.parametrize("direction", ["forward", "reverse",
                                       "bidirectional"])
def test_rnn_masked_sequence_lens(op, n_gates, n_out, direction):
    """Dynamic per-row lengths: ONNX masked semantics on both paths.

    Per row b: Y[t >= len_b] == 0, Y_h == the state at row b's last
    valid step, and each row's result equals running that row alone at
    its exact length (padding never leaks into the recurrence).
    """
    rng = np.random.default_rng(2)
    n_dir = 2 if direction == "bidirectional" else 1
    hidden, inp, t_len = 4, 3, 8
    lens = np.asarray([8, 5, 1], np.int64)
    batch = len(lens)
    b = GraphBuilder()
    w, r, bias = _rnn_weights(rng, n_dir, n_gates, hidden, inp)
    wn, rn, bn = b.init("w", w), b.init("r", r), b.init("b", bias)
    outs = b.n(op, ["x", wn, rn, bn, "lens"], n_out=n_out,
               hidden_size=hidden, direction=direction)
    model = build_model(b, ["x"], list(outs))
    x = rng.standard_normal((t_len, batch, inp)).astype(np.float32)
    feeds = {"x": x, "lens": lens}
    assert_parity(model, feeds, rtol=1e-4, atol=1e-5)

    y, y_h = OnnxExecutor(model).run(feeds)[:2]
    # zeros past each row's length
    for row, n in enumerate(lens):
        assert np.all(y[int(n):, :, row] == 0.0)
    # each row == solo run at its exact length
    for row, n in enumerate(lens):
        n = int(n)
        solo = OnnxExecutor(model).run(
            {"x": x[:n, row:row + 1], "lens": np.asarray([n], np.int64)})
        np.testing.assert_allclose(y[:n, :, row], solo[0][:, :, 0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(y_h[:, row], solo[1][:, 0],
                                   rtol=1e-5, atol=1e-6)


def test_rnn_uniform_static_lens_fold_to_fast_path():
    """sequence_lens as a full-length initializer compiles the unmasked
    path and matches the no-lens graph bit-for-bit."""
    rng = np.random.default_rng(3)
    hidden, inp, t_len, batch = 4, 3, 6, 2
    w, r, bias = _rnn_weights(rng, 1, 4, hidden, inp)
    x = rng.standard_normal((t_len, batch, inp)).astype(np.float32)

    def run(with_lens):
        b = GraphBuilder()
        wn, rn, bn = b.init("w", w), b.init("r", r), b.init("b", bias)
        inputs = ["x", wn, rn, bn]
        if with_lens:
            inputs.append(b.init(
                "lens", np.full(batch, t_len, np.int64)))
        y, _, _ = b.n("LSTM", inputs, n_out=3, hidden_size=hidden)
        model = build_model(b, ["x"], [y])
        runner = JaxGraphRunner(model)
        runner.run({"x": x})
        return np.asarray(runner.run({"x": x})[0])

    np.testing.assert_array_equal(run(False), run(True))


# -- quantized ops ------------------------------------------------------------


def test_dynamic_quantize_matmul_integer_jits_bit_exact():
    """The standard ort dynamic-quantization block (DQL -> MatMulInteger
    -> rescale) jits end-to-end; quantized ints are bit-exact vs the
    interpreter and shape-static downstream of DQL keeps folding."""
    rng = np.random.default_rng(4)
    w = rng.standard_normal((16, 8)).astype(np.float32) * 0.3
    w_scale = np.float32(np.abs(w).max() / 127.0)
    w_q = np.clip(np.rint(w / w_scale), -127, 127).astype(np.int8)
    b = GraphBuilder()
    wq = b.init("wq", w_q)
    ws = b.init("ws", w_scale)
    xq, xs, xz = b.n("DynamicQuantizeLinear", ["x"], n_out=3)
    acc = b.n("MatMulInteger", [xq, wq, xz])
    accf = b.cast(acc, 1)
    y = b.mul(accf, b.mul(xs, ws))
    # Shape of the DQL output must still fold (shapes stay static)
    sh = b.shape_of(xq)
    y2 = b.reshape(y, [2, -1])
    model = build_model(b, ["x"], [y, xq, sh, y2])
    x = rng.standard_normal((4, 16)).astype(np.float32)
    runner = assert_parity(model, {"x": x})
    stats = runner.plan_stats()
    assert stats["eager"] == 0
    assert stats["folded"] >= 1  # the Shape node
    # and the float result approximates the unquantized product
    got = runner.run({"x": x})[0]
    assert np.abs(got - x @ w).max() < 0.05


def test_quantize_linear_per_axis_parity():
    rng = np.random.default_rng(5)
    b = GraphBuilder()
    scale = b.init("s", np.asarray([0.02, 0.05, 0.1], np.float32))
    zp = b.init("z", np.asarray([10, -20, 3], np.int8))
    q = b.n("QuantizeLinear", ["x", scale, zp], axis=1)
    deq = b.n("DequantizeLinear", [q, scale, zp], axis=1)
    model = build_model(b, ["x"], [q, deq])
    x = (rng.standard_normal((4, 3, 5)) * 2).astype(np.float32)
    runner = assert_parity(model, {"x": x})
    assert runner.plan_stats()["eager"] == 0


# -- scatter / gather / reverse-sequence --------------------------------------


def test_gather_nd_parity_and_negative_indices():
    rng = np.random.default_rng(6)
    b = GraphBuilder()
    out = b.n("GatherND", ["x", "idx"])
    model = build_model(b, ["x"], [out])
    x = rng.standard_normal((4, 5, 6)).astype(np.float32)
    idx = np.asarray([[0, -1], [3, 2], [-4, 0]], np.int64)
    runner = assert_parity(model, {"x": x, "idx": idx})
    assert runner.plan_stats()["eager"] == 0


def test_reverse_sequence_parity():
    rng = np.random.default_rng(7)
    b = GraphBuilder()
    out = b.n("ReverseSequence", ["x", "lens"], batch_axis=0, time_axis=1)
    model = build_model(b, ["x"], [out])
    x = rng.standard_normal((3, 7, 2)).astype(np.float32)
    lens = np.asarray([7, 4, 1], np.int64)
    runner = assert_parity(model, {"x": x, "lens": lens})
    assert runner.plan_stats()["eager"] == 0


@pytest.mark.parametrize("reduction", ["add", "mul", "max", "min"])
def test_scatter_nd_reductions_jit(reduction):
    rng = np.random.default_rng(8)
    b = GraphBuilder()
    out = b.n("ScatterND", ["x", "idx", "upd"], reduction=reduction)
    model = build_model(b, ["x"], [out])
    x = rng.standard_normal((6, 3)).astype(np.float32)
    # duplicate rows on purpose: reductions combine them associatively
    idx = np.asarray([[1], [4], [1]], np.int64)
    upd = rng.standard_normal((3, 3)).astype(np.float32)
    runner = assert_parity(model, {"x": x, "idx": idx, "upd": upd},
                           rtol=1e-5, atol=1e-6)
    assert runner.plan_stats()["eager"] == 0


def test_scatter_nd_plain_static_unique_jits():
    rng = np.random.default_rng(9)
    b = GraphBuilder()
    idx = b.init("idx", np.asarray([[4], [0], [2]], np.int64))
    out = b.n("ScatterND", ["x", idx, "upd"])
    model = build_model(b, ["x"], [out])
    x = rng.standard_normal((6, 3)).astype(np.float32)
    upd = rng.standard_normal((3, 3)).astype(np.float32)
    runner = assert_parity(model, {"x": x, "upd": upd})
    assert runner.plan_stats()["eager"] == 0


def test_scatter_nd_plain_duplicates_stay_eager():
    """numpy applies the LAST duplicate write; XLA's order is
    unspecified — the guard must route this to the interpreter."""
    rng = np.random.default_rng(10)
    b = GraphBuilder()
    idx = b.init("idx", np.asarray([[2], [2]], np.int64))
    out = b.n("ScatterND", ["x", idx, "upd"])
    model = build_model(b, ["x"], [out])
    x = np.zeros((4, 2), np.float32)
    upd = np.asarray([[1.0, 1.0], [9.0, 9.0]], np.float32)
    runner = assert_parity(model, {"x": x, "upd": upd})
    assert runner.plan_stats()["eager"] == 1
    np.testing.assert_array_equal(
        runner.run({"x": x, "upd": upd})[0][2], [9.0, 9.0])


def test_scatter_nd_plain_negative_alias_stays_eager():
    """[-1] and [n-1] address the same row — the duplicate guard must
    normalize negatives before the unique check or the colliding write
    would be staged to XLA (unspecified order)."""
    rng = np.random.default_rng(11)
    b = GraphBuilder()
    idx = b.init("idx", np.asarray([[-1], [3]], np.int64))
    out = b.n("ScatterND", ["x", idx, "upd"])
    model = build_model(b, ["x"], [out])
    x = np.zeros((4, 2), np.float32)
    upd = np.asarray([[1.0, 1.0], [9.0, 9.0]], np.float32)
    runner = assert_parity(model, {"x": x, "upd": upd})
    assert runner.plan_stats()["eager"] == 1
    np.testing.assert_array_equal(
        runner.run({"x": x, "upd": upd})[0][3], [9.0, 9.0])


def test_scatter_nd_plain_dynamic_indices_stay_eager():
    """Dynamic plain-assignment indices can collide on a later call with
    the same signature — never staged."""
    b = GraphBuilder()
    out = b.n("ScatterND", ["x", "idx", "upd"])
    model = build_model(b, ["x"], [out])
    x = np.zeros((4, 2), np.float32)
    upd = np.asarray([[1.0, 1.0]], np.float32)
    runner = JaxGraphRunner(model)
    runner.run({"x": x, "idx": np.asarray([[1]], np.int64), "upd": upd})
    assert runner.plan_stats()["eager"] == 1
    got = runner.run(
        {"x": x, "idx": np.asarray([[3]], np.int64), "upd": upd})[0]
    np.testing.assert_array_equal(got[3], [1.0, 1.0])


@pytest.mark.parametrize("reduction,expect_eager", [
    ("add", 0), ("none", 1)])
def test_scatter_elements_guard(reduction, expect_eager):
    """ScatterElements with colliding indices: reductions jit, plain
    assignment goes eager."""
    rng = np.random.default_rng(11)
    b = GraphBuilder()
    idx = b.init("idx", np.asarray([[1, 1], [0, 2]], np.int64))
    kwargs = {"axis": 1}
    if reduction != "none":
        kwargs["reduction"] = reduction
    out = b.n("ScatterElements", ["x", idx, "upd"], **kwargs)
    model = build_model(b, ["x"], [out])
    x = rng.standard_normal((2, 3)).astype(np.float32)
    upd = rng.standard_normal((2, 2)).astype(np.float32)
    runner = assert_parity(model, {"x": x, "upd": upd},
                           rtol=1e-6, atol=1e-7)
    assert runner.plan_stats()["eager"] == expect_eager


def test_scatter_elements_unique_plain_jits():
    rng = np.random.default_rng(12)
    b = GraphBuilder()
    idx = b.init("idx", np.asarray([[1, 0], [0, 2]], np.int64))
    out = b.n("ScatterElements", ["x", idx, "upd"], axis=1)
    model = build_model(b, ["x"], [out])
    x = rng.standard_normal((2, 3)).astype(np.float32)
    upd = rng.standard_normal((2, 2)).astype(np.float32)
    runner = assert_parity(model, {"x": x, "upd": upd})
    assert runner.plan_stats()["eager"] == 0


def test_subgraph_noise_disables_draw_hoisting():
    """An If branch that draws from the shared RNG stream would
    interleave differently against hoisted top-level draws — the runner
    must keep every draw as an ordinary eager step (bit-exact parity
    with the interpreter's stream order)."""
    from phoonnx_tpu.onnx.reader import OnnxModel, OnnxNode

    def branch(with_noise):
        nodes = [OnnxNode(op_type="RandomNormalLike", name="bn",
                          inputs=["x"], outputs=["bnoise"], attributes={}),
                 OnnxNode(op_type="Add", name="ba", inputs=["x", "bnoise"],
                          outputs=["bout"], attributes={})]
        if not with_noise:
            nodes = [OnnxNode(op_type="Identity", name="bi", inputs=["x"],
                              outputs=["bout"], attributes={})]
        return OnnxModel(initializers={}, metadata={}, inputs=[],
                         outputs=["bout"], nodes=nodes)

    b = GraphBuilder()
    top = b.n("RandomNormalLike", ["x"])
    mixed = b.add("x", top)
    iff = b.n("If", ["cond"], then_branch=branch(True),
              else_branch=branch(False))
    out = b.add(mixed, iff)
    model = build_model(b, ["x"], [out])
    x = np.ones((2, 3), np.float32)
    feeds = {"x": x, "cond": np.asarray(True)}

    runner = JaxGraphRunner(model)
    assert not runner._draws_hoistable
    # seeded RNG: replay must reproduce the interpreter's stream order
    runner.executor.reseed(11)
    got = runner.run(feeds)
    runner.executor.reseed(11)
    got2 = runner.run(feeds)  # replay path
    interp = OnnxExecutor(model)
    interp.reseed(11)
    ref = interp.run(feeds)
    np.testing.assert_allclose(ref[0], np.asarray(got2[0]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(ref[0], np.asarray(got[0]),
                               rtol=1e-6, atol=1e-7)
    stats = runner.plan_stats()
    assert stats["host_draws"] == 0
    assert stats["eager"] >= 2  # the top-level draw AND the If


def test_random_output_shapes_stay_static_downstream():
    """Random draws are never folded, but their shapes ARE signature-
    pure: Shape -> Reshape downstream of a draw must keep jitting."""
    rng = np.random.default_rng(13)
    b = GraphBuilder()
    noise = b.n("RandomNormalLike", ["x"], seed=11.0)
    sh = b.shape_of(noise)
    flat = b.n("Reshape", [b.add("x", noise), b.i64([-1])])
    model = build_model(b, ["x"], [flat, sh])
    x = rng.standard_normal((3, 4)).astype(np.float32)
    runner = assert_parity(model, {"x": x})
    stats = runner.plan_stats()
    # the draw is a segment-preserving host step; Shape folds;
    # Add + Reshape jit in ONE segment
    assert stats["host_draws"] == 1
    assert stats["eager"] == 0
    assert stats["segments"] == 1
    assert stats["folded"] >= 1
    assert stats["jitted"] >= 2


# -- statically-quantized family (QLinearConv / QLinearMatMul / ConvInteger) --


def test_qlinear_matmul_jits_bit_exact():
    """The static-int8 matmul stages to XLA (int32 dot + f32
    single-rounding requant) bit-exactly vs the interpreter — the
    reference runs such graphs on ort's compiled int8 kernels."""
    rng = np.random.default_rng(20)
    b = GraphBuilder()
    a_q = rng.integers(0, 255, (6, 16)).astype(np.uint8)
    w_q = b.init("w", rng.integers(-127, 127, (16, 8)).astype(np.int8))
    out = b.n("QLinearMatMul", [
        "a", b.init("a_s", np.float32(0.013)),
        b.init("a_z", np.uint8(121)),
        w_q, b.init("w_s", np.float32(0.021)),
        b.init("w_z", np.int8(0)),
        b.init("y_s", np.float32(0.07)),
        b.init("y_z", np.uint8(110)),
    ])
    model = build_model(b, ["a"], [out])
    runner = assert_parity(model, {"a": a_q})
    assert runner.plan_stats()["eager"] == 0


@pytest.mark.parametrize("spatial", [1, 2])
def test_conv_integer_jits_bit_exact(spatial):
    rng = np.random.default_rng(21)
    b = GraphBuilder()
    if spatial == 1:
        x = rng.integers(0, 255, (1, 4, 20)).astype(np.uint8)
        w = rng.integers(-127, 127, (8, 4, 3)).astype(np.int8)
        attrs = {"pads": [1, 1], "strides": [2], "dilations": [1]}
    else:
        x = rng.integers(0, 255, (1, 4, 10, 12)).astype(np.uint8)
        w = rng.integers(-127, 127, (8, 4, 3, 3)).astype(np.int8)
        attrs = {"pads": [1, 1, 1, 1], "strides": [1, 2],
                 "dilations": [2, 1]}
    out = b.n("ConvInteger", [
        "x", b.init("w", w), b.init("x_z", np.uint8(128)),
        b.init("w_z", np.int8(3)),
    ], **attrs)
    model = build_model(b, ["x"], [out])
    runner = assert_parity(model, {"x": x})
    assert runner.plan_stats()["eager"] == 0


def test_qlinear_conv_per_channel_bias_jits_bit_exact():
    """Per-output-channel scales + int32 bias + grouped 1D conv — the
    exact shape ort's static quantizer emits for piper-style voices."""
    rng = np.random.default_rng(22)
    b = GraphBuilder()
    x = rng.integers(0, 255, (1, 8, 24)).astype(np.uint8)
    w = rng.integers(-127, 127, (8, 4, 5)).astype(np.int8)
    out = b.n("QLinearConv", [
        "x", b.init("x_s", np.float32(0.017)),
        b.init("x_z", np.uint8(99)),
        b.init("w", w),
        b.init("w_s", (0.01 + 0.01 * rng.random(8)).astype(np.float32)),
        b.init("w_z", np.zeros(8, np.int8)),
        b.init("y_s", np.float32(0.05)),
        b.init("y_z", np.uint8(128)),
        b.init("bias", rng.integers(-1000, 1000, 8).astype(np.int32)),
    ], pads=[2, 2], strides=[1], dilations=[1], group=2)
    model = build_model(b, ["x"], [out])
    runner = assert_parity(model, {"x": x})
    assert runner.plan_stats()["eager"] == 0


def test_qlinear_conv_int8_activations():
    """int8 (signed) activations and outputs: saturation at both rails."""
    rng = np.random.default_rng(23)
    b = GraphBuilder()
    x = rng.integers(-128, 127, (2, 3, 16)).astype(np.int8)
    w = rng.integers(-127, 127, (6, 3, 3)).astype(np.int8)
    out = b.n("QLinearConv", [
        "x", b.init("x_s", np.float32(0.02)),
        b.init("x_z", np.int8(-5)),
        b.init("w", w),
        b.init("w_s", np.float32(0.03)),
        b.init("w_z", np.int8(2)),
        b.init("y_s", np.float32(0.008)),
        b.init("y_z", np.int8(0)),
    ], pads=[1, 1], strides=[1], dilations=[1])
    model = build_model(b, ["x"], [out])
    runner = assert_parity(model, {"x": x})
    assert runner.plan_stats()["eager"] == 0


# -- spec edge semantics: interpreter <-> lowering parity -------------------


def test_variadic_min_parity():
    b = GraphBuilder()
    y = b.n("Min", ["a", "bb", "c"])
    model = build_model(b, ["a", "bb", "c"], [y])
    rng = np.random.default_rng(0)
    feeds = {k: rng.standard_normal(4).astype(np.float32)
             for k in ("a", "bb", "c")}
    assert_parity(model, feeds)


def test_split_num_outputs_uneven_parity():
    b = GraphBuilder()
    a, c = b.n("Split", ["x"], n_out=2, num_outputs=2, axis=0)
    model = build_model(b, ["x"], [a, c])
    assert_parity(model, {"x": np.arange(5, dtype=np.float32)})


def test_negative_pad_crop_parity():
    b = GraphBuilder()
    p = b.init("p", np.asarray([-1, 1], np.int64))
    y = b.n("Pad", ["x", p])
    model = build_model(b, ["x"], [y])
    assert_parity(model, {"x": np.arange(5, dtype=np.float32)})


def test_argmax_select_last_index_parity():
    b = GraphBuilder()
    y = b.n("ArgMax", ["x"], axis=0, select_last_index=1, keepdims=0)
    model = build_model(b, ["x"], [y])
    runner = assert_parity(model, {"x": np.float32([3, 1, 3])})
    out = runner.run({"x": np.float32([3, 1, 3])})[0]
    assert int(out) == 2


def test_reduce_empty_axes_parity():
    b = GraphBuilder()
    ax = b.init("ax", np.zeros((0,), np.int64))
    y = b.n("ReduceSum", ["x", ax])
    model = build_model(b, ["x"], [y])
    runner = assert_parity(model, {"x": np.ones((2, 3), np.float32)})
    out = runner.run({"x": np.ones((2, 3), np.float32)})[0]
    assert out.shape == (1, 1) and float(out.reshape(())) == 6.0


def test_rnn_unsupported_attrs_stay_eager_and_raise():
    """layout=1 is unsupported in both the interpreter and the scan
    lowering: the guard must keep the node eager, and the interpreter
    raises — one error site, no silent garbage."""
    rng = np.random.default_rng(0)
    w, r, _b = _rnn_weights(rng, 1, 4, 2, 3)
    b = GraphBuilder()
    wi = b.init("w", w)
    ri = b.init("r", r)
    y = b.n("LSTM", ["x", wi, ri], n_out=1, hidden_size=2, layout=1)
    model = build_model(b, ["x"], [y])
    runner = JaxGraphRunner(model)
    with pytest.raises(NotImplementedError):
        runner.run({"x": rng.standard_normal((4, 1, 3)).astype(np.float32)})


def test_gather_nd_batch_dims_parity():
    """GatherND batch_dims > 0 (previously refused by both engines):
    spec example pinned exactly, plus a random batch_dims=2 case with
    negative indices, staged with zero eager nodes."""
    # ONNX spec example: batch_dims=1
    b = GraphBuilder()
    out = b.n("GatherND", ["x", "idx"], batch_dims=1)
    model = build_model(b, ["x"], [out])
    x = np.asarray([[[0, 1], [2, 3]], [[4, 5], [6, 7]]], np.float32)
    idx = np.asarray([[1], [0]], np.int64)
    runner = assert_parity(model, {"x": x, "idx": idx})
    assert runner.plan_stats()["eager"] == 0
    (got,) = runner.run({"x": x, "idx": idx})
    np.testing.assert_array_equal(got, [[2.0, 3.0], [4.0, 5.0]])

    rng = np.random.default_rng(11)
    b = GraphBuilder()
    out = b.n("GatherND", ["x", "idx"], batch_dims=2)
    model = build_model(b, ["x"], [out])
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    idx = rng.integers(-4, 4, (2, 3, 6, 1)).astype(np.int64)
    runner = assert_parity(model, {"x": x, "idx": idx})
    assert runner.plan_stats()["eager"] == 0
    (got,) = runner.run({"x": x, "idx": idx})
    want = np.stack([
        np.stack([x[i, j][idx[i, j, :, 0]] for j in range(3)])
        for i in range(2)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("spatial", [1, 2])
def test_conv_transpose_grouped_matches_torch(spatial):
    """Grouped ConvTranspose (previously refused): pinned against the
    torch oracle (the layout the reference's exporters emit,
    phoonnx_train models.py upsample stack is ConvTranspose1d) and
    staged with zero eager nodes."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(12)
    group, cin, cout_per_g, k, stride, pad = 4, 8, 3, 5, 2, 2
    if spatial == 1:
        xshape, wshape = (2, cin, 13), (cin, cout_per_g, k)
    else:
        xshape, wshape = (2, cin, 9, 7), (cin, cout_per_g, k, 3)
    x = rng.standard_normal(xshape).astype(np.float32)
    w = (rng.standard_normal(wshape) * 0.3).astype(np.float32)
    bias = rng.standard_normal((group * cout_per_g,)).astype(np.float32)

    b = GraphBuilder()
    wn = b.init("w", w)
    bn = b.init("bias", bias)
    attrs = dict(group=group, strides=[stride] * spatial,
                 pads=[pad] * (2 * spatial))
    if spatial == 2:
        attrs["pads"] = [pad, 1, pad, 1]
    out = b.n("ConvTranspose", ["x", wn, bn], **attrs)
    model = build_model(b, ["x"], [out])
    runner = assert_parity(model, {"x": x}, rtol=1e-4, atol=1e-4)
    assert runner.plan_stats()["eager"] == 0

    with torch.no_grad():
        fn = (torch.nn.functional.conv_transpose1d if spatial == 1
              else torch.nn.functional.conv_transpose2d)
        tpad = pad if spatial == 1 else (pad, 1)
        want = fn(torch.from_numpy(x), torch.from_numpy(w),
                  torch.from_numpy(bias), stride=stride, padding=tpad,
                  groups=group).numpy()
    (got,) = runner.run({"x": x})
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("auto_pad", ["SAME_UPPER", "SAME_LOWER", "VALID"])
def test_conv_integer_auto_pad(auto_pad):
    """auto_pad in integer convs (previously refused): the resolved pads
    must match an explicit-pads run of the same geometry, bit-exactly,
    in both engines."""
    rng = np.random.default_rng(23)
    x = rng.integers(0, 255, (1, 4, 22)).astype(np.uint8)
    w = rng.integers(-127, 127, (8, 4, 3)).astype(np.int8)

    b = GraphBuilder()
    out = b.n("ConvInteger", [
        "x", b.init("w", w), b.init("x_z", np.uint8(128)),
        b.init("w_z", np.int8(3)),
    ], auto_pad=auto_pad, strides=[2])
    model = build_model(b, ["x"], [out])
    runner = assert_parity(model, {"x": x})
    assert runner.plan_stats()["eager"] == 0
    (got,) = runner.run({"x": x})

    # oracle: explicit pads per the ONNX SAME formula (in 22, s 2, k 3
    # -> out 11, total pad 1 — odd, so UPPER puts it at the end and
    # LOWER at the start); VALID -> no padding
    explicit = {"SAME_UPPER": [0, 1], "SAME_LOWER": [1, 0],
                "VALID": [0, 0]}[auto_pad]
    b2 = GraphBuilder()
    out2 = b2.n("ConvInteger", [
        "x", b2.init("w", w), b2.init("x_z", np.uint8(128)),
        b2.init("w_z", np.int8(3)),
    ], pads=explicit, strides=[2])
    model2 = build_model(b2, ["x"], [out2])
    from phoonnx_tpu.onnx.executor import OnnxExecutor as _Ex
    (want,) = _Ex(model2).run({"x": x})
    np.testing.assert_array_equal(got, want)
