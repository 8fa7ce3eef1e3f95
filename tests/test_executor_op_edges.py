"""ONNX-spec edge semantics of the numpy interpreter (found by review):
variadic Min/Max, opset-18 Split chunking, identity Clip, negative-pad
cropping, empty-axes reduction, select_last_index, pre-opset-13
Softmax flattening, zero-length ReverseSequence rows, and the RNN
unsupported-attribute guards (silent-wrong output violates the
module's coverage-gaps-raise contract)."""

import numpy as np
import pytest

from phoonnx_tpu.onnx.executor import OnnxExecutor
from phoonnx_tpu.onnx.reader import OnnxModel, OnnxNode


def run(op, inputs, feeds, attrs=None, opset=15, outputs=("y",)):
    node = OnnxNode(op_type=op, name="n0", inputs=list(inputs),
                    outputs=list(outputs), attributes=attrs or {})
    m = OnnxModel(initializers={}, metadata={}, inputs=list(feeds),
                  outputs=list(outputs), nodes=[node])
    m.opset = opset
    return OnnxExecutor(m).run(feeds)


def test_min_max_variadic():
    y = run("Min", ["a", "b", "c"],
            {"a": np.float32([3]), "b": np.float32([1]),
             "c": np.float32([2])})[0]
    assert y == 1
    y = run("Max", ["a"], {"a": np.float32([3, 1])})[0]
    assert (y == [3, 1]).all()


def test_split_num_outputs_ceil_chunks():
    a, b = run("Split", ["x"], {"x": np.arange(5.0)},
               {"num_outputs": 2, "axis": 0}, outputs=("a", "b"))
    assert a.shape == (3,) and b.shape == (2,)
    assert (a == [0, 1, 2]).all() and (b == [3, 4]).all()


def test_clip_without_bounds_is_identity():
    y = run("Clip", ["x"], {"x": np.float32([-5, 5])})[0]
    assert (y == [-5, 5]).all()


def test_pad_negative_crops():
    y = run("Pad", ["x", "p"],
            {"x": np.arange(5.0), "p": np.int64([-1, 1])})[0]
    assert (y == [1, 2, 3, 4, 0]).all()


def test_reduce_empty_axes_reduces_all():
    y = run("ReduceSum", ["x", "ax"],
            {"x": np.ones((2, 3), np.float32),
             "ax": np.zeros((0,), np.int64)})[0]
    assert y.shape == (1, 1) and float(y.reshape(())) == 6.0
    y = run("ReduceSum", ["x", "ax"],
            {"x": np.ones((2, 3), np.float32),
             "ax": np.zeros((0,), np.int64)},
            {"noop_with_empty_axes": 1})[0]
    assert y.shape == (2, 3)


def test_argmax_select_last_index():
    y = run("ArgMax", ["x"], {"x": np.float32([3, 1, 3])},
            {"axis": 0, "select_last_index": 1, "keepdims": 0})[0]
    assert y == 2
    y = run("ArgMin", ["x"], {"x": np.float32([1, 3, 1])},
            {"axis": 0, "select_last_index": 1, "keepdims": 0})[0]
    assert y == 2


def test_softmax_legacy_opset_flattens_trailing_block():
    x = np.random.default_rng(0).standard_normal((2, 3, 4)).astype(
        np.float32)
    y = run("Softmax", ["x"], {"x": x}, opset=11)[0]
    np.testing.assert_allclose(y.reshape(2, -1).sum(1), 1.0, rtol=1e-5)
    y13 = run("Softmax", ["x"], {"x": x}, opset=15)[0]
    np.testing.assert_allclose(y13.sum(-1), 1.0, rtol=1e-5)
    y_log = run("LogSoftmax", ["x"], {"x": x}, opset=11)[0]
    np.testing.assert_allclose(np.exp(y_log).reshape(2, -1).sum(1), 1.0,
                               rtol=1e-5)


def test_reverse_sequence_zero_length_row():
    y = run("ReverseSequence", ["x", "l"],
            {"x": np.arange(6.0).reshape(3, 2), "l": np.int64([0, 2])},
            {"time_axis": 0, "batch_axis": 1})[0]
    assert (y[:, 0] == [0, 2, 4]).all()
    assert (y[:2, 1] == [3, 1]).all()


@pytest.mark.parametrize("attrs", [
    {"layout": 1},
    {"activations": ["Relu", "Tanh", "Tanh"]},
    {"clip": 1.0},
])
def test_lstm_unsupported_attrs_raise(attrs):
    with pytest.raises(NotImplementedError):
        run("LSTM", ["x", "w", "r"],
            {"x": np.zeros((2, 1, 3), np.float32),
             "w": np.zeros((1, 8, 3), np.float32),
             "r": np.zeros((1, 8, 2), np.float32)},
            {"hidden_size": 2, **attrs})


def test_lstm_default_activations_accepted():
    y = run("LSTM", ["x", "w", "r"],
            {"x": np.zeros((2, 1, 3), np.float32),
             "w": np.zeros((1, 8, 3), np.float32),
             "r": np.zeros((1, 8, 2), np.float32)},
            {"hidden_size": 2,
             "activations": ["Sigmoid", "Tanh", "Tanh"]})[0]
    assert y.shape == (2, 1, 1, 2)
