"""Executor control flow (If/Loop subgraphs) + long-tail op coverage.

The reference hands any foreign voice graph to onnxruntime
(phoonnx/voice.py:167); scripted torch exports carry If/Loop nodes with
subgraph attributes, so the fallback interpreter must execute them.
Semantics are checked against independently computed numpy expectations,
round-tripped through the self-contained writer/reader (nested GraphProto
attributes included).
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


def test_if_branches(tmp_path):
    then_g = {
        "name": "then",
        "nodes": [("Mul", ["x", "two"], ["tout"])],
        "outputs": ["tout"],
        "initializers": {"two": np.float32(2.0)},
    }
    else_g = {
        "name": "else",
        "nodes": [("Neg", ["x"], ["eout"])],
        "outputs": ["eout"],
    }
    ex = build_and_load(
        tmp_path, {},
        nodes=[("If", ["cond"], ["y"],
                {"then_branch": then_g, "else_branch": else_g})],
        inputs=["cond", "x"], outputs=["y"],
    )
    x = np.asarray([1.0, -3.0], np.float32)
    np.testing.assert_allclose(
        ex.run({"cond": np.asarray(True), "x": x})[0], [2.0, -6.0])
    np.testing.assert_allclose(
        ex.run({"cond": np.asarray(False), "x": x})[0], [-1.0, 3.0])


def test_loop_trip_count_accumulator(tmp_path):
    """sum = Σ_{i<M} (v + i): carried value + per-iteration scan output."""
    body = {
        "name": "body",
        "nodes": [
            ("Cast", ["iter"], ["iter_f"], {"to": 1}),
            ("Add", ["v_in", "iter_f"], ["v_out"]),
            ("Identity", ["cond_in"], ["cond_out"]),
            ("Mul", ["v_out", "v_out"], ["scan_out"]),
        ],
        "inputs": ["iter", "cond_in", "v_in"],
        "outputs": ["cond_out", "v_out", "scan_out"],
    }
    ex = build_and_load(
        tmp_path, {},
        nodes=[("Loop", ["M", "cond", "v0"], ["v_final", "squares"],
                {"body": body})],
        inputs=["M", "cond", "v0"], outputs=["v_final", "squares"],
    )
    v_final, squares = ex.run({
        "M": np.asarray(4, np.int64),
        "cond": np.asarray(True),
        "v0": np.float32(1.0),
    })
    # v: 1 -> +0=1 -> +1=2 -> +2=4 -> +3=7
    assert float(v_final) == 7.0
    np.testing.assert_allclose(squares, [1.0, 4.0, 16.0, 49.0])


def test_loop_condition_termination(tmp_path):
    """Loop with no trip count runs until the body's condition flips."""
    body = {
        "name": "body",
        "nodes": [
            ("Add", ["v_in", "one"], ["v_out"]),
            ("Less", ["v_out", "limit"], ["cond_out"]),
        ],
        "inputs": ["iter", "cond_in", "v_in"],
        "outputs": ["cond_out", "v_out"],
        "initializers": {"one": np.float32(1.0)},
    }
    ex = build_and_load(
        tmp_path, {"limit": np.float32(5.0)},
        nodes=[("Loop", ["", "cond", "v0"], ["v_final"], {"body": body})],
        inputs=["cond", "v0"], outputs=["v_final"],
    )
    out = ex.run({"cond": np.asarray(True), "v0": np.float32(0.0)})[0]
    assert float(out) == 5.0  # stops when v reaches the outer-scope limit


def test_loop_outer_scope_capture(tmp_path):
    """Subgraphs read outer-scope tensors by name (ONNX scoping)."""
    body = {
        "name": "body",
        "nodes": [
            ("Add", ["v_in", "outer_step"], ["v_out"]),
            ("Identity", ["cond_in"], ["cond_out"]),
        ],
        "inputs": ["iter", "cond_in", "v_in"],
        "outputs": ["cond_out", "v_out"],
    }
    ex = build_and_load(
        tmp_path, {},
        nodes=[("Loop", ["M", "", "v0"], ["v_final"], {"body": body})],
        inputs=["M", "v0", "outer_step"], outputs=["v_final"],
    )
    out = ex.run({"M": np.asarray(3, np.int64), "v0": np.float32(0.0),
                  "outer_step": np.float32(2.5)})[0]
    assert float(out) == 7.5


def test_scatter_nd(tmp_path):
    ex = build_and_load(
        tmp_path, {},
        nodes=[("ScatterND", ["data", "idx", "upd"], ["y"])],
        inputs=["data", "idx", "upd"], outputs=["y"],
    )
    data = np.zeros((4, 3), np.float32)
    idx = np.asarray([[0], [2]], np.int64)
    upd = np.asarray([[1, 2, 3], [4, 5, 6]], np.float32)
    want = data.copy()
    want[0] = [1, 2, 3]
    want[2] = [4, 5, 6]
    np.testing.assert_array_equal(
        ex.run({"data": data, "idx": idx, "upd": upd})[0], want)


def test_scatter_elements_add(tmp_path):
    ex = build_and_load(
        tmp_path, {},
        nodes=[("ScatterElements", ["data", "idx", "upd"], ["y"],
                {"axis": 1, "reduction": "add"})],
        inputs=["data", "idx", "upd"], outputs=["y"],
    )
    data = np.ones((2, 4), np.float32)
    idx = np.asarray([[1, 1], [3, 0]], np.int64)
    upd = np.asarray([[10, 20], [30, 40]], np.float32)
    want = np.asarray([[1, 31, 1, 1], [41, 1, 1, 31]], np.float32)
    np.testing.assert_array_equal(
        ex.run({"data": data, "idx": idx, "upd": upd})[0], want)


def test_gather_nd_nonzero_topk(tmp_path):
    ex = build_and_load(
        tmp_path, {},
        nodes=[
            ("GatherND", ["data", "gidx"], ["g"]),
            ("NonZero", ["mask"], ["nz"]),
            ("TopK", ["scores", "k"], ["tv", "ti"], {"axis": -1}),
        ],
        inputs=["data", "gidx", "mask", "scores", "k"],
        outputs=["g", "nz", "tv", "ti"],
    )
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    g, nz, tv, ti = ex.run({
        "data": data,
        "gidx": np.asarray([[0, 1], [2, 3]], np.int64),
        "mask": np.asarray([[0, 1], [1, 0]], np.float32),
        "scores": np.asarray([[0.1, 0.9, 0.5, 0.7]], np.float32),
        "k": np.asarray(2, np.int64),
    })
    np.testing.assert_array_equal(g, [1.0, 11.0])
    np.testing.assert_array_equal(nz, [[0, 1], [1, 0]])
    np.testing.assert_allclose(tv, [[0.9, 0.7]])
    np.testing.assert_array_equal(ti, [[1, 3]])


def test_one_hot_axes(tmp_path):
    ex = build_and_load(
        tmp_path, {},
        nodes=[("OneHot", ["idx", "depth", "vals"], ["y"], {"axis": -1}),
               ("OneHot", ["idx", "depth", "vals"], ["y0"], {"axis": 0})],
        inputs=["idx", "depth", "vals"], outputs=["y", "y0"],
    )
    y, y0 = ex.run({
        "idx": np.asarray([0, -1, 2], np.int64),  # -1 wraps to depth-1
        "depth": np.asarray(3, np.int64),
        "vals": np.asarray([0.0, 1.0], np.float32),
    })
    np.testing.assert_array_equal(y, np.eye(3, dtype=np.float32)[[0, 2, 2]])
    np.testing.assert_array_equal(y0, y.T)


def test_reverse_sequence_trilu_misc(tmp_path):
    ex = build_and_load(
        tmp_path, {},
        nodes=[
            ("ReverseSequence", ["x", "lens"], ["r"],
             {"batch_axis": 0, "time_axis": 1}),
            ("Trilu", ["m"], ["tu"]),
            ("Trilu", ["m"], ["tl"], {"upper": 0}),
            ("Round", ["vals"], ["rd"]),
            ("Sign", ["vals"], ["sg"]),
            ("Sum", ["vals", "vals", "vals"], ["s3"]),
            ("HardSigmoid", ["vals"], ["hs"]),
        ],
        inputs=["x", "lens", "m", "vals"],
        outputs=["r", "tu", "tl", "rd", "sg", "s3", "hs"],
    )
    x = np.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], np.float32)
    m = np.arange(9, dtype=np.float32).reshape(3, 3)
    vals = np.asarray([-1.5, 0.5, 2.5], np.float32)
    r, tu, tl, rd, sg, s3, hs = ex.run({
        "x": x, "lens": np.asarray([3, 2], np.int64), "m": m, "vals": vals,
    })
    np.testing.assert_array_equal(r, [[3, 2, 1, 4], [6, 5, 7, 8]])
    np.testing.assert_array_equal(tu, np.triu(m))
    np.testing.assert_array_equal(tl, np.tril(m))
    np.testing.assert_array_equal(rd, [-2.0, 0.0, 2.0])  # half-to-even
    np.testing.assert_array_equal(sg, [-1.0, 1.0, 1.0])
    np.testing.assert_array_equal(s3, vals * 3)
    np.testing.assert_allclose(hs, np.clip(0.2 * vals + 0.5, 0, 1))


def test_loop_zero_trips_scan_shape(tmp_path):
    """M=0: scan outputs must be (0, *per-iteration-shape) with the
    body's dtype so downstream Concat/Reshape still typecheck."""
    body = {
        "name": "body",
        "nodes": [
            ("Identity", ["cond_in"], ["cond_out"]),
            ("Identity", ["v_in"], ["v_out"]),
            ("Add", ["plane", "plane"], ["scan_out"]),
        ],
        "inputs": ["iter", "cond_in", "v_in"],
        "outputs": ["cond_out", "v_out", "scan_out"],
    }
    ex = build_and_load(
        tmp_path, {"plane": np.ones((2, 3), np.int64)},
        nodes=[("Loop", ["M", "cond", "v0"], ["v_final", "scanned"],
                {"body": body}),
               ("Concat", ["scanned", "tail"], ["cat"], {"axis": 0})],
        inputs=["M", "cond", "v0", "tail"], outputs=["v_final", "cat"],
    )
    v_final, cat = ex.run({
        "M": np.asarray(0, np.int64), "cond": np.asarray(True),
        "v0": np.float32(3.0), "tail": np.ones((4, 2, 3), np.int64),
    })
    assert float(v_final) == 3.0  # carried value unchanged
    assert cat.shape == (4, 2, 3) and cat.dtype == np.int64
