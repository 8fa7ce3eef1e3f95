"""ONNX -> JAX lowering: jitted segments must match the interpreter.

The lowering (onnx/jax_lowering.py) gives foreign voice graphs compiled
XLA execution — the TPU analogue of the reference handing every graph
to onnxruntime's compiled engine (reference phoonnx/voice.py:167).
These tests pin: value parity with the numpy interpreter across op
families, constant folding of shape arithmetic, eager boundaries at
data-dependent shapes / control flow / random ops, plan reuse across
calls, and end-to-end parity + engine integration on a full VITS voice
graph.
"""

import numpy as np
import pytest

import jax

from phoonnx_tpu.onnx.builder import GraphBuilder
from phoonnx_tpu.onnx.executor import OnnxExecutor
from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner, _Segment
from phoonnx_tpu.onnx.reader import OnnxModel, OnnxNode


def build_model(b: GraphBuilder, inputs, outputs) -> OnnxModel:
    nodes = [
        OnnxNode(op_type=op, name=f"n{k}", inputs=list(i),
                 outputs=list(o), attributes=a)
        for k, (op, i, o, a) in enumerate(b.nodes)
    ]
    return OnnxModel(initializers=b.initializers, metadata={},
                     inputs=list(inputs), outputs=list(outputs),
                     nodes=nodes)


def assert_parity(model, feeds, rtol=1e-5, atol=1e-6, n_calls=2):
    """Runner output == interpreter output, on plan AND replay calls."""
    ref = OnnxExecutor(model).run(feeds)
    runner = JaxGraphRunner(model)
    for _ in range(n_calls):
        out = runner.run(feeds)
        assert len(out) == len(ref)
        for a, c in zip(ref, out):
            assert a.shape == c.shape
            if np.issubdtype(np.asarray(a).dtype, np.floating):
                np.testing.assert_allclose(a, c, rtol=rtol, atol=atol)
            else:
                np.testing.assert_array_equal(a, c)
    return runner


def test_dense_graph_single_segment():
    """matmul/relu/shape-arithmetic graph: Shape folds, everything else
    lands in one jitted segment, zero eager nodes."""
    rng = np.random.default_rng(0)
    b = GraphBuilder()
    w = b.init("w", rng.standard_normal((8, 4)).astype(np.float32))
    h = b.relu(b.matmul("x", w))
    sh = b.shape_of(h)
    h2 = b.reshape(h, [2, -1])  # static target
    s = b.reduce_sum(h2, [1], keepdims=0)
    model = build_model(b, ["x"], [s, sh])

    x = rng.standard_normal((3, 8)).astype(np.float32)
    runner = assert_parity(model, {"x": x})
    stats = runner.plan_stats()
    assert stats["eager"] == 0
    assert stats["segments"] == 1
    assert stats["folded"] >= 1  # the Shape node


def test_shape_arithmetic_constant_folds():
    """Reshape target computed from Shape/Gather/Concat must fold and
    keep the consumer jittable (signature-pure shape math)."""
    rng = np.random.default_rng(1)
    b = GraphBuilder()
    d0 = b.dim("x", 0)
    d1 = b.dim("x", 1)
    tgt = b.concat([d1, d0], axis=0)  # transpose via dynamic reshape
    y = b.reshape("x", tgt)
    out = b.mul(y, b.f32(2.0))
    model = build_model(b, ["x"], [out])

    x = rng.standard_normal((3, 5)).astype(np.float32)
    runner = assert_parity(model, {"x": x})
    stats = runner.plan_stats()
    assert stats["eager"] == 0
    # new signature -> new plan with the re-folded target
    x2 = rng.standard_normal((4, 7)).astype(np.float32)
    ref2 = OnnxExecutor(model).run({"x": x2})
    np.testing.assert_allclose(runner.run({"x": x2})[0], ref2[0],
                               rtol=1e-6)
    assert runner.plan_stats()["plans"] == 2


def test_data_dependent_range_goes_eager():
    """Range over a computed total is an eager boundary; downstream ops
    stay jitted and retrace when the data-dependent length changes."""
    b = GraphBuilder()
    total = b.n("ReduceSum", ["lens"], keepdims=0)
    rng_out = b.range_(b.const(np.int64(0)), total, b.const(np.int64(1)))
    sq = b.mul(rng_out, rng_out)
    out = b.cast(sq, 1)
    model = build_model(b, ["lens"], [out])

    lens = np.asarray([2, 3, 4], np.int64)
    runner = assert_parity(model, {"lens": lens})
    stats = runner.plan_stats()
    assert stats["eager"] >= 1  # the Range node
    assert stats["jitted"] >= 1
    # same signature, different VALUE -> different output length
    out2 = runner.run({"lens": np.asarray([1, 1, 1], np.int64)})[0]
    np.testing.assert_array_equal(out2, np.asarray([0, 1, 4], np.float32))


def test_elementwise_and_reduce_families():
    rng = np.random.default_rng(2)
    b = GraphBuilder()
    x = "x"
    y = b.add(b.exp(b.neg(x)), b.f32(1.0))
    y = b.div(b.f32(1.0), y)              # manual sigmoid
    z = b.n("Erf", [b.mul(x, b.f32(0.5))])
    w = b.n("LeakyRelu", [x], alpha=0.3)
    cat = b.concat([y, z, w], axis=1)
    sm = b.softmax(cat, axis=-1)
    red = b.n("ReduceMean", [sm], axes=[0], keepdims=1)
    mx = b.n("ReduceMax", [cat], keepdims=0)
    model = build_model(b, ["x"], [sm, red, mx])
    xv = rng.standard_normal((4, 6)).astype(np.float32)
    runner = assert_parity(model, {"x": xv})
    assert runner.plan_stats()["eager"] == 0


def test_conv_convtranspose_pad_gather():
    rng = np.random.default_rng(3)
    b = GraphBuilder()
    w1 = b.init("w1", rng.standard_normal((6, 3, 5)).astype(np.float32) * .2)
    bias = b.init("b1", rng.standard_normal((6,)).astype(np.float32))
    h = b.conv1d("x", w1, bias, stride=1, padding=2)
    h = b.leaky_relu(h, 0.1)
    w2 = b.init("w2", rng.standard_normal((6, 4, 8)).astype(np.float32) * .2)
    h = b.conv_transpose1d(h, w2, stride=4, padding=2)
    h = b.pad(h, [0, 0, 1, 0, 0, 2], value=0.5)
    idx = b.init("idx", np.asarray([0, 2, -1], np.int64))
    g = b.n("Gather", [h, idx], axis=1)
    model = build_model(b, ["x"], [g])
    xv = rng.standard_normal((2, 3, 17)).astype(np.float32)
    runner = assert_parity(model, {"x": xv}, rtol=2e-5, atol=2e-5)
    assert runner.plan_stats()["eager"] == 0


def test_weights_are_device_args_not_constants():
    """Initializers above the bake threshold ride as device-resident
    arguments (shared across plans), not baked XLA constants."""
    rng = np.random.default_rng(4)
    b = GraphBuilder()
    w = b.init("w", rng.standard_normal((128, 128)).astype(np.float32))
    out = b.matmul("x", w)
    model = build_model(b, ["x"], [out])
    runner = JaxGraphRunner(model)
    x = rng.standard_normal((2, 128)).astype(np.float32)
    ref = OnnxExecutor(model).run({"x": x})[0]
    np.testing.assert_allclose(runner.run({"x": x})[0], ref, rtol=1e-5)
    np.testing.assert_allclose(runner.run({"x": x})[0], ref, rtol=1e-5)
    seg = next(s for p in runner._plans.values() for s in p.steps
               if isinstance(s, _Segment))
    assert "w" in seg.static_dyn
    assert "w" in runner._dev_init  # uploaded once, shared across plans


def test_if_and_loop_replay_eagerly():
    """A plan made under one branch must still take the other branch at
    replay. Since r3, shape-compatible Ifs stage as lax.cond — the
    branch decision is RUNTIME, inside the jitted segment — so the plan
    has zero eager steps yet still branches correctly."""
    b = GraphBuilder()
    sub_then = GraphBuilder()
    t_out = sub_then.mul("x", sub_then.f32(2.0))
    then_g = build_model(sub_then, [], [t_out])
    sub_else = GraphBuilder()
    e_out = sub_else.add("x", sub_else.f32(10.0))
    else_g = build_model(sub_else, [], [e_out])
    picked = b.n("If", ["cond"], then_branch=then_g, else_branch=else_g)
    out = b.add(picked, b.f32(1.0))
    model = build_model(b, ["x", "cond"], [out])

    x = np.asarray([1.0, 2.0], np.float32)
    runner = JaxGraphRunner(model)
    ref_t = OnnxExecutor(model).run({"x": x, "cond": np.asarray(True)})
    ref_f = OnnxExecutor(model).run({"x": x, "cond": np.asarray(False)})
    np.testing.assert_allclose(
        runner.run({"x": x, "cond": np.asarray(True)})[0], ref_t[0])
    # same signature (bool scalar), opposite branch
    np.testing.assert_allclose(
        runner.run({"x": x, "cond": np.asarray(False)})[0], ref_f[0])
    assert runner.plan_stats()["plans"] == 1
    assert runner.plan_stats()["eager"] == 0
    assert runner.plan_stats()["segments"] == 1


def test_random_normal_like_redraws_per_call():
    b = GraphBuilder()
    noise = b.n("RandomNormalLike", ["x"])
    out = b.add("x", noise)
    model = build_model(b, ["x"], [out])
    x = np.zeros((4, 8), np.float32)
    runner = JaxGraphRunner(model)
    a = runner.run({"x": x})[0]
    c = runner.run({"x": x})[0]
    assert not np.array_equal(a, c), "noise must be re-drawn at replay"
    # the draw is a host step that does NOT split the segment
    stats = runner.plan_stats()
    assert stats["host_draws"] == 1
    assert stats["eager"] == 0
    assert stats["segments"] == 1


def test_seeded_random_matches_interpreter():
    b = GraphBuilder()
    noise = b.n("RandomNormalLike", ["x"], seed=7.0)
    out = b.add("x", noise)
    model = build_model(b, ["x"], [out])
    x = np.ones((3, 5), np.float32)
    assert_parity(model, {"x": x})


def test_lstm_graph_fully_jitted():
    """LSTM lowers to lax.scan: the whole recurrent graph (mimic3/
    silero-style) lands in one jitted segment, zero eager nodes."""
    rng = np.random.default_rng(5)
    hidden, inp = 6, 4
    b = GraphBuilder()
    w = b.init("w", rng.standard_normal(
        (1, 4 * hidden, inp)).astype(np.float32) * 0.3)
    r = b.init("r", rng.standard_normal(
        (1, 4 * hidden, hidden)).astype(np.float32) * 0.3)
    pre = b.mul("x", b.f32(0.5))
    y, _, _ = b.n("LSTM", [pre, w, r], n_out=3, hidden_size=hidden)
    post = b.relu(y)
    model = build_model(b, ["x"], [post])
    x = rng.standard_normal((7, 2, inp)).astype(np.float32)
    runner = assert_parity(model, {"x": x}, rtol=1e-4, atol=1e-5)
    stats = runner.plan_stats()
    assert stats["eager"] == 0
    assert stats["segments"] == 1
    assert stats["jitted"] == 3


# ---------------------------------------------------------------------------
# Full VITS voice graph: the actual foreign-voice serving path
# ---------------------------------------------------------------------------


def _seed_random_nodes(model: OnnxModel, seed: float = 3.0) -> int:
    n = 0
    for node in model.nodes:
        if node.op_type.startswith("Random"):
            node.attributes["seed"] = seed + n
            n += 1
    return n


@pytest.fixture(scope="module")
def vits_model():
    from phoonnx_tpu.models.vits.load import params_to_flat
    from phoonnx_tpu.models.vits.model import VitsHParams, random_params
    from phoonnx_tpu.onnx.vits_graph import export_vits_onnx
    from phoonnx_tpu.onnx.reader import read_onnx

    hp = VitsHParams.preset("micro")
    params = random_params(jax.random.PRNGKey(0), hp)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/model.onnx"
        export_vits_onnx(params_to_flat(params), hp, path,
                         metadata={"model_type": "vits"})
        model = read_onnx(path)
    n = _seed_random_nodes(model)
    assert n >= 1, "VITS graph should contain noise draws"
    return model


def test_vits_graph_lowering_parity(vits_model):
    """End-to-end foreign VITS voice: jitted path matches the
    interpreter within float tolerance; the bulk of nodes jit."""
    ids = np.asarray([[1, 5, 9, 3, 7, 2, 4, 11]], np.int64)
    feeds = {
        "input": ids,
        "input_lengths": np.asarray([ids.shape[1]], np.int64),
        "scales": np.asarray([0.667, 1.0, 0.8], np.float32),
    }
    feeds = {k: v for k, v in feeds.items() if k in vits_model.inputs}
    ref = OnnxExecutor(vits_model).run(feeds)[0]
    runner = JaxGraphRunner(vits_model, matmul_precision="highest")
    for _ in range(2):
        out = runner.run(feeds)[0]
        assert out.shape == ref.shape
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(out - ref).max() / scale < 5e-3, (
            f"waveform deviates {np.abs(out - ref).max():.2e} "
            f"(scale {scale:.2e})")
    stats = runner.plan_stats()
    # the graph is overwhelmingly jitted; only data-dependent frame
    # math and noise draws stay eager
    assert stats["jitted"] / max(stats["jitted"] + stats["eager"], 1) > 0.85
    assert stats["plans"] == 1


def test_vits_bucketed_padding_is_masked(vits_model):
    """Padding ids to a bucket with exact input_lengths must not change
    the waveform (graph masks by lengths) — the property the fallback
    engine's bucketing relies on."""
    if "input_lengths" not in vits_model.inputs:
        pytest.skip("graph does not declare input_lengths")
    ids = [1, 5, 9, 3, 7, 2]
    base = {
        "input": np.asarray([ids], np.int64),
        "input_lengths": np.asarray([len(ids)], np.int64),
        "scales": np.asarray([0.0, 1.0, 0.0], np.float32),
    }
    padded = dict(base)
    padded["input"] = np.asarray([ids + [0] * (16 - len(ids))], np.int64)
    ex = OnnxExecutor(vits_model)
    a = ex.run(base)[0]
    c = ex.run(padded)[0]
    assert a.shape == c.shape, "padded frames leaked into the output"
    scale = max(np.abs(a).max(), 1e-3)
    assert np.abs(a - c).max() / scale < 5e-3


def test_fallback_engine_uses_runner(vits_model):
    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine

    engine = OnnxFallbackEngine(vits_model, sample_rate=16000)
    assert engine.runner is not None
    wav1 = engine.synthesize_ids([1, 5, 9, 3, 7, 2], noise_scale=0.0,
                                 noise_w=0.0)
    assert wav1.ndim == 1 and len(wav1) > 0
    # interpreter-only engine agrees (deterministic: seeded noise x 0.0)
    plain = OnnxFallbackEngine(vits_model, sample_rate=16000,
                               compile=False)
    assert plain.runner is None
    wav2 = plain.synthesize_ids([1, 5, 9, 3, 7, 2], noise_scale=0.0,
                                noise_w=0.0)
    assert wav1.shape == wav2.shape
    scale = max(np.abs(wav2).max(), 1e-3)
    assert np.abs(wav1 - wav2).max() / scale < 5e-3
    # same bucket -> plan reuse, no new plan for a second length
    engine.synthesize_ids([2, 4, 6, 8], noise_scale=0.0, noise_w=0.0)
    assert engine.runner.plan_stats()["plans"] == 1


def test_fallback_engine_degrades_on_runner_error(vits_model, caplog):
    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine

    engine = OnnxFallbackEngine(vits_model, sample_rate=16000)

    def boom(feeds, outputs=None):
        raise RuntimeError("synthetic lowering failure")

    engine.runner.run = boom
    with caplog.at_level("WARNING"):
        wav = engine.synthesize_ids([1, 5, 9, 3], noise_scale=0.0,
                                    noise_w=0.0)
    assert engine.runner is None  # degraded permanently
    assert len(wav) > 0
    assert any("degrading" in r.getMessage() for r in caplog.records)
