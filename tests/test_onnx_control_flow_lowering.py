"""Staged control flow: If -> lax.cond, Loop -> lax.scan (VERDICT r2 #4).

The reference's onnxruntime runs scripted exports' If/Loop compiled
(reference voice.py:167); the lowering previously replayed them eagerly
between XLA segments. These tests pin: shape-compatible If and
static-trip-count Loop stage with ZERO eager nodes (asserted via the
plan's segment map), dynamic/unsafe forms still degrade to the
interpreter, and parity holds either way.
"""

import numpy as np

from phoonnx_tpu.onnx.builder import GraphBuilder
from phoonnx_tpu.onnx.reader import OnnxModel, OnnxNode

from tests.test_onnx_jax_lowering import assert_parity, build_model


def subgraph(nodes, outputs, inputs=(), initializers=None):
    return OnnxModel(
        initializers=dict(initializers or {}), metadata={},
        inputs=list(inputs), outputs=list(outputs),
        nodes=[OnnxNode(op_type=op, name=f"s{k}", inputs=list(i),
                        outputs=list(o), attributes=a)
               for k, (op, i, o, a) in enumerate(nodes)])


def test_if_shape_compatible_stages():
    then_g = subgraph(
        [("Mul", ["x", "two"], ["tout"], {})], ["tout"],
        initializers={"two": np.float32(2.0)})
    else_g = subgraph([("Neg", ["x"], ["eout"], {})], ["eout"])
    b = GraphBuilder()
    y = b.n("If", ["cond"], then_branch=then_g, else_branch=else_g)
    out = b.add(y, y)
    model = build_model(b, ["cond", "x"], [out])
    x = np.asarray([1.0, -3.0], np.float32)
    for cond in (True, False):
        runner = assert_parity(model, {"cond": np.asarray(cond), "x": x})
        stats = runner.plan_stats()
        assert stats["eager"] == 0, stats
        assert stats["segments"] == 1, stats


def test_if_shape_mismatch_stays_eager():
    """Branches produce different shapes: lax.cond cannot represent it;
    the trial trace must fail and the node stay eager."""
    then_g = subgraph(
        [("Concat", ["x", "x"], ["tout"], {"axis": 0})], ["tout"])
    else_g = subgraph([("Neg", ["x"], ["eout"], {})], ["eout"])
    b = GraphBuilder()
    y = b.n("If", ["cond"], then_branch=then_g, else_branch=else_g)
    model = build_model(b, ["cond", "x"], [y])
    x = np.asarray([1.0, -3.0], np.float32)
    runner = assert_parity(model, {"cond": np.asarray(True), "x": x})
    assert runner.plan_stats()["eager"] == 1


def test_loop_static_trip_count_stages():
    """Trip-count accumulator Loop (scripted-export shape): carried
    value + stacked scan output, staged as one lax.scan with zero eager
    nodes. M arrives as an initializer (plan-time static)."""
    body = subgraph(
        [("Cast", ["iter"], ["iter_f"], {"to": 1}),
         ("Add", ["v_in", "iter_f"], ["v_out"], {}),
         ("Identity", ["cond_in"], ["cond_out"], {}),
         ("Mul", ["v_out", "v_out"], ["scan_out"], {})],
        ["cond_out", "v_out", "scan_out"],
        inputs=["iter", "cond_in", "v_in"])
    b = GraphBuilder()
    m = b.init("M", np.asarray(4, np.int64))
    c = b.init("cond", np.asarray(True))
    vf, sq = b.n("Loop", [m, c, "v0"], n_out=2, body=body)
    out = b.add(vf, vf)
    sq2 = b.add(sq, sq)
    model = build_model(b, ["v0"], [out, sq2])
    runner = assert_parity(model, {"v0": np.float32(1.0)})
    stats = runner.plan_stats()
    assert stats["eager"] == 0, stats
    out_v, out_sq = runner.run({"v0": np.float32(1.0)})
    assert float(out_v) == 14.0  # 2 * 7
    np.testing.assert_allclose(out_sq, [2.0, 8.0, 32.0, 98.0])


def test_loop_dynamic_trip_count_stages_as_while():
    """M fed as a graph input is not plan-time static; a carried-only
    Loop still stages — bounded lax.while_loop takes M as a traced
    bound (VERDICT r3 #8)."""
    body = subgraph(
        [("Identity", ["cond_in"], ["cond_out"], {}),
         ("Add", ["v_in", "one"], ["v_out"], {})],
        ["cond_out", "v_out"], inputs=["iter", "cond_in", "v_in"],
        initializers={"one": np.float32(1.0)})
    b = GraphBuilder()
    c = b.init("cond", np.asarray(True))
    vf = b.n("Loop", ["M", c, "v0"], body=body)
    model = build_model(b, ["M", "v0"], [vf])
    runner = assert_parity(model, {"M": np.asarray(3, np.int64),
                                   "v0": np.float32(1.0)})
    assert runner.plan_stats()["eager"] == 0


def test_loop_condition_termination_stages_as_while():
    """A body that can flip its condition stages as a bounded
    lax.while_loop when it has no scan outputs: the while's early exit
    reproduces the interpreter's semantics exactly (VERDICT r3 #8 —
    previously this replayed eagerly on numpy)."""
    body = subgraph(
        [("Add", ["v_in", "one"], ["v_out"], {}),
         ("Less", ["v_out", "limit"], ["cond_out"], {})],
        ["cond_out", "v_out"], inputs=["iter", "cond_in", "v_in"],
        initializers={"one": np.float32(1.0), "limit": np.float32(5.0)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(100, np.int64))
    c = b.init("cond", np.asarray(True))
    vf = b.n("Loop", [m, c, "v0"], body=body)
    model = build_model(b, ["v0"], [vf])
    runner = assert_parity(model, {"v0": np.float32(1.0)})
    assert runner.plan_stats()["eager"] == 0


def test_loop_dynamic_termination_with_scans_stages_padded():
    """Dynamic termination WITH scan outputs: the concatenated
    scan-output length is data-dependent, so the Loop cannot fuse into
    a segment — it stages ALONE as a masked full-trip scan and the host
    slices the padded outputs to the executed count (_PaddedLoopStep).
    The interpreter's true-length scan output must come back exactly."""
    body = subgraph(
        [("Add", ["v_in", "one"], ["v_out"], {}),
         ("Less", ["v_out", "limit"], ["cond_out"], {}),
         ("Identity", ["v_out"], ["scan_out"], {})],
        ["cond_out", "v_out", "scan_out"],
        inputs=["iter", "cond_in", "v_in"],
        initializers={"one": np.float32(1.0), "limit": np.float32(5.0)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(100, np.int64))
    c = b.init("cond", np.asarray(True))
    vf, sf = b.n("Loop", [m, c, "v0"], n_out=2, body=body)
    model = build_model(b, ["v0"], [vf, sf])
    runner = assert_parity(model, {"v0": np.float32(1.0)})
    assert runner.plan_stats()["eager"] == 0
    out_v, out_s = runner.run({"v0": np.float32(1.0)})
    assert float(out_v) == 5.0
    np.testing.assert_allclose(out_s, [2.0, 3.0, 4.0, 5.0])


def test_loop_dynamic_scans_huge_bound_stays_eager():
    """The padded form runs the FULL trip bound on device; an
    effectively-unbounded ONNX bound (INT64_MAX idiom) must keep the
    eager path rather than allocate/compute the whole padded extent."""
    body = subgraph(
        [("Add", ["v_in", "one"], ["v_out"], {}),
         ("Less", ["v_out", "limit"], ["cond_out"], {}),
         ("Identity", ["v_out"], ["scan_out"], {})],
        ["cond_out", "v_out", "scan_out"],
        inputs=["iter", "cond_in", "v_in"],
        initializers={"one": np.float32(1.0), "limit": np.float32(5.0)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(np.iinfo(np.int64).max, np.int64))
    c = b.init("cond", np.asarray(True))
    vf, sf = b.n("Loop", [m, c, "v0"], n_out=2, body=body)
    model = build_model(b, ["v0"], [vf, sf])
    runner = assert_parity(model, {"v0": np.float32(1.0)})
    assert runner.plan_stats()["eager"] == 1


def test_loop_dynamic_scans_runtime_bound_stages_padded():
    """RUNTIME trip bound on a scan-output Loop (VERDICT r4 #7): M
    arrives as a graph input, so no concrete bound exists at plan time.
    The step stages anyway — per-call power-of-two pad buckets sized
    from the actual M, active mask gated on both the body cond and
    ``it < M`` — and only a call whose M exceeds the staging cap drops
    to the interpreter (parity must hold there too)."""
    body = subgraph(
        [("Add", ["v_in", "one"], ["v_out"], {}),
         ("Less", ["v_out", "limit"], ["cond_out"], {}),
         ("Identity", ["v_out"], ["scan_out"], {})],
        ["cond_out", "v_out", "scan_out"],
        inputs=["iter", "cond_in", "v_in"],
        initializers={"one": np.float32(1.0), "limit": np.float32(50.0)})
    b = GraphBuilder()
    c = b.init("cond", np.asarray(True))
    vf, sf = b.n("Loop", ["M", c, "v0"], n_out=2, body=body)
    model = build_model(b, ["M", "v0"], [vf, sf])
    runner = assert_parity(model, {"M": np.asarray(7, np.int64),
                                   "v0": np.float32(1.0)})
    assert runner.plan_stats()["eager"] == 0

    def run(m):
        return runner.run({"M": np.asarray(m, np.int64),
                           "v0": np.float32(1.0)})

    # bound by M (7 < cond's 49)
    out_v, out_s = run(7)
    assert float(out_v) == 8.0
    np.testing.assert_allclose(out_s, np.arange(2.0, 9.0))
    # cond terminates before M (bucket grows 16 -> 128)
    out_v, out_s = run(100)
    assert float(out_v) == 50.0
    np.testing.assert_allclose(out_s, np.arange(2.0, 51.0))
    # zero-trip
    out_v, out_s = run(0)
    assert float(out_v) == 1.0
    assert out_s.shape[0] == 0
    # a later M past the staging cap: interpreter fallback, same result
    out_v, out_s = run(100000)
    assert float(out_v) == 50.0
    np.testing.assert_allclose(out_s, np.arange(2.0, 51.0))


def test_loop_dynamic_scans_runtime_cond_zero_trip():
    """Padded staging with a RUNTIME initial condition: cond0=False
    must execute zero iterations — empty scan output, carried passthrough
    — and cond0=True replays the same plan with the true length."""
    body = subgraph(
        [("Add", ["v_in", "one"], ["v_out"], {}),
         ("Less", ["v_out", "limit"], ["cond_out"], {}),
         ("Identity", ["v_out"], ["scan_out"], {})],
        ["cond_out", "v_out", "scan_out"],
        inputs=["iter", "cond_in", "v_in"],
        initializers={"one": np.float32(1.0), "limit": np.float32(3.0)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(10, np.int64))
    vf, sf = b.n("Loop", [m, "c0", "v0"], n_out=2, body=body)
    model = build_model(b, ["c0", "v0"], [vf, sf])
    runner = assert_parity(model, {"c0": np.asarray(False),
                                   "v0": np.float32(1.0)})
    assert runner.plan_stats()["eager"] == 0
    out_v, out_s = runner.run({"c0": np.asarray(False),
                               "v0": np.float32(1.0)})
    assert float(out_v) == 1.0
    assert out_s.shape[0] == 0
    out_v, out_s = runner.run({"c0": np.asarray(True),
                               "v0": np.float32(1.0)})
    assert float(out_v) == 3.0
    np.testing.assert_allclose(out_s, [2.0, 3.0])


def test_loop_runtime_initial_cond_stages_as_while():
    """The initial condition arriving as a runtime input (possibly
    False -> zero trips) stages on the while path."""
    body = subgraph(
        [("Identity", ["cond_in"], ["cond_out"], {}),
         ("Add", ["v_in", "one"], ["v_out"], {})],
        ["cond_out", "v_out"], inputs=["iter", "cond_in", "v_in"],
        initializers={"one": np.float32(1.0)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(4, np.int64))
    vf = b.n("Loop", [m, "cond0", "v0"], body=body)
    model = build_model(b, ["cond0", "v0"], [vf])
    for cond in (True, False):
        runner = assert_parity(model, {"cond0": np.asarray(cond),
                                       "v0": np.float32(1.0)})
        assert runner.plan_stats()["eager"] == 0


def test_loop_outer_capture_weights_stage():
    """Body reads an outer-scope weight matrix (scripted exports close
    over module weights): staged scan must receive the capture."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 8)).astype(np.float32)
    body = subgraph(
        [("Identity", ["cond_in"], ["cond_out"], {}),
         ("MatMul", ["v_in", "w"], ["v_out"], {})],
        ["cond_out", "v_out"], inputs=["iter", "cond_in", "v_in"])
    b = GraphBuilder()
    b.init("w", w)
    m = b.init("M", np.asarray(3, np.int64))
    c = b.init("cond", np.asarray(True))
    vf = b.n("Loop", [m, c, "v0"], body=body)
    model = build_model(b, ["v0"], [vf])
    v0 = rng.standard_normal((2, 8)).astype(np.float32)
    runner = assert_parity(model, {"v0": v0}, rtol=1e-4, atol=1e-5)
    assert runner.plan_stats()["eager"] == 0


def test_if_inside_loop_stages():
    """Nested control flow: an If inside a staged Loop body traces
    through (parity via even/odd iteration behavior)."""
    then_g = subgraph([("Add", ["v_in", "pone"], ["tb"], {})], ["tb"],
                      initializers={"pone": np.float32(1.0)})
    else_g = subgraph([("Sub", ["v_in", "phalf"], ["eb"], {})], ["eb"],
                      initializers={"phalf": np.float32(0.5)})
    body = subgraph(
        [("Identity", ["cond_in"], ["cond_out"], {}),
         ("Mod", ["iter", "two_i"], ["rem"], {}),
         ("Cast", ["rem"], ["rem_b"], {"to": 9}),
         ("If", ["rem_b"], ["v_out"],
          {"then_branch": then_g, "else_branch": else_g})],
        ["cond_out", "v_out"], inputs=["iter", "cond_in", "v_in"],
        initializers={"two_i": np.asarray(2, np.int64)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(4, np.int64))
    c = b.init("cond", np.asarray(True))
    vf = b.n("Loop", [m, c, "v0"], body=body)
    model = build_model(b, ["v0"], [vf])
    runner = assert_parity(model, {"v0": np.float32(0.0)})
    assert runner.plan_stats()["eager"] == 0


def test_if_noise_branch_stays_eager():
    """Random draws inside a branch consume the executor's host RNG
    stream — staging would lose bit-exact reproducibility -> eager."""
    then_g = subgraph(
        [("RandomNormalLike", ["x"], ["noise"], {}),
         ("Add", ["x", "noise"], ["tout"], {})], ["tout"])
    else_g = subgraph([("Identity", ["x"], ["eout"], {})], ["eout"])
    b = GraphBuilder()
    y = b.n("If", ["cond"], then_branch=then_g, else_branch=else_g)
    model = build_model(b, ["cond", "x"], [y])
    from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner

    runner = JaxGraphRunner(model)
    runner.run({"cond": np.asarray(False),
                "x": np.ones((2, 2), np.float32)})
    assert runner.plan_stats()["eager"] == 1


def test_scripted_voice_graph_zero_eager_nodes():
    """A scripted-export-shaped voice graph (embed -> static-trip Loop
    refinement -> scale-conditional If -> waveform) runs through the
    fallback engine with ZERO interpreter-replayed nodes and parity on
    both branch values of the runtime condition."""
    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((32, 16)).astype(np.float32) * 0.3
    w_ref = rng.standard_normal((16, 16)).astype(np.float32) * 0.2
    w_out = rng.standard_normal((16, 64)).astype(np.float32) * 0.1

    body = subgraph(
        [("Identity", ["cond_in"], ["cond_out"], {}),
         ("MatMul", ["h_in", "w_ref"], ["h_mm"], {}),
         ("Tanh", ["h_mm"], ["h_out"], {})],
        ["cond_out", "h_out"], inputs=["iter", "cond_in", "h_in"])
    then_g = subgraph([("Mul", ["audio_raw", "boost"], ["tb"], {})],
                      ["tb"], initializers={"boost": np.float32(1.5)})
    else_g = subgraph([("Identity", ["audio_raw"], ["eb"], {})], ["eb"])

    b = GraphBuilder()
    b.init("emb", emb)
    b.init("w_ref", w_ref)
    b.init("w_out", w_out)
    m = b.init("M", np.asarray(3, np.int64))
    c0 = b.init("cond0", np.asarray(True))
    h = b.n("Gather", ["emb", "input"], axis=0)     # [1, T, 16]
    h_ref = b.n("Loop", [m, c0, h], body=body)
    raw = b.n("MatMul", [h_ref, "w_out"])           # [1, T, 64]
    flat = b.reshape(raw, [1, -1])
    audio_raw = b.n("Tanh", [flat])
    # runtime condition from the scales input (noise_scale > 0.5)
    ns = b.n("Gather", ["scales", b.i64([0])], axis=0)
    cond = b.n("Greater", [ns, b.init("half", np.float32(0.5))])
    # If branches capture audio_raw from the outer scope
    out = b.n("If", [cond], then_branch=subgraph(
        [("Mul", [audio_raw, "boost"], ["tb"], {})], ["tb"],
        initializers={"boost": np.float32(1.5)}),
        else_branch=subgraph(
            [("Identity", [audio_raw], ["eb"], {})], ["eb"]))
    model = build_model(b, ["input", "scales"], [out])

    engine = OnnxFallbackEngine(model, sample_rate=16000)
    ids = list(rng.integers(0, 32, 12))
    loud = engine.synthesize_ids(ids, noise_scale=0.9, seed=0)
    quiet = engine.synthesize_ids(ids, noise_scale=0.1, seed=0)
    assert loud.shape == quiet.shape
    np.testing.assert_allclose(loud, np.clip(quiet * 1.5, -1e9, 1e9),
                               rtol=1e-5, atol=1e-6)
    stats = engine.runner.plan_stats()
    assert stats["eager"] == 0, stats

    # interpreter parity on the runner path
    from phoonnx_tpu.onnx.executor import OnnxExecutor

    feeds = {"input": np.asarray([ids], np.int64),
             "scales": np.asarray([0.9, 1.0, 0.8], np.float32)}
    ref = OnnxExecutor(model).run(feeds)[0].reshape(-1)
    np.testing.assert_allclose(loud, ref, rtol=1e-5, atol=1e-6)


def test_nested_dynamic_loop_stages_as_while():
    """An early-terminating carried-only Loop NESTED inside a
    stageable outer Loop now stages too: the inner loop lowers as a
    bounded lax.while_loop whose early exit matches the interpreter
    (r3 refused this structurally because the scan path would have run
    it full-trip; the while path makes it exact)."""
    inner_body = subgraph(
        [("Add", ["v_in", "one"], ["v_out"], {}),
         ("Less", ["v_out", "three"], ["cond_out"], {})],
        ["cond_out", "v_out"],
        inputs=["it", "cin", "v_in"],
        initializers={"one": np.float32(1.0), "three": np.float32(3.0)})
    outer_body = subgraph(
        [("Loop", ["Mi", "ct", "w_in"], ["w_mid"], {"body": inner_body}),
         ("Identity", ["cond_in"], ["cond_out"], {})],
        ["cond_out", "w_mid"],
        inputs=["iter", "cond_in", "w_in"],
        initializers={"Mi": np.asarray(10, np.int64),
                      "ct": np.asarray(True)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(2, np.int64))
    c = b.init("cond0", np.asarray(True))
    (wf,) = (b.n("Loop", [m, c, "w0"], n_out=1, body=outer_body),)
    out = b.add(wf, wf)
    model = build_model(b, ["w0"], [out])
    runner = assert_parity(model, {"w0": np.float32(0.0)})
    assert runner.plan_stats()["eager"] == 0, runner.plan_stats()


def test_plain_scatter_in_if_branch_keeps_node_eager():
    """ScatterND with reduction=none inside an If branch cannot be
    duplicate-checked at plan time (values differ per taken branch), so
    the If must stay eager — XLA's duplicate-write order is
    unspecified while the interpreter applies the last write."""
    idx = np.asarray([[[1], [1]]], np.int64).reshape(2, 1)
    upd_t = np.asarray([10.0, 20.0], np.float32)
    then_g = subgraph(
        [("ScatterND", ["x", "sidx", "supd"], ["tout"], {})], ["tout"],
        initializers={"sidx": idx, "supd": upd_t})
    else_g = subgraph([("Neg", ["x"], ["eout"], {})], ["eout"])
    b = GraphBuilder()
    y = b.n("If", ["cond"], then_branch=then_g, else_branch=else_g)
    model = build_model(b, ["cond", "x"], [y])
    x = np.asarray([1.0, 2.0, 3.0], np.float32)
    for cond in (True, False):
        runner = assert_parity(model, {"cond": np.asarray(cond), "x": x})
        assert runner.plan_stats()["eager"] == 1, runner.plan_stats()


def test_reducing_scatter_in_if_branch_still_stages():
    """reduction=add combines duplicate writes associatively — safe to
    stage regardless of index values."""
    idx = np.asarray([[1], [1]], np.int64)
    upd = np.asarray([10.0, 20.0], np.float32)
    then_g = subgraph(
        [("ScatterND", ["x", "sidx", "supd"], ["tout"],
          {"reduction": "add"})], ["tout"],
        initializers={"sidx": idx, "supd": upd})
    else_g = subgraph([("Neg", ["x"], ["eout"], {})], ["eout"])
    b = GraphBuilder()
    y = b.n("If", ["cond"], then_branch=then_g, else_branch=else_g)
    model = build_model(b, ["cond", "x"], [y])
    x = np.asarray([1.0, 2.0, 3.0], np.float32)
    for cond in (True, False):
        runner = assert_parity(model, {"cond": np.asarray(cond), "x": x})
        assert runner.plan_stats()["eager"] == 0, runner.plan_stats()


def test_nested_fulltrip_loop_still_stages():
    """A nested Loop that provably runs full-trip (cond passthrough,
    True initializer condition) must NOT be caught by the
    dynamic-termination refusal."""
    inner_body = subgraph(
        [("Add", ["v_in", "one"], ["v_out"], {}),
         ("Identity", ["cin"], ["cond_out"], {})],
        ["cond_out", "v_out"],
        inputs=["it", "cin", "v_in"],
        initializers={"one": np.float32(1.0)})
    outer_body = subgraph(
        [("Loop", ["Mi", "ct", "w_in"], ["w_mid"], {"body": inner_body}),
         ("Identity", ["cond_in"], ["cond_out"], {})],
        ["cond_out", "w_mid"],
        inputs=["iter", "cond_in", "w_in"],
        initializers={"Mi": np.asarray(3, np.int64),
                      "ct": np.asarray(True)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(2, np.int64))
    c = b.init("cond0", np.asarray(True))
    (wf,) = (b.n("Loop", [m, c, "w0"], n_out=1, body=outer_body),)
    out = b.add(wf, wf)
    model = build_model(b, ["w0"], [out])
    runner = assert_parity(model, {"w0": np.float32(0.0)})
    assert runner.plan_stats()["eager"] == 0, runner.plan_stats()


def test_loop_dynamic_scans_shape_unstable_carry_stays_eager():
    """A body that reduces its (1,)-shaped carry to a scalar: jnp.where
    would silently broadcast it back, so the padded form must REFUSE
    (shape check raises in the trial trace) and the loop replay eagerly
    with the interpreter's output shapes on every call."""
    body = subgraph(
        [("ReduceSum", ["v_in"], ["v_scalar"], {"keepdims": 0}),
         ("Add", ["v_scalar", "one"], ["v_out"], {}),
         ("Less", ["v_out", "limit"], ["cond_out"], {}),
         ("Identity", ["v_out"], ["scan_out"], {})],
        ["cond_out", "v_out", "scan_out"],
        inputs=["iter", "cond_in", "v_in"],
        initializers={"one": np.float32(1.0), "limit": np.float32(5.0)})
    b = GraphBuilder()
    m = b.init("M", np.asarray(100, np.int64))
    c = b.init("cond", np.asarray(True))
    vf, sf = b.n("Loop", [m, c, "v0"], n_out=2, body=body)
    model = build_model(b, ["v0"], [vf, sf])
    v0 = np.asarray([1.0], np.float32)
    runner = assert_parity(model, {"v0": v0})
    assert runner.plan_stats()["eager"] == 1
    out_v, _out_s = runner.run({"v0": v0})
    assert np.asarray(out_v).shape == ()  # interpreter's scalar carry
