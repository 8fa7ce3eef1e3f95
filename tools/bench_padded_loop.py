"""Benchmark: dynamic-termination scan-output Loop — padded staging vs
interpreter replay.

The reference's autoregressive decode loop (mul.py:201-233) shipped as
an ONNX Loop has data-dependent termination AND scan outputs. The
lowering stages it as a masked full-trip scan over the whole trip bound
M, slicing the padded outputs to the executed count n host-side
(_PaddedLoopStep). The tradeoff this tool measures: the compiled path
computes all M (bound) iterations even when only n execute, while the
numpy interpreter replays exactly n iterations — but pays Python
per-node dispatch for each. Prints one JSON line with both times, the
ratio, and the n/M utilization so the crossover is auditable.

Usage: python tools/bench_padded_loop.py [--bound 512] [--exit-at 48]
       [--hidden 256] [--reps 20]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_decode_loop(bound: int, exit_at: int, hidden: int):
    """GRU-ish greedy-decode shape: per-iteration state matmul + tanh,
    a logits row as the scan output, exit when the step counter hits
    exit_at (runtime value, so termination is genuinely dynamic)."""
    from phoonnx_tpu.onnx.reader import OnnxModel, OnnxNode

    rng = np.random.default_rng(0)
    w = rng.standard_normal((hidden, hidden)).astype(np.float32) * 0.05
    body = OnnxModel(
        initializers={"W": w, "one": np.float32(1.0)},
        metadata={}, inputs=["iter", "cond_in", "v_in", "k_in"],
        outputs=["cond_out", "v_out", "k_out", "scan_out"],
        nodes=[
            OnnxNode(op_type="MatMul", name="b0", inputs=["v_in", "W"],
                     outputs=["h"], attributes={}),
            OnnxNode(op_type="Tanh", name="b1", inputs=["h"],
                     outputs=["v_out"], attributes={}),
            OnnxNode(op_type="Add", name="b2", inputs=["k_in", "one"],
                     outputs=["k_out"], attributes={}),
            OnnxNode(op_type="Less", name="b3", inputs=["k_out", "limit"],
                     outputs=["cond_out"], attributes={}),
            OnnxNode(op_type="Identity", name="b4", inputs=["v_out"],
                     outputs=["scan_out"], attributes={}),
        ])
    return OnnxModel(
        initializers={"M": np.asarray(bound, np.int64),
                      "c0": np.asarray(True),
                      "k0": np.float32(0.0)},
        metadata={}, inputs=["v0", "limit"],
        outputs=["vf", "kf", "logits"],
        nodes=[OnnxNode(op_type="Loop", name="decode",
                        inputs=["M", "c0", "v0", "k0"],
                        outputs=["vf", "kf", "logits"],
                        attributes={"body": body})])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=int, default=512)
    ap.add_argument("--exit-at", type=int, default=48)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the sandbox sitecustomize "
                    "force-registers axon and resets JAX_PLATFORMS; only "
                    "the in-process config update sticks — see conftest)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from phoonnx_tpu.onnx.executor import OnnxExecutor
    from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner

    model = build_decode_loop(args.bound, args.exit_at, args.hidden)
    feeds = {"v0": np.zeros((1, args.hidden), np.float32),
             "limit": np.float32(args.exit_at)}

    runner = JaxGraphRunner(model)
    runner.run(feeds)  # plan + compile
    stats = runner.plan_stats()
    assert stats["eager"] == 0, f"loop replayed eagerly: {stats}"
    _, kf, logits = runner.run(feeds)
    n_exec = int(kf)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        runner.run(feeds)
    staged_ms = (time.perf_counter() - t0) / args.reps * 1000

    interp = OnnxExecutor(model)
    ref_out = interp.run(feeds)
    np.testing.assert_allclose(np.asarray(logits), ref_out[2], atol=1e-5)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        interp.run(feeds)
    interp_ms = (time.perf_counter() - t0) / args.reps * 1000

    print(json.dumps({
        "metric": "padded_loop_decode_ms",
        "staged_ms": round(staged_ms, 3),
        "interpreter_ms": round(interp_ms, 3),
        "speedup": round(interp_ms / staged_ms, 2),
        "bound": args.bound,
        "executed": n_exec,
        "padded_utilization": round(n_exec / args.bound, 3),
        "hidden": args.hidden,
        "backend": __import__("jax").default_backend(),
    }))


if __name__ == "__main__":
    main()
