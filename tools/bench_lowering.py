"""Benchmark: foreign ONNX voice graphs — XLA lowering vs interpreter.

The reference hands ANY voice graph to onnxruntime (compiled C++,
reference voice.py:167). Our fallback engine lowers the graph to jitted
XLA segments (onnx/jax_lowering.py); this tool measures what that buys
over the pure-numpy interpreter on the same graph, i.e. the compiled
fallback's speedup for coqui/mimic3-style voices that cannot be
name-imported onto the native engine.

Builds a name-mangled (hence non-importable) executable VITS graph at
the requested preset, runs it through OnnxFallbackEngine both ways, and
prints one JSON line.

Usage: python tools/bench_lowering.py [--preset medium] [--tokens 64]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_foreign_graph(preset: str, out_path: str) -> int:
    """Executable VITS graph with mangled initializer names; returns
    its sample rate."""
    import jax

    from phoonnx_tpu.models.vits.load import params_to_flat
    from phoonnx_tpu.models.vits.model import VitsHParams, random_params
    from phoonnx_tpu.onnx.reader import read_onnx
    from phoonnx_tpu.onnx.vits_graph import export_vits_onnx
    from phoonnx_tpu.onnx.writer import write_onnx

    hp = VitsHParams.preset(preset, n_vocab=161)
    params = random_params(jax.random.PRNGKey(0), hp)
    native = out_path + ".native"
    export_vits_onnx(params_to_flat(params), hp, native,
                     metadata={"model_type": "vits"})

    model = read_onnx(native)
    rename = {name: f"foreign/{name}" for name in model.initializers}
    io_names = set(model.inputs) | set(model.outputs)
    remap = lambda n: rename.get(n, n) if n not in io_names else n  # noqa: E731
    nodes = [
        (n.op_type,
         [remap(i) for i in n.inputs],
         [remap(o) for o in n.outputs],
         n.attributes)
        for n in model.nodes
    ]
    write_onnx(
        out_path,
        {rename[k]: v for k, v in model.initializers.items()},
        metadata=dict(model.metadata),
        inputs=model.inputs, outputs=model.outputs, nodes=nodes,
    )
    Path(native).unlink()
    return hp.sample_rate


def time_engine(engine, ids, reps: int, warmup: int, seed=0) -> tuple:
    """Median seconds per synthesize_ids call + audio seconds produced.

    A fixed seed pins the graph-internal noise, so the duration-dependent
    tensor shapes repeat across calls and the lowered path measures
    compiled-segment replay (the serving steady state once a shape has
    been seen; novel shapes pay one XLA compile, reported separately)."""
    audio = None
    for _ in range(warmup):
        audio = engine.synthesize_ids(ids, seed=seed)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        audio = engine.synthesize_ids(ids, seed=seed)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), len(audio) / engine.hp.sample_rate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--reps-interp", type=int, default=3)
    ap.add_argument("--reps-lowered", type=int, default=10)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); the sandbox "
                         "sitecustomize otherwise pins the TPU relay")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from phoonnx_tpu.infer.onnx_engine import OnnxFallbackEngine
    from phoonnx_tpu.onnx.reader import read_onnx

    with tempfile.TemporaryDirectory() as tmp:
        path = str(Path(tmp) / "model.onnx")
        print(f"building foreign {args.preset}-preset graph ...",
              file=sys.stderr)
        sample_rate = build_foreign_graph(args.preset, path)
        model = read_onnx(path)

    rng = np.random.default_rng(0)
    ids = [int(x) for x in rng.integers(4, 160, args.tokens)]

    lowered = OnnxFallbackEngine(model, sample_rate, compile=True)
    lowered_s, audio_s = time_engine(lowered, ids,
                                     args.reps_lowered, warmup=2)
    assert lowered.runner is not None, (
        "lowering degraded to the interpreter — speedup would be fake")
    stats = lowered.runner.plan_stats()
    # one call at a never-seen seed: the novel-shape cost (segments
    # downstream of the noise-dependent frame count retrace + compile;
    # amortized by the jit cache / persistent compilation cache)
    t0 = time.perf_counter()
    lowered.synthesize_ids(ids, seed=987654)
    novel_shape_s = time.perf_counter() - t0

    interp = OnnxFallbackEngine(model, sample_rate, compile=False)
    interp_s, _ = time_engine(interp, ids, args.reps_interp, warmup=1)

    import jax

    print(json.dumps({
        "metric": "onnx_fallback_lowering_speedup",
        "value": round(interp_s / lowered_s, 1),
        "unit": "x_vs_numpy_interpreter",
        "extra": {
            "preset": args.preset,
            "tokens": args.tokens,
            "interpreter_s_per_utt": round(interp_s, 4),
            "lowered_s_per_utt": round(lowered_s, 4),
            "audio_seconds": round(audio_s, 2),
            "lowered_rtf": round(lowered_s / audio_s, 6),
            "interpreter_rtf": round(interp_s / audio_s, 6),
            "novel_shape_first_call_s": round(novel_shape_s, 3),
            "plan": stats,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
