"""Benchmark: bundled auxiliary models — compiled runner vs interpreter.

The reference runs tashkeel/phonikud/silero on onnxruntime (compiled
C++); the rebuild now runs them through the ONNX -> JAX lowering
(onnx/aux_compile.py + jax_lowering.py). This tool measures what that
buys over the eager numpy interpreter on graphs shaped like the real
models:

* ``vad``      — silero-style: conv feature stack + LSTM(64) over one
                 [1, 512] audio chunk, called in a host loop with
                 recurrent state threading (the preprocess usage).
* ``tashkeel`` — libtashkeel-style: char+hint embeddings -> 2-layer
                 biLSTM(256) tagger over a 256-char bucket.
* ``phonikud`` — dictabert-style: ort dynamically-quantized encoder
                 blocks (DynamicQuantizeLinear -> MatMulInteger) over a
                 256-position bucket, 3 logit heads.

Timing is honest wall clock per call from the host, inputs VARIED per
iteration (the axon relay serves repeated identical programs from a
cache; see bench.py). On a remote-tunnel TPU each compiled call pays
the ~30 ms relay RTT — pass --platform cpu to measure pure compute on
the host CPU backend (how preprocess workers run the VAD).

Usage: python tools/bench_aux.py [--model all] [--iters 30]
       [--platform cpu]
Prints one JSON line per model.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _model(builder, inputs, outputs):
    from phoonnx_tpu.onnx.reader import OnnxModel, OnnxNode

    nodes = [
        OnnxNode(op_type=op, name=f"n{k}", inputs=list(i),
                 outputs=list(o), attributes=a)
        for k, (op, i, o, a) in enumerate(builder.nodes)
    ]
    return OnnxModel(initializers=builder.initializers, metadata={},
                     inputs=list(inputs), outputs=list(outputs),
                     nodes=nodes)


def build_vad():
    """Conv stack + LSTM(64) + prob head over one [1, 512] chunk with
    [2, 1, 64] recurrent state, silero's I/O contract."""
    from phoonnx_tpu.onnx.builder import GraphBuilder

    rng = np.random.default_rng(0)
    b = GraphBuilder()
    h = b.unsqueeze("input", [1])  # [1,1,512]
    ch = 1
    for i, out_ch in enumerate((16, 32, 64)):
        w = b.init(f"cw{i}", (rng.standard_normal((out_ch, ch, 5))
                              * 0.2).astype(np.float32))
        bias = b.init(f"cb{i}", np.zeros(out_ch, np.float32))
        h = b.relu(b.conv1d(h, w, bias, stride=2, padding=2))
        ch = out_ch
    # [1,64,64] -> [T=64,1,64]
    x = b.transpose(h, [2, 0, 1])
    hidden = 64
    w = b.init("lw", (rng.standard_normal((1, 4 * hidden, 64))
                      * 0.2).astype(np.float32))
    r = b.init("lr", (rng.standard_normal((1, 4 * hidden, hidden))
                      * 0.2).astype(np.float32))
    h0 = b.n("Gather", ["h", b.i64([0])], axis=0)
    c0 = b.n("Gather", ["c", b.i64([0])], axis=0)
    y, yh, yc = b.n("LSTM", [x, w, r, "", "", h0, c0], n_out=3,
                    hidden_size=hidden)
    pw = b.init("pw", (rng.standard_normal((hidden, 1))
                       * 0.2).astype(np.float32))
    last = b.squeeze(b.n("Slice", [y, b.i64([63]), b.i64([64]),
                                   b.i64([0])]), [0, 1])
    prob = b.sigmoid(b.matmul(last, pw))
    h_out = b.n("Concat", [yh, yh], axis=0)
    c_out = b.n("Concat", [yc, yc], axis=0)
    model = _model(b, ["input", "h", "c"], [prob, h_out, c_out])

    def feeds(i, state):
        rng_i = np.random.default_rng(i)
        f = {"input": (0.1 * rng_i.standard_normal((1, 512))).astype(
            np.float32)}
        f.update(state or {"h": np.zeros((2, 1, 64), np.float32),
                           "c": np.zeros((2, 1, 64), np.float32)})
        return f

    def carry(outs):
        return {"h": np.asarray(outs[1]), "c": np.asarray(outs[2])}

    return model, feeds, carry


def build_tashkeel(seq: int = 256):
    """Char+hint embeddings -> 2-layer biLSTM(256) -> target ids."""
    from phoonnx_tpu.onnx.builder import GraphBuilder

    rng = np.random.default_rng(1)
    b = GraphBuilder()
    emb_c = b.init("emb_c", (rng.standard_normal((80, 128))
                             * 0.1).astype(np.float32))
    emb_d = b.init("emb_d", (rng.standard_normal((16, 128))
                             * 0.1).astype(np.float32))
    e = b.add(b.n("Gather", [emb_c, "char_inputs"], axis=0),
              b.n("Gather", [emb_d, "diac_inputs"], axis=0))  # [1,T,128]
    x = b.transpose(e, [1, 0, 2])  # [T,1,128]
    hidden, inp = 256, 128
    for layer in range(2):
        w = b.init(f"w{layer}", (rng.standard_normal(
            (2, 4 * hidden, inp)) * 0.05).astype(np.float32))
        r = b.init(f"r{layer}", (rng.standard_normal(
            (2, 4 * hidden, hidden)) * 0.05).astype(np.float32))
        y = b.n("LSTM", [x, w, r, "", "input_lengths"], n_out=3,
                hidden_size=hidden, direction="bidirectional")[0]
        # [T,2,1,H] -> [T,1,2H]
        x = b.reshape(b.transpose(y, [0, 2, 1, 3]), [0, 1, -1])
        inp = 2 * hidden
    proj = b.init("proj", (rng.standard_normal((inp, 24))
                           * 0.1).astype(np.float32))
    scores = b.matmul(x, proj)  # [T,1,24]
    ids = b.n("ArgMax", [b.squeeze(scores, [1])], axis=1, keepdims=0)
    logits = b.reduce_max(b.squeeze(scores, [1]), [1], keepdims=0)
    target = b.unsqueeze(ids, [0])
    log_out = b.unsqueeze(logits, [0])
    model = _model(b, ["char_inputs", "diac_inputs", "input_lengths"],
                   [target, log_out])

    def feeds(i, _state):
        rng_i = np.random.default_rng(100 + i)
        n = seq - (i % 7)  # varying true lengths inside one bucket
        char = np.zeros((1, seq), np.int64)
        char[0, :n] = rng_i.integers(1, 80, n)
        diac = np.zeros((1, seq), np.int64)
        diac[0, :n] = rng_i.integers(0, 16, n)
        return {"char_inputs": char, "diac_inputs": diac,
                "input_lengths": np.asarray([n], np.int64)}

    return model, feeds, None


def build_phonikud(seq: int = 256, hidden: int = 512, layers: int = 2):
    """ort dynamic-quant encoder: embeddings + per-layer
    (DQL -> MatMulInteger -> rescale -> relu) x2 + residual, 3 heads."""
    from phoonnx_tpu.onnx.builder import GraphBuilder

    rng = np.random.default_rng(2)
    b = GraphBuilder()
    emb = b.init("emb", (rng.standard_normal((128, hidden))
                         * 0.05).astype(np.float32))
    h = b.n("Gather", [emb, "input_ids"], axis=0)  # [1,T,H]
    maskf = b.unsqueeze(b.cast("attention_mask", 1), [2])
    h = b.mul(h, maskf)
    for layer in range(layers):
        res = h
        for j in range(2):
            wf = (rng.standard_normal((hidden, hidden)) * 0.05).astype(
                np.float32)
            ws = np.float32(np.abs(wf).max() / 127.0)
            wq = b.init(f"wq{layer}_{j}", np.clip(
                np.rint(wf / ws), -127, 127).astype(np.int8))
            wsn = b.init(f"ws{layer}_{j}", ws)
            xq, xs, xz = b.n("DynamicQuantizeLinear",
                             [b.squeeze(h, [0])], n_out=3)
            acc = b.n("MatMulInteger", [xq, wq, xz])
            h = b.unsqueeze(b.relu(b.mul(b.cast(acc, 1),
                                         b.mul(xs, wsn))), [0])
        h = b.add(h, res)
    heads = []
    for name, n_cls in (("nikud", 29), ("shin", 2), ("add", 3)):
        hw = b.init(f"hw_{name}", (rng.standard_normal((hidden, n_cls))
                                   * 0.1).astype(np.float32))
        heads.append(b.matmul(h, hw))
    model = _model(b, ["input_ids", "attention_mask"], heads)

    def feeds(i, _state):
        rng_i = np.random.default_rng(200 + i)
        n = seq - (i % 7)
        ids = np.zeros((1, seq), np.int64)
        ids[0, :n] = rng_i.integers(1, 128, n)
        mask = np.zeros((1, seq), np.int64)
        mask[0, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}

    return model, feeds, None


def time_path(run, feeds, carry, iters):
    """Median wall seconds per call, inputs varied per iteration."""
    state = None
    for i in range(3):  # warm (plan + compile on the runner path)
        outs = run(feeds(i, state))
        state = carry(outs) if carry else None
    times = []
    for i in range(iters):
        f = feeds(1000 + i, state)
        t0 = time.perf_counter()
        outs = run(f)
        np.asarray(outs[0])
        times.append(time.perf_counter() - t0)
        state = carry(outs) if carry else None
    return float(np.median(times))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["all", "vad", "tashkeel", "phonikud"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from phoonnx_tpu.onnx.executor import OnnxExecutor
    from phoonnx_tpu.onnx.jax_lowering import JaxGraphRunner

    builders = {"vad": build_vad, "tashkeel": build_tashkeel,
                "phonikud": build_phonikud}
    names = list(builders) if args.model == "all" else [args.model]
    for name in names:
        model, feeds, carry = builders[name]()
        interp = OnnxExecutor(model)
        t_interp = time_path(interp.run, feeds, carry, args.iters)
        runner = JaxGraphRunner(model, matmul_precision="highest")
        t_comp = time_path(runner.run, feeds, carry, args.iters)
        stats = runner.plan_stats()
        print(json.dumps({
            "metric": f"aux_{name}_speedup_compiled_vs_interpreter",
            "value": round(t_interp / t_comp, 2),
            "unit": "x",
            "vs_baseline": round(t_interp / t_comp, 2),
            "extras": {
                "interpreter_ms_per_call": round(t_interp * 1e3, 3),
                "compiled_ms_per_call": round(t_comp * 1e3, 3),
                "jitted_nodes": stats["jitted"],
                "eager_nodes": stats["eager"],
                "plans": stats["plans"],
            },
        }), flush=True)


if __name__ == "__main__":
    main()
