"""Honest train-step timing on the TPU chip.

Measures the fused G+D VITS train step (phoonnx_tpu.train.step) with the
same chained-execution methodology as bench.py: N steps run inside ONE
jitted program (the TrainState threads the data dependency between
steps), the wall clock runs until a dependent loss checksum's bytes are
fetched, and the trivial-program round-trip is subtracted. This is the
timing pattern that survives the axon relay's early-returning
``block_until_ready`` (see bench.py docstring).

Prints one JSON line per (preset, batch, dtype) config:
    {"config": ..., "step_ms": ..., "utt_per_sec": ...}

Run: ``python tools/bench_train.py [--preset medium] [--chain 8]``
"""

import argparse
import json
import os
import sys
import time

# runnable as `python tools/bench_train.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    import numpy as np

    return np.asarray(x)


def _measure_rtt() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def triv(x):
        return x + 1.0

    _fetch(triv(jnp.float32(0.0)))
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        _fetch(triv(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _calibrate(rtt: float) -> float:
    """Matmul-calibrated practical chip peak (vary operands per rep —
    identical (executable, value) calls can be relay-cached)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_cal = 4096
    a_cal = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_cal, n_cal)),
        jnp.float32)

    @jax.jit
    def cal_chain(a):
        def body(i, acc):
            m = acc @ a
            return m / (jnp.abs(m).max() + 1.0)

        return jax.lax.fori_loop(0, 24, body, a)[0, 0]

    _fetch(cal_chain(a_cal))
    best = float("inf")
    for rep in range(3):
        arg = a_cal + jnp.float32((rep + 1) * 1e-6)
        _fetch(arg)
        t0 = time.perf_counter()
        _fetch(cal_chain(arg))
        best = min(best, time.perf_counter() - t0)
    return 24 * 2 * n_cal ** 3 / max(best - rtt, 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--batches", default="8",
                    help="comma list, e.g. 8,16,32,64")
    ap.add_argument("--t-text", type=int, default=128)
    ap.add_argument("--t-spec", type=int, default=512,
                    help="spectrogram frames (512 ~ 6 s at 22.05 kHz)")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--mas-impl", default="auto",
                    choices=["auto", "scan", "pallas"])
    ap.add_argument("--out", default=None,
                    help="also write the result list to this JSON file")
    ap.add_argument("--grouped-conv", default="custom",
                    choices=["native", "custom"],
                    help="grouped-conv autodiff A/B knob. Since round 5 "
                         "'custom' (the production path) matches "
                         "'native' speed on every geometry: it is the "
                         "native dW plus a free analytic probe that "
                         "cancels the SPMD idle-axis miscount "
                         "(nn._grouped_conv_bwd, TRAINING.md).")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu import flops as flops_mod
    from phoonnx_tpu.models.vits import nn as vits_nn
    from phoonnx_tpu.models.vits.model import VitsHParams
    from phoonnx_tpu.train import step as train_step_mod

    vits_nn.set_grouped_conv_impl(args.grouped_conv)

    hp = VitsHParams.preset(args.preset, n_vocab=161)
    rng = np.random.default_rng(0)
    t_x, t_y = args.t_text, args.t_spec
    spec_ch = hp.filter_length // 2 + 1

    rtt = _measure_rtt()
    peak = _calibrate(rtt)
    print(json.dumps({"calibrated_peak_tflops": round(peak / 1e12, 1),
                      "rtt_ms": round(rtt * 1000, 2)}), flush=True)

    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        batch = {
            "phoneme_ids": jnp.asarray(
                rng.integers(4, 160, (b, t_x)), jnp.int32),
            "phoneme_lengths": jnp.full((b,), t_x, jnp.int32),
            "spec": jnp.asarray(
                rng.random((b, t_y, spec_ch), np.float32) * 2.0),
            "spec_lengths": jnp.full((b,), t_y, jnp.int32),
            "audio": jnp.asarray(
                rng.random((b, t_y * hp.hop_length), np.float32) * 2 - 1),
        }
        step_gflops = flops_mod.train_step_gflops(
            hp, t_x, t_y, batch_size=b)
        for dtype in args.dtypes.split(","):
            cfg = train_step_mod.TrainConfig(compute_dtype=dtype,
                                             mas_impl=args.mas_impl)
            state = train_step_mod.init_train_state(
                jax.random.PRNGKey(0), hp, cfg)
            state = jax.device_put(state)

            @jax.jit
            def chain(state, base_rng, batch=batch, cfg=cfg):
                def body(i, carry):
                    st, acc = carry
                    st, metrics = train_step_mod.train_step(
                        st, batch, jax.random.fold_in(base_rng, i),
                        hp, cfg)
                    return st, acc + metrics["loss_gen_all"].astype(
                        jnp.float32)

                _, acc = jax.lax.fori_loop(
                    0, args.chain, body, (state, jnp.float32(0.0)))
                return acc

            t0 = time.perf_counter()
            _fetch(chain(state, jax.random.PRNGKey(0)))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                _fetch(chain(state, jax.random.PRNGKey(rep + 1)))
                best = min(best, time.perf_counter() - t0)
            step_s = max(best - rtt, 1e-9) / args.chain
            out = {
                "config": f"{args.preset} b{b} x{t_x}x{t_y} {dtype}",
                "step_ms": round(step_s * 1000, 2),
                "utt_per_sec": round(b / step_s, 1),
                "audio_sec_of_data_per_sec": round(
                    b * t_y * hp.hop_length / hp.sample_rate / step_s, 1),
                "train_gflop_per_step": round(step_gflops, 1),
                "train_mfu": round(
                    step_gflops * 1e9 / step_s / peak, 4),
                "flop_source": "analytic (flops.train_step_gflops)",
                "compile_s_chained": round(compile_s, 1),
                "device": str(jax.devices()[0]),
            }
            results.append(out)
            print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"calibrated_peak_tflops": round(peak / 1e12, 1),
                       "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
