"""Precise batch-scaling measurement of one fused vocoder stage kernel.

Long chained runs (device time >> RTT noise) of apply_group for a single
stage across batch sizes, reporting us/step (grid step = one (b, tile)
program) and ms/utt — the number that must stay flat for batching to pay.

Usage: python tools/bench_stage_scaling.py [--stage 2] [--dtype float32]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--batches", default="1,2,4,8,16,32")
    ap.add_argument("--target-ms", type=float, default=80.0,
                    help="target total device ms per chained run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu.models.vits import (fused_stage, model as vits_model,
                                         nn)
    from phoonnx_tpu.models.vits.model import VitsHParams

    hp = VitsHParams.preset(args.preset, n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    dtype = jnp.dtype(args.dtype)
    if args.dtype == "bfloat16":
        from phoonnx_tpu.infer.engine import cast_floating

        params = cast_floating(params, jnp.bfloat16)
    packed = jax.device_put(
        vits_model.pack_decoder_params(params, hp, args.frames))
    dec = packed["dec"]

    i = args.stage
    t = args.frames
    for j in range(i + 1):
        t *= dec["upsample_rates"][j]
    up = dec["ups"][i]
    out_ch = (int(up["packed"]["out_ch"]) if "packed" in up
              else int(nn.resolve_weight(up).shape[1]))
    stage_r = nn.pack_ratio(out_ch, t)
    spec = dec["fused_stages"][i]
    assert spec is not None
    tile = int(spec["tile"])
    print(f"stage {i}: T={t} r={stage_r} C={out_ch} tile={tile} "
          f"hb={int(spec['hb'])} taps={spec['W'].shape[0]}")

    def _fetch(x):
        return np.asarray(x)

    @jax.jit
    def triv(x):
        return x + 1.0

    _fetch(triv(jnp.float32(0.0)))
    rtts = []
    for k in range(6):
        t0 = time.perf_counter()
        _fetch(triv(jnp.float32(k)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt: {rtt * 1e3:.1f} ms")

    rng0 = np.random.default_rng(0)
    # rough per-step estimate to scale the chain length
    est_step_us = 4.0
    for batch in [int(b) for b in args.batches.split(",")]:
        rows = t // stage_r
        n_tiles = -(-rows // tile)
        steps = batch * n_tiles
        chain = max(2, int(args.target_ms * 1e3 / (est_step_us * steps)))
        x = jnp.asarray(
            rng0.standard_normal((batch, rows, stage_r * out_ch)), dtype)

        @jax.jit
        def run(xx):
            def body(k, acc):
                y = fused_stage.apply_group(
                    spec, xx + k.astype(xx.dtype) * 1e-6)
                return acc + y[:, ::257].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

        _fetch(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _fetch(run(x))
            best = min(best, time.perf_counter() - t0)
        per_call = max(best - rtt, 0.0) / chain
        us_step = per_call * 1e6 / steps
        print(f"b={batch:3d} chain={chain:4d} steps/call={steps:5d} "
              f"ms/call={per_call * 1e3:8.3f} us/step={us_step:7.2f} "
              f"ms/utt={per_call * 1e3 / batch:7.3f}")


if __name__ == "__main__":
    main()
