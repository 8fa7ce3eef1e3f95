"""Batch-packed lanes vs phase-packed lanes for the r>1 fused stages.

VERDICT r4 #3 asked whether filling the 128 lanes with BATCH elements
(r=1 in time, block-diagonal identical weight blocks per element)
instead of time phases (spread taps) removes the packed-tap FLOP
inflation at high batch. The analytical answer is no before measuring:

* tap COUNT is equal — batch-packing needs K taps per conv (sum over
  medium's resblock2 group: 3+3+5+5+7+7 = 30) and the spread-tap
  construction also lands at 30 for this geometry;
* tap matrices are [128, 128] dense-executed either way; block-diag
  density is 1/r = 25% vs measured spread density ~35%, so the DENSE
  FLOPs per output element are identical and the USEFUL fraction is
  *lower* for batch-packing (batch elements never mix in a tap);
* batch-packing pays extras phase-packing doesn't: r x larger halo
  (offsets live at full time resolution -> more recompute or smaller
  tiles) and a [B, T, C] -> [B/r, T, r*C] lane transpose of the
  stage input in HBM.

This tool measures both anyway (honest rejection needs numbers): the
standard spec on [B, T/r, r*C] vs the dil_scale=r batch-packed spec on
[B/r, T, r*C], same chained methodology, plus the repack transpose
cost, with a correctness cross-check between the two layouts.

Usage: python tools/bench_stage_batchpack.py [--stage 2] [--batches 16,64]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--batches", default="16,64")
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu.models.vits import fused_stage, model as vits_model
    from phoonnx_tpu.models.vits import modules, nn
    from phoonnx_tpu.models.vits.model import VitsHParams

    hp = VitsHParams.preset(args.preset, n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    dtype = jnp.dtype(args.dtype)
    if args.dtype == "bfloat16":
        from phoonnx_tpu.infer.engine import cast_floating

        params = cast_floating(params, jnp.bfloat16)
    dec = params["dec"]
    num_kernels = int(dec["num_kernels"])
    i = args.stage

    # stage geometry (mirrors pack_decoder_params' schedule walk)
    t = args.frames
    for k in range(i + 1):
        t *= hp.upsample_rates[k]
    out_ch = nn.resolve_weight(dec["ups"][i]).shape[1]
    r = nn.pack_ratio(out_ch, t)
    print(f"stage{i}: T={t} C={out_ch} r={r} dtype={args.dtype}")
    if r <= 1:
        print("stage is unpacked (r=1); batch-packing is the XLA "
              "batched-conv handoff already measured — nothing to do")
        return

    blocks = dec["resblocks"][i * num_kernels:(i + 1) * num_kernels]
    spec_std = fused_stage.build_group_spec(
        blocks, r, modules.LRELU_SLOPE, dtype=dtype)
    spec_bat = fused_stage.build_group_spec(
        blocks, r, modules.LRELU_SLOPE, dtype=dtype, dil_scale=r)
    print(f"std  spec: taps={spec_std['W'].shape[0]} "
          f"tile={int(spec_std['tile'])} hb={int(spec_std['hb'])}")
    if spec_bat is None:
        print("batch-packed spec REJECTED by the VMEM budget "
              "(halo x r blew the tile search) — rejection stands")
        return
    print(f"bat  spec: taps={spec_bat['W'].shape[0]} "
          f"tile={int(spec_bat['tile'])} hb={int(spec_bat['hb'])}")

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

    def timed(name, fn, *inputs):
        @jax.jit
        def chain(*ins):
            def body(k, acc):
                return acc + fn(k, *ins)

            return jax.lax.fori_loop(0, args.chain, body,
                                     jnp.float32(0.0))

        _fetch(chain(*inputs))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _fetch(chain(*inputs))
            best = min(best, time.perf_counter() - t0)
        per = max(best - rtt, 0.0) / args.chain
        print(f"  {name:40s} {per * 1e3:8.3f} ms")
        return per

    def vary(k, x):
        return x + (k.astype(x.dtype) * 1e-6)

    # correctness: both layouts must agree (same math, different order)
    rng = np.random.default_rng(0)
    b_chk = r
    x_time = rng.standard_normal((b_chk, t, out_ch)).astype(np.float32)
    x_std = jnp.asarray(
        x_time.reshape(b_chk, t // r, r, out_ch)
        .reshape(b_chk, t // r, r * out_ch), dtype)
    x_bat = jnp.asarray(
        x_time.reshape(1, b_chk, t, out_ch).transpose(0, 2, 1, 3)
        .reshape(1, t, b_chk * out_ch), dtype)
    y_std = np.asarray(fused_stage.apply_group(spec_std, x_std)).astype(
        np.float32)
    y_bat = np.asarray(fused_stage.apply_group(spec_bat, x_bat)).astype(
        np.float32)
    y_std_time = y_std.reshape(b_chk, t // r, r, out_ch).reshape(
        b_chk, t, out_ch)
    y_bat_time = y_bat.reshape(1, t, b_chk, out_ch).transpose(
        0, 2, 1, 3).reshape(b_chk, t, out_ch)
    err = np.max(np.abs(y_std_time - y_bat_time)) / (
        np.max(np.abs(y_std_time)) + 1e-9)
    print(f"cross-layout max rel err: {err:.2e}")
    assert err < 5e-3, "layouts disagree — measurement would be invalid"

    for batch in [int(b) for b in args.batches.split(",")]:
        if batch % r:
            continue
        print(f"batch={batch}")
        xs = jnp.asarray(
            rng.standard_normal((batch, t // r, r * out_ch)), dtype)
        xb = jnp.asarray(
            rng.standard_normal((batch // r, t, r * out_ch)), dtype)
        xt = jnp.asarray(
            rng.standard_normal((batch, t, out_ch)), dtype)

        def f_std(k, x):
            y = fused_stage.apply_group(spec_std, vary(k, x))
            return y[:, ::257].astype(jnp.float32).sum()

        def f_bat(k, x):
            y = fused_stage.apply_group(spec_bat, vary(k, x))
            return y[:, ::257].astype(jnp.float32).sum()

        def f_repack(k, x):
            # the lane transpose the batch-packed layout needs on entry
            b, tt, c = x.shape
            y = vary(k, x).reshape(b // r, r, tt, c).transpose(
                0, 2, 1, 3).reshape(b // r, tt, r * c)
            return y[:, ::257].astype(jnp.float32).sum()

        std = timed(f"phase-packed [B,{t // r},{r * out_ch}]", f_std, xs)
        bat = timed(f"batch-packed [B/{r},{t},{r * out_ch}]", f_bat, xb)
        rep = timed("entry lane transpose alone", f_repack, xt)
        print(f"  -> batch/phase ratio {bat / std:5.2f}x"
              f" (+transpose {(bat + rep) / std:5.2f}x)")


if __name__ == "__main__":
    main()
