"""Isolate the vocoder's per-component batch scaling.

Times, at several batch sizes:
  * each fused Pallas stage kernel alone (per-stage apply_group)
  * the XLA fallback (resblock chain) for the same stages
  * the upsample transposed convs alone
so the batch-serializing component of BENCH's flat batch sweep is
attributed to a specific op, not the whole decode.

Usage: python tools/bench_vocoder_parts.py [--preset medium]
       [--dtype float32] [--batches 1,4,16] [--frames 512]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batches", default="1,4,16")
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu.models.vits import (fused_stage, model as vits_model,
                                         modules, nn)
    from phoonnx_tpu.models.vits.model import VitsHParams

    hp = VitsHParams.preset(args.preset, n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    dtype = jnp.dtype(args.dtype)
    if args.dtype == "bfloat16":
        from phoonnx_tpu.infer.engine import cast_floating

        params = cast_floating(params, jnp.bfloat16)
    packed = vits_model.pack_decoder_params(params, hp, args.frames)
    packed = jax.device_put(packed)
    dec = packed["dec"]

    def _fetch(x):
        return np.asarray(x)

    @jax.jit
    def triv(x):
        return x + 1.0

    _fetch(triv(jnp.float32(0.0)))
    rtts = []
    for i in range(6):
        t0 = time.perf_counter()
        _fetch(triv(jnp.float32(i)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt: {rtt * 1e3:.1f} ms")

    def timed(name, fn, *inputs):
        @jax.jit
        def chain(*ins):
            def body(i, acc):
                return acc + fn(i, *ins)

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0.0))

        _fetch(chain(*inputs))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _fetch(chain(*inputs))
            best = min(best, time.perf_counter() - t0)
        per = max(best - rtt, 0.0) / args.chain
        print(f"  {name:36s} {per * 1e3:8.3f} ms")
        return per

    def vary(i, x):
        return x + (i.astype(x.dtype) * 1e-6)

    # reconstruct the per-stage geometry the generator walks
    num_kernels = dec["num_kernels"]
    rng0 = np.random.default_rng(0)
    resblock_fn = (modules.resblock1 if dec["resblock_type"] == "1"
                   else modules.resblock2)

    for batch in [int(b) for b in args.batches.split(",")]:
        print(f"batch={batch}")
        t = args.frames
        pack_r = 1
        for i, up in enumerate(dec["ups"]):
            rate = dec["upsample_rates"][i]
            t *= rate
            out_ch = int(
                nn.resolve_weight(up).shape[1]) if "packed" not in up else \
                int(up["packed"]["out_ch"])
            stage_r = nn.pack_ratio(out_ch, t)
            spec = dec["fused_stages"][i]
            x = jnp.asarray(
                rng0.standard_normal((batch, t // max(stage_r, 1),
                                      max(stage_r, 1) * out_ch)), dtype)
            if spec is not None and fused_stage.usable(spec, stage_r, x):
                def f_kernel(it, xx, spec=spec):
                    y = fused_stage.apply_group(spec, vary(it, xx))
                    return y[:, ::257].astype(jnp.float32).sum()

                timed(f"stage{i} pallas (T={t}, r={stage_r}, "
                      f"C={out_ch})", f_kernel, x)

            blocks = dec["resblocks"][i * num_kernels:(i + 1) * num_kernels]

            def f_xla(it, xx, blocks=blocks, stage_r=stage_r):
                acc = None
                xv = vary(it, xx)
                for block in blocks:
                    out = resblock_fn(block, xv, pack_r=stage_r,
                                      packed_io=stage_r > 1)
                    acc = out if acc is None else acc + out
                y = acc / len(blocks)
                return y[:, ::257].astype(jnp.float32).sum()

            timed(f"stage{i} XLA    (T={t}, r={stage_r}, "
                  f"C={out_ch})", f_xla, x)

            # native unpacked convs: [B, T, C] straight through XLA
            xn = jnp.asarray(
                rng0.standard_normal((batch, t, out_ch)), dtype)

            def f_native(it, xx, blocks=blocks):
                acc = None
                xv = vary(it, xx)
                for block in blocks:
                    out = resblock_fn(block, xv, pack_r=1, packed_io=False)
                    acc = out if acc is None else acc + out
                y = acc / len(blocks)
                return y[:, ::257].astype(jnp.float32).sum()

            timed(f"stage{i} native (T={t}, r=1, "
                  f"C={out_ch})", f_native, xn)
            pack_r = stage_r

        # the transposed-conv chain alone
        def f_ups(it, z):
            xx = nn.apply_conv(dec["conv_pre"], vary(it, z), padding=3)
            p_r = 1
            for i, up in enumerate(dec["ups"]):
                rate = dec["upsample_rates"][i]
                kernel = dec["upsample_kernel_sizes"][i]
                padding = (kernel - rate) // 2
                pb = up.get("packed")
                if pb is not None and int(pb["r_in"]) == p_r:
                    xx = nn.conv_transpose1d_packed_io(
                        xx, None, stride=rate, padding=padding,
                        r_in=p_r, prebuilt=pb)
                    r_up = rate * p_r
                    out_ch = int(pb["out_ch"])
                    t_out = xx.shape[1] * r_up
                    s_r = nn.pack_ratio(out_ch, t_out)
                    if r_up != s_r:
                        xx = xx.reshape(xx.shape[0],
                                        xx.shape[1] * (r_up // s_r),
                                        s_r * out_ch)
                    p_r = s_r
                else:
                    if p_r > 1:  # unpack to [B, T, C] first
                        b_, rows_, lanes_ = xx.shape
                        xx = xx.reshape(b_, rows_ * p_r, lanes_ // p_r)
                    w = nn.resolve_weight(up)
                    xx = nn.conv_transpose1d(xx, w, up.get("bias"),
                                             stride=rate, padding=padding)
                    out_ch = w.shape[1]
                    s_r = nn.pack_ratio(out_ch, xx.shape[1])
                    if s_r > 1:
                        xx = xx.reshape(xx.shape[0], xx.shape[1] // s_r,
                                        s_r * out_ch)
                    p_r = s_r
            return xx[:, ::257].astype(jnp.float32).sum()

        z = jnp.asarray(
            rng0.standard_normal(
                (batch, args.frames, hp.inter_channels)), dtype)
        timed("upsample chain (all stages)", f_ups, z)


if __name__ == "__main__":
    main()
