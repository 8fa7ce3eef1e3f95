"""Per-stage device timing of the single-stream synthesis graph.

Times each stage of ``vits_model.infer`` (text 128 / frames 512 — the
bench.py workload) as its own chained program, plus the full graph,
using the chained-execution + data-fetch-barrier methodology (see
bench.py: ``block_until_ready`` under-measures on tunnel backends).

Each stage also reports XLA's own FLOP estimate
(``compiled.cost_analysis()``), the achieved TFLOP/s, and the roofline
fraction against a matmul-calibrated chip peak — so "is this stage
actually fast" is answered in FLOPs-vs-achieved, not just wall time.

Stage sums will not exactly match the full graph (XLA fuses across
stage boundaries and overlaps independent work), but the split shows
where optimization effort pays.

Usage: python tools/profile_infer.py [--preset medium] [--chain 20]
       [--reps 3] [--dtype float32] [--batch 1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--preset", default="medium",
                    choices=["micro", "medium", "high"])
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu.models.vits import (
        duration,
        encoder,
        model as vits_model,
        nn,
        posterior,
    )
    from phoonnx_tpu.models.vits.model import VitsHParams

    hp = VitsHParams.preset(args.preset, n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    if args.dtype == "bfloat16":
        from phoonnx_tpu.infer.engine import cast_floating

        params = cast_floating(params, jnp.bfloat16)
    dtype = jnp.dtype(args.dtype)

    t_text, max_frames = 128, 512
    batch = args.batch
    packed = vits_model.pack_decoder_params(params, hp, max_frames)
    packed = jax.device_put(packed)

    rng0 = np.random.default_rng(0)
    ids = jnp.asarray(rng0.integers(4, 160, (batch, t_text)), jnp.int32)
    lengths = jnp.asarray([t_text] * batch, jnp.int32)
    x_mask = nn.sequence_mask(lengths, t_text)[..., None].astype(dtype)
    y_mask = jnp.ones((batch, max_frames, 1), dtype)
    h = hp.hidden_channels
    x_h = jnp.asarray(rng0.standard_normal((batch, t_text, h)), dtype)
    z_p = jnp.asarray(
        rng0.standard_normal((batch, max_frames, hp.inter_channels)), dtype)
    dpn = jnp.asarray(rng0.standard_normal((batch, t_text, 2)), dtype)
    w_ceil = jnp.abs(
        jnp.asarray(rng0.standard_normal((batch, t_text)),
                    jnp.float32)) + 1.0
    m_p = jnp.asarray(
        rng0.standard_normal((batch, t_text, hp.inter_channels)), dtype)
    frame_lengths = jnp.asarray([max_frames] * batch, jnp.int32)

    def _fetch(x):
        return np.asarray(x)

    @jax.jit
    def triv(x):
        return x + 1.0

    _fetch(triv(jnp.float32(0.0)))
    rtts = []
    for i in range(8):
        t0 = time.perf_counter()
        _fetch(triv(jnp.float32(i)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt: {rtt * 1e3:.1f} ms")

    # matmul-calibrated chip peak for the roofline column (the v5e spec
    # sheet number is not achievable through the tunnel stack; a big
    # square matmul is the practical ceiling — ~225 f32 / ~320 bf16
    # TFLOP/s measured on this chip)
    n_cal = 4096
    a_cal = jnp.asarray(rng0.standard_normal((n_cal, n_cal)), dtype)

    @jax.jit
    def cal_chain(a):
        def body(i, acc):
            m = acc @ a
            return m / (jnp.abs(m).max() + 1.0)

        return jax.lax.fori_loop(0, 8, body, a)[0, 0]

    _fetch(cal_chain(a_cal))
    cal_best = float("inf")
    for rep in range(args.reps):
        # vary the operand: identical (executable, value) calls can be
        # relay-cached on this backend
        arg = a_cal + jnp.float32((rep + 1) * 1e-6)
        _fetch(arg)
        t0 = time.perf_counter()
        _fetch(cal_chain(arg))
        cal_best = min(cal_best, time.perf_counter() - t0)
    peak = 8 * 2 * n_cal ** 3 / max(cal_best - rtt, 1e-9)
    print(f"calibrated peak: {peak / 1e12:.1f} TFLOP/s ({args.dtype})")

    print(f"{'stage':28s} {'ms':>8s} {'GFLOP':>8s} {'TFLOP/s':>8s} "
          f"{'roofline':>9s}")
    results = {}

    def timed(name, fn, *inputs):
        """fn(i, *inputs) -> scalar contribution; chained args.chain x."""

        @jax.jit
        def chain(*ins):
            def body(i, acc):
                return acc + fn(i, *ins)

            return jax.lax.fori_loop(
                0, args.chain, body, jnp.float32(0.0))

        try:
            cost = chain.lower(*inputs).compile().cost_analysis()
            if isinstance(cost, list):  # one dict per device on old jax
                cost = cost[0] if cost else {}
            flops = float((cost or {}).get("flops", 0.0)) / args.chain
        except Exception:  # backend without a cost model
            flops = 0.0

        _fetch(chain(*inputs))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _fetch(chain(*inputs))
            best = min(best, time.perf_counter() - t0)
        per = max(best - rtt, 0.0) / args.chain
        achieved = flops / per if per > 0 else 0.0
        print(f"{name:28s} {per * 1e3:8.3f} {flops / 1e9:8.2f} "
              f"{achieved / 1e12:8.2f} {achieved / peak:8.1%}")
        results[name] = {"ms": per * 1e3, "gflop": flops / 1e9,
                         "roofline": achieved / peak}
        return per

    # jitter an input per iteration so no step can be relay-cached
    def vary(i, x):
        return x + (i.astype(x.dtype) * 1e-6)

    def f_encoder(i, params, ids, x_mask):
        x, m, logs = encoder.text_encoder(
            params["enc_p"], ids, x_mask + 0 * vary(i, x_mask[..., :1]))
        return (x[:, ::7].astype(jnp.float32).sum()
                + m[:, ::11].astype(jnp.float32).sum())

    def f_sdp(i, params, x, x_mask, dpn):
        logw = duration.sdp_reverse(
            params["dp"], vary(i, x), x_mask, dpn, g=None)
        return logw.astype(jnp.float32).sum()

    def f_path(i, params, w_ceil, x_mask, y_mask, m_p):
        attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)
        attn = nn.generate_path(w_ceil + 0 * i, attn_mask)
        m_exp = jnp.einsum("byx,bxc->byc", attn, m_p)
        return m_exp[:, ::13].astype(jnp.float32).sum()

    def f_flow(i, params, z_p, y_mask):
        z = posterior.coupling_flow(
            params["flow"], vary(i, z_p), y_mask, g=None, reverse=True)
        return z[:, ::13].astype(jnp.float32).sum()

    def f_vocoder(i, params, z_p, y_mask):
        audio = vits_model.decode_audio(
            params, hp, vary(i, z_p) * y_mask, g=None)
        return audio[:, ::1997].astype(jnp.float32).sum()

    def f_vocoder_masked(i, params, z_p, y_mask, frame_lengths):
        # production batched path: bucket-padded latents + per-conv
        # tail zeroing (lengths one frame short so masking is live)
        audio = vits_model.decode_audio(
            params, hp, vary(i, z_p) * y_mask, g=None,
            frame_lengths=frame_lengths - 1)
        return audio[:, ::1997].astype(jnp.float32).sum()

    def f_full(i, params, ids, lengths):
        rng = jax.random.fold_in(jax.random.PRNGKey(7), i)
        audio, y_lengths, _ = vits_model.infer(
            params, hp, ids, lengths, max_frames=max_frames,
            noise_scale=jnp.float32(0.667),
            length_scale=jnp.float32(1.0),
            noise_w=jnp.float32(0.8), rng=rng)
        return audio[:, ::1997].astype(jnp.float32).sum()

    timed("text_encoder", f_encoder, packed, ids, x_mask)
    timed("sdp_reverse", f_sdp, packed, x_h, x_mask, dpn)
    timed("generate_path+expand", f_path, packed, w_ceil, x_mask,
          y_mask, m_p)
    timed("coupling_flow(reverse)", f_flow, packed, z_p, y_mask)
    timed("vocoder(packed)", f_vocoder, packed, z_p, y_mask)
    timed("vocoder(packed,masked)", f_vocoder_masked, packed, z_p, y_mask,
          frame_lengths)
    timed("FULL infer", f_full, packed, ids, lengths)


if __name__ == "__main__":
    main()
