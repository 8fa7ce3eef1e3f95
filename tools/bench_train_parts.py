"""Per-stage roofline of the fused VITS G+D training step.

The inference side closed its batch-scaling blind spot with
tools/bench_vocoder_parts.py (round 4); this is the training
counterpart (VERDICT r4 #4): times each stage of the train step —
text/posterior encoders, flow, the MAS score einsums + DP kernel, SDP
nll, the segment vocoder decode, mel STFT, discriminators — forward
and (where the stage is on the gradient path) forward+backward, at
several batch sizes, next to the full fused step. The gap between the
sum of parts and the whole is XLA cross-stage fusion/overhead; the
largest part is the binding stage.

Shapes mirror a realistic 22.05 kHz medium-preset training batch:
t_x=128 phonemes, t_y=400 spec frames (~4.6 s), segment 32 frames.

Usage (on the TPU chip):
    python tools/bench_train_parts.py [--preset medium]
        [--batches 8,32,64] [--dtype float32] [--t-x 128] [--t-y 400]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--batches", default="8,32,64")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--t-x", type=int, default=128)
    ap.add_argument("--t-y", type=int, default=400)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mas-impl", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu.models.vits import discriminator as disc
    from phoonnx_tpu.models.vits import (duration, encoder, model as
                                         vits_model, posterior)
    from phoonnx_tpu.models.vits import nn
    from phoonnx_tpu.models.vits.model import VitsHParams
    from phoonnx_tpu.ops import mas, stft
    from phoonnx_tpu.train.step import (TrainConfig, init_train_state,
                                        train_step)

    hp = VitsHParams.preset(args.preset, n_vocab=161)
    cfg = TrainConfig(mas_impl=args.mas_impl,
                      compute_dtype=args.dtype)
    state = init_train_state(jax.random.PRNGKey(0), hp, cfg)
    params = jax.device_put(state.params_g)
    params_d = jax.device_put(state.params_d)
    dtype = jnp.dtype(args.dtype)

    t_x, t_y = args.t_x, args.t_y
    seg = hp.segment_size
    seg_samples = seg * hp.hop_length

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
        """fn(i, *inputs) -> f32 scalar; chained fori_loop timing."""

        @jax.jit
        def chain(*ins):
            def body(i, acc):
                return acc + fn(i, *ins)

            return jax.lax.fori_loop(0, args.chain, body,
                                     jnp.float32(0.0))

        _fetch(chain(*inputs))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _fetch(chain(*inputs))
            best = min(best, time.perf_counter() - t0)
        per = max(best - rtt, 0.0) / args.chain
        print(f"  {name:34s} {per * 1e3:9.3f} ms", flush=True)
        return per * 1e3

    def vary(i, x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + (i.astype(x.dtype) * 1e-6)
        return x

    def key(i):
        return jax.random.fold_in(jax.random.PRNGKey(3), i)

    def tsum(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree.leaves(tree)
                   if jnp.issubdtype(jnp.asarray(leaf).dtype,
                                     jnp.floating))

    report = {"preset": args.preset, "dtype": args.dtype,
              "t_x": t_x, "t_y": t_y, "rtt_ms": round(rtt * 1e3, 2),
              "batches": {}}

    for batch in [int(b) for b in args.batches.split(",")]:
        print(f"batch={batch}")
        rows = {}
        rng0 = np.random.default_rng(0)
        ids = jnp.asarray(rng0.integers(4, 160, (batch, t_x)), jnp.int32)
        x_mask = jnp.ones((batch, t_x, 1), dtype)
        y_mask = jnp.ones((batch, t_y, 1), dtype)
        spec = jnp.asarray(
            rng0.standard_normal((batch, t_y, hp.spec_channels)) ** 2,
            dtype)
        z_in = jnp.asarray(
            rng0.standard_normal((batch, t_y, hp.inter_channels)), dtype)
        post_noise = jnp.asarray(
            rng0.standard_normal((batch, t_y, hp.inter_channels)), dtype)
        x_hidden = jnp.asarray(
            rng0.standard_normal((batch, t_x, hp.hidden_channels)), dtype)
        w_dur = jnp.asarray(
            rng0.integers(1, 8, (batch, t_x, 1)).astype(np.float32), dtype)
        e_q = jnp.asarray(rng0.standard_normal((batch, t_x, 2)), dtype)
        z_seg = jnp.asarray(
            rng0.standard_normal((batch, seg, hp.inter_channels)), dtype)
        y_wave = jnp.asarray(
            rng0.standard_normal((batch, seg_samples)) * 0.1, dtype)
        y_hat_wave = jnp.asarray(
            rng0.standard_normal((batch, seg_samples)) * 0.1, dtype)
        neg_cent = jnp.asarray(
            -np.abs(rng0.standard_normal((batch, t_y, t_x))), jnp.float32)
        attn_mask = jnp.ones((batch, t_y, t_x), jnp.float32)

        # -- forward-only stages -------------------------------------
        def f_te(i, ids):
            x, m, l = encoder.text_encoder(
                params["enc_p"], ids, x_mask, p_dropout=hp.p_dropout,
                rng=key(i), deterministic=False)
            return (x[:, ::7].astype(jnp.float32).sum()
                    + m[:, ::7].astype(jnp.float32).sum())

        rows["text_encoder_fwd"] = timed("text_encoder fwd", f_te, ids)

        def f_te_bwd(i, ids):
            def loss(p):
                x, m, l = encoder.text_encoder(
                    p, ids, x_mask, p_dropout=hp.p_dropout,
                    rng=key(i), deterministic=False)
                return (x.astype(jnp.float32).sum()
                        + m.astype(jnp.float32).sum()
                        + l.astype(jnp.float32).sum())

            return tsum(jax.grad(loss)(params["enc_p"]))

        rows["text_encoder_fwdbwd"] = timed("text_encoder fwd+bwd",
                                            f_te_bwd, ids)

        def f_pe(i, spec):
            z, m, l = posterior.posterior_encoder(
                params["enc_q"], vary(i, spec), y_mask, post_noise)
            return z[:, ::13].astype(jnp.float32).sum()

        rows["posterior_fwd"] = timed("posterior_encoder fwd", f_pe, spec)

        def f_pe_bwd(i, spec):
            def loss(p):
                z, m, l = posterior.posterior_encoder(
                    p, vary(i, spec), y_mask, post_noise)
                return (z.astype(jnp.float32).sum()
                        + m.astype(jnp.float32).sum())

            return tsum(jax.grad(loss)(params["enc_q"]))

        rows["posterior_fwdbwd"] = timed("posterior_encoder fwd+bwd",
                                         f_pe_bwd, spec)

        def f_flow(i, z):
            z_p = posterior.coupling_flow(params["flow"], vary(i, z),
                                          y_mask)
            return z_p[:, ::13].astype(jnp.float32).sum()

        rows["flow_fwd"] = timed("coupling_flow fwd", f_flow, z_in)

        def f_flow_bwd(i, z):
            def loss(p):
                z_p = posterior.coupling_flow(p, vary(i, z), y_mask)
                return z_p.astype(jnp.float32).sum()

            return tsum(jax.grad(loss)(params["flow"]))

        rows["flow_fwdbwd"] = timed("coupling_flow fwd+bwd", f_flow_bwd,
                                    z_in)

        # MAS: scores (einsums) + DP kernel; stop-grad in the step, so
        # forward-only is the whole cost
        def f_scores(i, z_p, m_p, logs_p):
            z_p, m_p, logs_p = vary(i, z_p), vary(i, m_p), vary(i, logs_p)
            s_p_sq_r = jnp.exp(-2.0 * logs_p)
            nc1 = jnp.sum(-0.5 * jnp.log(2.0 * jnp.pi) - logs_p,
                          axis=-1)[:, None, :]
            nc2 = jnp.einsum("byc,bxc->byx", -0.5 * jnp.square(z_p),
                             s_p_sq_r)
            nc3 = jnp.einsum("byc,bxc->byx", z_p, m_p * s_p_sq_r)
            nc4 = jnp.sum(-0.5 * jnp.square(m_p) * s_p_sq_r,
                          axis=-1)[:, None, :]
            return (nc1 + nc2 + nc3 + nc4)[:, ::7].astype(
                jnp.float32).sum()

        z_p_d = jnp.asarray(
            rng0.standard_normal((batch, t_y, hp.inter_channels)), dtype)
        m_p_d = jnp.asarray(
            rng0.standard_normal((batch, t_x, hp.inter_channels)), dtype)
        logs_p_d = jnp.asarray(
            rng0.standard_normal((batch, t_x, hp.inter_channels)) * 0.1,
            dtype)
        rows["mas_scores_fwd"] = timed("MAS score einsums", f_scores,
                                       z_p_d, m_p_d, logs_p_d)

        def f_mas(i, nc):
            path = mas.maximum_path(vary(i, nc), attn_mask,
                                    impl=args.mas_impl)
            return path[:, ::7].astype(jnp.float32).sum()

        rows["mas_dp_fwd"] = timed(f"MAS DP ({args.mas_impl})", f_mas,
                                   neg_cent)

        def f_sdp(i, x):
            nll = duration.sdp_nll(
                params["dp"], vary(i, x), x_mask, w_dur, e_q,
                p_dropout=0.5, rng=key(i), deterministic=False)
            return nll.astype(jnp.float32).sum()

        rows["sdp_fwd"] = timed("SDP nll fwd", f_sdp, x_hidden)

        def f_sdp_bwd(i, x):
            def loss(p):
                nll = duration.sdp_nll(
                    p, vary(i, x), x_mask, w_dur, e_q,
                    p_dropout=0.5, rng=key(i), deterministic=False)
                return nll.astype(jnp.float32).sum()

            return tsum(jax.grad(loss)(params["dp"]))

        rows["sdp_fwdbwd"] = timed("SDP nll fwd+bwd", f_sdp_bwd, x_hidden)

        def f_voc(i, z):
            o = vits_model.decode_audio(params, hp, vary(i, z))
            return o[:, ::257].astype(jnp.float32).sum()

        rows["vocoder_fwd"] = timed(f"vocoder fwd (seg={seg})", f_voc,
                                    z_seg)

        # grad wrt the decoder params — decode_audio reads params["dec"]
        def f_voc_bwd2(i, z):
            def loss(p):
                o = vits_model.decode_audio({**params, "dec": p}, hp,
                                            vary(i, z))
                return o.astype(jnp.float32).sum()

            return tsum(jax.grad(loss)(params["dec"]))

        rows["vocoder_fwdbwd"] = timed("vocoder fwd+bwd", f_voc_bwd2,
                                       z_seg)

        def f_mel(i, y):
            m = stft.mel_spectrogram(
                vary(i, y).astype(jnp.float32), hp.filter_length,
                hp.mel_channels, hp.sample_rate, hp.hop_length,
                hp.win_length)
            return m.sum()

        rows["mel_fwd"] = timed("mel STFT fwd", f_mel, y_wave)

        def f_mel_bwd(i, y):
            def loss(yy):
                m = stft.mel_spectrogram(
                    yy.astype(jnp.float32), hp.filter_length,
                    hp.mel_channels, hp.sample_rate, hp.hop_length,
                    hp.win_length)
                return m.sum()

            return jax.grad(loss)(vary(i, y)).astype(jnp.float32).sum()

        rows["mel_fwdbwd"] = timed("mel STFT fwd+bwd", f_mel_bwd, y_wave)

        def f_disc(i, y, y_hat):
            rs, gs, fr, fg = disc.multi_period_discriminator(
                params_d, vary(i, y), vary(i, y_hat))
            return (tsum(rs) + tsum(gs))

        rows["disc_fwd"] = timed("discriminators fwd", f_disc, y_wave,
                                 y_hat_wave)

        def f_disc_bwd(i, y, y_hat):
            def loss(p):
                rs, gs, fr, fg = disc.multi_period_discriminator(
                    p, vary(i, y), vary(i, y_hat))
                return tsum(rs) + tsum(gs) + tsum(fr) + tsum(fg)

            return tsum(jax.grad(loss)(params_d))

        rows["disc_fwdbwd"] = timed("discriminators fwd+bwd", f_disc_bwd,
                                    y_wave, y_hat_wave)

        # -- the full fused step (G+D grads + both optimizer updates) --
        batch_dict = {
            "phoneme_ids": ids,
            "phoneme_lengths": jnp.full((batch,), t_x, jnp.int32),
            "spec": spec.astype(jnp.float32),
            "spec_lengths": jnp.full((batch,), t_y, jnp.int32),
            "audio": jnp.asarray(
                rng0.standard_normal((batch, t_y * hp.hop_length)) * 0.1,
                np.float32),
        }
        step_fn = partial(train_step, hp=hp, cfg=cfg)

        @jax.jit
        def chain_step(state, batch_in):
            def body(i, carry):
                st, acc = carry
                b = {k: vary(i, v) if k == "spec" else v
                     for k, v in batch_in.items()}
                st, metrics = step_fn(st, b, key(i))
                return st, acc + metrics["loss_gen_all"].astype(
                    jnp.float32)

            _, acc = jax.lax.fori_loop(
                0, args.chain, body, (state, jnp.float32(0.0)))
            return acc

        _fetch(chain_step(state, batch_dict))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _fetch(chain_step(state, batch_dict))
            best = min(best, time.perf_counter() - t0)
        full_ms = max(best - rtt, 0.0) / args.chain * 1e3
        print(f"  {'FULL fused G+D step':34s} {full_ms:9.3f} ms")
        rows["full_step"] = full_ms

        grad_parts = (rows["text_encoder_fwdbwd"]
                      + rows["posterior_fwdbwd"] + rows["flow_fwdbwd"]
                      + rows["mas_scores_fwd"] + rows["mas_dp_fwd"]
                      + rows["sdp_fwdbwd"] + rows["vocoder_fwdbwd"]
                      + 2 * rows["mel_fwd"] + rows["mel_fwdbwd"]
                      + rows["disc_fwd"] + rows["disc_fwdbwd"])
        rows["sum_of_parts"] = round(grad_parts, 3)
        print(f"  {'sum of parts (approx)':34s} {grad_parts:9.3f} ms")
        report["batches"][str(batch)] = {
            k: round(v, 3) for k, v in rows.items()}

    print(json.dumps(report))


if __name__ == "__main__":
    main()
