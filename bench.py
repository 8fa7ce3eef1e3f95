"""Benchmark: VITS synthesis RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full synthesis graph (text encoder + SDP + alignment +
inverse flow + HiFi-GAN) on the "medium" voice preset at a realistic
workload: one ~6s utterance per program (frame bucket 512 @ 86.1 fps,
22.05 kHz). RTF = device_time / audio_seconds_decoded. The reference
publishes no numbers (BASELINE.md); vs_baseline compares against the
north-star target RTF 0.02 (>1.0 means better than target).

Timing methodology: N synthesis steps are CHAINED inside one jitted
program (per-step rng via fold_in, a scalar checksum threads the data
dependency), and the wall clock runs until the checksum's *bytes* are
fetched. This is robust on remote-tunnel TPU backends where
``block_until_ready`` can return before device execution finishes
(observed on the axon relay: 30 dispatched programs "completed" in less
time than one program's FLOPs allow). The trivial-program round-trip
time is measured separately and subtracted.
"""

import json
import sys
import time

TARGET_RTF = 0.02
N_CHAIN = 20


def _fetch(x):
    """Barrier that provably waits: pull the result's bytes to host."""
    import numpy as np

    return np.asarray(x)


def _measure_rtt() -> float:
    """Median dispatch+fetch round-trip of a trivial program."""
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


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoonnx_tpu.models.vits import model as vits_model
    from phoonnx_tpu.models.vits.model import VitsHParams

    hp = VitsHParams.preset("medium", n_vocab=161)
    params = vits_model.random_params(jax.random.PRNGKey(0), hp)
    params = jax.device_put(params)

    t_text, max_frames = 128, 512
    # what the engine dispatches in production: decoder packed kernels
    # precomputed at init (placement-only, bit-identical; engine.py
    # _params_for_frames)
    packed = vits_model.pack_decoder_params(params, hp, max_frames)
    sample_rate = hp.sample_rate
    audio_seconds = max_frames * hp.hop_length / sample_rate

    def forward(params, ids, lengths, rng):
        audio, y_lengths, _ = vits_model.infer(
            params, hp, ids, lengths, max_frames=max_frames,
            noise_scale=jnp.float32(0.667),
            length_scale=jnp.float32(1.0),
            noise_w=jnp.float32(0.8),
            rng=rng,
        )
        return audio, y_lengths

    ids = jnp.asarray(
        np.random.default_rng(0).integers(4, 160, (1, t_text)), jnp.int32
    )
    lengths = jnp.asarray([t_text], jnp.int32)

    rtt = _measure_rtt()

    # Matmul-calibrated chip peak (the practically achievable ceiling on
    # this chip/stack; ~225 f32 TFLOP/s on v5e) for the MFU extras.
    n_cal = 4096
    a_cal = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_cal, n_cal)),
        jnp.float32)

    @jax.jit
    def cal_chain(a):
        def body(i, acc):
            m = acc @ a
            return m / (jnp.abs(m).max() + 1.0)

        return jax.lax.fori_loop(0, 8, body, a)[0, 0]

    _fetch(cal_chain(a_cal))
    cal_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch(cal_chain(a_cal))
        cal_best = min(cal_best, time.perf_counter() - t0)
    peak_flops = 8 * 2 * n_cal ** 3 / max(cal_best - rtt, 1e-9)

    def graph_flops(chain_fn, *inputs) -> float:
        """XLA's own FLOP estimate for one chained step."""
        try:
            cost = chain_fn.lower(*inputs).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0] if cost else {}
            return float((cost or {}).get("flops", 0.0)) / N_CHAIN
        except Exception:
            return 0.0

    def chained_seconds(run_params, ids_c, lengths_c,
                        want_flops: bool = False):
        """Best-of-3 device seconds per synthesis step (RTT-corrected)."""

        @jax.jit
        def chain(params, ids, lengths, base_rng):
            def body(i, acc):
                rng = jax.random.fold_in(base_rng, i)
                audio, _ = forward(params, ids, lengths, rng)
                # checksum threads the dependency so no step can be
                # elided or overlapped out of the measurement
                return acc + audio[:, :: 1997].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

        flops = graph_flops(chain, run_params, ids_c, lengths_c,
                            jax.random.PRNGKey(0)) if want_flops else 0.0
        _fetch(chain(run_params, ids_c, lengths_c, jax.random.PRNGKey(0)))
        best = float("inf")
        # best-of-3: the bench chip is shared; transient contention
        # otherwise dominates (observed 3x run-to-run swings)
        for rep in range(3):
            t0 = time.perf_counter()
            _fetch(chain(run_params, ids_c, lengths_c,
                         jax.random.PRNGKey(rep + 1)))
            best = min(best, time.perf_counter() - t0)
        per_step = max(best - rtt, 1e-9) / N_CHAIN
        return (per_step, flops) if want_flops else per_step

    # Headline: single-utterance fp32 RTF (device compute per audio second)
    step_s, step_flops = chained_seconds(packed, ids, lengths,
                                         want_flops=True)
    rtf = step_s / audio_seconds
    # MFU: the graph's XLA-estimated FLOPs over the measured step time,
    # against the matmul-calibrated peak. Single-stream synthesis is
    # latency- and bandwidth-bound (tiny tensors), so this is honest
    # context for the RTF number, not a target to maximize.
    mfu_single = step_flops / step_s / peak_flops if step_flops else None

    # Secondary: batched serving throughput (fp32 and bf16)
    def throughput(batch: int, dtype):
        run_params = packed
        if dtype == jnp.bfloat16:
            from phoonnx_tpu.infer.engine import cast_floating

            run_params = vits_model.pack_decoder_params(
                cast_floating(params, jnp.bfloat16), hp, max_frames)
        ids_b = jnp.tile(ids, (batch, 1))
        lengths_b = jnp.full((batch,), t_text, jnp.int32)
        per_step, flops = chained_seconds(run_params, ids_b, lengths_b,
                                          want_flops=True)
        mfu = flops / per_step / peak_flops if flops else None
        return batch * audio_seconds / per_step, mfu

    batch16_fp32, mfu_batch16 = throughput(16, jnp.float32)
    batch16_bf16, _ = throughput(16, jnp.bfloat16)

    # Client-visible single-call latency (dispatch + compute + full audio
    # fetch; on a remote-tunnel TPU the round-trip dominates)
    fn = jax.jit(forward)
    _fetch(fn(packed, ids, lengths, jax.random.PRNGKey(0))[0])
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        _fetch(fn(packed, ids, lengths, jax.random.PRNGKey(100 + i))[0])
        lat.append(time.perf_counter() - t0)
    latency_ms = float(np.median(lat) * 1000)

    # Secondary: the high-quality preset's single-utterance RTF (4x the
    # decoder compute of medium; piper's "high" voices use it)
    hp_high = VitsHParams.preset("high", n_vocab=161)
    params_high = vits_model.pack_decoder_params(
        jax.device_put(vits_model.random_params(jax.random.PRNGKey(0),
                                                hp_high)),
        hp_high, max_frames)

    def forward_high(params, ids, lengths, rng):
        audio, y_lengths, _ = vits_model.infer(
            params, hp_high, ids, lengths, max_frames=max_frames,
            noise_scale=jnp.float32(0.667),
            length_scale=jnp.float32(1.0),
            noise_w=jnp.float32(0.8),
            rng=rng,
        )
        return audio, y_lengths

    @jax.jit
    def chain_high(params, ids, lengths, base_rng):
        def body(i, acc):
            rng = jax.random.fold_in(base_rng, i)
            audio, _ = forward_high(params, ids, lengths, rng)
            return acc + audio[:, ::1997].astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

    flops_high = graph_flops(chain_high, params_high, ids, lengths,
                             jax.random.PRNGKey(0))
    _fetch(chain_high(params_high, ids, lengths, jax.random.PRNGKey(0)))
    best_high = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        _fetch(chain_high(params_high, ids, lengths,
                          jax.random.PRNGKey(rep + 1)))
        best_high = min(best_high, time.perf_counter() - t0)
    step_high = max(best_high - rtt, 1e-9) / N_CHAIN
    rtf_high = step_high / audio_seconds
    mfu_high = flops_high / step_high / peak_flops if flops_high else None

    # Streaming: time-to-first-audio via the chunked vocoder decode
    # (wall clock to the first fetched chunk — already an honest barrier)
    from phoonnx_tpu.infer.engine import VitsEngine

    engine = VitsEngine(params, hp, text_buckets=(128,),
                        frame_buckets=(512,))
    ids_list = [int(x) for x in np.asarray(ids)[0]]
    for _ in range(2):  # compile phase1/latents/chunk programs
        for _chunk in engine.synthesize_ids_streaming(
                ids_list, chunk_frames=128, overlap_frames=32, seed=0):
            break
    ttfa = []
    for i in range(10):
        t0 = time.perf_counter()
        for _chunk in engine.synthesize_ids_streaming(
                ids_list, chunk_frames=128, overlap_frames=32, seed=i):
            ttfa.append(time.perf_counter() - t0)
            break
    ttfa_ms = float(np.median(ttfa) * 1000)

    result = {
        "metric": "rtf_vits_medium_22k05",
        "value": round(rtf, 6),
        "unit": "s_compute_per_s_audio",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
        "extra": {
            "audio_sec_per_sec_per_chip": round(1.0 / rtf, 1),
            "device_ms_per_utterance": round(step_s * 1000, 3),
            "client_latency_ms_incl_fetch": round(latency_ms, 2),
            "rtt_ms": round(rtt * 1000, 2),
            "batch16_fp32_audio_sec_per_sec": round(batch16_fp32, 1),
            "batch16_bf16_audio_sec_per_sec": round(batch16_bf16, 1),
            "rtf_high_preset_fp32": round(rtf_high, 6),
            "calibrated_peak_tflops": round(peak_flops / 1e12, 1),
            "model_gflop_per_utterance": round(step_flops / 1e9, 3),
            "mfu": (round(mfu_single, 4)
                    if mfu_single is not None else None),
            "mfu_batch16_fp32": (round(mfu_batch16, 4)
                                 if mfu_batch16 is not None else None),
            "mfu_high_preset": (round(mfu_high, 4)
                                if mfu_high is not None else None),
            "streaming_ttfa_ms": round(ttfa_ms, 2),
            "frames": max_frames,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
