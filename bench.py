"""Benchmark: VITS synthesis RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full bucketed synthesis path (text encoder + SDP + alignment +
inverse flow + HiFi-GAN) on the "medium" voice preset at a realistic
workload: one ~6s utterance per call (frame bucket 512 @ 86.1 fps,
22.05 kHz). RTF = device_time / audio_seconds_decoded. The reference
publishes no numbers (BASELINE.md); vs_baseline compares against the
north-star target RTF 0.02 (>1.0 means better than target).
"""

import json
import sys
import time

TARGET_RTF = 0.02


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

    fn = jax.jit(forward, donate_argnums=())
    ids = jnp.asarray(
        np.random.default_rng(0).integers(4, 160, (1, t_text)), jnp.int32
    )
    lengths = jnp.asarray([t_text], jnp.int32)

    # compile + warmup
    audio, _ = fn(params, ids, lengths, jax.random.PRNGKey(0))
    audio.block_until_ready()
    for i in range(3):
        audio, _ = fn(params, ids, lengths, jax.random.PRNGKey(i))
        audio.block_until_ready()

    # best-of-3 timed blocks: the bench chip is shared, and transient
    # contention otherwise dominates the recorded number (observed 3x
    # run-to-run swings); the minimum is the honest device capability
    iters = 20
    elapsed = float("inf")
    for _rep in range(3):
        start = time.perf_counter()
        for i in range(iters):
            audio, _ = fn(params, ids, lengths, jax.random.PRNGKey(100 + i))
        audio.block_until_ready()
        elapsed = min(elapsed, (time.perf_counter() - start) / iters)
    rtf = elapsed / audio_seconds

    # Secondary configs: batched serving throughput (fp32 and bf16)
    def throughput(batch: int, dtype) -> float:
        run_params = params
        if dtype == jnp.bfloat16:
            from phoonnx_tpu.infer.engine import cast_floating

            run_params = cast_floating(params, jnp.bfloat16)
        fn_b = jax.jit(forward)
        ids_b = jnp.tile(ids, (batch, 1))
        lengths_b = jnp.full((batch,), t_text, jnp.int32)
        out, _ = fn_b(run_params, ids_b, lengths_b, jax.random.PRNGKey(0))
        out.block_until_ready()
        dt = float("inf")
        for _rep in range(3):
            start = time.perf_counter()
            for i in range(10):
                out, _ = fn_b(run_params, ids_b, lengths_b,
                              jax.random.PRNGKey(i))
            out.block_until_ready()
            dt = min(dt, (time.perf_counter() - start) / 10)
        return batch * audio_seconds / dt

    batch16_fp32 = throughput(16, jnp.float32)
    batch16_bf16 = throughput(16, jnp.bfloat16)

    # Streaming: time-to-first-audio via the chunked vocoder decode
    # (includes host round-trips; on a remote-tunnel TPU those dominate)
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
            "latency_ms_best_mean": round(elapsed * 1000, 2),
            "batch16_fp32_audio_sec_per_sec": round(batch16_fp32, 1),
            "batch16_bf16_audio_sec_per_sec": round(batch16_bf16, 1),
            "streaming_ttfa_ms": round(ttfa_ms, 2),
            "frames": max_frames,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
