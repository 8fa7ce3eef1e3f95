"""A/B the batched tail-zeroing strategies + bf16 batched fused stages.

The r3 bleed-window fix (nn.zero_time_tail) unrolls a Python loop of
per-element dynamic-update-slices — O(1) ops at batch 1 but a 2B-long
serialized chain at batch B, suspected cause of per-utterance decode
time RISING with batch (BENCH r3: fp32 b4 6560 -> b64 5833 audio-s/s)
and of bf16 batched (XLA path, masks at every conv) losing to r1.

Variants timed on the full decode_audio at (batch, frames):
  dus     — current unrolled per-element slice/update chain
  vmapdus — one gather + one scatter via vmap'd dynamic slice/update
  mult    — full-tensor mask multiply (the r2 approach)
plus fused-stage enablement for bf16 batched (usable() policy A/B).

Usage: python tools/bench_tail_zero.py [--frames 512] [--reps 3]
Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CHAIN = 8


def _rtt():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def triv(x):
        return x + 1.0

    np.asarray(triv(jnp.float32(0.0)))
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        np.asarray(triv(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_decode(params, hp, batch, frames, dtype_name, rtt, reps):
    import jax
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits import model as vits_model

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(
        (batch, frames, hp.inter_channels)).astype(np.float32) * 0.5)
    if dtype_name == "bfloat16":
        z = z.astype(jnp.bfloat16)
    # valid lengths spread over the bucket like a real bucketed batch
    lengths = jnp.asarray(
        np.linspace(frames // 2, frames, batch).astype(np.int32))

    @jax.jit
    def chain(params, z, lengths, salt):
        def body(i, acc):
            zz = z + (salt + i).astype(z.dtype) * jnp.asarray(1e-6, z.dtype)
            audio = vits_model.decode_audio(params, hp, zz,
                                            frame_lengths=lengths)
            return acc + audio[:, ::1997].astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

    np.asarray(chain(params, z, lengths, jnp.int32(0)))
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(params, z, lengths, jnp.int32(rep + 1)))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / N_CHAIN * 1000  # ms per decode


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batches", default="1,16,64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from phoonnx_tpu.infer.engine import cast_floating
    from phoonnx_tpu.models.vits import fused_stage, nn
    from phoonnx_tpu.models.vits import model as vits_model
    from phoonnx_tpu.models.vits.model import VitsHParams

    hp = VitsHParams.preset("medium", n_vocab=161)
    base = vits_model.random_params(jax.random.PRNGKey(0), hp)
    packed_f32 = vits_model.pack_decoder_params(base, hp, args.frames)
    packed_bf16 = vits_model.pack_decoder_params(
        cast_floating(base, jnp.bfloat16), hp, args.frames)

    rtt = _rtt()
    print(json.dumps({"rtt_ms": round(rtt * 1000, 2),
                      "device": str(jax.devices()[0])}), flush=True)

    batches = [int(b) for b in args.batches.split(",")]
    for dtype_name, packed in (("float32", packed_f32),
                               ("bfloat16", packed_bf16)):
        for batch in batches:
            for variant in ("dus", "vmapdus", "mult"):
                nn.TAIL_ZERO_IMPL = variant
                try:
                    ms = bench_decode(packed, hp, batch, args.frames,
                                      dtype_name, rtt, args.reps)
                    row = {"dtype": dtype_name, "batch": batch,
                           "variant": variant,
                           "decode_ms": round(ms, 3),
                           "ms_per_utt": round(ms / batch, 4)}
                except Exception as exc:  # pragma: no cover
                    row = {"dtype": dtype_name, "batch": batch,
                           "variant": variant, "error": str(exc)[:200]}
                finally:
                    nn.TAIL_ZERO_IMPL = "dus"
                print(json.dumps(row), flush=True)
            if dtype_name == "bfloat16" and batch > 1:
                # A/B: force fused Pallas stages on for bf16 batched
                orig = fused_stage.usable
                fused_stage.usable = lambda spec, r, x, _o=orig: (
                    spec is not None and fused_stage.enabled()
                    and int(spec["r"]) == r
                    and int(spec["L"]) == x.shape[-1])
                try:
                    ms = bench_decode(packed, hp, batch, args.frames,
                                      dtype_name, rtt, args.reps)
                    row = {"dtype": dtype_name, "batch": batch,
                           "variant": "fused_forced",
                           "decode_ms": round(ms, 3),
                           "ms_per_utt": round(ms / batch, 4)}
                except Exception as exc:  # pragma: no cover
                    row = {"dtype": dtype_name, "batch": batch,
                           "variant": "fused_forced",
                           "error": str(exc)[:200]}
                finally:
                    fused_stage.usable = orig
                print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
