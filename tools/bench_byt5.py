"""ByT5/Charsiu G2P decode throughput on the TPU chip.

BASELINE config 4: the reference's ByT5 phonemizer re-runs the FULL
decoder for every generated token through onnxruntime, one session.run
per step, word by word (reference mul.py:201-233, 286-288) — ≤512 host
round-trips per word. This engine runs one jitted KV-cached while_loop
per word-batch (models/byt5.py), so a whole batch decodes in a single
device program.

Weights are random at byt5-small geometry (the real checkpoint is a
download; speed is weight-independent). Random logits never emit EOS, so
every decode runs to max_length — the numbers below are worst-case.

Timing: each rep uses DIFFERENT input bytes (the relay caches
same-executable/same-value dispatches) and the device executes programs
in dispatch order, so fetching the final rep's bytes is a barrier for
the whole sequence; the trivial-program RTT is subtracted once.

Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="words decoded per program (Charsiu style)")
    ap.add_argument("--word-bytes", type=int, default=12)
    ap.add_argument("--max-length", type=int, default=32,
                    help="decode steps (IPA outputs are short)")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 halves the weight/KV HBM traffic the "
                         "autoregressive decode is bound by")
    args = ap.parse_args()

    import numpy as np
    import torch
    import transformers

    import jax
    import jax.numpy as jnp

    from phoonnx_tpu.models import byt5

    # byt5-small geometry (google/byt5-small config.json)
    config = transformers.T5Config(
        vocab_size=384, d_model=1472, d_kv=64, d_ff=3584,
        num_layers=12, num_decoder_layers=4, num_heads=6,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.T5ForConditionalGeneration(config).eval()
    named = {k: v.detach().numpy() for k, v in model.state_dict().items()
             if not k.startswith(("encoder.embed_tokens",
                                  "decoder.embed_tokens"))}
    del model
    bucket = 8 * ((args.word_bytes + 8) // 8 + 1)
    engine = byt5.ByT5Engine.from_flat(
        named, max_length=args.max_length, input_buckets=(bucket,),
        dtype=args.dtype)

    rng = np.random.default_rng(0)

    def word_batch(rep: int):
        # byte-level ids like the phonemizer: printable bytes + 3, eos 1
        return [
            list(rng.integers(35, 125, args.word_bytes) + 3) + [1]
            for _ in range(args.batch)
        ]

    def fetch_rtt() -> float:
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

    t0 = time.perf_counter()
    engine.greedy_decode_batch(word_batch(-1))  # compile
    compile_s = time.perf_counter() - t0
    rtt = fetch_rtt()

    t0 = time.perf_counter()
    for rep in range(args.reps):
        out = engine.greedy_decode_batch(word_batch(rep))
    assert len(out) == args.batch  # host-materialized = all reps executed
    wall = time.perf_counter() - t0 - rtt

    per_batch = wall / args.reps
    words_per_sec = args.batch / per_batch
    tokens = args.batch * args.max_length
    print(json.dumps({
        "config": (f"byt5-small b{args.batch} in{args.word_bytes}B "
                   f"gen{args.max_length} {args.dtype}"),
        "batch_decode_ms": round(per_batch * 1000, 2),
        "words_per_sec": round(words_per_sec, 1),
        "decode_tokens_per_sec": round(tokens / per_batch, 1),
        "compile_s": round(compile_s, 1),
        "rtt_ms": round(rtt * 1000, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
