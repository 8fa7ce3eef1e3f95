"""Monotonic-alignment-search sweep: pallas kernel vs lax.scan DP.

Settles whether the Pallas MAS kernel pays for its ~400 lines
(VERDICT r2 #8): sweeps (batch, T_text, T_spec) standalone with the
chained-timing methodology (see bench.py — plain dispatch loops are
meaningless on the relay tunnel), and optionally times the FULL fused
train step under both impls at one shape (--train-step). The results
table lives in TRAINING.md; ``train.step.TrainConfig.mas_impl``'s
default must reflect it.

Usage: python tools/bench_mas.py [--train-step] [--reps 3]
Prints one JSON line per configuration.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = (
    (8, 96, 384),     # medium corpus utterances (~4.5 s)
    (8, 192, 768),    # long utterances (~9 s)
    (32, 96, 384),    # large-batch training
    (8, 384, 1536),   # very long (~18 s, near bucket ceiling)
)
N_CHAIN = 10


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


def bench_standalone(impl, b, tx, ty, rtt, reps):
    import jax
    import jax.numpy as jnp

    from phoonnx_tpu.ops import mas

    rng = np.random.default_rng(0)
    neg = jnp.asarray(rng.standard_normal((b, ty, tx)), jnp.float32)
    mask = jnp.ones((b, ty, tx), jnp.float32)

    @jax.jit
    def chain(neg, mask, salt):
        def body(i, acc):
            n = neg + (salt + i).astype(jnp.float32) * 1e-6
            path = mas.maximum_path(n, mask, impl=impl)
            return acc + path[:, ::7, ::3].sum()

        return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

    np.asarray(chain(neg, mask, jnp.int32(0)))
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(neg, mask, jnp.int32(rep + 1)))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / N_CHAIN * 1000


def bench_train_step(impl, b, tx, ty, rtt, reps):
    """Full fused G+D train step (medium preset) with this MAS impl."""
    import jax
    import jax.numpy as jnp

    from phoonnx_tpu.models.vits.model import VitsHParams
    from phoonnx_tpu.train.step import (TrainConfig, init_train_state,
                                        train_step)

    hp = VitsHParams.preset("medium", n_vocab=161)
    cfg = TrainConfig(mas_impl=impl)
    state = init_train_state(jax.random.PRNGKey(0), hp, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "phoneme_ids": jnp.asarray(
            rng.integers(1, 161, (b, tx)), jnp.int32),
        "phoneme_lengths": jnp.full((b,), tx, jnp.int32),
        "spec": jnp.asarray(rng.standard_normal(
            (b, ty, hp.spec_channels)).astype(np.float32) ** 2),
        "spec_lengths": jnp.full((b,), ty, jnp.int32),
        "audio": jnp.asarray((rng.standard_normal(
            (b, ty * hp.hop_length)) * 0.1).astype(np.float32)),
    }
    from functools import partial

    step = jax.jit(partial(train_step, hp=hp, cfg=cfg), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(metrics["loss_gen_all"])
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        for _ in range(3):
            state, metrics = step(state, batch,
                                  jax.random.PRNGKey(rep * 3 + 2))
        np.asarray(metrics["loss_gen_all"])
        best = min(best, (time.perf_counter() - t0 - rtt) / 3)
    return best * 1000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--train-step", action="store_true")
    ap.add_argument("--train-shape", default="8,96,384")
    args = ap.parse_args()

    import jax

    rtt = _rtt()
    print(json.dumps({"rtt_ms": round(rtt * 1000, 2),
                      "device": str(jax.devices()[0])}), flush=True)
    for b, tx, ty in SHAPES:
        row = {"shape": f"b{b} tx{tx} ty{ty}"}
        for impl in ("scan", "pallas"):
            try:
                row[impl + "_ms"] = round(
                    bench_standalone(impl, b, tx, ty, rtt, args.reps), 3)
            except Exception as exc:
                row[impl + "_ms"] = f"error: {exc}"
        if isinstance(row.get("scan_ms"), float) and isinstance(
                row.get("pallas_ms"), float):
            row["pallas_speedup"] = round(
                row["scan_ms"] / row["pallas_ms"], 2)
        print(json.dumps(row), flush=True)

    if args.train_step:
        b, tx, ty = (int(x) for x in args.train_shape.split(","))
        row = {"train_step_shape": f"b{b} tx{tx} ty{ty}"}
        for impl in ("scan", "pallas"):
            row[impl + "_step_ms"] = round(
                bench_train_step(impl, b, tx, ty, rtt, args.reps), 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
