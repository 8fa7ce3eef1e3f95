"""Monotonic Alignment Search (MAS) — the VITS training alignment DP.

The reference implements this as its only hand-written native kernel
(Cython + OpenMP prange, phoonnx_train/vits/monotonic_align/core.pyx:1-43)
and round-trips tensors through numpy/CPU every training step. Here it runs
*inside* the jitted training step as a vectorized dynamic program:

* forward: ``lax.scan`` over spec frames; each step is a fused [B, T_text]
  VPU update (max(stay, advance) + emission). Batch and text dims are fully
  vectorized; only the frame recurrence is sequential.
* backtracking: reverse ``lax.scan`` carrying the current text index,
  reproducing the reference's exact tie-breaking (advance only when the
  diagonal predecessor is strictly better, forced advance on the x==y edge).

Conventions follow the reference call site (models.py:628-650):
``neg_cent`` and ``mask`` are [B, T_spec, T_text]; the returned path is 0/1
with exactly one text position per valid spec frame.

:func:`maximum_path_numpy` is the host-side oracle with identical loop
semantics, used for testing and as a CPU fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_NEG_INF = -1e9

# "auto" crossover: the Pallas kernel's grid serializes over batch while
# the scan DP vectorizes across it (v5e sweep, tools/bench_mas.py:
# pallas 2.28x at b8, 1.01x at b16, 0.51x at b32, 0.27x at b64).
_PALLAS_MAX_BATCH = 16


def maximum_path(neg_cent: Array, attn_mask: Array,
                 impl: str = "scan") -> Array:
    """Best monotonic path; neg_cent/attn_mask [B, T_spec, T_text].

    impl:
      * ``"scan"`` — lax.scan DP (default; partitions under GSPMD, runs
        on any backend);
      * ``"pallas"`` — VMEM kernel (ops/mas_pallas.py), bit-identical;
        2.1-3.2x faster standalone on v5e at per-device batch <= 8 and
        -9% on the full fused train step (b8: 36.8 vs 40.6 ms/step),
        but its grid serializes over batch while the scan DP vectorizes
        across it, so scan wins past b~16 (b64 tx96: 2.6 vs 9.6 ms) —
        the measured sweep lives in TRAINING.md / tools/bench_mas.py.
        Sharding-aware: wrapped in custom_partitioning so a
        batch-sharded mesh runs the kernel on each device's local shard
        (what matters is the per-device batch). On non-TPU backends it
        runs in interpret mode (slow — for tests).
      * ``"auto"`` — pallas on a TPU backend at batch <= 16, scan
        otherwise (the measured crossover). The heuristic reads the
        logical (global) batch — under a DP-sharded mesh where the
        per-device shard is small, pass ``impl="pallas"`` explicitly.
    """
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and neg_cent.shape[0] <= _PALLAS_MAX_BATCH else "scan")
    if impl == "pallas":
        from phoonnx_tpu.ops.mas_pallas import maximum_path_pallas

        return maximum_path_pallas(
            neg_cent, attn_mask,
            interpret=jax.default_backend() != "tpu",
        )
    if impl != "scan":
        raise ValueError(f"unknown MAS impl: {impl!r}")
    b, t_y, t_x = neg_cent.shape
    # exact counting: summing a bf16 mask quantizes above 256 ones
    # (256+1 -> 256), shifting y_lens/x_lens for long utterances
    y_lens = jnp.maximum(
        jnp.sum(attn_mask[:, :, 0].astype(jnp.int32), axis=1), 1)
    x_lens = jnp.maximum(
        jnp.sum(attn_mask[:, 0, :].astype(jnp.int32), axis=1), 1)

    value = jnp.where(attn_mask > 0, neg_cent, 0.0).astype(jnp.float32)
    x_idx = jnp.arange(t_x)[None, :]  # [1, T_x]

    def forward_step(q_prev, y):
        # q_prev: [B, T_x] best score at spec frame y-1
        stay = jnp.where(x_idx == y, _NEG_INF, q_prev)
        advance = jnp.pad(q_prev[:, :-1], [(0, 0), (1, 0)],
                          constant_values=_NEG_INF)
        # x == 0 has no diagonal predecessor; its path starts at y == 0.
        advance = advance.at[:, 0].set(jnp.where(y == 0, 0.0, _NEG_INF))
        q = value[:, y, :] + jnp.maximum(stay, advance)
        return q, q

    init = jnp.full((b, t_x), _NEG_INF, jnp.float32)
    _, q_all = jax.lax.scan(forward_step, init, jnp.arange(t_y))
    # q_all: [T_y, B, T_x]

    def backward_step(x_cur, y):
        inside = y < y_lens  # [B]
        onehot = (x_idx == x_cur[:, None]) & inside[:, None]
        q_prev = q_all[jnp.maximum(y - 1, 0)]  # [B, T_x]
        q_stay = jnp.take_along_axis(q_prev, x_cur[:, None], axis=1)[:, 0]
        q_diag = jnp.take_along_axis(
            q_prev, jnp.maximum(x_cur - 1, 0)[:, None], axis=1
        )[:, 0]
        do_advance = (x_cur != 0) & ((x_cur == y) | (q_stay < q_diag))
        x_next = jnp.where(inside & (y > 0) & do_advance, x_cur - 1, x_cur)
        return x_next, onehot

    _, path_rev = jax.lax.scan(
        backward_step, x_lens - 1, jnp.arange(t_y - 1, -1, -1)
    )
    path = jnp.moveaxis(path_rev[::-1], 0, 1)  # [B, T_y, T_x]
    return path.astype(neg_cent.dtype) * attn_mask


def maximum_path_numpy(neg_cent: np.ndarray, attn_mask: np.ndarray
                       ) -> np.ndarray:
    """Oracle with the reference kernel's exact loops (core.pyx:7-42)."""
    neg_cent = np.asarray(neg_cent, dtype=np.float32).copy()
    attn_mask = np.asarray(attn_mask)
    b = neg_cent.shape[0]
    path = np.zeros_like(neg_cent, dtype=np.float32)
    y_lens = attn_mask[:, :, 0].sum(1).astype(int)
    x_lens = attn_mask[:, 0, :].sum(1).astype(int)

    for i in range(b):
        value = neg_cent[i]
        t_y, t_x = max(y_lens[i], 1), max(x_lens[i], 1)
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = _NEG_INF if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else _NEG_INF
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            path[i, y, index] = 1.0
            if index != 0 and (
                index == y or value[y - 1, index] < value[y - 1, index - 1]
            ):
                index -= 1
    return path
