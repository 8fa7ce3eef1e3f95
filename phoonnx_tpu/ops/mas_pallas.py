"""Monotonic Alignment Search as a Pallas TPU kernel.

One grid step per batch element; the [T_spec, T_text] score table lives in
VMEM for the whole forward DP + backtrack, so the sequential recurrence
runs at VPU latency instead of per-step XLA dispatches (the lax.scan
version in ops/mas.py round-trips the carry through HBM ~2*T_spec times).

Semantics are identical to the reference Cython kernel
(phoonnx_train/vits/monotonic_align/core.pyx) and to ops/mas.maximum_path:
stay/advance recurrence with a forced advance on the x==y edge, stay-on-tie
backtracking, per-batch true lengths from the mask.

The public entry point is wrapped in ``custom_partitioning`` so the kernel
composes with GSPMD/Shardy sharded programs: the DP is independent per
batch element, so under a batch-sharded mesh each device runs the kernel
on its local shard (no collectives); the time/text dims are declared
replicated. This is what lets the fused SPMD train step keep the VMEM
kernel instead of falling back to the lax.scan DP when the data axis is
sharded.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

Array = jax.Array

_NEG_INF = -1e9


def _mas_kernel(value_ref, y_len_ref, x_len_ref, path_ref, q_scratch):
    """One batch element: value [T_y, T_x] -> 0/1 path [T_y, T_x]."""
    t_y, t_x = value_ref.shape
    i = pl.program_id(0)
    y_len = y_len_ref[i]
    x_len = x_len_ref[i]

    x_idx = jax.lax.broadcasted_iota(jnp.int32, (1, t_x), 1)

    # --- forward DP over spec frames ---
    def forward(y, q_prev):
        # q_prev: [1, T_x] scores at frame y-1
        stay = jnp.where(x_idx == y, _NEG_INF, q_prev)
        advance = pltpu.roll(q_prev, 1, 1)
        advance = jnp.where(x_idx == 0,
                            jnp.where(y == 0, 0.0, _NEG_INF), advance)
        q = value_ref[y, :][None, :] + jnp.maximum(stay, advance)
        q_scratch[y, :] = q[0]
        return q

    jax.lax.fori_loop(
        0, t_y, forward, jnp.full((1, t_x), _NEG_INF, jnp.float32)
    )

    # --- backtrack ---
    path_ref[...] = jnp.zeros((t_y, t_x), jnp.float32)

    def backward(i, x_cur):
        y = t_y - 1 - i
        inside = y < y_len
        onehot = ((x_idx[0] == x_cur) & inside).astype(jnp.float32)
        path_ref[y, :] = path_ref[y, :] + onehot

        q_prev_row = q_scratch[jnp.maximum(y - 1, 0), :]
        q_stay = jnp.sum(
            jnp.where(x_idx[0] == x_cur, q_prev_row, 0.0)
        )
        q_diag = jnp.sum(
            jnp.where(x_idx[0] == jnp.maximum(x_cur - 1, 0), q_prev_row, 0.0)
        )
        do_advance = (x_cur != 0) & ((x_cur == y) | (q_stay < q_diag))
        return jnp.where(inside & (y > 0) & do_advance, x_cur - 1, x_cur)

    jax.lax.fori_loop(0, t_y, backward, x_len - 1)


def _maximum_path_pallas_local(neg_cent: Array, attn_mask: Array,
                               interpret: bool) -> Array:
    """Single-device Pallas MAS; neg_cent/attn_mask [B, T_spec, T_text]."""
    b, t_y, t_x = neg_cent.shape
    # int32 sums: a bf16 mask quantizes counts above 256 (see ops/mas.py)
    y_lens = jnp.maximum(
        jnp.sum(attn_mask[:, :, 0].astype(jnp.int32), axis=1), 1
    )
    x_lens = jnp.maximum(
        jnp.sum(attn_mask[:, 0, :].astype(jnp.int32), axis=1), 1
    )
    value = jnp.where(attn_mask > 0, neg_cent, 0.0).astype(jnp.float32)

    path = pl.pallas_call(
        _mas_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t_y, t_x), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, t_y, t_x), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_y, t_x), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t_y, t_x), jnp.float32)],
        interpret=interpret,
    )(value, y_lens, x_lens)
    return path.astype(neg_cent.dtype) * attn_mask


def _common_batch_axes(arg_shapes):
    """The ONE batch-dim sharding every operand and the result will use.

    The per-shard DP needs full [T_y, T_x] planes and matching local
    batch slices on BOTH operands, so a single spec is chosen (the first
    operand with a sharded batch dim) and returned for everything — the
    partitioner inserts the reshards. Projecting each operand's own
    sharding independently would hand lower_fn differently-sized local
    shards (e.g. a sharded neg_cent with a replicated mask) and fail
    compilation.
    """
    for s in arg_shapes:
        spec = getattr(s.sharding, "spec", None)
        if spec is not None and len(spec) > 0 and spec[0] is not None:
            return spec[0]
    return None


def _batch_sharding(mesh, batch_axes, ndim: int):
    return NamedSharding(
        mesh, PartitionSpec(batch_axes, *([None] * (ndim - 1)))
    )


def _mas_partition(interpret, mesh, arg_shapes, result_shape):
    batch_axes = _common_batch_axes(arg_shapes)
    arg_shardings = tuple(
        _batch_sharding(mesh, batch_axes, len(s.shape)) for s in arg_shapes
    )
    result_sharding = _batch_sharding(
        mesh, batch_axes, len(result_shape.shape)
    )

    def lower_fn(neg_cent, attn_mask):
        return _maximum_path_pallas_local(neg_cent, attn_mask, interpret)

    return mesh, lower_fn, result_sharding, arg_shardings


def _mas_infer_sharding(interpret, mesh, arg_shapes, result_shape):
    return _batch_sharding(
        mesh, _common_batch_axes(arg_shapes), len(result_shape.shape)
    )


@functools.partial(custom_partitioning, static_argnums=(2,))
def _maximum_path_pallas_cp(neg_cent, attn_mask, interpret):
    return _maximum_path_pallas_local(neg_cent, attn_mask, interpret)


# Shardy rule: batch is a free (shardable) factor; the DP recurrence
# couples every position within a [T_y, T_x] plane, so those factors
# must stay replicated on device.
_maximum_path_pallas_cp.def_partition(
    partition=_mas_partition,
    infer_sharding_from_operands=_mas_infer_sharding,
    sharding_rule="b ty tx, b ty tx -> b ty tx",
    need_replication_factors=("ty", "tx"),
)


def maximum_path_pallas(neg_cent: Array, attn_mask: Array,
                        interpret: bool = False) -> Array:
    """Pallas MAS; neg_cent/attn_mask [B, T_spec, T_text].

    Safe inside sharded (pjit/GSPMD) programs: partitions over the batch
    dim, each device running the VMEM kernel on its local shard.
    """
    return _maximum_path_pallas_cp(neg_cent, attn_mask, interpret)


# Measured on TPU v5e at the training shape [8, 512, 128]: bit-identical
# to the scan implementation, 2.1 ms vs 4.4 ms per call, <1 s Mosaic
# compile. Selected automatically on TPU via maximum_path(impl="auto");
# under a sharded data mesh the custom_partitioning wrapper keeps the
# kernel local to each device's batch shard.
