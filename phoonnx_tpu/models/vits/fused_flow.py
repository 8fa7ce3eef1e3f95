"""Fused inverse coupling-flow stack as a Pallas TPU kernel.

The synthesis-time flow reversal (reference: phoonnx_train/vits/
models.py:247-254 — 4x channel-flip + mean-only affine coupling, each
with a 4-layer gated WaveNet inner net) lowers on the XLA path to ~26
small convs over [1, T, 192] tensors. Like the text encoder before it
(see fused_encoder.py), its FLOPs are trivial (~7 GFLOP at T=512, a
~30 us MXU floor) but the stage profiled at ~0.13 ms single-stream on
v5e: per-HLO fixed overhead + an HBM round-trip per conv.

This kernel runs the ENTIRE reverse flow in one ``pallas_call``:

* grid = (batch, n_flows); the activation halves live in VMEM scratch
  that persists across coupling steps (TPU grids are sequential), so
  HBM sees one read of z_p and one write of z;
* per-coupling weights are stacked [F, ...] host-side (``build_spec``,
  attached by ``vits_model.pack_decoder_params``) and streamed per grid
  step by the Pallas pipeline;
* the channel ``flip`` that precedes every coupling is never
  materialised: flips compose to an alternating half-swap, so the spec
  folds them into the weights — even processing steps reverse the
  ``pre`` conv's input axis and the ``post`` conv's output axis
  (+ bias), and the kernel just swaps which half it reads/updates.
  With an even n_flows the final layout is the identity, so the
  physical buffer IS the output;
* the k-size-5 WN convs are tap form: sum over static row offsets of
  ``shift(h) @ W_tap`` (one MXU matmul per tap), exactly like the
  fused encoder's FFN.

Inference-only by construction (the XLA path keeps autodiff for
training). Masking parity with modules.wn / residual_coupling_layer:
the pre projection, each residual update, the skip accumulator, and
the coupled half's update are zeroed on padded rows; the pass-through
half is left untouched (the XLA path never masks it either).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phoonnx_tpu.models.vits import nn
from phoonnx_tpu.models.vits.statics import StaticInt

Array = jax.Array

# Same stance as fused_encoder: the estimator over-counts (Mosaic reuses
# temporaries); the gate refuses pathological shapes, it does not track
# real VMEM. Medium preset at T=512 estimates ~19 MB.
_VMEM_BUDGET = 32 * 1024 * 1024

# Test hook (mirrors fused_encoder/fused_stage): interpreter mode off-TPU
# so CPU CI exercises the exact kernel semantics.
FORCE_INTERPRET = False


def enabled() -> bool:
    return jax.default_backend() == "tpu" or FORCE_INTERPRET


def _lanes(n: int) -> int:
    return -(-n // 128) * 128


def _plain_weight(conv):
    """Resolved conv weight as NUMPY (spec build runs at init on
    concrete params; weight-norm folding in numpy avoids eager device
    ops on a remote-compile relay)."""
    if "weight" in conv:
        return np.asarray(conv["weight"])
    # f32 accumulation like XLA's reduce (a bf16-accumulated numpy sum
    # loses ~2% on the folded weights); result cast back to the stored
    # dtype — reassociation-level difference from the jnp path at most
    v = np.asarray(conv["weight_v"])
    g = np.asarray(conv["weight_g"])
    axes = tuple(range(1, v.ndim))
    v32 = v.astype(np.float32)
    norm = np.sqrt(np.sum(np.square(v32), axis=axes, keepdims=True))
    return (g.astype(np.float32) * v32 / norm).astype(v.dtype)


def build_spec(flow_params):
    """Stacked-weight spec for the REVERSE pass of ``coupling_flow``,
    or None when the layout is not the uniform VITS flow stack.

    Weights are stored in processing order (``reversed(flows)``) with
    the inter-coupling channel flips folded in: every even processing
    step's ``pre`` weight has its input-channel axis reversed and its
    ``post`` weight/bias the output axis reversed, so the kernel reads
    x0 from one physical half and subtracts m into the other without
    ever permuting lanes.
    """
    flows = flow_params.get("flows")
    if not flows or len(flows) % 2 != 0:
        return None
    first = flows[0]
    half = int(first["half_channels"])
    enc0 = first["enc"]
    hidden = int(enc0["hidden"])
    k = int(enc0["kernel_size"])
    dil = int(enc0["dilation_rate"])
    n_layers = int(enc0["n_layers"])
    has_cond = "cond_layer" in enc0

    w_pre, b_pre, w_in, b_in, w_rs, b_rs = [], [], [], [], [], []
    w_post, b_post, cond_w, cond_b = [], [], [], []
    for j, flow in enumerate(reversed(flows)):
        enc = flow["enc"]
        post_w = flow["post"]["weight"]
        if (int(flow["half_channels"]) != half
                or int(enc["hidden"]) != hidden
                or int(enc["kernel_size"]) != k
                or int(enc["dilation_rate"]) != dil
                or int(enc["n_layers"]) != n_layers
                or ("cond_layer" in enc) != has_cond
                or post_w.shape[0] != half):  # mean_only coupling
            return None
        fold = (j % 2 == 0)

        wp = np.asarray(flow["pre"]["weight"])[:, :, 0].T  # [half, hidden]
        if fold:
            wp = wp[::-1]
        w_pre.append(wp)
        b_pre.append(np.asarray(flow["pre"]["bias"])[None])

        wi, bi_, wr, br = [], [], [], []
        for i in range(n_layers):
            w = _plain_weight(enc["in_layers"][i])  # [2h, h, k]
            wi.append(np.transpose(w, (2, 1, 0)))  # [k, h, 2h]
            bi_.append(np.asarray(enc["in_layers"][i]["bias"])[None])
            rs = _plain_weight(enc["res_skip_layers"][i])[:, :, 0].T
            rb = np.asarray(enc["res_skip_layers"][i]["bias"])[None]
            if i == n_layers - 1:
                # last layer emits skip only ([h] wide): place it in the
                # skip half so the kernel's res/skip split is uniform
                rs = np.concatenate(
                    [np.zeros((hidden, hidden), rs.dtype), rs], axis=1)
                rb = np.concatenate(
                    [np.zeros((1, hidden), rb.dtype), rb], axis=1)
            wr.append(rs)
            br.append(rb)
        w_in.append(np.stack(wi))
        b_in.append(np.stack(bi_))
        w_rs.append(np.stack(wr))
        b_rs.append(np.stack(br))

        wq = np.asarray(post_w)[:, :, 0].T  # [hidden, half]
        bq = np.asarray(flow["post"]["bias"])
        if fold:
            wq = wq[:, ::-1]
            bq = bq[::-1]
        w_post.append(wq)
        b_post.append(bq[None])

        if has_cond:
            cw = _plain_weight(enc["cond_layer"])[:, :, 0]  # [L*2h, gin]
            cond_w.append(cw.T)  # [gin, L*2h]
            bias = enc["cond_layer"].get("bias")
            cond_b.append(np.zeros((cw.shape[0],), cw.dtype)
                          if bias is None else np.asarray(bias))

    spec = {
        "n_flows": StaticInt(len(flows)),
        "n_layers": StaticInt(n_layers),
        "half": StaticInt(half),
        "hidden": StaticInt(hidden),
        "kernel_size": StaticInt(k),
        "dilation_rate": StaticInt(dil),
        "w_pre": jnp.asarray(np.stack(w_pre)),
        "b_pre": jnp.asarray(np.stack(b_pre)),
        "w_in": jnp.asarray(np.stack(w_in)),
        "b_in": jnp.asarray(np.stack(b_in)),
        "w_rs": jnp.asarray(np.stack(w_rs)),
        "b_rs": jnp.asarray(np.stack(b_rs)),
        "w_post": jnp.asarray(np.stack(w_post)),
        "b_post": jnp.asarray(np.stack(b_post)),
    }
    if has_cond:
        spec["cond_w"] = jnp.asarray(np.stack(cond_w))
        spec["cond_b"] = jnp.asarray(np.stack(cond_b))
    return spec


def _vmem_estimate(spec, t: int) -> int:
    h = int(spec["hidden"])
    half = int(spec["half"])
    k = int(spec["kernel_size"])
    n_layers = int(spec["n_layers"])
    ib = jnp.dtype(spec["w_in"].dtype).itemsize
    weights = (n_layers * (k + 1) * h * _lanes(2 * h)
               + half * _lanes(h) + h * _lanes(half)
               + n_layers * _lanes(2 * h)) * ib
    # x in/out blocks + scratch halves (f32) + peak temporaries
    # (x_in f32 + shifted copy, h/skip/acts f32, m f32)
    acts = (2 * t * _lanes(2 * half) * ib
            + 2 * t * _lanes(half) * 4
            + 2 * t * _lanes(2 * h) * 4
            + 3 * t * _lanes(h) * 4)
    return 2 * weights + acts  # weight blocks are double-buffered


def usable(spec, x: Array) -> bool:
    """Gate mirrors fused_encoder.usable: the kernel wins by removing
    per-HLO overhead at small batch; the XLA path amortizes it across
    batch lanes while the grid serializes batch elements."""
    if spec is None or not enabled():
        return False
    b, t, c = x.shape
    if b > 8 or c != 2 * int(spec["half"]):
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _vmem_estimate(spec, t) <= _VMEM_BUDGET


def _kernel(len_ref, x_ref, g_ref, wpre_ref, bpre_ref, win_ref, bin_ref,
            wrs_ref, brs_ref, wpost_ref, bpost_ref, out_ref,
            lo_buf, hi_buf, *, half, hidden, k, dilation_rate, n_layers,
            precision=None):
    from jax.experimental import pallas as pl

    fi = pl.program_id(1)
    t = x_ref.shape[1]
    length = len_ref[pl.program_id(0)]
    out_dtype = out_ref.dtype

    @pl.when(fi == 0)
    def _():
        x0 = x_ref[0].astype(jnp.float32)
        lo_buf[:] = x0[:, :half]
        hi_buf[:] = x0[:, half:]

    row1 = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    row_mask = row1 < length
    even = (fi % 2) == 0

    def dot(a, b_mat):
        return jax.lax.dot_general(
            a, b_mat, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

    def shift_rows(v, off):
        if off == 0:
            return v
        zeros = jnp.zeros((abs(off), v.shape[1]), v.dtype)
        if off > 0:
            return jnp.concatenate([v[off:], zeros], axis=0)
        return jnp.concatenate([zeros, v[:off]], axis=0)

    x_lo = lo_buf[:]
    x_hi = hi_buf[:]
    # flips fold to an alternating half-swap (module docstring): even
    # steps read x0 from the high half and couple into the low half
    x0 = jnp.where(even, x_hi, x_lo)

    h = dot(x0, wpre_ref[0]) + bpre_ref[0].astype(jnp.float32)
    h = jnp.where(row_mask, h, 0.0)  # pre(x0) * mask

    skip_acc = jnp.zeros((t, hidden), jnp.float32)
    for i in range(n_layers):
        d = dilation_rate ** i
        pad = (k * d - d) // 2
        x_in = bin_ref[0, i].astype(jnp.float32)
        for j in range(k):
            x_in = x_in + dot(shift_rows(h, j * d - pad), win_ref[0, i, j])
        x_in = x_in + g_ref[0, 0, i].astype(jnp.float32)[None, :]
        acts = (jnp.tanh(x_in[:, :hidden])
                * jax.nn.sigmoid(x_in[:, hidden:]))
        rs = dot(acts, wrs_ref[0, i]) + brs_ref[0, i].astype(jnp.float32)
        h = jnp.where(row_mask, h + rs[:, :hidden], 0.0)
        skip_acc = skip_acc + rs[:, hidden:]
    skip_acc = jnp.where(row_mask, skip_acc, 0.0)  # wn output * mask

    m = dot(skip_acc, wpost_ref[0]) + bpost_ref[0].astype(jnp.float32)
    m = jnp.where(row_mask, m, 0.0)

    # x1 = (x1 - m) * mask on the coupled half; pass-through half untouched
    new_lo = jnp.where(even, jnp.where(row_mask, x_lo - m, 0.0), x_lo)
    new_hi = jnp.where(even, x_hi, jnp.where(row_mask, x_hi - m, 0.0))
    lo_buf[:] = new_lo
    hi_buf[:] = new_hi
    out_ref[0] = jnp.concatenate([new_lo, new_hi],
                                 axis=1).astype(out_dtype)


def apply(spec, x: Array, x_mask: Array, g=None, precision=None) -> Array:
    """Reverse the full coupling stack. x [B, T, C] (z_p), x_mask
    [B, T, 1] -> z [B, T, C] (coupling_flow(..., reverse=True) contract).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from phoonnx_tpu.models.vits.fused_encoder import resolve_precision

    b, t, c = x.shape
    n_flows = int(spec["n_flows"])
    n_layers = int(spec["n_layers"])
    hidden = int(spec["hidden"])
    lengths = jnp.sum(x_mask[:, :, 0].astype(jnp.int32), axis=1)  # [B]

    if "cond_w" in spec:
        if g is None:
            # mirror modules.wn: dropping g would synthesize
            # speaker-unconditioned audio on an hparams mismatch
            raise ValueError(
                "fused flow has speaker conditioning but no g was passed")
        g_all = (jnp.einsum("bg,fgh->bfh", g[:, 0, :].astype(jnp.float32),
                            spec["cond_w"].astype(jnp.float32))
                 + spec["cond_b"].astype(jnp.float32))
        g_all = g_all.reshape(b, n_flows, n_layers, 2 * hidden)
    else:
        if g is not None:
            raise ValueError(
                "fused flow received speaker conditioning but was built "
                "without gin_channels (hparams/checkpoint mismatch)")
        g_all = jnp.zeros((b, n_flows, n_layers, 2 * hidden), jnp.float32)

    def flow_block(arr):
        return pl.BlockSpec((1,) + arr.shape[1:],
                            lambda bi, fi, *_: (fi,) + (0,) * (arr.ndim - 1),
                            memory_space=pltpu.VMEM)

    weight_names = ("w_pre", "b_pre", "w_in", "b_in", "w_rs", "b_rs",
                    "w_post", "b_post")
    weights = [spec[name] for name in weight_names]

    kernel = functools.partial(
        _kernel,
        half=int(spec["half"]), hidden=hidden,
        k=int(spec["kernel_size"]),
        dilation_rate=int(spec["dilation_rate"]), n_layers=n_layers,
        precision=resolve_precision(precision),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lengths [B] lands whole in SMEM
        grid=(b, n_flows),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda bi, fi, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_layers, 2 * hidden),
                         lambda bi, fi, *_: (bi, fi, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [flow_block(w) for w in weights],
        out_specs=pl.BlockSpec((1, t, c), lambda bi, fi, *_: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, c // 2), jnp.float32),
                        pltpu.VMEM((t, c // 2), jnp.float32)],
    )
    # Mosaic's default scoped-VMEM limit is 16 MB; the per-flow streamed
    # weight stack alone (w_in [n_layers, k, h, 2h], double-buffered) is
    # ~12 MB at hidden 192, so a T=512 block trips the default (observed
    # on v5e: "18.10M and limit 16.00M"). v5e has 128 MB of VMEM — raise
    # the scoped limit to the gate's budget with headroom.
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _VMEM_BUDGET),
        interpret=FORCE_INTERPRET and jax.default_backend() != "tpu",
    )(lengths, x, g_all, *weights)
    return out
