"""Fused VITS text-encoder stack as a Pallas TPU kernel.

The text encoder (reference: phoonnx_train/vits/attentions.py:12-74 —
6 layers of windowed relative-position attention + conv FFN) is the
second-largest slice of single-stream synthesis device time after the
vocoder (profiled 0.29 ms of a 0.99 ms graph on v5e), yet its FLOPs
are trivial: the XLA path lowers to ~60 small HLOs over [1, T, 192]
tensors, so the cost is per-op fixed overhead + HBM round-trips, not
compute.

This kernel runs the ENTIRE layer stack in one ``pallas_call``:

* grid = (batch, n_layers); the activation [T, H] lives in a VMEM
  scratch buffer that persists across layer steps (TPU grids are
  sequential), so HBM sees one read of the embedded input and one
  write of the final hidden state;
* per-layer weights are stacked [L, ...] host-side (``build_spec``,
  attached by ``vits_model.pack_decoder_params``) and streamed per
  grid step by the Pallas pipeline (double-buffered);
* the relative-position window-4 attention bias is computed WITHOUT
  the reference's pad/reshape shuffle (attentions.py:269-294): for
  T > window every entry of the padded relative table beyond the
  ±window band is zero, so score/weight contributions reduce to
  2*window+1 banded diagonal adds / reductions — pure VPU selects;
* the k-size-3 FFN convs are tap form: sum over static row offsets of
  ``shift(x) @ W_k`` (one MXU matmul per tap).

Inference-only by construction (dropout off); the XLA path keeps
autodiff for training. Masking parity with attention.encoder: padded
KEY columns are excluded via the -1e4 score fill, FFN inputs are
zeroed beyond the true length before each conv, and the final output
is zeroed on padded rows (the XLA path's trailing ``x * x_mask``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phoonnx_tpu.models.vits.statics import StaticInt

Array = jax.Array

# The estimator below over-counts (Mosaic reuses temporaries and elides
# double-buffering of revisited blocks): medium-preset compiles were
# verified on v5e through T=1024 (est. 30 MB). The gate exists to refuse
# pathological configs (huge filter widths), not to track real VMEM.
_VMEM_BUDGET = 32 * 1024 * 1024

# Test hook (mirrors fused_stage): run in interpreter mode off-TPU so
# CPU CI exercises the exact kernel semantics.
FORCE_INTERPRET = False


def enabled() -> bool:
    return jax.default_backend() == "tpu" or FORCE_INTERPRET


def resolve_precision(explicit):
    """Explicit dot precision, else the ambient default — with ambient
    ``high`` (bf16x3) upgraded to HIGHEST: Mosaic supports only
    DEFAULT/HIGHEST, and raising precision inside the kernel keeps an
    engine-wide ``jax.default_matmul_precision("high")`` working (the
    XLA ops get bf16x3, the kernels get true f32)."""
    if explicit is not None:
        return explicit
    ambient = jax.config.jax_default_matmul_precision
    if ambient is not None and str(ambient).lower() in (
            "high", "float32", "tensorfloat32"):
        return jax.lax.Precision.HIGHEST
    return None


def _lanes(n: int) -> int:
    return -(-n // 128) * 128


def build_spec(enc_params):
    """Stacked-weight spec for ``attention.encoder`` params, or None.

    Supported = every layer has window relative attention with a shared
    (heads_share=True) table and identical shapes — exactly what
    ``encoder.init_text_encoder`` builds for all VITS presets. Returns
    None for anything else (the caller keeps the XLA path).
    """
    layers = enc_params.get("layers")
    if not layers:
        return None
    first = layers[0]["attn"]
    window = first.get("window_size")
    if window is None:
        return None
    n_heads = int(first["n_heads"])
    dk = int(first["k_channels"])
    h = n_heads * dk
    ffn_k = int(layers[0]["ffn"]["kernel_size"])

    # stacking runs in numpy: params are concrete at init, and ~90 eager
    # jnp slice/stack ops would each become a tiny device program on a
    # remote-compile relay
    def A(x):
        return np.asarray(x)

    w_qkv, b_qkv, w_o, b_o, rel_k, rel_v = [], [], [], [], [], []
    ln, w1, b1, w2, b2 = [], [], [], [], []
    for layer in layers:
        attn = layer["attn"]
        if attn.get("window_size") is None \
                or int(attn["window_size"]) != int(window) \
                or int(attn["n_heads"]) != n_heads \
                or int(attn["k_channels"]) != dk \
                or attn["emb_rel_k"].shape[0] != 1 \
                or int(layer["ffn"]["kernel_size"]) != ffn_k \
                or attn["conv_q"]["weight"].shape[:2] != (h, h):
            return None
        wq = A(attn["conv_q"]["weight"])[:, :, 0].T  # [H, H]: y = x @ W.T
        wk = A(attn["conv_k"]["weight"])[:, :, 0].T
        wv = A(attn["conv_v"]["weight"])[:, :, 0].T
        w_qkv.append(np.concatenate([wq, wk, wv], axis=1))
        b_qkv.append(np.concatenate([
            A(attn["conv_q"]["bias"]), A(attn["conv_k"]["bias"]),
            A(attn["conv_v"]["bias"]),
        ])[None])
        w_o.append(A(attn["conv_o"]["weight"])[:, :, 0].T)
        b_o.append(A(attn["conv_o"]["bias"])[None])
        rel_k.append(A(attn["emb_rel_k"])[0])  # [2w+1, dk]
        rel_v.append(A(attn["emb_rel_v"])[0])
        ln.append(np.stack([
            A(layer["norm_1"]["gamma"]), A(layer["norm_1"]["beta"]),
            A(layer["norm_2"]["gamma"]), A(layer["norm_2"]["beta"]),
        ]))
        f1, f2 = layer["ffn"]["conv_1"], layer["ffn"]["conv_2"]
        w1.append(np.transpose(A(f1["weight"]), (2, 1, 0)))  # [K, H, F]
        b1.append(A(f1["bias"])[None])
        w2.append(np.transpose(A(f2["weight"]), (2, 1, 0)))  # [K, F, H]
        b2.append(A(f2["bias"])[None])

    return {
        "n_layers": StaticInt(len(layers)),
        "n_heads": StaticInt(n_heads),
        "dk": StaticInt(dk),
        "window": StaticInt(int(window)),
        "ffn_k": StaticInt(ffn_k),
        "w_qkv": jnp.asarray(np.stack(w_qkv)),
        "b_qkv": jnp.asarray(np.stack(b_qkv)),
        "w_o": jnp.asarray(np.stack(w_o)),
        "b_o": jnp.asarray(np.stack(b_o)),
        "rel_k": jnp.asarray(np.stack(rel_k)),
        "rel_v": jnp.asarray(np.stack(rel_v)),
        "ln": jnp.asarray(np.stack(ln)),
        "w_ffn1": jnp.asarray(np.stack(w1)),
        "b_ffn1": jnp.asarray(np.stack(b1)),
        "w_ffn2": jnp.asarray(np.stack(w2)),
        "b_ffn2": jnp.asarray(np.stack(b2)),
    }


def _vmem_estimate(spec, t: int) -> int:
    h = spec["w_o"].shape[-1]
    f = spec["w_ffn1"].shape[-1]
    k = int(spec["ffn_k"])
    ib = jnp.dtype(spec["w_o"].dtype).itemsize
    weights = (h * _lanes(3 * h) + h * _lanes(h) + 4 * _lanes(h)
               + k * h * _lanes(f) + k * f * _lanes(h)
               + 2 * (2 * int(spec["window"]) + 1) * _lanes(h)) * ib
    # x in/out blocks + persistent x_buf + peak temporaries (qkv, per-head
    # scores/probs in f32, ffn hidden + shifted copy)
    acts = (3 * t * _lanes(h) * ib
            + t * _lanes(3 * h) * ib
            + 2 * t * _lanes(t) * 4
            + 2 * t * _lanes(f) * ib)
    return 2 * weights + acts  # pipeline double-buffers the weight blocks


def usable(spec, x: Array, deterministic: bool = True) -> bool:
    """Measured policy (v5e, chained A/B, medium preset, T=128, f32):
    the kernel wins by removing per-HLO overhead — 0.0098 vs 0.044 ms
    at batch 1 (4.5x), 0.083 vs 0.210 at batch 4 — but the XLA path
    amortizes that overhead across batch lanes while the kernel's grid
    serializes batch elements, so they cross at ~batch 16 (0.447 vs
    0.437): gate to batch <= 8. bf16 measures the same shape (0.016 vs
    0.078 ms at batch 1, wash at batch 8; attention math is f32
    in-kernel either way, like the XLA path's einsums)."""
    if spec is None or not deterministic or not enabled():
        return False
    b, t, h = x.shape
    if b > 8 or h != spec["w_o"].shape[-1] or t <= int(spec["window"]):
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _vmem_estimate(spec, t) <= _VMEM_BUDGET


def _kernel(len_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
            relk_ref, relv_ref, ln_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, x_buf, *, n_heads, dk, window, ffn_k,
            precision=None, eps=1e-5):
    from jax.experimental import pallas as pl

    layer = pl.program_id(1)
    t = x_ref.shape[1]
    h = n_heads * dk
    # lengths is a scalar-prefetch arg: the full [B] vector in SMEM
    length = len_ref[pl.program_id(0)]
    dtype = x_buf.dtype

    @pl.when(layer == 0)
    def _():
        x_buf[:] = x_ref[0]

    row2 = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    row_mask = row1 < length

    def dot(a, b_mat, transpose_b=False):
        dims = (((1,), (1 if transpose_b else 0,)), ((), ()))
        return jax.lax.dot_general(
            a, b_mat, dimension_numbers=dims, precision=precision,
            preferred_element_type=jnp.float32)

    def layer_norm(vec, gamma, beta):
        vf = vec.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mean), axis=-1, keepdims=True)
        normed = (vf - mean) * jax.lax.rsqrt(var + eps)
        return (normed * gamma.astype(jnp.float32)
                + beta.astype(jnp.float32)).astype(dtype)

    x = x_buf[:]

    # --- windowed relative self-attention ------------------------------
    qkv = dot(x, wqkv_ref[0]) + bqkv_ref[0].astype(jnp.float32)  # [T, 3H]
    scale = 1.0 / (dk ** 0.5)
    rel_k = relk_ref[0].astype(jnp.float32)  # [2w+1, dk]
    rel_v = relv_ref[0].astype(jnp.float32)
    heads = []
    for hd in range(n_heads):
        qh = qkv[:, hd * dk:(hd + 1) * dk] * scale
        kh = qkv[:, h + hd * dk:h + (hd + 1) * dk]
        vh = qkv[:, 2 * h + hd * dk:2 * h + (hd + 1) * dk]
        scores = dot(qh, kh, transpose_b=True)  # [T, T]
        # banded relative-key bias: scores[t, t+c] += (q_t . rel_k[c+w])
        rel_logits = dot(qh, rel_k, transpose_b=True)  # [T, 2w+1]
        for j in range(2 * window + 1):
            c = j - window
            scores = scores + jnp.where(
                col2 - row2 == c, rel_logits[:, j:j + 1], 0.0)
        scores = jnp.where(col2 < length, scores, -1e4)
        p_attn = jax.nn.softmax(scores, axis=-1)
        oh = dot(p_attn, vh)  # [T, dk]
        # banded relative-value term: oh[t] += p[t, t+c] * rel_v[c+w]
        for j in range(2 * window + 1):
            c = j - window
            band = jnp.sum(jnp.where(col2 - row2 == c, p_attn, 0.0),
                           axis=1, keepdims=True)  # [T, 1]
            oh = oh + band * rel_v[j:j + 1, :]
        heads.append(oh)
    attn = jnp.concatenate(heads, axis=1).astype(dtype)  # [T, H]
    y = dot(attn, wo_ref[0]) + bo_ref[0].astype(jnp.float32)
    x = layer_norm(x.astype(jnp.float32) + y,
                   ln_ref[0, 0:1, :], ln_ref[0, 1:2, :])

    # --- conv FFN (tap-matmul form) -------------------------------------
    pad_l = (ffn_k - 1) // 2

    def shift_rows(v, off):
        if off == 0:
            return v
        zeros = jnp.zeros((abs(off), v.shape[1]), v.dtype)
        if off > 0:
            return jnp.concatenate([v[off:], zeros], axis=0)
        return jnp.concatenate([zeros, v[:off]], axis=0)

    xm = jnp.where(row_mask, x, 0.0)
    h1 = b1_ref[0].astype(jnp.float32)
    for k in range(ffn_k):
        h1 = h1 + dot(shift_rows(xm, k - pad_l), w1_ref[0, k])
    h1 = jnp.where(row_mask, jnp.maximum(h1, 0.0), 0.0).astype(dtype)
    y2 = b2_ref[0].astype(jnp.float32)
    for k in range(ffn_k):
        y2 = y2 + dot(shift_rows(h1, k - pad_l), w2_ref[0, k])
    y2 = jnp.where(row_mask, y2, 0.0)
    x = layer_norm(x.astype(jnp.float32) + y2,
                   ln_ref[0, 2:3, :], ln_ref[0, 3:4, :])

    x_buf[:] = x
    out_ref[0] = jnp.where(row_mask, x, 0.0)


def apply(spec, x: Array, x_mask: Array, precision=None) -> Array:
    """Run the full encoder stack. x [B, T, H] (already masked), x_mask
    [B, T, 1] -> hidden [B, T, H] * mask (attention.encoder contract).

    precision: forwarded to every in-kernel dot (None = backend default
    = bf16-rounded multiplies on TPU; ``jax.lax.Precision.HIGHEST`` =
    3-pass true-f32, what the engine uses for fidelity-first f32
    synthesis)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h = x.shape
    n_layers = int(spec["n_layers"])
    lengths = jnp.sum(x_mask[:, :, 0].astype(jnp.int32), axis=1)  # [B]

    def layer_block(arr):
        # index maps get the scalar-prefetch ref appended to the grid ids
        return pl.BlockSpec((1,) + arr.shape[1:],
                            lambda bi, li, *_: (li,) + (0,) * (arr.ndim - 1),
                            memory_space=pltpu.VMEM)

    weight_names = ("w_qkv", "b_qkv", "w_o", "b_o", "rel_k", "rel_v",
                    "ln", "w_ffn1", "b_ffn1", "w_ffn2", "b_ffn2")
    weights = [spec[name] for name in weight_names]

    kernel = functools.partial(
        _kernel,
        n_heads=int(spec["n_heads"]), dk=int(spec["dk"]),
        window=int(spec["window"]), ffn_k=int(spec["ffn_k"]),
        precision=resolve_precision(precision),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lengths [B] lands whole in SMEM
        grid=(b, n_layers),
        in_specs=[
            pl.BlockSpec((1, t, h), lambda bi, li, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [layer_block(w) for w in weights],
        out_specs=pl.BlockSpec((1, t, h), lambda bi, li, *_: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, h), x.dtype)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h), x.dtype),
        interpret=FORCE_INTERPRET and jax.default_backend() != "tpu",
    )(lengths, x, *weights)
    return out
