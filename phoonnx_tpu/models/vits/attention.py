"""Windowed relative-position multi-head attention + conv FFN.

JAX rebuild of the reference text-encoder attention
(phoonnx_train/vits/attentions.py:161-427). The relative->absolute index
shuffles are pure static reshapes, so the whole layer compiles to a handful
of MXU matmuls. Layout: [B, T, C].
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import nn

from phoonnx_tpu.models.vits.statics import StaticInt

Array = jax.Array


def init_multi_head_attention(rng, channels: int, out_channels: int,
                              n_heads: int, window_size: Optional[int] = 4,
                              heads_share: bool = True):
    k_channels = channels // n_heads
    rng, kq, kk, kv, ko, kr1, kr2 = jax.random.split(rng, 7)

    def xavier_conv(key, out_ch, in_ch):
        # xavier_uniform on the [O, I, 1] kernel (attentions.py:207-209)
        bound = math.sqrt(6.0 / (out_ch + in_ch))
        weight = jax.random.uniform(
            key, (out_ch, in_ch, 1), minval=-bound, maxval=bound,
            dtype=jnp.float32,
        )
        return {"weight": weight, "bias": jnp.zeros((out_ch,), jnp.float32)}

    params = {
        "n_heads": StaticInt(n_heads),
        "k_channels": StaticInt(k_channels),
        "window_size": None if window_size is None else StaticInt(window_size),
        "conv_q": xavier_conv(kq, channels, channels),
        "conv_k": xavier_conv(kk, channels, channels),
        "conv_v": xavier_conv(kv, channels, channels),
        "conv_o": nn.init_conv(ko, out_channels, channels, 1),
    }
    if window_size is not None:
        n_heads_rel = 1 if heads_share else n_heads
        rel_std = k_channels ** -0.5
        shape = (n_heads_rel, 2 * window_size + 1, k_channels)
        params["emb_rel_k"] = rel_std * jax.random.normal(kr1, shape)
        params["emb_rel_v"] = rel_std * jax.random.normal(kr2, shape)
    return params


def _get_relative_embeddings(emb: Array, length: int, window_size: int) -> Array:
    """Slice/pad the (2w+1) relative table to 2*length-1 entries."""
    pad_length = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, [(0, 0), (pad_length, pad_length), (0, 0)])
    return emb[:, start:start + 2 * length - 1]


def _relative_to_absolute(x: Array) -> Array:
    """[B, H, L, 2L-1] -> [B, H, L, L] via the pad/reshape shuffle."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, 1)])
    x_flat = x.reshape(b, h, length * 2 * length)
    x_flat = jnp.pad(x_flat, [(0, 0), (0, 0), (0, length - 1)])
    x_final = x_flat.reshape(b, h, length + 1, 2 * length - 1)
    return x_final[:, :, :length, length - 1:]


def _absolute_to_relative(x: Array) -> Array:
    """[B, H, L, L] -> [B, H, L, 2L-1]."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, length - 1)])
    x_flat = x.reshape(b, h, length * length + length * (length - 1))
    x_flat = jnp.pad(x_flat, [(0, 0), (0, 0), (length, 0)])
    return x_flat.reshape(b, h, length, 2 * length)[:, :, :, 1:]


def multi_head_attention(params, x: Array, c: Array,
                         attn_mask: Optional[Array] = None,
                         p_dropout: float = 0.0, rng=None,
                         deterministic=True) -> Array:
    """Self/cross attention; x (queries) and c (keys/values) are [B, T, C]."""
    n_heads = params["n_heads"]
    k_channels = params["k_channels"]
    window_size = params["window_size"]

    q = nn.apply_conv(params["conv_q"], x)
    k = nn.apply_conv(params["conv_k"], c)
    v = nn.apply_conv(params["conv_v"], c)

    b, t_t, d = q.shape
    t_s = k.shape[1]
    # [B, T, H*D] -> [B, H, T, D]
    q = q.reshape(b, t_t, n_heads, k_channels).transpose(0, 2, 1, 3)
    k = k.reshape(b, t_s, n_heads, k_channels).transpose(0, 2, 1, 3)
    v = v.reshape(b, t_s, n_heads, k_channels).transpose(0, 2, 1, 3)

    scale = 1.0 / math.sqrt(k_channels)
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k,
                        preferred_element_type=jnp.float32)

    if window_size is not None:
        assert t_s == t_t, "relative attention requires self-attention"
        rel_k = _get_relative_embeddings(params["emb_rel_k"], t_s, window_size)
        # [B,H,L,D] x [1 or H, M, D] -> [B,H,L,M]; broadcast the table to
        # per-head before contracting — an "nmd" einsum would SUM over
        # the table's head axis when heads_share=False
        rel_k = jnp.broadcast_to(rel_k, (n_heads,) + rel_k.shape[1:])
        rel_logits = jnp.einsum("bhld,hmd->bhlm", q * scale, rel_k,
                                preferred_element_type=jnp.float32)
        scores = scores + _relative_to_absolute(rel_logits)

    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, -1e4, scores)

    p_attn = jax.nn.softmax(scores, axis=-1)
    if not deterministic and rng is not None:
        p_attn = nn.dropout(p_attn, p_dropout, rng, deterministic)

    output = jnp.einsum("bhts,bhsd->bhtd", p_attn, v,
                        preferred_element_type=jnp.float32)
    if window_size is not None:
        rel_weights = _absolute_to_relative(p_attn)
        rel_v = _get_relative_embeddings(params["emb_rel_v"], t_s, window_size)
        rel_v = jnp.broadcast_to(rel_v, (n_heads,) + rel_v.shape[1:])
        output = output + jnp.einsum("bhlm,hmd->bhld", rel_weights, rel_v,
                                     preferred_element_type=jnp.float32)

    # [B, H, T, D] -> [B, T, H*D]; back to the compute dtype (attention
    # accumulates in f32 even under bf16 inference)
    output = output.transpose(0, 2, 1, 3).reshape(b, t_t, d).astype(x.dtype)
    return nn.apply_conv(params["conv_o"], output)


# ---------------------------------------------------------------------------
# Conv feed-forward network (attentions.py:362-427)
# ---------------------------------------------------------------------------


def init_ffn(rng, in_channels: int, out_channels: int, filter_channels: int,
             kernel_size: int):
    rng, k1, k2 = jax.random.split(rng, 3)
    return {
        "kernel_size": StaticInt(kernel_size),
        "conv_1": nn.init_conv(k1, filter_channels, in_channels, kernel_size),
        "conv_2": nn.init_conv(k2, out_channels, filter_channels, kernel_size),
    }


def _same_pad(x: Array, kernel_size: int) -> Array:
    if kernel_size == 1:
        return x
    pad_l = (kernel_size - 1) // 2
    pad_r = kernel_size // 2
    return jnp.pad(x, [(0, 0), (pad_l, pad_r), (0, 0)])


def ffn(params, x: Array, x_mask: Array, p_dropout: float = 0.0, rng=None,
        deterministic=True) -> Array:
    kernel_size = params["kernel_size"]
    h = nn.apply_conv(params["conv_1"], _same_pad(x * x_mask, kernel_size))
    h = jax.nn.relu(h)
    h = nn.dropout(h, p_dropout, rng, deterministic)
    h = nn.apply_conv(params["conv_2"], _same_pad(h * x_mask, kernel_size))
    return h * x_mask


# ---------------------------------------------------------------------------
# Encoder stack (attentions.py:12-74)
# ---------------------------------------------------------------------------


def init_encoder(rng, hidden_channels: int, filter_channels: int,
                 n_heads: int, n_layers: int, kernel_size: int = 1,
                 window_size: int = 4):
    layers = []
    for _ in range(n_layers):
        rng, k_attn, k_ffn = jax.random.split(rng, 3)
        layers.append({
            "attn": init_multi_head_attention(
                k_attn, hidden_channels, hidden_channels, n_heads,
                window_size=window_size,
            ),
            "norm_1": nn.init_layer_norm(hidden_channels),
            "ffn": init_ffn(k_ffn, hidden_channels, hidden_channels,
                            filter_channels, kernel_size),
            "norm_2": nn.init_layer_norm(hidden_channels),
        })
    return {"layers": layers}


def encoder(params, x: Array, x_mask: Array, p_dropout: float = 0.0,
            rng=None, deterministic=True) -> Array:
    fused = params.get("fused")
    if fused is not None and deterministic:
        from phoonnx_tpu.models.vits import fused_encoder

        if fused_encoder.usable(fused, x, deterministic):
            return fused_encoder.apply(fused, x * x_mask, x_mask)

    attn_mask = x_mask[:, :, None, 0] * x_mask[:, None, :, 0]  # [B, T, T]
    attn_mask = attn_mask[:, None]  # [B, 1, T_t, T_s]
    x = x * x_mask
    for layer in params["layers"]:
        if rng is not None:
            rng, r1, r2, r3, r4 = jax.random.split(rng, 5)
        else:
            r1 = r2 = r3 = r4 = None
        y = multi_head_attention(layer["attn"], x, x, attn_mask,
                                 p_dropout=p_dropout, rng=r1,
                                 deterministic=deterministic)
        y = nn.dropout(y, p_dropout, r2, deterministic)
        x = nn.layer_norm(layer["norm_1"], x + y)

        y = ffn(layer["ffn"], x, x_mask, p_dropout=p_dropout, rng=r3,
                deterministic=deterministic)
        y = nn.dropout(y, p_dropout, r4, deterministic)
        x = nn.layer_norm(layer["norm_2"], x + y)
    return x * x_mask
