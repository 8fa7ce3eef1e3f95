"""VITS building blocks: DDSConv, WaveNet stack, resblocks, flow layers.

Functional JAX rebuild of the reference blocks
(phoonnx_train/vits/modules.py). Activations are [B, T, C]; masks are
[B, T, 1]; ``reverse`` / ``deterministic`` are trace-time constants.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import nn
from phoonnx_tpu.models.vits.transforms import (
    piecewise_rational_quadratic_transform,
)

from phoonnx_tpu.models.vits.statics import StaticFloat, StaticInt, StaticTuple

Array = jax.Array


# ---------------------------------------------------------------------------
# DDSConv — dilated depth-separable conv stack (modules.py:81-129)
# ---------------------------------------------------------------------------


def init_dds_conv(rng, channels: int, kernel_size: int, n_layers: int):
    layers = []
    for i in range(n_layers):
        rng, k1, k2 = jax.random.split(rng, 3)
        layers.append({
            "sep": nn.init_conv(k1, channels, channels, kernel_size,
                                groups=channels),
            "pointwise": nn.init_conv(k2, channels, channels, 1),
            "norm1": nn.init_layer_norm(channels),
            "norm2": nn.init_layer_norm(channels),
        })
    return {"layers": layers, "kernel_size": StaticInt(kernel_size)}


def dds_conv(params, x: Array, x_mask: Array, g: Optional[Array] = None,
             p_dropout: float = 0.0, rng=None, deterministic=True) -> Array:
    kernel_size = params["kernel_size"]
    channels = x.shape[-1]
    if g is not None:
        x = x + g
    for i, layer in enumerate(params["layers"]):
        dilation = kernel_size ** i
        padding = (kernel_size * dilation - dilation) // 2
        y = nn.apply_conv(layer["sep"], x * x_mask, padding=padding,
                          dilation=dilation, groups=channels)
        y = nn.layer_norm(layer["norm1"], y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.apply_conv(layer["pointwise"], y)
        y = nn.layer_norm(layer["norm2"], y)
        y = jax.nn.gelu(y, approximate=False)
        if not deterministic and rng is not None:
            rng, sub = jax.random.split(rng)
            y = nn.dropout(y, p_dropout, sub, deterministic)
        x = x + y
    return x * x_mask


# ---------------------------------------------------------------------------
# WN — gated dilated WaveNet stack (modules.py:132-209)
# ---------------------------------------------------------------------------


def init_wn(rng, hidden: int, kernel_size: int, dilation_rate: int,
            n_layers: int, gin_channels: int = 0):
    params = {"n_layers": StaticInt(n_layers),
              "kernel_size": StaticInt(kernel_size),
              "dilation_rate": StaticInt(dilation_rate),
              "hidden": StaticInt(hidden)}
    in_layers, res_skip_layers = [], []
    for i in range(n_layers):
        rng, k1, k2 = jax.random.split(rng, 3)
        in_layers.append(
            nn.init_wn_conv(k1, 2 * hidden, hidden, kernel_size)
        )
        res_skip_ch = 2 * hidden if i < n_layers - 1 else hidden
        res_skip_layers.append(nn.init_wn_conv(k2, res_skip_ch, hidden, 1))
    params["in_layers"] = in_layers
    params["res_skip_layers"] = res_skip_layers
    if gin_channels:
        rng, k = jax.random.split(rng)
        params["cond_layer"] = nn.init_wn_conv(
            k, 2 * hidden * n_layers, gin_channels, 1
        )
    return params


def wn(params, x: Array, x_mask: Array, g: Optional[Array] = None,
       p_dropout: float = 0.0, rng=None, deterministic=True) -> Array:
    hidden = params["hidden"]
    n_layers = params["n_layers"]
    kernel_size = params["kernel_size"]
    dilation_rate = params["dilation_rate"]

    output = jnp.zeros_like(x)
    if g is not None:
        if "cond_layer" not in params:
            # silently dropping g would synthesize speaker-unconditioned
            # audio on an hparams/checkpoint mismatch
            raise ValueError(
                "WN received speaker conditioning but was initialized "
                "without gin_channels (hparams/checkpoint mismatch)"
            )
        g_all = nn.apply_wn_conv(params["cond_layer"], g)
    else:
        g_all = None

    for i in range(n_layers):
        dilation = dilation_rate ** i
        padding = (kernel_size * dilation - dilation) // 2
        x_in = nn.apply_wn_conv(params["in_layers"][i], x, padding=padding,
                                dilation=dilation)
        if g_all is not None:
            g_l = g_all[..., i * 2 * hidden:(i + 1) * 2 * hidden]
        else:
            g_l = jnp.zeros_like(x_in)
        acts = nn.gated_tanh_sigmoid(x_in, g_l, hidden)
        if not deterministic and rng is not None:
            rng, sub = jax.random.split(rng)
            acts = nn.dropout(acts, p_dropout, sub, deterministic)
        res_skip = nn.apply_wn_conv(params["res_skip_layers"][i], acts)
        if i < n_layers - 1:
            x = (x + res_skip[..., :hidden]) * x_mask
            output = output + res_skip[..., hidden:]
        else:
            output = output + res_skip
    return output * x_mask


# ---------------------------------------------------------------------------
# HiFi-GAN residual blocks (modules.py:220-368)
# ---------------------------------------------------------------------------

LRELU_SLOPE = 0.1


def init_resblock1(rng, channels: int, kernel_size: int, dilations):
    convs1, convs2 = [], []
    for d in dilations:
        rng, k1, k2 = jax.random.split(rng, 3)
        convs1.append(nn.init_wn_conv(k1, channels, channels, kernel_size,
                                      std=0.01))
        convs2.append(nn.init_wn_conv(k2, channels, channels, kernel_size,
                                      std=0.01))
    return {"convs1": convs1, "convs2": convs2,
            "kernel_size": StaticInt(kernel_size),
            "dilations": StaticTuple(dilations)}


def _wn_conv_packed(conv, x_p, k: int, dilation: int, pack_r: int) -> Array:
    """Weight-normed conv applied in channel-packed space
    ([B, T/r, r*C] in, same out; see nn.conv1d_packed_io)."""
    padding = (k * dilation - dilation) // 2
    pb = conv.get("packed")
    if (pb is not None and int(pb["r"]) == pack_r
            and int(pb["dilation"]) == dilation):
        return nn.conv1d_packed_io(x_p, None, prebuilt=pb)
    return nn.conv1d_packed_io(x_p, nn.resolve_weight(conv),
                               conv.get("bias"), dilation=dilation,
                               padding=padding, r=pack_r)


def pack_resblock(block: dict, pack_r: int) -> dict:
    """Copy of a resblock param subtree with precomputed packed kernels
    for ``pack_r`` (engine init; see nn.packed_conv_prebuilt)."""
    if pack_r <= 1:
        return block
    k = block["kernel_size"]

    def _with_packed(conv, dilation):
        conv = dict(conv)
        conv["packed"] = nn.packed_conv_prebuilt(
            nn.resolve_weight(conv), conv.get("bias"), pack_r, dilation,
            (k * dilation - dilation) // 2,
        )
        return conv

    packed = dict(block)
    if "convs1" in block:  # resblock1: convs1 at their dilation, convs2 at 1
        packed["convs1"] = [
            _with_packed(c, d)
            for c, d in zip(block["convs1"], block["dilations"])
        ]
        packed["convs2"] = [_with_packed(c, 1) for c in block["convs2"]]
    else:  # resblock2
        packed["convs"] = [
            _with_packed(c, d)
            for c, d in zip(block["convs"], block["dilations"])
        ]
    return packed


def resblock1(params, x: Array, mask_fn=None,
              pack_r: int = 1, packed_io: bool = False) -> Array:
    """mask_fn: optional post-conv re-zeroing of padded tail positions
    (nn.zero_time_tail closure from the decoder). Applied to every conv
    OUTPUT: the residual chain then stays zero on the bleed window, so
    each conv's boundary taps read exactly the zeros the exact-length
    decode's own padding would supply (decode padding-invariance)."""
    k = params["kernel_size"]
    if pack_r > 1:
        # Channel-packed stage: every tensor (residuals included) lives as
        # [B, T/r, r*C] so the whole stage reads/writes full 128-lane
        # tiles instead of 1/r-occupied ones. Same math, grouped sums.
        # packed_io: caller already holds the packed view — the
        # [T, C] <-> [T/r, r*C] boundary is NOT free on TPU (the layouts
        # differ physically), so stages that chain packed blocks should
        # pack once outside.
        if packed_io:
            x_p = x
        else:
            b, t, c = x.shape
            x_p = x.reshape(b, t // pack_r, pack_r * c)
        for conv1, conv2, dilation in zip(
            params["convs1"], params["convs2"], params["dilations"]
        ):
            xt = nn.leaky_relu(x_p, LRELU_SLOPE)
            xt = _wn_conv_packed(conv1, xt, k, dilation, pack_r)
            if mask_fn is not None:
                xt = mask_fn(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = _wn_conv_packed(conv2, xt, k, 1, pack_r)
            if mask_fn is not None:
                xt = mask_fn(xt)
            x_p = xt + x_p
        if packed_io:
            return x_p
        return x_p.reshape(b, t, c)
    for conv1, conv2, dilation in zip(
        params["convs1"], params["convs2"], params["dilations"]
    ):
        xt = nn.leaky_relu(x, LRELU_SLOPE)
        xt = nn.apply_wn_conv(conv1, xt, dilation=dilation,
                              padding=(k * dilation - dilation) // 2)
        if mask_fn is not None:
            xt = mask_fn(xt)
        xt = nn.leaky_relu(xt, LRELU_SLOPE)
        xt = nn.apply_wn_conv(conv2, xt, padding=(k - 1) // 2)
        if mask_fn is not None:
            xt = mask_fn(xt)
        x = xt + x
    return x


def init_resblock2(rng, channels: int, kernel_size: int, dilations):
    convs = []
    for d in dilations:
        rng, k1 = jax.random.split(rng)
        convs.append(nn.init_wn_conv(k1, channels, channels, kernel_size,
                                     std=0.01))
    return {"convs": convs, "kernel_size": StaticInt(kernel_size),
            "dilations": StaticTuple(dilations)}


def resblock2(params, x: Array, mask_fn=None,
              pack_r: int = 1, packed_io: bool = False) -> Array:
    """mask_fn: see :func:`resblock1`."""
    k = params["kernel_size"]
    if pack_r > 1:
        if packed_io:
            x_p = x
        else:
            b, t, c = x.shape
            x_p = x.reshape(b, t // pack_r, pack_r * c)
        for conv, dilation in zip(params["convs"], params["dilations"]):
            xt = nn.leaky_relu(x_p, LRELU_SLOPE)
            xt = _wn_conv_packed(conv, xt, k, dilation, pack_r)
            if mask_fn is not None:
                xt = mask_fn(xt)
            x_p = xt + x_p
        if packed_io:
            return x_p
        return x_p.reshape(b, t, c)
    for conv, dilation in zip(params["convs"], params["dilations"]):
        xt = nn.leaky_relu(x, LRELU_SLOPE)
        xt = nn.apply_wn_conv(conv, xt, dilation=dilation,
                              padding=(k * dilation - dilation) // 2)
        if mask_fn is not None:
            xt = mask_fn(xt)
        x = xt + x
    return x


# ---------------------------------------------------------------------------
# Flow primitives (modules.py:371-409)
# ---------------------------------------------------------------------------


def log_flow(x: Array, x_mask: Array, reverse: bool = False):
    if not reverse:
        y = jnp.log(jnp.maximum(x, 1e-5)) * x_mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * x_mask


def flip_flow(x: Array, reverse: bool = False):
    """Flip the channel axis (invertible, zero logdet)."""
    y = jnp.flip(x, axis=-1)
    if not reverse:
        return y, jnp.zeros(x.shape[0], x.dtype)
    return y


def init_elementwise_affine(channels: int):
    return {"m": jnp.zeros((channels,), jnp.float32),
            "logs": jnp.zeros((channels,), jnp.float32)}


def elementwise_affine(params, x: Array, x_mask: Array, reverse=False):
    if not reverse:
        y = (params["m"] + jnp.exp(params["logs"]) * x) * x_mask
        logdet = jnp.sum(params["logs"] * x_mask, axis=(1, 2))
        return y, logdet
    return (x - params["m"]) * jnp.exp(-params["logs"]) * x_mask


# ---------------------------------------------------------------------------
# Residual coupling layer (modules.py:412-467)
# ---------------------------------------------------------------------------


def init_residual_coupling_layer(rng, channels: int, hidden: int,
                                 kernel_size: int, dilation_rate: int,
                                 n_layers: int, gin_channels: int = 0):
    half = channels // 2
    rng, k_pre, k_wn = jax.random.split(rng, 3)
    return {
        "half_channels": StaticInt(half),
        "pre": nn.init_conv(k_pre, hidden, half, 1),
        "enc": init_wn(k_wn, hidden, kernel_size, dilation_rate, n_layers,
                       gin_channels=gin_channels),
        "post": nn.init_zero_conv(half, hidden),  # mean_only
    }


def residual_coupling_layer(params, x: Array, x_mask: Array,
                            g: Optional[Array] = None, reverse=False):
    """Affine (mean-only) coupling with a WN inner network."""
    half = params["half_channels"]
    x0, x1 = x[..., :half], x[..., half:]
    h = nn.apply_conv(params["pre"], x0) * x_mask
    h = wn(params["enc"], h, x_mask, g=g)
    m = nn.apply_conv(params["post"], h) * x_mask

    if not reverse:
        x1 = (m + x1) * x_mask
        out = jnp.concatenate([x0, x1], axis=-1)
        logdet = jnp.zeros(x.shape[0], x.dtype)  # mean-only: logs == 0
        return out, logdet
    x1 = (x1 - m) * x_mask
    return jnp.concatenate([x0, x1], axis=-1)


# ---------------------------------------------------------------------------
# ConvFlow — RQ-spline coupling for the SDP (modules.py:469-527)
# ---------------------------------------------------------------------------


def init_conv_flow(rng, in_channels: int, filter_channels: int,
                   kernel_size: int, n_layers: int, num_bins: int = 10,
                   tail_bound: float = 5.0):
    half = in_channels // 2
    rng, k_pre, k_dds = jax.random.split(rng, 3)
    return {
        "half_channels": StaticInt(half),
        "filter_channels": StaticInt(filter_channels),
        "num_bins": StaticInt(num_bins),
        "tail_bound": StaticFloat(tail_bound),
        "pre": nn.init_conv(k_pre, filter_channels, half, 1),
        "convs": init_dds_conv(k_dds, filter_channels, kernel_size, n_layers),
        "proj": nn.init_zero_conv(half * (num_bins * 3 - 1), filter_channels),
    }


def conv_flow(params, x: Array, x_mask: Array, g: Optional[Array] = None,
              reverse=False):
    half = params["half_channels"]
    num_bins = params["num_bins"]
    filter_channels = params["filter_channels"]

    x0, x1 = x[..., :half], x[..., half:]
    h = nn.apply_conv(params["pre"], x0)
    h = dds_conv(params["convs"], h, x_mask, g=g)
    h = nn.apply_conv(params["proj"], h) * x_mask

    b, t, _ = x0.shape
    # [B, T, half*(3K-1)] -> [B, T, half, 3K-1]
    h = h.reshape(b, t, half, num_bins * 3 - 1)
    scale = 1.0 / math.sqrt(filter_channels)
    unnorm_widths = h[..., :num_bins] * scale
    unnorm_heights = h[..., num_bins:2 * num_bins] * scale
    unnorm_derivs = h[..., 2 * num_bins:]

    # plain float: the StaticFloat wrapper is not a weak scalar to JAX and
    # would silently promote bf16 activations to f32
    x1, logabsdet = piecewise_rational_quadratic_transform(
        x1, unnorm_widths, unnorm_heights, unnorm_derivs,
        inverse=reverse, tails="linear",
        tail_bound=float(params["tail_bound"]),
    )

    out = jnp.concatenate([x0, x1], axis=-1) * x_mask
    logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
    if not reverse:
        return out, logdet
    return out
