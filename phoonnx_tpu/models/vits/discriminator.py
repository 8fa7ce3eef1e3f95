"""Multi-period + multi-scale discriminators (training only).

Reference: phoonnx_train/vits/models.py:378-519. Layout: waveforms are
[B, N]; period discriminators fold to [B, frames, period, C] and run 2D
convs on the MXU.
"""

from typing import List, Tuple

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import nn
from phoonnx_tpu.models.vits.statics import StaticInt

Array = jax.Array

LRELU_SLOPE = 0.1
PERIODS = (2, 3, 5, 7, 11)

# lhs [B, H, W, C]; rhs torch layout [O, I, kh, kw]
_CONV2D_DN = ("NHWC", "OIHW", "NHWC")


def _init_wn_conv2d(rng, out_ch, in_ch, kernel_hw):
    k_rng, _ = jax.random.split(rng)
    fan_in = in_ch * kernel_hw[0] * kernel_hw[1]
    bound = (1.0 / fan_in) ** 0.5 * (3.0 ** 0.5)
    v = jax.random.uniform(
        k_rng, (out_ch, in_ch) + tuple(kernel_hw), minval=-bound,
        maxval=bound, dtype=jnp.float32,
    )
    axes = tuple(range(1, v.ndim))
    g = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    return {"weight_v": v, "weight_g": g,
            "bias": jnp.zeros((out_ch,), jnp.float32)}


def _conv2d(params, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    weight = nn.resolve_weight(params)
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=stride, padding=padding,
        dimension_numbers=_CONV2D_DN, preferred_element_type=x.dtype,
    )
    return out + params["bias"]


def init_discriminator_p(rng, period: int, kernel_size: int = 5,
                         stride: int = 3, channel_scale: int = 1):
    keys = jax.random.split(rng, 6)
    cs = channel_scale
    channels = [(1, 32 // cs), (32 // cs, 128 // cs),
                (128 // cs, 512 // cs), (512 // cs, 1024 // cs)]
    convs = [
        _init_wn_conv2d(keys[i], out_ch, in_ch, (kernel_size, 1))
        for i, (in_ch, out_ch) in enumerate(channels)
    ]
    convs.append(_init_wn_conv2d(keys[4], 1024 // cs, 1024 // cs,
                                 (kernel_size, 1)))
    return {
        "period": StaticInt(period),
        "kernel_size": StaticInt(kernel_size),
        "stride": StaticInt(stride),
        "convs": convs,
        "conv_post": _init_wn_conv2d(keys[5], 1, 1024 // cs, (3, 1)),
    }


def discriminator_p(params, y: Array) -> Tuple[Array, List[Array]]:
    """y [B, N] -> (flattened logits, feature maps)."""
    period = params["period"]
    kernel_size = params["kernel_size"]
    stride = params["stride"]
    pad = (kernel_size - 1) // 2

    b, n = y.shape
    if n % period != 0:
        n_pad = period - (n % period)
        y = jnp.pad(y, [(0, 0), (0, n_pad)], mode="reflect")
        n += n_pad
    x = y.reshape(b, n // period, period, 1)  # [B, H=t/p, W=p, C=1]

    fmap = []
    for i, conv in enumerate(params["convs"]):
        s = (stride, 1) if i < len(params["convs"]) - 1 else (1, 1)
        x = _conv2d(conv, x, stride=s, padding=((pad, pad), (0, 0)))
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _conv2d(params["conv_post"], x, padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(b, -1), fmap


def init_discriminator_s(rng, channel_scale: int = 1):
    keys = jax.random.split(rng, 7)
    cs = channel_scale
    specs = [  # (in, out, kernel, stride, groups, padding)
        (1, 16 // cs, 15, 1, 1, 7),
        (16 // cs, 64 // cs, 41, 4, 4, 20),
        (64 // cs, 256 // cs, 41, 4, 16 // cs if cs <= 4 else 4, 20),
        (256 // cs, 1024 // cs, 41, 4, 64 // cs, 20),
        (1024 // cs, 1024 // cs, 41, 4, 256 // cs, 20),
        (1024 // cs, 1024 // cs, 5, 1, 1, 2),
    ]
    convs = []
    for key, (in_ch, out_ch, k, s, groups, p) in zip(keys, specs):
        conv = nn.init_wn_conv(key, out_ch, in_ch, k, groups=groups)
        conv["stride"] = StaticInt(s)
        conv["groups"] = StaticInt(groups)
        conv["padding"] = StaticInt(p)
        convs.append(conv)
    return {
        "convs": convs,
        "conv_post": nn.init_wn_conv(keys[6], 1, 1024 // cs, 3),
    }


def discriminator_s(params, y: Array) -> Tuple[Array, List[Array]]:
    x = y[..., None]  # [B, N, 1]
    fmap = []
    for conv in params["convs"]:
        x = nn.conv1d(
            x, nn.resolve_weight(conv), conv.get("bias"),
            stride=conv["stride"], padding=conv["padding"],
            groups=conv["groups"],
        )
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = nn.conv1d(x, nn.resolve_weight(params["conv_post"]),
                  params["conv_post"].get("bias"), padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def init_multi_period_discriminator(rng, periods=PERIODS,
                                    channel_scale: int = 1):
    """periods/channel_scale are test knobs; defaults match the reference
    (periods (2,3,5,7,11), channels up to 1024, models.py:495-519)."""
    keys = jax.random.split(rng, len(periods) + 1)
    return {
        "msd": init_discriminator_s(keys[0], channel_scale=channel_scale),
        "mpd": [
            init_discriminator_p(keys[i + 1], p,
                                 channel_scale=channel_scale)
            for i, p in enumerate(periods)
        ],
    }


def multi_period_discriminator(params, y: Array, y_hat: Array):
    """Run all sub-discriminators on real and generated audio.

    Real and fake ride ONE batched pass per sub-discriminator (convs are
    batch-independent, so splitting the outputs afterwards is exact):
    half the conv dispatches and double the arithmetic intensity — the
    discriminators are the compute bulk of the train step.
    """
    b = y.shape[0]
    yy = jnp.concatenate([y, y_hat], axis=0)
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []

    def _split(out, fm):
        y_d_rs.append(out[:b])
        y_d_gs.append(out[b:])
        fmap_rs.append([m[:b] for m in fm])
        fmap_gs.append([m[b:] for m in fm])

    _split(*discriminator_s(params["msd"], yy))
    for sub in params["mpd"]:
        _split(*discriminator_p(sub, yy))
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs
