"""Duration models: stochastic (flow-based) and deterministic predictors.

Reference: phoonnx_train/vits/models.py:14-165. The SDP's stochastic inputs
(posterior noise e_q, reverse-mode z) are explicit arguments so synthesis is
reproducible and verifiable against other runtimes.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import modules, nn

from phoonnx_tpu.models.vits.statics import StaticInt

Array = jax.Array


def init_stochastic_duration_predictor(rng, in_channels: int,
                                       filter_channels: int,
                                       kernel_size: int, n_flows: int = 4,
                                       gin_channels: int = 0):
    # The reference overrides filter_channels with in_channels
    # (models.py:25); keep that so checkpoints line up.
    filter_channels = in_channels
    params = {"filter_channels": StaticInt(filter_channels)}

    # keys: n_flows CF + 4 post CF + 6 convs/projs + optional cond
    rng, *keys = jax.random.split(rng, n_flows + 13)
    it = iter(keys)

    flows = [{"ea": modules.init_elementwise_affine(2)}]
    for _ in range(n_flows):
        flows.append({"cf": modules.init_conv_flow(
            next(it), 2, filter_channels, kernel_size, n_layers=3)})
    params["flows"] = flows

    params["post_pre"] = nn.init_conv(next(it), filter_channels, 1, 1)
    params["post_proj"] = nn.init_conv(next(it), filter_channels,
                                       filter_channels, 1)
    params["post_convs"] = modules.init_dds_conv(next(it), filter_channels,
                                                 kernel_size, n_layers=3)
    post_flows = [{"ea": modules.init_elementwise_affine(2)}]
    for _ in range(4):
        post_flows.append({"cf": modules.init_conv_flow(
            next(it), 2, filter_channels, kernel_size, n_layers=3)})
    params["post_flows"] = post_flows

    params["pre"] = nn.init_conv(next(it), filter_channels, in_channels, 1)
    params["proj"] = nn.init_conv(next(it), filter_channels, filter_channels, 1)
    params["convs"] = modules.init_dds_conv(next(it), filter_channels,
                                            kernel_size, n_layers=3)
    if gin_channels:
        params["cond"] = nn.init_conv(next(it), filter_channels, gin_channels, 1)
    return params


def _condition(params, x: Array, x_mask: Array, g: Optional[Array],
               p_dropout: float = 0.0, rng=None,
               deterministic: bool = True) -> Array:
    """Shared conditioning trunk: pre -> (+cond g) -> DDSConv -> proj."""
    x = jax.lax.stop_gradient(x)
    x = nn.apply_conv(params["pre"], x)
    if g is not None:
        g = jax.lax.stop_gradient(g)
        x = x + nn.apply_conv(params["cond"], g)
    x = modules.dds_conv(params["convs"], x, x_mask,
                         p_dropout=p_dropout, rng=rng,
                         deterministic=deterministic)
    return nn.apply_conv(params["proj"], x) * x_mask


def sdp_nll(params, x: Array, x_mask: Array, w: Array, e_q: Array,
            g: Optional[Array] = None, p_dropout: float = 0.5,
            rng=None, deterministic: bool = True) -> Array:
    """Training-mode negative log-likelihood of durations ``w`` [B, T, 1].

    ``e_q`` [B, T, 2] is the posterior noise sample (torch.randn in the
    reference, models.py:80). Returns per-example nll [B]. The DDSConv
    stacks regularize with dropout 0.5 in training, as in the reference
    (models.py:25 passes p_dropout=0.5; DDSConv applies it per layer).
    """
    rng_c = rng_p = None
    if rng is not None:
        rng_c, rng_p = jax.random.split(rng)
    x = _condition(params, x, x_mask, g, p_dropout=p_dropout,
                   rng=rng_c, deterministic=deterministic)

    # Variational posterior over (u, nu): flow from e_q conditioned on x+h_w
    h_w = nn.apply_conv(params["post_pre"], w)
    h_w = modules.dds_conv(params["post_convs"], h_w, x_mask,
                           p_dropout=p_dropout, rng=rng_p,
                           deterministic=deterministic)
    h_w = nn.apply_conv(params["post_proj"], h_w) * x_mask

    e_q = e_q * x_mask
    z_q = e_q
    logdet_tot_q = jnp.zeros(x.shape[0], x.dtype)
    cond_q = x + h_w
    for i, flow in enumerate(params["post_flows"]):
        if "ea" in flow:
            z_q, logdet = modules.elementwise_affine(flow["ea"], z_q, x_mask)
        else:
            z_q, logdet = modules.conv_flow(flow["cf"], z_q, x_mask, g=cond_q)
            logdet_tot_q = logdet_tot_q + logdet
            z_q, logdet = modules.flip_flow(z_q)
        logdet_tot_q = logdet_tot_q + logdet

    z_u, z1 = z_q[..., :1], z_q[..., 1:]
    u = jax.nn.sigmoid(z_u) * x_mask
    z0 = (w - u) * x_mask
    logdet_tot_q = logdet_tot_q + jnp.sum(
        (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
        axis=(1, 2),
    )
    logq = (
        jnp.sum(-0.5 * (math.log(2 * math.pi) + jnp.square(e_q)) * x_mask,
                axis=(1, 2))
        - logdet_tot_q
    )

    # Prior flow over (log w - u, nu)
    logdet_tot = jnp.zeros(x.shape[0], x.dtype)
    z0, logdet = modules.log_flow(z0, x_mask)
    logdet_tot = logdet_tot + logdet
    z = jnp.concatenate([z0, z1], axis=-1)
    for flow in params["flows"]:
        if "ea" in flow:
            z, logdet = modules.elementwise_affine(flow["ea"], z, x_mask)
            logdet_tot = logdet_tot + logdet
        else:
            z, logdet = modules.conv_flow(flow["cf"], z, x_mask, g=x)
            logdet_tot = logdet_tot + logdet
            z, logdet = modules.flip_flow(z)
            logdet_tot = logdet_tot + logdet
    nll = (
        jnp.sum(0.5 * (math.log(2 * math.pi) + jnp.square(z)) * x_mask,
                axis=(1, 2))
        - logdet_tot
    )
    return nll + logq


def sdp_reverse(params, x: Array, x_mask: Array, z: Array,
                g: Optional[Array] = None) -> Array:
    """Inference: sample log-durations from noise ``z`` [B, T, 2].

    ``z`` should already be scaled by noise_w (the reference scales
    torch.randn by noise_scale, models.py:111). Mirrors the reference's
    reversed flow list which drops the first ConvFlow (models.py:109-110).
    """
    x = _condition(params, x, x_mask, g)

    flows = params["flows"]
    # forward order: [EA, CF1, CF2, CF3, CF4] with flips between; reverse
    # order skips CF1 ("remove a useless vflow").
    reverse_flows = list(reversed(flows[2:]))  # CF4, CF3, CF2
    for flow in reverse_flows:
        z = modules.flip_flow(z, reverse=True)
        z = modules.conv_flow(flow["cf"], z, x_mask, g=x, reverse=True)
    z = modules.flip_flow(z, reverse=True)
    z = modules.elementwise_affine(flows[0]["ea"], z, x_mask, reverse=True)
    logw = z[..., :1]
    return logw


def init_duration_predictor(rng, in_channels: int, filter_channels: int,
                            kernel_size: int, gin_channels: int = 0):
    rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
    params = {
        "kernel_size": StaticInt(kernel_size),
        "conv_1": nn.init_conv(k1, filter_channels, in_channels, kernel_size),
        "norm_1": nn.init_layer_norm(filter_channels),
        "conv_2": nn.init_conv(k2, filter_channels, filter_channels,
                               kernel_size),
        "norm_2": nn.init_layer_norm(filter_channels),
        "proj": nn.init_conv(k3, 1, filter_channels, 1),
    }
    if gin_channels:
        params["cond"] = nn.init_conv(k4, in_channels, gin_channels, 1)
    return params


def duration_predictor(params, x: Array, x_mask: Array,
                       g: Optional[Array] = None, p_dropout: float = 0.0,
                       rng=None, deterministic=True) -> Array:
    """Deterministic log-duration head (models.py:120-165)."""
    kernel = params["kernel_size"]
    pad = kernel // 2
    x = jax.lax.stop_gradient(x)
    if g is not None:
        g = jax.lax.stop_gradient(g)
        x = x + nn.apply_conv(params["cond"], g)
    rng1 = rng2 = None
    if rng is not None:
        rng1, rng2 = jax.random.split(rng)  # independent dropout masks
    x = nn.apply_conv(params["conv_1"], x * x_mask, padding=pad)
    x = jax.nn.relu(x)
    x = nn.layer_norm(params["norm_1"], x)
    x = nn.dropout(x, p_dropout, rng1, deterministic)
    x = nn.apply_conv(params["conv_2"], x * x_mask, padding=pad)
    x = jax.nn.relu(x)
    x = nn.layer_norm(params["norm_2"], x)
    x = nn.dropout(x, p_dropout, rng2, deterministic)
    x = nn.apply_conv(params["proj"], x * x_mask)
    return x * x_mask
