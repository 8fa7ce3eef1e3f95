"""Posterior encoder and coupling-flow stack.

Reference: phoonnx_train/vits/models.py:212-296.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import modules, nn

from phoonnx_tpu.models.vits.statics import StaticInt

Array = jax.Array


def init_posterior_encoder(rng, in_channels: int, out_channels: int,
                           hidden_channels: int, kernel_size: int,
                           dilation_rate: int, n_layers: int,
                           gin_channels: int = 0):
    rng, k_pre, k_wn, k_proj = jax.random.split(rng, 4)
    return {
        "out_channels": StaticInt(out_channels),
        "pre": nn.init_conv(k_pre, hidden_channels, in_channels, 1),
        "enc": modules.init_wn(k_wn, hidden_channels, kernel_size,
                               dilation_rate, n_layers,
                               gin_channels=gin_channels),
        "proj": nn.init_conv(k_proj, out_channels * 2, hidden_channels, 1),
    }


def posterior_encoder(params, y: Array, y_mask: Array, noise: Array,
                      g: Optional[Array] = None
                      ) -> Tuple[Array, Array, Array]:
    """spec [B, T, C_spec] -> (z sample, m_q, logs_q).

    ``noise`` [B, T, C_out] is the reparameterisation sample (explicit for
    reproducibility; torch.randn_like in the reference, models.py:295).
    """
    out_channels = params["out_channels"]
    h = nn.apply_conv(params["pre"], y) * y_mask
    h = modules.wn(params["enc"], h, y_mask, g=g)
    stats = nn.apply_conv(params["proj"], h) * y_mask
    m, logs = stats[..., :out_channels], stats[..., out_channels:]
    z = (m + noise * jnp.exp(logs)) * y_mask
    return z, m, logs


def init_residual_coupling_block(rng, channels: int, hidden_channels: int,
                                 kernel_size: int, dilation_rate: int,
                                 n_layers: int, n_flows: int = 4,
                                 gin_channels: int = 0):
    flows = []
    for _ in range(n_flows):
        rng, key = jax.random.split(rng)
        flows.append(modules.init_residual_coupling_layer(
            key, channels, hidden_channels, kernel_size, dilation_rate,
            n_layers, gin_channels=gin_channels,
        ))
    return {"flows": flows}


def coupling_flow(params, x: Array, x_mask: Array,
                  g: Optional[Array] = None, reverse: bool = False) -> Array:
    """4x (affine coupling + channel flip); invertible (models.py:247-254)."""
    if not reverse:
        for layer in params["flows"]:
            x, _ = modules.residual_coupling_layer(layer, x, x_mask, g=g)
            x, _ = modules.flip_flow(x)
        return x
    fused = params.get("fused_rev")
    if fused is not None:
        from phoonnx_tpu.models.vits import fused_flow

        if fused_flow.usable(fused, x):
            return fused_flow.apply(fused, x, x_mask, g=g)
    for layer in reversed(params["flows"]):
        x = modules.flip_flow(x, reverse=True)
        x = modules.residual_coupling_layer(layer, x, x_mask, g=g,
                                            reverse=True)
    return x
