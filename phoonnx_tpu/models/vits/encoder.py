"""VITS text encoder (reference: phoonnx_train/vits/models.py:168-209)."""

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from phoonnx_tpu.models.vits import attention, nn

from phoonnx_tpu.models.vits.statics import StaticInt

Array = jax.Array


def init_text_encoder(rng, n_vocab: int, out_channels: int,
                      hidden_channels: int, filter_channels: int,
                      n_heads: int, n_layers: int, kernel_size: int):
    rng, k_emb, k_enc, k_proj = jax.random.split(rng, 4)
    emb = hidden_channels ** -0.5 * jax.random.normal(
        k_emb, (n_vocab, hidden_channels), dtype=jnp.float32
    )
    return {
        "hidden_channels": StaticInt(hidden_channels),
        "out_channels": StaticInt(out_channels),
        "emb": {"weight": emb},
        "encoder": attention.init_encoder(
            k_enc, hidden_channels, filter_channels, n_heads, n_layers,
            kernel_size,
        ),
        "proj": nn.init_conv(k_proj, out_channels * 2, hidden_channels, 1),
    }


def text_encoder(params, x_ids: Array, x_mask: Array, p_dropout: float = 0.0,
                 rng=None, deterministic=True
                 ) -> Tuple[Array, Array, Array]:
    """ids [B, T], mask [B, T, 1] -> (hidden x, prior mean m, prior logs)."""
    hidden = params["hidden_channels"]
    out_channels = params["out_channels"]

    x = nn.embedding(params["emb"], x_ids) * math.sqrt(hidden)  # [B, T, H]
    x = attention.encoder(params["encoder"], x * x_mask, x_mask,
                          p_dropout=p_dropout, rng=rng,
                          deterministic=deterministic)
    stats = nn.apply_conv(params["proj"], x) * x_mask
    m, logs = stats[..., :out_channels], stats[..., out_channels:]
    return x, m, logs
