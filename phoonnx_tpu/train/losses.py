"""VITS training losses (reference: phoonnx_train/vits/losses.py)."""

from typing import List, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def feature_loss(fmap_r: List[List[Array]],
                 fmap_g: List[List[Array]]) -> Array:
    """L1 feature matching over all discriminator activations, x2."""
    loss = 0.0
    for disc_r, disc_g in zip(fmap_r, fmap_g):
        for feat_r, feat_g in zip(disc_r, disc_g):
            loss += jnp.mean(
                jnp.abs(jax.lax.stop_gradient(feat_r) - feat_g)
            )
    return loss * 2.0


def discriminator_loss(real_outputs: List[Array],
                       generated_outputs: List[Array]
                       ) -> Tuple[Array, List[Array], List[Array]]:
    """LSGAN discriminator loss: (1-D(y))^2 + D(y_hat)^2."""
    loss = 0.0
    r_losses, g_losses = [], []
    for real, generated in zip(real_outputs, generated_outputs):
        r_loss = jnp.mean(jnp.square(1.0 - real))
        g_loss = jnp.mean(jnp.square(generated))
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(generated_outputs: List[Array]
                   ) -> Tuple[Array, List[Array]]:
    """LSGAN generator loss: (1-D(y_hat))^2."""
    loss = 0.0
    gen_losses = []
    for generated in generated_outputs:
        g_loss = jnp.mean(jnp.square(1.0 - generated))
        gen_losses.append(g_loss)
        loss += g_loss
    return loss, gen_losses


def kl_loss(z_p: Array, logs_q: Array, m_p: Array, logs_p: Array,
            z_mask: Array) -> Array:
    """Masked KL(q||p) between posterior sample and aligned prior.

    All tensors [B, T, C] except z_mask [B, T, 1] (losses.py:43-58).
    """
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * jnp.square(z_p - m_p) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
