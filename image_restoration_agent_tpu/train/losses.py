"""Restoration training losses."""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     eps: float = 1e-3) -> jnp.ndarray:
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


def psnr_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Negative PSNR (NAFNet's training objective)."""
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
