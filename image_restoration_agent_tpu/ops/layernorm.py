"""LayerNorm variants used across the restoration zoo (NHWC layout).

Three distinct normalizations appear in the reference zoo and they are NOT
interchangeable (parity to <=0.1 dB requires matching each exactly):

- ``layer_norm_2d``: NAFNet's LayerNorm2d — per-pixel channel statistics,
  biased variance, eps **inside** sqrt, learned scale+bias
  (X-Restormer/xrestormer/archs/NAFNet_arch.py LayerNormFunction).
- ``layer_norm_with_bias``: Restormer WithBias_LayerNorm — same math, eps=1e-5
  (restormer_arch.py WithBias_LayerNorm).
- ``layer_norm_bias_free``: Restormer BiasFree_LayerNorm — variance is central
  but the mean is *not* subtracted from x (restormer_arch.py
  BiasFree_LayerNorm: ``x / sqrt(var+eps) * w``).

All operate on the channel (last) axis of NHWC tensors and compute statistics
in float32 regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def _moments(x: jnp.ndarray):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return xf, mu, var


def layer_norm_2d(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                  eps: float = 1e-6) -> jnp.ndarray:
    """NAFNet LayerNorm2d over the channel axis of (..., C)."""
    xf, mu, var = _moments(x)
    y = (xf - mu) / jnp.sqrt(var + eps)
    return (y * weight + bias).astype(x.dtype)


def layer_norm_with_bias(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Restormer WithBias LayerNorm."""
    xf, mu, var = _moments(x)
    y = (xf - mu) / jnp.sqrt(var + eps)
    return (y * weight + bias).astype(x.dtype)


def layer_norm_bias_free(x: jnp.ndarray, weight: jnp.ndarray,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Restormer BiasFree LayerNorm: divides by std but keeps the mean."""
    xf, _, var = _moments(x)
    y = xf / jnp.sqrt(var + eps)
    return (y * weight).astype(x.dtype)
