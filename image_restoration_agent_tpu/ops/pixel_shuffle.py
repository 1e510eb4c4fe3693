"""Pixel shuffle / unshuffle in NHWC with torch channel-ordering semantics.

torch.nn.PixelShuffle(r) on NCHW maps channel c*r*r+i*r+j to spatial offset
(i, j) of channel c. Weight converters in this repo keep torch channel order,
so the NHWC shuffle here must reproduce that exact ordering (used by SwinIR/
HAT/X-Restormer Upsample, Restormer Down/Upsample, NAFNet ups).
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(..., H, W, C*r*r) -> (..., H*r, W*r, C), torch ordering."""
    *b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(*b, h, w, c, r, r)              # split channel as (c, i, j)
    x = jnp.moveaxis(x, (-3, -2, -1), (-1, -4, -2))   # -> (..., h, i, w, j, c)
    return x.reshape(*b, h * r, w * r, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(..., H*r, W*r, C) -> (..., H, W, C*r*r), torch ordering."""
    *b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(*b, h, r, w, r, c)
    x = jnp.moveaxis(x, (-4, -2, -1), (-2, -1, -3))   # -> (..., h, w, c, i, j)
    return x.reshape(*b, h, w, c * r * r)
