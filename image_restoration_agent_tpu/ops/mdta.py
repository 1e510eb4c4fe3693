"""MDTA — Multi-DConv-Head Transposed Self-Attention (Restormer/X-Restormer).

Reference math (restormer_arch.py Attention.forward): q/k/v are reshaped to
(B, heads, C_h, HW), L2-normalized along HW, then a *channel-by-channel*
attention matrix ``softmax(q @ k^T * temperature)`` of shape (C_h, C_h) mixes
value channels. The heavy ops are the two (C_h, HW) x (HW, C_h) contractions
— large-K matmuls that map directly onto the MXU; the attention matrix itself
is tiny. Softmax and normalization accumulate in float32.

Layout note: we keep NHWC and contract over the flattened spatial axis, so no
transposes materialize — XLA folds the reshape into the dot_general.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mdta_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Transposed channel attention.

    Args:
        q, k, v: ``(B, H, W, C)`` tensors (after the 1x1 + depthwise 3x3 convs).
        temperature: ``(num_heads,)`` or ``(num_heads, 1, 1)`` learned scale.
        num_heads: head count; C must divide evenly.

    Returns:
        ``(B, H, W, C)``.
    """
    b, h, w, c = q.shape
    ch = c // num_heads
    hw = h * w

    def split(x):
        # (B, HW, heads, C_h) -> (B, heads, C_h, HW)
        return x.reshape(b, hw, num_heads, ch).transpose(0, 2, 3, 1)

    qh, kh, vh = split(q), split(k), split(v)

    # L2 normalize along the spatial axis (torch F.normalize: eps=1e-12 floor).
    def l2norm(x):
        xf = x.astype(jnp.float32)
        n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        return xf / jnp.maximum(n, 1e-12)

    qn, kn = l2norm(qh), l2norm(kh)
    temp = temperature.reshape(1, num_heads, 1, 1).astype(jnp.float32)

    # (B, heads, C_h, C_h) — the big-K contraction over HW.
    attn = jnp.einsum("bhcn,bhdn->bhcd", qn, kn,
                      preferred_element_type=jnp.float32) * temp
    attn = jax.nn.softmax(attn, axis=-1)

    out = jnp.einsum("bhcd,bhdn->bhcn", attn, vh.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
    return out.astype(q.dtype)
