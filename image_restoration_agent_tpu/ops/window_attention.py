"""Windowed multi-head self-attention with relative position bias.

The shared spatial-attention block of SwinIR (network_swinir.py
WindowAttention:65-163, window_partition/reverse:33-64), HAT (HAB/OCAB) and
DehazeFormer. Rebuilt NHWC-first:

- window partition/reverse are pure reshapes/transposes that XLA folds into
  the surrounding ops (no layout thrash),
- attention runs batched over (B * num_windows) with heads as a leading axis
  so the (N, N) logits matmuls tile onto the MXU,
- the shifted-window attention mask is built at trace time from static shapes
  (numpy), becoming a program constant — the reference computes it per call
  on device (SwinTransformerBlock.calculate_mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B * nH * nW, ws, ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h // ws * w // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2*ws-1)^2 relative-position-bias table,
    same construction as the reference (network_swinir.py:87-99)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1]).astype(np.int32)


@functools.lru_cache(maxsize=256)
def shift_attention_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray | None:
    """Additive (-100/0) mask for shifted windows, (nW, N, N), or None if
    shift == 0. Built in numpy at trace time (static shapes)."""
    if shift == 0:
        return None
    img_mask = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    m = img_mask.reshape(h // ws, ws, w // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)  # (nW, N)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    rpb_table: jnp.ndarray,
    ws: int,
    mask: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Multi-head attention within windows.

    Args:
        qkv: ``(nWB, N, 3*C)`` packed projections, N = ws*ws, nWB = batch of
            windows. Packing order is torch qkv-Linear order (q | k | v).
        num_heads: heads; C = qkv.shape[-1] // 3 must divide evenly.
        rpb_table: ``((2*ws-1)^2, num_heads)`` relative position bias table.
        ws: window size.
        mask: optional ``(nW, N, N)`` additive mask (shifted windows); window
            batch must be a multiple of nW.
        scale: logit scale; defaults to head_dim ** -0.5.

    Returns:
        ``(nWB, N, C)`` attention output (pre output-projection).
    """
    nwb, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    scale = hd ** -0.5 if scale is None else scale

    qkv = qkv.reshape(nwb, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (nWB, heads, N, hd)

    attn = jnp.einsum("whnd,whmd->whnm", q * scale, k,
                      preferred_element_type=jnp.float32)

    idx = jnp.asarray(relative_position_index(ws).reshape(-1))
    bias = rpb_table[idx].reshape(n, n, num_heads).transpose(2, 0, 1)
    attn = attn + bias[None].astype(attn.dtype)

    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(nwb // nw, nw, num_heads, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(nwb, num_heads, n, n)

    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn, v.astype(attn.dtype),
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
    return out.astype(qkv.dtype)
