"""Modulated deformable convolution v2 (DCNv2) for TPU.

The reference's only in-tree native code is an im2col CUDA extension for
DCNv2 (RIDCP_dehazing/basicsr/ops/dcn/src/*.cu, SURVEY.md §2.5b), consumed
by RIDCP's WarpBlock feature alignment. TPU-native rebuild: for each of the
K*K kernel taps, sample the input at (base grid + tap offset + learned
offset) with bilinear interpolation (a vectorized 4-corner gather), scale by
the modulation mask, and fold the K*K sampled planes into ONE matmul with
the (K*K*Cin, Cout) weight — i.e. im2col becomes gather + a single
MXU-friendly contraction instead of a custom kernel.

Offsets/masks follow torchvision/mmcv DCNv2 layout: offset (B, H, W,
2*G*K*K) ordered (g, k, [dy, dx]); mask (B, H, W, G*K*K); deformable groups
G split the input channels, each group using its own offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample img (B, H, W, C) at float coords ys/xs (B, H, W) with zero
    padding outside (matches the CUDA im2col border behavior)."""
    b, h, w, c = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = img.reshape(b, h * w, c)

    def corner(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1).reshape(b, *yi.shape[1:], c)
        return vals * valid[..., None]

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def modulated_deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    kernel: int = 3,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """DCNv2 forward, stride 1, padding (kernel-1)//2, dilation 1.

    Args:
        x: (B, H, W, Cin).
        offset: (B, H, W, 2*G*K*K), ordered (g, tap, [dy, dx]).
        mask: (B, H, W, G*K*K) in [0, 1] (already sigmoided).
        weight: (K, K, Cin, Cout) — torch (Cout, Cin, K, K) transposed like
            every conv in convert/torch_import.py.
        bias: (Cout,) or None.

    Returns:
        (B, H, W, Cout).
    """
    b, h, w, cin = x.shape
    k = kernel
    g = deformable_groups
    cg = cin // g
    pad = (k - 1) // 2

    base_y = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    base_x = jnp.arange(w, dtype=jnp.float32)[None, None, :]

    offset = offset.reshape(b, h, w, g, k * k, 2)
    mask = mask.reshape(b, h, w, g, k * k)
    xg = x.reshape(b, h, w, g, cg)

    cols = []
    for tap in range(k * k):
        ky, kx = tap // k, tap % k
        planes = []
        for gi in range(g):
            dy = offset[:, :, :, gi, tap, 0]
            dx = offset[:, :, :, gi, tap, 1]
            ys = base_y + (ky - pad) + dy
            xs = base_x + (kx - pad) + dx
            sampled = _bilinear_gather(xg[:, :, :, gi], ys, xs)
            planes.append(sampled * mask[:, :, :, gi, tap][..., None])
        cols.append(jnp.concatenate(planes, axis=-1))  # (B,H,W,Cin)

    col = jnp.concatenate(cols, axis=-1)  # (B, H, W, K*K*Cin), tap-major
    wmat = weight.transpose(0, 1, 2, 3).reshape(k * k * cin,
                                                weight.shape[-1])
    out = jnp.einsum("bhwi,io->bhwo", col, wmat,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
