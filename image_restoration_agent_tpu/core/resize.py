"""Separable bicubic resize as two dense matmuls (MXU-friendly).

Covers both resize conventions the reference relies on:

- MATLAB ``imresize`` semantics (cubic a=-0.5, antialiasing on downscale) used
  by the degradation synthesizer (AgenticIR/dataset/add_single_degradation.py
  ``lr`` via basicsr matlab_functions.imresize) and by the scorer's x4
  alignment (AgenticIR/utils/scorer.py:56-62).
- torch ``F.interpolate(mode="bicubic", align_corners=False)`` semantics
  (cubic a=-0.75, no antialias) used by NAFNet's input upscale
  (NAFNet_arch.py forward).

Interpolation weights depend only on static shapes, so they are built once in
numpy and folded into the program as constants; the resize itself is two
matmuls (out = W_h @ img @ W_w^T), which XLA maps straight onto the MXU —
no gather/scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    f = ((a + 2) * ax3 - (a + 3) * ax2 + 1) * (ax <= 1)
    f = f + (a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a) * ((1 < ax) & (ax <= 2))
    return f


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int, out_size: int, a: float, antialias: bool, matlab: bool
) -> np.ndarray:
    """Dense (out_size, in_size) row-stochastic interpolation matrix."""
    scale = out_size / in_size
    kernel_width = 4.0
    if antialias and scale < 1.0:
        kernel_width /= scale

    # Output sample centers in input coordinates (identical formula for
    # MATLAB and torch align_corners=False).
    x_out = np.arange(out_size, dtype=np.float64)
    u = (x_out + 0.5) / scale - 0.5

    left = np.floor(u - kernel_width / 2).astype(np.int64)
    p = int(np.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(p)[None, :]  # (out, p)
    dist = u[:, None] - idx
    if antialias and scale < 1.0:
        w = scale * _cubic(dist * scale, a)
    else:
        w = _cubic(dist, a)
    # Edge handling: clamp indices (replicate border), matching both MATLAB's
    # symmetric fold for the near-edge taps and torch's clamping closely
    # enough for 4-tap cubics (MATLAB actually reflects; for the tap radius
    # used here reflection == clamp only for the first sample, so reflect
    # explicitly when matlab=True).
    if matlab:
        n = in_size
        aux = np.concatenate([np.arange(n), np.arange(n - 1, -1, -1)])
        idx_c = aux[np.mod(idx, 2 * n)]
    else:
        idx_c = np.clip(idx, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for r in range(out_size):
        np.add.at(mat[r], idx_c[r], w[r])
    mat /= mat.sum(axis=1, keepdims=True)
    return mat.astype(np.float32)


def _apply_separable(img: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    mh_j = jnp.asarray(mh)
    mw_j = jnp.asarray(mw)
    # (..., H, W, C): contract H then W. HIGHEST precision: on TPU the MXU
    # defaults to bf16 inputs, which costs ~3e-4 absolute error — visible in
    # image resample quality — while these matmuls are a negligible fraction
    # of total FLOPs.
    prec = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,...hwc->...owc", mh_j, img, precision=prec)
    out = jnp.einsum("pw,...hwc->...hpc", mw_j, out, precision=prec)
    return out


def resize_matlab(img: jnp.ndarray, scale: float | None = None,
                  out_shape: tuple[int, int] | None = None) -> jnp.ndarray:
    """MATLAB-imresize-compatible bicubic resize of ``(..., H, W, C)``."""
    h, w = img.shape[-3], img.shape[-2]
    if out_shape is None:
        assert scale is not None
        out_shape = (int(np.ceil(h * scale)), int(np.ceil(w * scale)))
    mh = _resize_matrix(h, out_shape[0], -0.5, True, True)
    mw = _resize_matrix(w, out_shape[1], -0.5, True, True)
    return _apply_separable(img, mh, mw)


def resize_bicubic_torch(img: jnp.ndarray, scale: float) -> jnp.ndarray:
    """torch F.interpolate(bicubic, align_corners=False) compatible resize."""
    h, w = img.shape[-3], img.shape[-2]
    out_shape = (int(h * scale), int(w * scale))
    mh = _resize_matrix(h, out_shape[0], -0.75, False, False)
    mw = _resize_matrix(w, out_shape[1], -0.75, False, False)
    return _apply_separable(img, mh, mw)
