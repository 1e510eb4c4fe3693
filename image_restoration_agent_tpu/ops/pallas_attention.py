"""Fused Pallas TPU kernel for windowed multi-head self-attention.

Why: the XLA path materializes (nWB, heads, N, head_dim) tensors whose minor
dim (head_dim = 30 for SwinIR-M) pads to 128 lanes — every intermediate
(qkv split, logits, softmax, AV) becomes a 4x-bloated HBM round-trip;
measured cost ~17 ms per SwinIR-M block vs ~1 ms roofline. This kernel keeps
a block of windows VMEM-resident: per window it runs the per-head QK^T and
AV dots on the MXU, adds relative-position bias (+ shifted-window mask),
does an f32 softmax in registers, and writes only the final (N, C) output
to HBM. HBM traffic = qkv in + out once.

Layout contract: qkv is (nWB, N, 3C) with C in lanes, packed [q | k | v]
like a torch qkv Linear (window batch ordered image-major then row-major, so
window w's mask group is w mod nW). Relative-position bias is (heads, N, N)
f32; the shifted-window mask is (nW, N, N) f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_rows(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _kernel_nomask(qkv_ref, rpb_ref, out_ref, *, num_heads, head_dim, g,
                   scale):
    c = num_heads * head_dim
    for w in range(g):
        qkv = qkv_ref[w]
        for h in range(num_heads):
            lo = h * head_dim
            q = qkv[:, lo: lo + head_dim]
            k = qkv[:, c + lo: c + lo + head_dim]
            v = qkv[:, 2 * c + lo: 2 * c + lo + head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            p = _softmax_rows(logits + rpb_ref[h])
            out = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[w, :, lo: lo + head_dim] = out.astype(out_ref.dtype)


def _kernel_masked(qkv_ref, rpb_ref, mask_ref, out_ref, *, num_heads,
                   head_dim, g, scale):
    c = num_heads * head_dim
    for w in range(g):
        qkv = qkv_ref[w]
        for h in range(num_heads):
            lo = h * head_dim
            q = qkv[:, lo: lo + head_dim]
            k = qkv[:, c + lo: c + lo + head_dim]
            v = qkv[:, 2 * c + lo: 2 * c + lo + head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            p = _softmax_rows(logits + rpb_ref[h] + mask_ref[w])
            out = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[w, :, lo: lo + head_dim] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "g", "interpret"))
def wmsa_pallas(qkv: jnp.ndarray, rpb: jnp.ndarray,
                mask: jnp.ndarray | None = None, num_heads: int = 6,
                g: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Fused window MHSA.

    Args:
        qkv: (nWB, N, 3C) packed projections.
        rpb: (heads, N, N) f32 relative-position bias (pre-gathered).
        mask: optional (nW, N, N) f32 additive shift mask; nWB % nW == 0 and
            window w uses mask[w % nW].
        num_heads: head count.
        g: windows per kernel program (must divide nWB, and nW when masked).

    Returns:
        (nWB, N, C).
    """
    nwb, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    assert nwb % g == 0, (nwb, g)
    scale = hd ** -0.5

    common = dict(num_heads=num_heads, head_dim=hd, g=g, scale=scale)
    out_shape = jax.ShapeDtypeStruct((nwb, n, c), qkv.dtype)
    qkv_spec = pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    rpb_spec = pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    if mask is None:
        return pl.pallas_call(
            functools.partial(_kernel_nomask, **common),
            grid=(nwb // g,),
            in_specs=[qkv_spec, rpb_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qkv, rpb.astype(jnp.float32))

    nw = mask.shape[0]
    assert nwb % nw == 0 and nw % g == 0, (nwb, nw, g)
    mask_spec = pl.BlockSpec((g, n, n), lambda i: (i % (nw // g), 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_masked, **common),
        grid=(nwb // g,),
        in_specs=[qkv_spec, rpb_spec, mask_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(qkv, rpb.astype(jnp.float32), mask.astype(jnp.float32))
