"""Memory-bounded dense attention: scan over query chunks.

Softmax(QK^T)V without materializing the (N, M) score matrix — the peak
temp is (chunk, M). Used by the DiffBIR VAE mid-block and UNet
self-attention, whose token counts grow with canvas area: the reference
runs these whole-image (AgenticIR/executor/super_resolution/__init__.py
passes --sr_scale 4 with no --tiled; DiffBIR relies on xformers
memory-efficient attention for the same reason), and at a 1024px canvas
the 128x128 latent gives N = 16384 tokens — a dense (N, N) f32 score
matrix per head is 1 GB, and 16 GB at a 2048px canvas, which exceeds
single-chip HBM. Chunked scores keep the same FLOPs on MXU-friendly
(chunk, M) dots with peak memory ~chunk * M.

No online/streaming softmax is needed (each chunk sees all of K), so the
result is bit-identical to the dense path in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _largest_divisor_leq(n: int, cap: int) -> int:
    for c in range(min(n, cap), 0, -1):
        if n % c == 0:
            return c
    return n


def chunked_attention(q, k, v, scale: float, chunk: int = 2048):
    """softmax(q @ k^T * scale) @ v over the second-to-last axis of q.

    Args:
        q: (..., N, D); k: (..., M, D); v: (..., M, Dv).
        scale: logit scale (e.g. D ** -0.5).
        chunk: target query-chunk size; rounded down to a divisor of N.

    Returns:
        (..., N, Dv) in v.dtype's promotion with f32 softmax math,
        cast back to q.dtype.
    """
    n = q.shape[-2]
    c = _largest_divisor_leq(n, chunk)
    lead = q.shape[:-2]
    qc = q.reshape(*lead, n // c, c, q.shape[-1])
    # move the chunk axis to the front for lax.map
    qc = jnp.moveaxis(qc, -3, 0)

    def one(qi):
        lg = jnp.einsum("...nd,...md->...nm", qi, k,
                        preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(lg, axis=-1)
        return jnp.einsum("...nm,...md->...nd", p, v.astype(p.dtype),
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(one, qc)
    out = jnp.moveaxis(out, 0, -3).reshape(*lead, n, v.shape[-1])
    return out.astype(q.dtype)


# Below this many score-matrix entries the dense einsum path is kept:
# XLA fuses scale+bias+softmax well at small N*M and lax.map adds loop
# overhead that only pays off once the score matrix stops fitting caches.
DENSE_SCORE_LIMIT = 32 * 1024 * 1024
