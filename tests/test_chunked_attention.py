"""chunked_attention == dense attention (it replaces the dense path in the
DiffBIR VAE mid-block and UNet self-attention at big canvases, where the
(N, M) score matrix would exceed HBM — 16 GB at a 2048px canvas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.ops.chunked_attention import (
    _largest_divisor_leq, chunked_attention)


def _dense(q, k, v, scale):
    lg = jnp.einsum("...nd,...md->...nm", q, k,
                    preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(lg, axis=-1)
    out = jnp.einsum("...nm,...md->...nd", p, v.astype(p.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@pytest.mark.parametrize("shape,chunk", [
    ((1, 96, 16), 32),     # (B, N, D) single-head, N % chunk == 0
    ((1, 100, 16), 32),    # N not divisible by the target chunk
    ((2, 3, 64, 8), 16),   # (B, H, N, D) multi-head
])
def test_chunked_matches_dense(shape, chunk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = shape[-1] ** -0.5
    got = chunked_attention(q, k, v, scale, chunk=chunk)
    want = _dense(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_cross_attention_rectangular():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 48, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 20, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 20, 8)), jnp.float32)
    got = chunked_attention(q, k, v, 8 ** -0.5, chunk=16)
    want = _dense(q, k, v, 8 ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_divisor_pick():
    assert _largest_divisor_leq(16384, 2048) == 2048
    assert _largest_divisor_leq(100, 32) == 25
    assert _largest_divisor_leq(7, 32) == 7


def test_jit_under_scan():
    """The DiffBIR sampler runs attention inside nn.scan/lax.scan — make
    sure the lax.map body traces under jit."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 64, 8)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((1, 64, 8)), jnp.float32)

    @jax.jit
    def run(q, kv):
        def body(carry, _):
            out = chunked_attention(carry, kv, kv, 8 ** -0.5, chunk=16)
            return out, None
        y, _ = jax.lax.scan(body, q, None, length=3)
        return y

    out = run(q, kv)
    assert out.shape == q.shape and bool(jnp.isfinite(out).all())
