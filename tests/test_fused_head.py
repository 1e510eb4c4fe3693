"""fused_pixelshuffle_head == the sequential conv/shuffle chain, exactly.

The composed plane-space conv is interior-exact by construction; the border
ring is recomputed sequentially and pasted, so the whole output must match
the naive chain to float tolerance — including every border pixel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.models.common import (conv3x3_xla,
                                                       fused_pixelshuffle_head)
from image_restoration_agent_tpu.ops.conv3x3 import (
    compose_conv_weights, conv_after_shuffle_weights)
from image_restoration_agent_tpu.ops.pixel_shuffle import pixel_shuffle


def _naive_head(x, stages, wl, bl, rs):
    for (w, b), r in zip(stages, rs):
        x = pixel_shuffle(conv3x3_xla(x, w, b), r)
    return conv3x3_xla(x, wl, bl)


def _rand_head(key, cin, cf, cout, rs):
    ks = jax.random.split(key, 2 * len(rs) + 2)
    stages = []
    c = cin
    for i, r in enumerate(rs):
        w = jax.random.normal(ks[2 * i], (3, 3, c, cf * r * r)) * 0.1
        b = jax.random.normal(ks[2 * i + 1], (cf * r * r,)) * 0.1
        stages.append((w, b))
        c = cf
    wl = jax.random.normal(ks[-2], (3, 3, cf, cout)) * 0.1
    bl = jax.random.normal(ks[-1], (cout,)) * 0.1
    return stages, wl, bl


@pytest.mark.parametrize("rs", [[2, 2], [2], [3]])
def test_fused_head_matches_sequential(rs):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 40, 6))
    stages, wl, bl = _rand_head(key, 6, 8, 3, rs)

    def seq(z):
        return _naive_head(z, stages, wl, bl, rs)

    got = fused_pixelshuffle_head(x, stages, wl, bl, rs, seq)
    want = seq(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_head_tiny_input_falls_back():
    rs = [2, 2]
    stages, wl, bl = _rand_head(jax.random.PRNGKey(2), 6, 8, 3, rs)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 10, 10, 6))

    def seq(z):
        return _naive_head(z, stages, wl, bl, rs)

    got = fused_pixelshuffle_head(x, stages, wl, bl, rs, seq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(seq(x)),
                               atol=2e-5, rtol=1e-4)


def test_compose_conv_weights_interior():
    k = jax.random.PRNGKey(4)
    wa = jax.random.normal(k, (3, 3, 4, 5)) * 0.2
    ba = jax.random.normal(k, (5,)) * 0.2
    wb = jax.random.normal(k, (3, 3, 5, 2)) * 0.2
    bb = jax.random.normal(k, (2,)) * 0.2
    w, b = compose_conv_weights(wa, ba, wb, bb)
    assert w.shape == (5, 5, 4, 2)
    x = jax.random.normal(k, (1, 16, 16, 4))
    seq = conv3x3_xla(conv3x3_xla(x, wa, ba), wb, bb)
    one = conv3x3_xla(x, w, b)
    # exact in the interior (2-px ring excluded)
    np.testing.assert_allclose(np.asarray(one)[:, 2:-2, 2:-2],
                               np.asarray(seq)[:, 2:-2, 2:-2],
                               atol=2e-5, rtol=1e-4)


def test_cas_general_k5():
    """conv_after_shuffle_weights identity for a 5x5 kernel."""
    k = jax.random.PRNGKey(5)
    w = jax.random.normal(k, (5, 5, 4, 3)) * 0.2
    x = jax.random.normal(k, (1, 8, 8, 16))
    want = jax.lax.conv_general_dilated(
        pixel_shuffle(x, 2), w, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    wp = conv_after_shuffle_weights(w, 2)
    assert wp.shape == (3, 3, 16, 12)
    got = pixel_shuffle(jax.lax.conv_general_dilated(
        x, wp, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_head_packed_matches_unpacked():
    rs = [2, 2]
    stages, wl, bl = _rand_head(jax.random.PRNGKey(6), 6, 8, 3, rs)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 24, 40, 6))

    def seq(z):
        return _naive_head(z, stages, wl, bl, rs)

    unpacked = fused_pixelshuffle_head(x, stages, wl, bl, rs, seq)
    packed = fused_pixelshuffle_head(x, stages, wl, bl, rs, seq,
                                     packed=True)
    assert packed.shape == (1, 96, 160 * 3)
    np.testing.assert_allclose(np.asarray(packed).reshape(1, 96, 160, 3),
                               np.asarray(unpacked), atol=2e-5, rtol=1e-4)


def test_tiled_apply_packed_band_mode():
    """packed_c=3 band blending == the unpacked path, byte-for-byte after
    the (free) host reshape."""
    from image_restoration_agent_tpu.core.tiling import tiled_apply

    rs = [2]
    stages, wl, bl = _rand_head(jax.random.PRNGKey(8), 3, 8, 3, rs)
    scale = 2

    def head(z, packed):
        def seq(v):
            return _naive_head(v, stages, wl, bl, rs)
        return fused_pixelshuffle_head(z, stages, wl, bl, rs, seq,
                                       packed=packed)

    img = jax.random.normal(jax.random.PRNGKey(9), (50, 64, 3))
    want = tiled_apply(lambda b: head(b, False), img, tile=(24, 64),
                       overlap=8, scale=scale, batch=1, pad_multiple=8)
    got = tiled_apply(lambda b: head(b, True), img, tile=(24, 64),
                      overlap=8, scale=scale, batch=1, pad_multiple=8,
                      packed_c=3)
    assert got.shape == (50 * scale, 64 * scale * 3)
    np.testing.assert_allclose(
        np.asarray(got).reshape(50 * scale, 64 * scale, 3),
        np.asarray(want), atol=2e-5, rtol=1e-4)
