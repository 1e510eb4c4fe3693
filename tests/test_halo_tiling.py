"""Halo-exchange tile parallelism: must match single-chip blending exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.core.tiling import tiled_apply
from image_restoration_agent_tpu.parallel import make_mesh
from image_restoration_agent_tpu.parallel.halo_tiling import (
    halo_pad_height, tiled_apply_halo)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh({"tile": 8})


class TestHaloPad:
    def test_pad_height_constraints(self):
        h = halo_pad_height(100, 32, 24, 4)
        assert h >= 100
        assert (h - 32) % 24 == 0
        assert (((h - 32) // 24) + 1) % 4 == 0

    def test_exact_fit_unchanged(self):
        # rows=8, stride 24, tile 32 -> h = 7*24+32 = 200
        assert halo_pad_height(200, 32, 24, 8) == 200


class TestHaloTiling:
    def test_matches_single_chip(self, mesh8, rng):
        tile, overlap = 32, 8
        stride = tile - overlap
        h = halo_pad_height(150, tile, stride, 8)
        w = 80
        img = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))

        def fn(batch):
            return batch * 0.5 + 0.25

        want = tiled_apply(fn, img, tile=tile, overlap=overlap, batch=64,
                           pad_multiple=1)
        got = tiled_apply_halo(fn, img, mesh8, axis="tile", tile=tile,
                               overlap=overlap)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_matches_with_scale(self, mesh8, rng):
        tile, overlap = 32, 8
        stride = tile - overlap
        h = halo_pad_height(120, tile, stride, 8)
        img = jnp.asarray(rng.random((h, 72, 3), dtype=np.float32))

        def fn(batch):  # nearest 2x
            return jnp.repeat(jnp.repeat(batch, 2, 1), 2, 2)

        want = tiled_apply(fn, img, tile=tile, overlap=overlap, scale=2,
                           batch=64, pad_multiple=1)
        got = tiled_apply_halo(fn, img, mesh8, axis="tile", tile=tile,
                               overlap=overlap, scale=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_jittable_under_mesh(self, mesh8, rng):
        tile, overlap = 32, 8
        h = halo_pad_height(100, tile, tile - overlap, 8)
        img = jnp.asarray(rng.random((h, 64, 3), dtype=np.float32))

        f = jax.jit(lambda im: tiled_apply_halo(
            lambda b: b + 1.0, im, mesh8, tile=tile, overlap=overlap))
        out = f(img)
        np.testing.assert_allclose(np.asarray(out)[: h],
                                   np.asarray(img) + 1.0, atol=1e-5)
