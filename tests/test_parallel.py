"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from image_restoration_agent_tpu.core.tiling import tiled_apply
from image_restoration_agent_tpu.models import build_model
from image_restoration_agent_tpu.parallel import (
    make_mesh, make_sharded_train_step, make_train_state, tiled_apply_sharded,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


class TestMesh:
    def test_make_mesh_shapes(self, eight_devices):
        mesh = make_mesh({"data": 2, "tile": 4})
        assert mesh.shape == {"data": 2, "tile": 4}

    def test_too_many_devices_raises(self, eight_devices):
        with pytest.raises(ValueError):
            make_mesh({"tile": 1024})


class TestTileParallel:
    def test_sharded_matches_single_device(self, eight_devices, rng):
        """Sharded overlap-blend must equal the single-chip result."""
        img = jnp.asarray(rng.random((96, 80, 3), dtype=np.float32))

        def fn(batch):  # cheap deterministic "model"
            return batch * 0.5 + 0.25

        want = tiled_apply(fn, img, tile=32, overlap=8, batch=64,
                           pad_multiple=8)
        mesh = make_mesh({"tile": 8})
        got = tiled_apply_sharded(fn, img, mesh, axis="tile", tile=32,
                                  overlap=8, pad_multiple=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_sharded_with_scale_and_ragged_tiles(self, eight_devices, rng):
        """Tile count not divisible by device count; x2 scale."""
        img = jnp.asarray(rng.random((72, 72, 3), dtype=np.float32))

        def fn(batch):
            return jnp.repeat(jnp.repeat(batch, 2, 1), 2, 2)

        mesh = make_mesh({"tile": 8})
        got = tiled_apply_sharded(fn, img, mesh, axis="tile", tile=32,
                                  overlap=8, scale=2, pad_multiple=8)
        want = np.repeat(np.repeat(np.asarray(img), 2, 0), 2, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestShardedTraining:
    @pytest.mark.slow
    def test_nafnet_train_step_runs_and_descends(self, eight_devices):
        mesh = make_mesh({"data": 2, "model": 4})
        model = build_model("nafnet_small", width=8,
                            enc_blk_nums=(1,), dec_blk_nums=(1,))
        tx = optax.adam(1e-3)
        lq = jnp.ones((4, 16, 16, 3)) * 0.3
        hq = jnp.ones((4, 16, 16, 3)) * 0.5
        state = make_train_state(model, jax.random.PRNGKey(0), lq[:1], tx)
        step, shard_state, shard_batch = make_sharded_train_step(
            model, tx, mesh)
        state = shard_state(state)
        lq, hq = shard_batch(lq), shard_batch(hq)
        losses = []
        for _ in range(3):
            state, loss = step(state, lq, hq)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert int(jax.device_get(state.step)) == 3

    def test_params_actually_sharded(self, eight_devices):
        mesh = make_mesh({"data": 2, "model": 4})
        model = build_model("nafnet_small", width=8,
                            enc_blk_nums=(1,), dec_blk_nums=(1,))
        tx = optax.adam(1e-3)
        sample = jnp.zeros((1, 16, 16, 3))
        state = make_train_state(model, jax.random.PRNGKey(0), sample, tx)
        _, shard_state, _ = make_sharded_train_step(model, tx, mesh)
        state = shard_state(state)
        # at least one param leaf must be sharded over 'model'
        leaves = jax.tree.leaves(state.params)
        assert any(
            "model" in str(l.sharding.spec) for l in leaves if l.ndim > 0)
