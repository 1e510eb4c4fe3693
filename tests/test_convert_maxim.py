"""MAXIM conversion parity vs the reference (vendored upstream Flax) model.

The reference implementation is itself JAX/Flax (SURVEY.md §2.4), so parity
is checked by importing it directly and comparing full forward passes through
converted weights — no torch re-modeling risk.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_MAXIM_DIR = "/root/reference/AgenticIR/executor/dehazing/tools/maxim"


def _load_ref_maxim():
    if REF_MAXIM_DIR not in sys.path:
        sys.path.insert(0, REF_MAXIM_DIR)
    try:
        from maxim.models import maxim as ref_maxim  # noqa: PLC0415
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference MAXIM unavailable: {e}")
    return ref_maxim


CFG = dict(features=8, depth=2, num_stages=2, num_groups=2,
           num_supervision_scales=1, high_res_stages=1,
           num_bottleneck_blocks=2)
SIZES = dict(block_size_hr=(8, 8), block_size_lr=(4, 4),
             grid_size_hr=(4, 4))


@pytest.mark.slow
class TestMaximConversion:
    def _build_pair(self):
        ref_maxim = _load_ref_maxim()
        from image_restoration_agent_tpu.models.maxim import MAXIM

        ref = ref_maxim.MAXIM(
            **CFG, **SIZES, grid_size_lr=(4, 4), use_bias=True,
            use_global_mlp=True, use_cross_gating=True, num_outputs=3,
            dropout_rate=0.0)
        mine = MAXIM(**CFG, **SIZES)
        return ref, mine

    def test_converted_forward_matches(self, rng):
        from image_restoration_agent_tpu.convert.maxim_rules import (
            convert_maxim)

        ref, mine = self._build_pair()
        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        ref_vars = ref.init(jax.random.PRNGKey(7), x, train=False)
        want = np.asarray(ref.apply(ref_vars, x, train=False)[-1][-1])

        my_params = convert_maxim(
            jax.tree.map(np.asarray, ref_vars["params"]),
            num_stages=CFG["num_stages"], depth=CFG["depth"],
            num_groups=CFG["num_groups"],
            num_bottleneck_blocks=CFG["num_bottleneck_blocks"],
            num_supervision_scales=CFG["num_supervision_scales"])
        got = np.asarray(mine.apply(my_params, x))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_map_is_bijective_and_complete(self, rng):
        """Every reference leaf maps; the converted tree initializes my
        model exactly (same structure and shapes)."""
        from image_restoration_agent_tpu.convert.maxim_rules import (
            convert_maxim)

        ref, mine = self._build_pair()
        x = jnp.ones((1, 32, 32, 3), jnp.float32)
        ref_vars = ref.init(jax.random.PRNGKey(0), x, train=False)
        my_params = convert_maxim(
            jax.tree.map(np.asarray, ref_vars["params"]),
            num_stages=CFG["num_stages"], depth=CFG["depth"],
            num_groups=CFG["num_groups"],
            num_bottleneck_blocks=CFG["num_bottleneck_blocks"],
            num_supervision_scales=CFG["num_supervision_scales"])
        expect = mine.init(jax.random.PRNGKey(0), x)
        got_paths = {tuple(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(my_params)[0]}
        want_paths = {tuple(p) for p, _ in
                      jax.tree_util.tree_flatten_with_path(expect)[0]}
        assert got_paths == want_paths
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.shape(a), np.shape(b)), my_params, expect)
