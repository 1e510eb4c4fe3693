"""conv3x3_pallas: CPU interpret-mode equivalence vs XLA conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.ops.conv3x3 import (
    conv3x3_pallas, conv3x3_supported)
from image_restoration_agent_tpu.ops.pixel_shuffle import pixel_shuffle

pytestmark = pytest.mark.slow


def _xla_conv(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b[None, None, None, :]
    return y.astype(x.dtype)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestConv3x3:
    def test_matches_xla_conv(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 128, 12),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 12, 20),
                                            dtype=np.float32))
        got = conv3x3_pallas(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_xla_conv(x, w)), atol=2e-5)

    def test_bias_and_batch(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 24, 136, 8),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 8, 16),
                                            dtype=np.float32))
        b = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
        got = conv3x3_pallas(x, w, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_xla_conv(x, w, b)), atol=2e-5)

    def test_edge_rows_zero_padded(self, rng):
        """SAME zero padding at the top/bottom canvas edges (the clamped
        halo blocks must be masked, not used)."""
        x = jnp.asarray(np.ones((1, 8, 128, 4), np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 4), dtype=np.float32))
        got = conv3x3_pallas(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_xla_conv(x, w)), atol=2e-5)

    def test_lrelu(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 128, 4),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 8), dtype=np.float32))
        got = conv3x3_pallas(x, w, act="lrelu", interpret=True)
        want = _xla_conv(x, w)
        want = jnp.where(want >= 0, want, 0.01 * want)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_fused_pixel_shuffle(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 128, 6),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 6, 16),
                                            dtype=np.float32))
        got = conv3x3_pallas(x, w, shuffle=2, interpret=True)
        want = pixel_shuffle(_xla_conv(x, w), 2)
        assert got.shape == (1, 32, 256, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_supported_predicate(self):
        assert conv3x3_supported(552, 1920, 180, 180)
        assert conv3x3_supported(64, 64, 3, 180) is False  # w < 128
        assert not conv3x3_supported(7, 128, 4, 4)
        assert not conv3x3_supported(8, 128, 4, 9, shuffle=2)


class TestConvRouting:
    """models.common.Conv dispatch: the Pallas fast path must be
    param-tree-compatible with the nn.Conv fallback and numerically equal
    (fused act/shuffle epilogues included)."""

    def _both(self, make, x):
        from image_restoration_agent_tpu.models import common
        key = jax.random.PRNGKey(0)
        common.set_conv3x3_mode("off")
        try:
            m = make()
            params_slow = m.init(key, x)
            y_slow = m.apply(params_slow, x)
            common.set_conv3x3_mode("interpret")
            params_fast = m.init(key, x)
            y_fast = m.apply(params_slow, x)  # slow params, fast path
        finally:
            common.set_conv3x3_mode("auto")
        return params_slow, params_fast, y_slow, y_fast

    def test_param_tree_and_values_match(self, rng):
        from image_restoration_agent_tpu.models.common import Conv
        x = jnp.asarray(rng.standard_normal((1, 16, 128, 8),
                                            dtype=np.float32))
        ps, pf, ys, yf = self._both(
            lambda: Conv(12, act="lrelu"), x)
        assert jax.tree_util.tree_structure(ps) \
            == jax.tree_util.tree_structure(pf)
        for a, b in zip(jax.tree_util.tree_leaves(ps),
                        jax.tree_util.tree_leaves(pf)):
            assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yf),
                                   atol=2e-5)

    def test_shuffle_epilogue_matches(self, rng):
        from image_restoration_agent_tpu.models.common import Conv
        x = jnp.asarray(rng.standard_normal((1, 16, 128, 4),
                                            dtype=np.float32))
        ps, pf, ys, yf = self._both(lambda: Conv(16, shuffle=2), x)
        assert ys.shape == (1, 32, 256, 4)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yf),
                                   atol=2e-5)

    def test_unsupported_shape_falls_back(self, rng):
        from image_restoration_agent_tpu.models import common
        x = jnp.asarray(rng.standard_normal((1, 10, 64, 4),
                                            dtype=np.float32))
        common.set_conv3x3_mode("interpret")
        try:
            m = common.Conv(8)
            params = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(params, x)
        finally:
            common.set_conv3x3_mode("auto")
        assert y.shape == (1, 10, 64, 8)

    def test_wide_canvas_column_chunks(self, rng):
        """W > 2176 runs as column chunks with 8-col halos; result must
        equal the single-shot SAME conv exactly."""
        x = jnp.asarray(rng.standard_normal((1, 8, 4000, 4),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 8), dtype=np.float32))
        got = conv3x3_pallas(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_xla_conv(x, w)), atol=2e-5)


class TestConvAfterShuffle:
    """Plane-space conv identity: conv3x3(pixel_shuffle(x, r)) ==
    pixel_shuffle(conv3x3(x, W'), r)."""

    @pytest.mark.parametrize("r", [2, 3])
    def test_weight_transform_identity(self, rng, r):
        from image_restoration_agent_tpu.ops.conv3x3 import (
            conv_after_shuffle_weights)
        cin, cout = 5, 4
        x = jnp.asarray(rng.standard_normal((1, 6, 8, cin * r * r),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout),
                                            dtype=np.float32))
        want = _xla_conv(pixel_shuffle(x, r), w)
        wp = conv_after_shuffle_weights(w, r)
        got = pixel_shuffle(_xla_conv(x, wp), r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_module_fast_vs_fallback(self, rng):
        from image_restoration_agent_tpu.models import common
        x = jnp.asarray(rng.standard_normal((1, 16, 128, 16),
                                            dtype=np.float32))
        m = common.ConvAfterShuffle(3, 2)
        common.set_conv3x3_mode("off")
        try:
            params = m.init(jax.random.PRNGKey(0), x)
            y_slow = m.apply(params, x)
            common.set_conv3x3_mode("interpret")
            y_fast = m.apply(params, x)
        finally:
            common.set_conv3x3_mode("auto")
        assert params["params"]["Conv_0"]["kernel"].shape == (3, 3, 4, 3)
        assert y_slow.shape == (1, 32, 256, 3)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_slow),
                                   atol=2e-5)

    def test_fused_residual(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 128, 4),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 6), dtype=np.float32))
        res = jnp.asarray(rng.standard_normal((1, 8, 128, 6),
                                              dtype=np.float32))
        got = conv3x3_pallas(x, w, res=res, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_xla_conv(x, w) + res),
                                   atol=2e-5)

    @pytest.mark.parametrize("roll", [-4, 4, -12])
    def test_fused_roll(self, rng, roll):
        """conv(roll2d(x, roll)): fused via modular index maps for
        |roll| <= 7 (either sign), XLA roll fallback otherwise."""
        x = jnp.asarray(rng.standard_normal((1, 24, 136, 5),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 5, 6), dtype=np.float32))
        got = conv3x3_pallas(x, w, roll=roll, interpret=True)
        want = _xla_conv(jnp.roll(x, (roll, roll), axis=(1, 2)), w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_fused_roll_with_residual(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 128, 4),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 4), dtype=np.float32))
        res = jnp.asarray(rng.standard_normal((1, 16, 128, 4),
                                              dtype=np.float32))
        got = conv3x3_pallas(x, w, roll=4, res=res, interpret=True)
        want = _xla_conv(jnp.roll(x, (4, 4), axis=(1, 2)), w) + res
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_fused_ln_pre(self, rng):
        """conv(LN(x)): SAME pad applies to the LN output (masking after
        the in-kernel LN, since LN(0) = ln_bias != 0)."""
        x = jnp.asarray(rng.standard_normal((1, 8, 128, 6),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 6, 4), dtype=np.float32))
        s = jnp.asarray(rng.standard_normal(6, dtype=np.float32))
        t = jnp.asarray(rng.standard_normal(6, dtype=np.float32))
        from image_restoration_agent_tpu.models.common import (
            layer_norm_lanes)
        got = conv3x3_pallas(x, w, ln_pre=(s, t), interpret=True)
        want = _xla_conv(layer_norm_lanes(x, s, t), w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_pair_kernel(self, rng):
        """Fused two-conv chain == two separate SAME convs."""
        from image_restoration_agent_tpu.ops.conv3x3 import (
            conv3x3_pair_pallas)
        x = jnp.asarray(rng.standard_normal((1, 16, 136, 5),
                                            dtype=np.float32))
        w1 = jnp.asarray(rng.standard_normal((3, 3, 5, 7),
                                             dtype=np.float32))
        b1 = jnp.asarray(rng.standard_normal(7, dtype=np.float32))
        w2 = jnp.asarray(rng.standard_normal((3, 3, 7, 4),
                                             dtype=np.float32))
        b2 = jnp.asarray(rng.standard_normal(4, dtype=np.float32))
        got = conv3x3_pair_pallas(x, w1, b1, w2, b2, interpret=True)
        u = _xla_conv(x, w1) + b1[None, None, None, :]
        want = _xla_conv(u, w2) + b2[None, None, None, :]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_upsample_tail_fast_vs_fallback(self, rng):
        from image_restoration_agent_tpu.models import common
        x = jnp.asarray(rng.standard_normal((1, 16, 128, 4),
                                            dtype=np.float32))
        w1 = jnp.asarray(rng.standard_normal((3, 3, 4, 16),
                                             dtype=np.float32))
        b1 = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
        wl = jnp.asarray(rng.standard_normal((3, 3, 4, 3),
                                             dtype=np.float32))
        bl = jnp.asarray(rng.standard_normal(3, dtype=np.float32))
        common.set_conv3x3_mode("off")
        try:
            want = common.upsample_tail(x, w1, b1, wl, bl, 2)
            common.set_conv3x3_mode("interpret")
            got = common.upsample_tail(x, w1, b1, wl, bl, 2)
        finally:
            common.set_conv3x3_mode("auto")
        assert want.shape == (1, 32, 256, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
