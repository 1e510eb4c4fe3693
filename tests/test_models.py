"""Model zoo tests: shape invariants (the reference's x1/x4 check,
executor/__init__.py:113-157), jit-ability, and determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.models import build_model, list_models
from image_restoration_agent_tpu.models.registry import MODEL_REGISTRY, get_spec


def _init_and_run(name, h=32, w=32, seed=0):
    spec = get_spec(name)
    model = build_model(name)
    x = jnp.asarray(
        np.random.default_rng(seed).random((1, h, w, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    return spec, x, out, model, params


class TestNAFNet:
    @pytest.mark.slow
    @pytest.mark.slow
    def test_shape_preserved(self):
        spec, x, out, *_ = _init_and_run("nafnet_small")
        assert out.shape == x.shape

    @pytest.mark.slow
    def test_nondivisible_input_padded_internally(self):
        model = build_model("nafnet_small")
        x = jnp.zeros((1, 30, 21, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 30, 21, 3)

    def test_zero_init_residual_blocks_identityish(self):
        """beta/gamma are zero-initialized, so at init every NAFBlock is an
        identity map and the whole net is intro->ending + global residual."""
        model = build_model("nafnet_small")
        x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 3),
                                                        dtype=np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert np.isfinite(np.asarray(out)).all()

    def test_jit_and_determinism(self):
        model = build_model("nafnet_small")
        x = jnp.ones((1, 16, 16, 3)) * 0.5
        params = model.init(jax.random.PRNGKey(0), x)
        f = jax.jit(model.apply)
        a, b = f(params, x), f(params, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
class TestRestormer:
    def test_shape_preserved(self):
        spec, x, out, *_ = _init_and_run("restormer_tiny")
        assert out.shape == x.shape

    def test_global_residual_at_init(self):
        """Output conv is zeros-free random but residual keeps output finite
        and input-correlated."""
        _, x, out, *_ = _init_and_run("restormer_tiny")
        assert np.isfinite(np.asarray(out)).all()


class TestSwinIR:
    def test_sr_x4_shape(self):
        spec, x, out, *_ = _init_and_run("swinir_tiny", h=16, w=16)
        assert spec.scale == 4
        assert out.shape == (1, 64, 64, 3)

    @pytest.mark.slow
    def test_window7_denoise_config_builds(self):
        # JPEG config uses window_size 7 and img_range 255.
        model = build_model("swinir_jpeg_40", embed_dim=8, depths=(1,),
                            num_heads=(1,))
        x = jnp.zeros((1, 14, 14, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 14, 14, 3)

    def test_shifted_windows_change_output(self):
        """Two-block RSTB alternates shift 0 / ws//2; check the net is
        sensitive to spatial permutation (i.e. attention is windowed)."""
        model = build_model("swinir_tiny")
        x = jnp.asarray(np.random.default_rng(2).random((1, 16, 16, 3),
                                                        dtype=np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        out1 = model.apply(params, x)
        out2 = model.apply(params, jnp.roll(x, 3, axis=2))
        assert not np.allclose(np.asarray(out1),
                               np.roll(np.asarray(out2), -12, axis=2),
                               atol=1e-4)


class TestRegistry:
    def test_expected_models_registered(self):
        names = list_models()
        for required in ["nafnet", "nafnet_small", "restormer",
                         "swinir_sr_x4", "swinir_denoise_15",
                         "swinir_jpeg_40"]:
            assert required in names

    def test_specs_have_subtasks(self):
        for name, spec in MODEL_REGISTRY.items():
            assert spec.subtasks, name
            assert spec.scale >= 1, name
