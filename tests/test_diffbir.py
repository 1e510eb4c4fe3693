"""DiffBIR stack tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.models.diffbir import (
    AutoencoderKL, SpacedSampler, space_timesteps,
)
from image_restoration_agent_tpu.models.diffbir.pipeline import (
    wavelet_color_fix, wavelet_decompose,
)
from image_restoration_agent_tpu.models import build_model

pytestmark = pytest.mark.slow


class TestSpacedSchedule:
    def test_space_timesteps_count_and_range(self):
        steps = space_timesteps(1000, [50])
        assert len(steps) == 50
        assert steps[0] == 0 and steps[-1] == 999

    def test_respaced_alphas_match_original(self):
        s = SpacedSampler()
        sched = s.make_schedule(50)
        # cumulative alphas of the respaced chain must equal the original
        # schedule's at the selected timesteps
        want = s.alphas_cumprod_full[sched["timesteps"]]
        np.testing.assert_allclose(sched["sqrt_ac"] ** 2, want, rtol=1e-5)

    def test_sample_shapes_and_determinism(self):
        s = SpacedSampler()

        def eps_fn(x, t):
            return x * 0.1  # dummy denoiser

        rng = jax.random.PRNGKey(0)
        a = s.sample(eps_fn, (1, 8, 8, 4), rng, num_steps=5)
        b = s.sample(eps_fn, (1, 8, 8, 4), rng, num_steps=5)
        assert a.shape == (1, 8, 8, 4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()


class TestVAE:
    def test_encode_decode_shapes(self, rng):
        vae = AutoencoderKL(ch=32)
        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        params = vae.init(jax.random.PRNGKey(0), x)
        z = vae.apply(params, x, method=AutoencoderKL.encode)
        assert z.shape == (1, 4, 4, 4)  # 8x downsampling, 4 latents
        out = vae.apply(params, z, method=AutoencoderKL.decode)
        assert out.shape == (1, 32, 32, 3)


class TestWaveletFix:
    def test_decompose_reconstructs(self, rng):
        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        high, low = wavelet_decompose(x)
        np.testing.assert_allclose(np.asarray(high + low), np.asarray(x),
                                   atol=1e-5)

    def test_color_fix_takes_style_low_freq(self, rng):
        content = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        style = content * 0.2 + 0.4
        fixed = wavelet_color_fix(content, style)
        # means should track the style image, not the content
        assert abs(float(fixed.mean()) - float(style.mean())) < 0.02


class TestPipeline:
    def test_end_to_end_tiny(self):
        m = build_model("diffbir_tiny")
        x = jnp.asarray(np.random.default_rng(0).random(
            (1, 16, 16, 3), dtype=np.float32))
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == (1, 64, 64, 3)  # 4x SR
        assert np.isfinite(np.asarray(out)).all()
