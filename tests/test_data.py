"""Degradation synthesis tests: contract (uint8 in/out), determinism,
and that each op actually degrades quality."""

import numpy as np
import pytest

from image_restoration_agent_tpu.data import (
    DEGRADE_OPS, apply_degradation, synthesize_combo,
)
from image_restoration_agent_tpu.iqa import Scorer


@pytest.fixture
def clean_image(rng):
    """Structured test image (gradients + checkers), 96x96 uint8."""
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (xx * 255 / w), (yy * 255 / h),
        ((xx // 8 + yy // 8) % 2) * 200 + 27,
    ], -1)
    return img.astype(np.uint8)


class TestOps:
    def test_all_eight_ops_registered(self):
        assert len(DEGRADE_OPS) == 8

    @pytest.mark.parametrize("name", sorted(DEGRADE_OPS))
    def test_uint8_contract(self, name, clean_image):
        rng = np.random.default_rng(0)
        out = apply_degradation(clean_image, name, rng=rng)
        assert out.dtype == np.uint8
        if name == "low resolution":
            assert out.shape == (24, 24, 3)
        else:
            assert out.shape == clean_image.shape

    @pytest.mark.parametrize("name", [n for n in sorted(DEGRADE_OPS)
                                      if n != "low resolution"])
    def test_actually_degrades(self, name, clean_image):
        rng = np.random.default_rng(0)
        out = apply_degradation(clean_image, name, rng=rng)
        sc = Scorer()
        scores = sc.score_arrays(out.astype(np.float32) / 255,
                                 clean_image.astype(np.float32) / 255)
        assert scores["psnr"] < 40.0, (name, scores)

    def test_deterministic_with_seed(self, clean_image):
        a = apply_degradation(clean_image, "noise",
                              rng=np.random.default_rng(5))
        b = apply_degradation(clean_image, "noise",
                              rng=np.random.default_rng(5))
        np.testing.assert_array_equal(a, b)

    def test_darken_reduces_brightness(self, clean_image):
        out = apply_degradation(clean_image, "dark",
                                rng=np.random.default_rng(0))
        assert out.astype(np.float64).mean() < clean_image.astype(np.float64).mean()

    def test_haze_raises_brightness_in_far_field(self, clean_image):
        rng = np.random.default_rng(0)
        dark = (clean_image * 0.2).astype(np.uint8)
        out = apply_degradation(dark, "haze", rng=rng)
        assert out.astype(np.float64).mean() > dark.astype(np.float64).mean()

    def test_gaussian_noise_sigma_controls_strength(self, clean_image):
        from image_restoration_agent_tpu.data import add_noise
        weak = add_noise(clean_image, "Gaussian", arg=5,
                         rng=np.random.default_rng(0))
        strong = add_noise(clean_image, "Gaussian", arg=50,
                           rng=np.random.default_rng(0))
        d_weak = np.abs(weak.astype(int) - clean_image.astype(int)).mean()
        d_strong = np.abs(strong.astype(int) - clean_image.astype(int)).mean()
        assert d_strong > 3 * d_weak


class TestCombos:
    def test_combo_string(self, clean_image):
        rng = np.random.default_rng(0)
        out = synthesize_combo(clean_image, "dark + noise", rng=rng)
        assert out.shape == clean_image.shape

    def test_benchmark_combos_parse(self, clean_image):
        # the 16 combos of the reference benchmark task list
        combos = [
            "rain + haze", "motion blur + low resolution", "dark + noise",
            "defocus blur + jpeg compression artifact",
            "noise + jpeg compression artifact", "rain + low resolution",
            "motion blur + dark", "defocus blur + haze",
            "motion blur + jpeg compression artifact", "haze + noise",
            "defocus blur + low resolution", "rain + dark",
            "haze + motion blur + low resolution",
            "rain + noise + low resolution",
            "dark + defocus blur + jpeg compression artifact",
            "motion blur + defocus blur + noise",
        ]
        rng = np.random.default_rng(1)
        out = synthesize_combo(clean_image, combos[2], rng=rng)
        assert out.dtype == np.uint8
        for c in combos:
            parts = [p.strip() for p in c.split("+")]
            assert all(p in DEGRADE_OPS for p in parts), c
