"""IQA tests: PSNR/SSIM correctness and evaluator contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.iqa import psnr, ssim, Scorer
from image_restoration_agent_tpu.iqa.classifier import (
    DEGRADATIONS, EVALUATED_DEGRADATIONS, SEVERITY_LEVELS, SeverityEvaluator,
)


class TestPSNR:
    def test_identical_images_infinite_ish(self, rng):
        img = jnp.asarray(rng.random((32, 32, 3), dtype=np.float32))
        assert float(psnr(img, img)) > 100.0

    def test_known_value(self):
        a = jnp.zeros((10, 10, 3))
        b = jnp.full((10, 10, 3), 0.1)
        # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20 dB
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)

    def test_symmetry(self, rng):
        a = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
        b = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
        np.testing.assert_allclose(float(psnr(a, b)), float(psnr(b, a)),
                                   atol=1e-5)


class TestSSIM:
    def test_identical_is_one(self, rng):
        img = jnp.asarray(rng.random((32, 32, 3), dtype=np.float32))
        np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)

    def test_noise_lowers_ssim(self, rng):
        img = jnp.asarray(rng.random((64, 64, 3), dtype=np.float32))
        noisy = img + jnp.asarray(
            rng.normal(0, 0.2, (64, 64, 3)).astype(np.float32))
        s = float(ssim(jnp.clip(noisy, 0, 1), img))
        assert 0.0 < s < 0.9

    def test_monotone_in_noise(self, rng):
        img = jnp.asarray(rng.random((64, 64, 3), dtype=np.float32))
        vals = []
        for sigma in (0.02, 0.1, 0.3):
            noisy = jnp.clip(img + jnp.asarray(
                rng.normal(0, sigma, (64, 64, 3)).astype(np.float32)), 0, 1)
            vals.append(float(ssim(noisy, img)))
        assert vals[0] > vals[1] > vals[2]


class TestScorer:
    def test_align_x4(self, rng):
        sc = Scorer()
        small = rng.random((16, 16, 3), dtype=np.float32)
        big = rng.random((64, 64, 3), dtype=np.float32)
        out = sc.score_arrays(small, big)
        assert set(out) == {"psnr", "ssim"}
        assert np.isfinite(out["psnr"])

    def test_mismatched_raises(self, rng):
        sc = Scorer()
        with pytest.raises(ValueError):
            sc.score_arrays(rng.random((16, 16, 3), dtype=np.float32),
                            rng.random((40, 40, 3), dtype=np.float32))


class TestSeverityEvaluator:
    @pytest.mark.slow
    def test_contract_shapes(self, rng):
        ev = SeverityEvaluator()
        img = rng.random((50, 70, 3), dtype=np.float32)
        evaluation = ev.evaluate(img)
        assert len(evaluation) == 7
        assert {d for d, _ in evaluation} == set(EVALUATED_DEGRADATIONS)
        assert all(s in SEVERITY_LEVELS for _, s in evaluation)

    @pytest.mark.slow
    def test_severity_of_single(self, rng):
        ev = SeverityEvaluator()
        img = rng.random((50, 70, 3), dtype=np.float32)
        s = ev.severity_of(img, "noise")
        assert s in SEVERITY_LEVELS

    def test_eight_degradations_declared(self):
        assert len(DEGRADATIONS) == 8
        assert "low resolution" in DEGRADATIONS


class TestEvaluatorSingleton:
    def test_default_is_shared(self):
        """default() must return one process-wide instance: a fresh
        jax.jit wrapper per agent run recompiled the classifier every
        request (measured 18 s per agent run before the fix)."""
        from image_restoration_agent_tpu.iqa.classifier import (
            SeverityEvaluator)

        a = SeverityEvaluator.default()
        b = SeverityEvaluator.default()
        assert a is b
        assert a._apply is b._apply

    def test_logits_memoized_per_image(self):
        from image_restoration_agent_tpu.iqa.classifier import (
            SeverityEvaluator)

        ev = SeverityEvaluator()  # random init fine
        img = np.random.default_rng(0).random((64, 64, 3),
                                              dtype=np.float32)
        l1 = ev.logits(img)
        l2 = ev.logits(img)
        assert l1 is l2  # cache hit returns the same array object
        img2 = img.copy()
        img2[0, 0, 0] += 0.5
        l3 = ev.logits(img2)
        assert l3 is not l1

    def test_shipped_v4_checkpoint_loads_and_discriminates(self):
        """default() loads the shipped v4 weights (not random init) and the
        trained classifier ranks a heavy degradation above the clean image's
        severity for that degradation. Guards the checkpoint <-> arch pairing
        (a topology mismatch would silently fall back to random init)."""
        from pathlib import Path

        from image_restoration_agent_tpu.data import degrade as D
        from image_restoration_agent_tpu.iqa.classifier import (
            SEVERITY_LEVELS, SeverityEvaluator)

        import image_restoration_agent_tpu.iqa.classifier as clf_mod
        v4 = Path(clf_mod.__file__).resolve().parent.parent / "weights" \
            / "degradation_classifier_v4"
        if not v4.exists():
            import pytest
            pytest.skip("v4 checkpoint not shipped in this tree")

        ev = SeverityEvaluator.default()
        # default() must have picked a trained checkpoint at 224px, not
        # the random-init fallback (which uses the v1 160px size)
        assert ev.input_size == 224

        # in-distribution fixture: the same procedural generator the
        # classifier trains/evals on (a bare gradient or random field is
        # OOD and reads as blur / pure noise respectively)
        from image_restoration_agent_tpu.train.classifier import (
            procedural_corpus)
        clean = procedural_corpus(2, size=288, seed=777)[1]
        noisy = D.add_noise(clean, noise_type="Gaussian", arg=50,
                            rng=np.random.default_rng(1))
        lvl = SEVERITY_LEVELS.index
        assert lvl(ev.severity_of(noisy, "noise")) > \
            lvl(ev.severity_of(clean, "noise"))

    def test_shipped_v5_checkpoint_loads_and_discriminates(self):
        """When the v5 checkpoint ships, default() must pick it over v4,
        build the arch its sibling .arch marker declares (the promotion
        gate can ship either the CORAL head or the softmax/V3-arch head,
        scripts/eval_classifier_v5.py), and still rank a heavy
        degradation above clean — guards the checkpoint <-> arch
        pairing."""
        from pathlib import Path

        import image_restoration_agent_tpu.iqa.classifier as clf_mod
        v5 = Path(clf_mod.__file__).resolve().parent.parent / "weights" \
            / "degradation_classifier_v5"
        if not v5.exists():
            import pytest
            pytest.skip("v5 checkpoint not shipped in this tree")

        from image_restoration_agent_tpu.data import degrade as D
        from image_restoration_agent_tpu.iqa.classifier import (
            SEVERITY_LEVELS, DegradationClassifierV3,
            DegradationClassifierV5, SeverityEvaluator)
        from image_restoration_agent_tpu.train.classifier import (
            procedural_corpus)

        marker = v5.parent / (v5.name + ".arch")
        arch = marker.read_text().strip() if marker.exists() else "coral"
        ev = SeverityEvaluator.default()
        assert isinstance(
            ev.model,
            DegradationClassifierV5 if arch == "coral"
            else DegradationClassifierV3)
        assert ev.input_size == 224
        clean = procedural_corpus(2, size=288, seed=777)[1]
        noisy = D.add_noise(clean, noise_type="Gaussian", arg=50,
                            rng=np.random.default_rng(1))
        lvl = SEVERITY_LEVELS.index
        assert lvl(ev.severity_of(noisy, "noise")) > \
            lvl(ev.severity_of(clean, "noise"))

    def test_v5_texture_free_ood_near_zero_severity(self):
        """Regression for the v4 OOD hole (VERDICT r3 #4): smooth clean
        gradients and flats must score at most 'low' severity on EVERY
        degradation — v4 reported heavy blur/JPEG on such inputs, which
        corrupts the reflection loop's success/rollback decisions."""
        from pathlib import Path

        import image_restoration_agent_tpu.iqa.classifier as clf_mod
        v5 = Path(clf_mod.__file__).resolve().parent.parent / "weights" \
            / "degradation_classifier_v5"
        if not v5.exists():
            import pytest
            pytest.skip("v5 checkpoint not shipped in this tree")

        from image_restoration_agent_tpu.iqa.classifier import (
            DEGRADATIONS, SEVERITY_LEVELS, SeverityEvaluator)

        ev = SeverityEvaluator.default()
        yy, xx = np.mgrid[0:288, 0:288].astype(np.float32) / 288
        lvl = SEVERITY_LEVELS.index
        for name, img in (
                ("linear", np.stack([0.2 + 0.6 * xx, 0.3 + 0.5 * yy,
                                     np.full_like(xx, 0.55)], -1)),
                ("radial", np.stack(
                    [np.clip(1.2 - np.hypot(yy - .5, xx - .5), 0, 1)] * 3,
                    -1) * 0.7),
                ("flat", np.full((288, 288, 3), 0.42, np.float32))):
            for d in DEGRADATIONS:
                sev = ev.severity_of(img.astype(np.float32), d)
                assert lvl(sev) <= 1, (name, d, sev)
