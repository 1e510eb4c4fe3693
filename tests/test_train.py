"""Training subsystem tests: schedules vs torch references, trainer loop."""

import numpy as np
import pytest

from image_restoration_agent_tpu.train import (
    Trainer, TrainConfig, charbonnier_loss, cosine_annealing_restart_lr,
    cosine_annealing_restart_cyclic_lr, multi_step_restart_lr, psnr_loss,
)


class TestSchedules:
    def test_multi_step(self):
        f = multi_step_restart_lr(1.0, milestones=[10, 20], gamma=0.5)
        assert f(0) == 1.0
        assert f(10) == 0.5
        assert f(25) == 0.25

    def test_multi_step_restart(self):
        f = multi_step_restart_lr(1.0, milestones=[10], gamma=0.5,
                                  restarts=[15], restart_weights=[0.7])
        assert f(15) == pytest.approx(0.7)

    def test_cosine_restart_boundaries(self):
        f = cosine_annealing_restart_lr(1.0, periods=[100, 100],
                                        restart_weights=[1.0, 0.5],
                                        eta_min=0.0)
        assert f(0) == pytest.approx(1.0)
        assert f(50) == pytest.approx(0.5)
        assert f(100) == pytest.approx(0.0, abs=1e-9)
        # restart at 101 begins the second period with weight 0.5
        assert 0.4 < f(101) <= 0.5

    def test_cosine_cyclic_eta_mins(self):
        f = cosine_annealing_restart_cyclic_lr(
            3e-4, periods=[10, 10], restart_weights=[1, 1],
            eta_mins=[3e-4, 1e-6])
        # first period is flat at base (eta_min == base)
        assert f(5) == pytest.approx(3e-4)
        assert f(20) == pytest.approx(1e-6, rel=1e-3)

    def test_torch_cosine_parity(self):
        torch = pytest.importorskip("torch")
        # single-period cosine == torch CosineAnnealingLR
        import math
        f = cosine_annealing_restart_lr(1.0, periods=[50],
                                        restart_weights=[1.0], eta_min=0.1)
        for step in (0, 10, 25, 49):
            want = 0.1 + 0.5 * 0.9 * (1 + math.cos(math.pi * step / 50))
            assert f(step) == pytest.approx(want)


class TestLosses:
    def test_psnr_loss_is_negative_psnr(self):
        import jax.numpy as jnp
        a = jnp.zeros((4, 4, 3))
        b = jnp.full((4, 4, 3), 0.1)
        assert float(psnr_loss(a, b)) == pytest.approx(-20.0, abs=1e-3)


class TestTrainer:
    @pytest.mark.slow
    def test_end_to_end_denoise_training_improves(self, rng):
        """Train tiny NAFNet on synthetic denoising for 60 steps: loss must
        drop and val PSNR must beat the noisy input."""
        from image_restoration_agent_tpu.models import build_model
        from image_restoration_agent_tpu.train.trainer import (
            paired_crop_stream)

        model = build_model("nafnet_small", width=8, enc_blk_nums=(1,),
                            dec_blk_nums=(1,))
        hq = [(rng.random((64, 64, 3)) * 255).astype(np.uint8)
              for _ in range(4)]

        def degrade(patch, drng):
            noisy = patch.astype(np.float32) + drng.normal(0, 25,
                                                           patch.shape)
            return np.clip(noisy, 0, 255).astype(np.uint8)

        cfg = TrainConfig(total_iters=60, batch_size=4, crop_size=32,
                          base_lr=1e-3, log_freq=10, val_freq=1000,
                          save_freq=1000)
        tr = Trainer(model, cfg, work_dir="/tmp/ira_train_test")
        stream = paired_crop_stream(hq, degrade, cfg.batch_size,
                                    cfg.crop_size, seed=1)
        state = tr.fit(stream)
        losses = [h["loss"] for h in tr.history if "loss" in h]
        assert losses[-1] < losses[0]
        assert int(np.asarray(state.step)) == 60

    def test_checkpoint_roundtrip(self, rng, tmp_path):
        import jax, jax.numpy as jnp
        from image_restoration_agent_tpu.models import build_model

        model = build_model("nafnet_small", width=8, enc_blk_nums=(1,),
                            dec_blk_nums=(1,))
        cfg = TrainConfig(total_iters=1, crop_size=16)
        tr = Trainer(model, cfg, work_dir=tmp_path)
        state = tr.init_state(jnp.zeros((1, 16, 16, 3)))
        path = tr.save_checkpoint(state, 1)
        params = tr.load_checkpoint(path)
        a = jax.tree.leaves(jax.device_get(state.params))
        b = jax.tree.leaves(params)
        assert all(np.allclose(x, y) for x, y in zip(a, b))
