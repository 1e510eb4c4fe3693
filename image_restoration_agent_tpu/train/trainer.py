"""Trainer: the BasicSR-style training loop, TPU-native.

Replaces the reference training stacks (X-Restormer's BasicSR SRModel
pipeline, DeepSpeed for DepictQA — SURVEY.md §2.5) with one sharded jitted
train step over a device mesh (parallel/train_step.py), orbax checkpointing,
periodic validation with the IQA scorer, and paired-crop data pipelines fed
by the degradation synthesizer.

Config maps 1:1 onto the concepts of the reference's YAML options
(total_iter, scheduler periods, val_freq, save_freq, crop size, batch).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..iqa.metrics import psnr
from ..parallel.mesh import make_mesh
from ..parallel.train_step import (TrainState, make_sharded_train_step,
                                   make_train_state)
from .losses import charbonnier_loss


@dataclasses.dataclass
class TrainConfig:
    total_iters: int = 1000
    batch_size: int = 8
    crop_size: int = 128
    base_lr: float = 3e-4
    weight_decay: float = 0.0
    grad_clip: float = 0.0
    lr_schedule: Optional[Callable[[int], float]] = None
    loss: Callable = charbonnier_loss
    val_freq: int = 200
    save_freq: int = 500
    log_freq: int = 50
    mesh_axes: Optional[dict] = None       # e.g. {"data": 4, "model": 2}
    seed: int = 0


class Trainer:
    def __init__(self, model, config: TrainConfig,
                 work_dir: str | Path = "train_work"):
        self.model = model
        self.cfg = config
        self.work_dir = Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.history: list[dict] = []

        schedule = config.lr_schedule or (lambda step: config.base_lr)
        tx_parts = []
        if config.grad_clip > 0:
            tx_parts.append(optax.clip_by_global_norm(config.grad_clip))
        tx_parts.append(optax.scale_by_adam())
        if config.weight_decay > 0:
            tx_parts.append(optax.add_decayed_weights(config.weight_decay))
        tx_parts.append(optax.scale_by_schedule(lambda s: -schedule(s)))
        self.tx = optax.chain(*tx_parts)

        if config.mesh_axes:
            self.mesh = make_mesh(config.mesh_axes)
        else:
            self.mesh = make_mesh({"data": 1, "model": 1})
        self.step_fn, self._shard_state, self._shard_batch = \
            make_sharded_train_step(self.model, self.tx, self.mesh,
                                    loss_fn=config.loss)

    # ------------- lifecycle -------------

    def init_state(self, sample: jnp.ndarray) -> TrainState:
        state = make_train_state(self.model, jax.random.PRNGKey(self.cfg.seed),
                                 sample, self.tx)
        return self._shard_state(state)

    def fit(self, data: Iterable[tuple[np.ndarray, np.ndarray]],
            state: Optional[TrainState] = None,
            val_pairs: Optional[list] = None) -> TrainState:
        it = iter(data)
        first_lq, first_hq = next(it)
        if state is None:
            state = self.init_state(jnp.asarray(first_lq[:1]))

        def batches():
            yield first_lq, first_hq
            yield from it

        t0 = time.time()
        for i, (lq, hq) in enumerate(batches()):
            if i >= self.cfg.total_iters:
                break
            lq = self._shard_batch(jnp.asarray(lq))
            hq = self._shard_batch(jnp.asarray(hq))
            state, loss = self.step_fn(state, lq, hq)
            if (i + 1) % self.cfg.log_freq == 0 or i == 0:
                rec = {"step": i + 1, "loss": float(loss),
                       "seconds": round(time.time() - t0, 2)}
                self.history.append(rec)
            if val_pairs and (i + 1) % self.cfg.val_freq == 0:
                self.history.append(
                    {"step": i + 1, "val_psnr": self.validate(state,
                                                              val_pairs)})
            if (i + 1) % self.cfg.save_freq == 0:
                self.save_checkpoint(state, i + 1)
        (self.work_dir / "history.json").write_text(
            json.dumps(self.history, indent=2))
        return state

    def validate(self, state: TrainState, pairs: list) -> float:
        vals = []
        for lq, hq in pairs:
            pred = self.model.apply(state.params, jnp.asarray(lq[None]))
            vals.append(float(psnr(jnp.clip(pred[0], 0, 1),
                                   jnp.asarray(hq))))
        return float(np.mean(vals))

    # ------------- checkpointing (orbax) -------------

    def save_checkpoint(self, state: TrainState, step: int) -> Path:
        import orbax.checkpoint as ocp

        path = (self.work_dir / f"ckpt_{step}").resolve()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, jax.device_get(state.params), force=True)
        return path

    def load_checkpoint(self, path: str | Path):
        import orbax.checkpoint as ocp

        sample = jnp.zeros((1, self.cfg.crop_size, self.cfg.crop_size, 3))
        template = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0), sample))
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(Path(path).resolve(), template)


def paired_crop_stream(hq_images: list[np.ndarray], degrade: Callable,
                       batch_size: int, crop: int, seed: int = 0):
    """Infinite stream of (lq, hq) batches: random crops + degradation.

    The TPU-native analogue of the reference's paired datasets
    (xrestormer/data/*_dataset.py) fed by the synthesizer instead of
    LMDB folders.
    """
    rng = np.random.default_rng(seed)
    while True:
        lqs, hqs = [], []
        for _ in range(batch_size):
            img = hq_images[rng.integers(len(hq_images))]
            h, w = img.shape[:2]
            y = rng.integers(0, max(h - crop, 1))
            x = rng.integers(0, max(w - crop, 1))
            patch = img[y:y + crop, x:x + crop]
            lq = degrade(patch, rng)
            hqs.append(patch.astype(np.float32) / 255.0)
            lqs.append(lq.astype(np.float32) / 255.0)
        yield np.stack(lqs), np.stack(hqs)
