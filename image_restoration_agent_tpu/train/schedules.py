"""LR schedules as optax-compatible (traceable) functions.

Rebuilds of X-Restormer/xrestormer/models/lr_scheduler.py:

- MultiStepRestartLR (:6): gamma decay at milestones, weight-scaled restarts.
- CosineAnnealingRestartLR (:57): cosine from eta_max*weight to eta_min per
  restart period.
- CosineAnnealingRestartCyclicLR (:98): per-period eta_min list (Restormer's
  progressive training).

All return ``f(step) -> lr`` computable on traced (jnp) or concrete steps,
so they plug directly into ``optax.scale_by_schedule``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def multi_step_restart_lr(base_lr: float, milestones: Sequence[int],
                          gamma: float = 0.1,
                          restarts: Sequence[int] = (0,),
                          restart_weights: Sequence[float] = (1,)):
    assert len(restarts) == len(restart_weights)
    ms = jnp.asarray(sorted(milestones))
    rs = jnp.asarray(list(restarts))
    rw = jnp.asarray(list(restart_weights), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step)
        n = jnp.searchsorted(ms, step, side="right")
        lr = base_lr * gamma ** n
        is_restart = step == rs  # (R,)
        restart_lr = jnp.sum(jnp.where(is_restart, base_lr * rw, 0.0))
        return jnp.where(jnp.any(is_restart), restart_lr, lr)

    return schedule


def _cosine_core(base_lr, periods, restart_weights, eta_mins):
    cumulative = jnp.asarray(np.cumsum(periods))
    periods_j = jnp.asarray(periods, jnp.float32)
    weights_j = jnp.asarray(restart_weights, jnp.float32)
    etas_j = jnp.asarray(eta_mins, jnp.float32)
    last = len(periods) - 1

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.minimum(
            jnp.searchsorted(cumulative, step.astype(jnp.int32),
                             side="left"), last)
        nearest = jnp.where(idx == 0, 0.0,
                            cumulative[jnp.maximum(idx - 1, 0)]
                            .astype(jnp.float32))
        period = periods_j[idx]
        weight = weights_j[idx]
        eta_min = etas_j[idx]
        frac = (step - nearest) / period
        return eta_min + weight * 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * frac))

    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 0.0):
    assert len(periods) == len(restart_weights)
    return _cosine_core(base_lr, list(periods), list(restart_weights),
                        [eta_min] * len(periods))


def cosine_annealing_restart_cyclic_lr(base_lr: float,
                                       periods: Sequence[int],
                                       restart_weights: Sequence[float],
                                       eta_mins: Sequence[float]):
    assert len(periods) == len(restart_weights) == len(eta_mins)
    return _cosine_core(base_lr, list(periods), list(restart_weights),
                        list(eta_mins))


def with_gradual_warmup(schedule, warmup_steps: int,
                        multiplier: float = 1.0):
    """Gradual warmup wrapper (the reference vendors
    pytorch-gradual-warmup-lr for MPRNet training): linearly scale the
    wrapped schedule from base/multiplier to full over warmup_steps."""

    def warmed(step):
        s = jnp.asarray(step, jnp.float32)
        lr = schedule(step)
        frac = jnp.clip(s / max(warmup_steps, 1), 0.0, 1.0)
        scale = (1.0 + (multiplier - 1.0) * frac) / multiplier
        return lr * jnp.where(s < warmup_steps, scale, 1.0)

    return warmed
