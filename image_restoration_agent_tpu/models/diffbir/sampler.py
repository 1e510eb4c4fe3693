"""Spaced DDPM sampler (IDDPM respacing) as a jitted lax.scan loop.

Rebuild of DiffBIR/model/spaced_sampler.py: select an evenly-spaced subset
of the 1000 linear-beta timesteps (space_timesteps:14), recompute the
respaced betas from cumulative alphas (make_schedule:108), then ancestral
sampling with eps prediction and fixed-small posterior variance
(p_sample:339). The whole 50-step loop runs on-device inside one
``lax.scan`` — the reference steps from Python with one CUDA launch chain
per step.

Tiled latent diffusion (sample_with_mixdiff:381) samples overlapping latent
tiles and blends eps predictions per step with a uniform-weight canvas —
here via the same static tile-grid machinery as core/tiling.py.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def space_timesteps(num_timesteps: int, section_counts: Sequence[int] | str
                    ) -> list[int]:
    """Evenly spaced timestep subset (IDDPM semantics, single section)."""
    if isinstance(section_counts, str):
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    all_steps: list[int] = []
    start = 0
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if count > size:
            raise ValueError(f"cannot take {count} steps from {size}")
        if count <= 1:
            stride = 1.0
        else:
            stride = (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start + round(cur))
            cur += stride
        start += size
    return sorted(set(all_steps))


class SpacedSampler:
    def __init__(self, num_train_steps: int = 1000,
                 linear_start: float = 0.00085,
                 linear_end: float = 0.0120):
        self.num_train_steps = num_train_steps
        # LDM "linear" schedule: betas from sqrt-linear interpolation
        self.betas_full = np.linspace(
            linear_start ** 0.5, linear_end ** 0.5, num_train_steps,
            dtype=np.float64) ** 2
        self.alphas_cumprod_full = np.cumprod(1.0 - self.betas_full)

    def make_schedule(self, num_steps: int):
        used = space_timesteps(self.num_train_steps, [num_steps])
        last_cum = 1.0
        betas = []
        for t in used:
            cum = self.alphas_cumprod_full[t]
            betas.append(1 - cum / last_cum)
            last_cum = cum
        betas = np.asarray(betas, np.float64)
        ac = np.cumprod(1.0 - betas)
        ac_prev = np.append(1.0, ac[:-1])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        sched = {
            "timesteps": np.asarray(used, np.int32),
            "sqrt_ac": np.sqrt(ac).astype(np.float32),
            "sqrt_1m_ac": np.sqrt(1 - ac).astype(np.float32),
            "sqrt_recip_ac": np.sqrt(1 / ac).astype(np.float32),
            "sqrt_recipm1_ac": np.sqrt(1 / ac - 1).astype(np.float32),
            "post_log_var": np.log(
                np.maximum(post_var, 1e-20)).astype(np.float32),
            "post_mean_c0": (betas * np.sqrt(ac_prev)
                             / (1 - ac)).astype(np.float32),
            "post_mean_ct": ((1 - ac_prev) * np.sqrt(1 - betas)
                             / (1 - ac)).astype(np.float32),
        }
        return sched

    def sample(
        self,
        eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        shape: tuple,
        rng: jax.Array,
        num_steps: int = 50,
    ) -> jnp.ndarray:
        """Ancestral sampling from pure noise. ``eps_fn(x, t_train)`` returns
        predicted noise; t_train is the ORIGINAL-schedule timestep index."""
        sched = {k: jnp.asarray(v) for k, v in
                 self.make_schedule(num_steps).items()}
        n = num_steps
        rng, sub = jax.random.split(rng)
        x = jax.random.normal(sub, shape, jnp.float32)

        def step(carry, i):
            x, rng = carry
            idx = n - 1 - i  # reversed schedule
            t_train = sched["timesteps"][idx]
            eps = eps_fn(x, jnp.full((shape[0],), t_train, jnp.int32))
            x0 = (sched["sqrt_recip_ac"][idx] * x
                  - sched["sqrt_recipm1_ac"][idx] * eps)
            x0 = jnp.clip(x0, -1.0, 1.0)
            mean = (sched["post_mean_c0"][idx] * x0
                    + sched["post_mean_ct"][idx] * x)
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, shape, jnp.float32)
            nonzero = (idx > 0).astype(jnp.float32)
            x = mean + nonzero * jnp.exp(0.5 * sched["post_log_var"][idx]) \
                * noise
            return (x, rng), None

        (x, _), _ = jax.lax.scan(step, (x, rng), jnp.arange(n))
        return x

    def sample_tiled(
        self,
        eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        shape: tuple,
        rng: jax.Array,
        num_steps: int = 50,
        tile: int = 64,
        stride: int = 32,
    ) -> jnp.ndarray:
        """Mixture-of-diffusers tiling: per step, predict eps on overlapping
        latent tiles and blend with a uniform count canvas
        (reference sample_with_mixdiff:381-497)."""
        b, h, w, c = shape
        hs = list(range(0, h - tile, stride)) + [h - tile]
        ws_ = list(range(0, w - tile, stride)) + [w - tile]
        offsets = [(y, x) for y in hs for x in ws_]
        count = np.zeros((1, h, w, 1), np.float32)
        for (y, x) in offsets:
            count[:, y:y + tile, x:x + tile] += 1.0
        count_j = jnp.asarray(count)

        def eps_tiled(x, t):
            eps = jnp.zeros_like(x)
            for (y, xo) in offsets:
                patch = jax.lax.dynamic_slice(
                    x, (0, y, xo, 0), (b, tile, tile, c))
                e = eps_fn(patch, t)
                eps = jax.lax.dynamic_update_slice(
                    eps,
                    jax.lax.dynamic_slice(eps, (0, y, xo, 0),
                                          (b, tile, tile, c)) + e,
                    (0, y, xo, 0))
            return eps / count_j

        return self.sample(eps_tiled, shape, rng, num_steps)
