"""Experiment: whole-image Restormer 720p vs tiled-256 (bench preset).

Whole-canvas forward pads 720 -> 768 rows (all four U-Net levels stay
fused-kernel-supported: 768/1280 -> 384/640 -> 192/320 -> 96/160) and
pays 6.7% pad overhead instead of tiled-256's ~42% overlap redundancy.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench as _b

_b.enable_compile_cache()

import jax
import jax.numpy as jnp

from image_restoration_agent_tpu.core.tiling import tiled_apply
from image_restoration_agent_tpu.models import build_model
from image_restoration_agent_tpu.ops.restormer_fused import (
    restormer_fused_supported)

h, w = 720, 1280
ph = 768
for lvl, mult in ((1, 1), (2, 2), (4, 4), (8, 8)):
    dim = 48 * (1 if mult == 1 else mult)
    print(f"level /{mult}: {ph // mult}x{w // mult} dim~{dim} supported:",
          restormer_fused_supported(ph // mult, w // mult, dim, 2 * dim))

model = build_model("restormer")
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    params)

rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))


def fwd(batch):
    return model.apply(params, batch.astype(jnp.bfloat16)) \
        .astype(jnp.float32)


@jax.jit
def run(img):
    return tiled_apply(fwd, img, tile=None, scale=1, pad_multiple=8,
                       pad_kind="reflect", pad_to=(ph, w))


out = run(img)
out.block_until_ready()
times = []
for _ in range(5):
    t0 = time.perf_counter()
    run(img).block_until_ready()
    times.append(time.perf_counter() - t0)
dt = min(times)
print(f"whole-image 768x1280: best={dt:.4f}s -> {h * w / 1e6 / dt:.3f} MP/s")
