"""Time the fused SR head vs its pieces at the headline band shape."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import bench as _b

_b.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_agent_tpu.models.common import (conv3x3_xla,
                                                       fused_pixelshuffle_head,
                                                       upsample_tail)
from image_restoration_agent_tpu.ops.pixel_shuffle import pixel_shuffle

DISPATCH = 0.025  # axon tunnel per-dispatch overhead (s), subtracted


def timeit(fn, *args, repeats=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best - DISPATCH


rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 552, 1920, 64), dtype=np.float32),
                dtype=jnp.bfloat16)
k = jax.random.PRNGKey(0)
rs = [2, 2]
stages = []
c = 64
for i, r in enumerate(rs):
    stages.append((jax.random.normal(k, (3, 3, c, 64 * r * r),
                                     jnp.bfloat16) * 0.05,
                   jnp.zeros((64 * r * r,), jnp.float32)))
wl = jax.random.normal(k, (3, 3, 64, 3), jnp.bfloat16) * 0.05
bl = jnp.zeros((3,), jnp.float32)


def seq_head(z):
    for (w, b), r in zip(stages[:-1], rs[:-1]):
        z = pixel_shuffle(conv3x3_xla(z, w, b), r)
    return upsample_tail(z, *stages[-1], wl, bl, rs[-1])


@jax.jit
def fused(z):
    return fused_pixelshuffle_head(z, stages, wl, bl, rs, seq_head)


@jax.jit
def seq(z):
    return seq_head(z)


from image_restoration_agent_tpu.ops.conv3x3 import (
    compose_conv_weights, conv_after_shuffle_weights)

w, b = wl.astype(jnp.float32), bl
for (wi, bi), r in zip(reversed(stages), reversed(rs)):
    w = conv_after_shuffle_weights(w, r)
    b = jnp.repeat(b, r * r)
    w, b = compose_conv_weights(wi, bi, w, b)
w = jax.device_put(w.astype(jnp.bfloat16))
b = jax.device_put(b)
print("composite kernel:", w.shape)


@jax.jit
def conv_only(z):
    y = jax.lax.conv_general_dilated(
        z, w.astype(z.dtype), (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)[None, None, None, :]


@jax.jit
def conv_shuffles(z):
    y = conv_only(z)
    for r in rs:
        y = pixel_shuffle(y, r)
    return y


for name, fn in (("seq head (old path)", seq),
                 ("composite conv only", conv_only),
                 ("conv + shuffles", conv_shuffles),
                 ("fused head (full, strips+paste)", fused)):
    t = timeit(fn, x)
    print(f"{name}: {t * 1e3:.2f} ms")
