"""Where does the 1.052s headline go? Band forward vs glue split.

Times (on the live TPU, headline shapes):
  1. model.apply on one 552x1920 band (the unit tiled_apply maps over)
  2. one fused full Swin block at the band shape (x72 = block budget)
  3. the whole headline run (bench path) for reference
glue = headline - 2 * band_forward  -> pad/gather/blend/crop + dispatch.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import bench as _b

_b.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_agent_tpu.models import build_model


def timeit(fn, *args, repeats=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


model = build_model("swinir_sr_x4")
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    params)

rng = np.random.default_rng(0)
band = jnp.asarray(rng.random((1, 552, 1920, 3), dtype=np.float32))


@jax.jit
def fwd(x):
    return model.apply(params, x.astype(jnp.bfloat16)).astype(jnp.float32)


t_band = timeit(fwd, band)
print(f"band 552x1920 forward: {t_band * 1e3:.1f} ms "
      f"(x2 bands = {2 * t_band * 1e3:.1f} ms)")

# fused full block at band shape
from image_restoration_agent_tpu.ops.pallas_attention import (
    swin_strip_pallas)
from image_restoration_agent_tpu.ops.window_attention import (
    shift_attention_mask)

c, heads, ws = 180, 6, 8
x = jnp.asarray(rng.random((1, 552, 1920, c), dtype=np.float32),
                dtype=jnp.bfloat16)
k = jax.random.PRNGKey(1)
lnw = jnp.ones((c,)); lnb = jnp.zeros((c,))
wqkv = jax.random.normal(k, (c, 3 * c), jnp.bfloat16) * 0.02
bqkv = jnp.zeros((3 * c,))
wproj = jax.random.normal(k, (c, c), jnp.bfloat16) * 0.02
bproj = jnp.zeros((c,))
rpb = jax.random.normal(k, (heads, ws * ws, ws * ws)) * 0.02
mb = shift_attention_mask(2 * ws, 2 * ws, ws, ws // 2)
w1 = jax.random.normal(k, (c, 2 * c), jnp.bfloat16) * 0.02
b1 = jnp.zeros((2 * c,))
w2 = jax.random.normal(k, (2 * c, c), jnp.bfloat16) * 0.02
b2 = jnp.zeros((c,))
mlp = (lnw, lnb, w1, b1, w2, b2)


@jax.jit
def blk(x):
    return swin_strip_pallas(x, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
                             mask_bank=mb, num_heads=heads, ws=ws,
                             dc=ws // 2, mlp=mlp, fastmath=True)


t_blk = timeit(blk, x)
print(f"fused block 552x1920: {t_blk * 1e3:.2f} ms "
      f"(x72 = {72 * t_blk * 1e3:.1f} ms)")
print(f"non-block inside band fwd: "
      f"{(t_band - 36 * t_blk) * 1e3:.1f} ms/band")

# ---- non-block components at band shape ----
from flax import linen as nn

from image_restoration_agent_tpu.models.common import (Conv, ConvParams,
                                                       upsample_tail)


def timed_module(mod, x, label, mult=1):
    f = jax.jit(lambda v: mod.apply(p, v))
    global p
    p = mod.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, p)
    t = timeit(f, x)
    print(f"{label}: {t * 1e3:.2f} ms (x{mult} = {mult * t * 1e3:.1f} ms)")
    return t


xc = x  # (1, 552, 1920, 180) bf16
t_conv = timed_module(Conv(180, kernel=3), xc,
                      "conv3x3 180->180 @552x1920", mult=7)
t_cbu = timed_module(Conv(64, kernel=3), xc,
                     "conv_before_upsample 180->64", mult=1)
x64 = jnp.asarray(rng.random((1, 552, 1920, 64), dtype=np.float32),
                  dtype=jnp.bfloat16)
t_up0 = timed_module(Conv(256, kernel=3, shuffle=2), x64,
                     "upsample0 64->256 +shuffle @552x1920", mult=1)
x64b = jnp.asarray(rng.random((1, 1104, 3840, 64), dtype=np.float32),
                   dtype=jnp.bfloat16)


class Tail(nn.Module):
    @nn.compact
    def __call__(self, y):
        w1, b1 = ConvParams(256, 64, name="upsample1")()
        wl, bl = ConvParams(3, 64, name="conv_last")()
        return upsample_tail(y, w1, b1, wl, bl, 2)


t_tail = timed_module(Tail(), x64b,
                      "upsample_tail (conv+shuffle+conv_last) @1104x3840",
                      mult=1)
known = 36 * t_blk + 7 * t_conv + t_cbu + t_up0 + t_tail
print(f"accounted: {known * 1e3:.1f} ms of {t_band * 1e3:.1f} ms band fwd "
      f"(residual {(t_band - known) * 1e3:.1f} ms)")
