"""Round-4 kernel lab: rolled-body unroll sweep + softmax probes.

Measures the fused full Swin block at the headline band shape
(1, 552, 1920, 180) bf16 via a 12-block jitted chain (alternating dc, the
measurement protocol from docs/NEXT_STEPS.md — standalone single-kernel
timings overstate ~3x). Also records per-variant COMPILE wall time, the
round-3 driver-timeout metric.

Usage: python scripts/lab_r4.py [variant ...]
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

from image_restoration_agent_tpu.ops.pallas_attention import (
    swin_strip_pallas)
from image_restoration_agent_tpu.ops.window_attention import (
    shift_attention_mask)

NBLK = 12
c, heads, ws = 180, 6, 8
H, W = 552, 1920

key = jax.random.PRNGKey(1)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, H, W, c), dtype=np.float32), jnp.bfloat16)
lnw = jnp.ones((c,)); lnb = jnp.zeros((c,))
wqkv = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) * 0.02
bqkv = jnp.zeros((3 * c,))
wproj = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.02
bproj = jnp.zeros((c,))
rpb = jax.random.normal(key, (heads, ws * ws, ws * ws)) * 0.02
mb = shift_attention_mask(2 * ws, 2 * ws, ws, ws // 2)
w1 = jax.random.normal(key, (c, 2 * c), jnp.bfloat16) * 0.02
b1 = jnp.zeros((2 * c,))
w2 = jax.random.normal(key, (2 * c, c), jnp.bfloat16) * 0.02
b2 = jnp.zeros((c,))
mlp = (lnw, lnb, w1, b1, w2, b2)


def chain(mode, ablate="", ur=0, wc=None, rp=1):
    def one(xx, dc):
        return swin_strip_pallas(
            xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
            mask_bank=mb if dc else None, num_heads=heads, ws=ws, dc=dc,
            mlp=mlp, attn_mode=mode, fastmath=True, ablate=ablate,
            r_unroll=ur, wchunk_override=wc, rrows_pref=rp)

    @jax.jit
    def run(xx):
        for i in range(NBLK):
            xx = one(xx, ws // 2 if i % 2 else 0)
        return xx

    return run


VARIANTS = {
    "paired2": lambda: chain("paired2"),
    "p2r_ur0": lambda: chain("paired2r", ur=0),
    "p2r_ur1": lambda: chain("paired2r", ur=1),
    "p2r_ur2": lambda: chain("paired2r", ur=2),
    "p2r_ur4": lambda: chain("paired2r", ur=4),
    "p2r_pexp": lambda: chain("paired2r", ablate="pexp", ur=0),
    # reciprocal-multiply softmax normalization is the DEFAULT since r4
    # (11.325 vs 11.454 ms/block at w384); divnorm restores the old divide
    "p2r_divnorm": lambda: chain("paired2r", ablate="divnorm", ur=0),
    "p2r_pexp_recip": lambda: chain("paired2r", ablate="pexp", ur=0),
    # column-chunk width sweep: fewer/fatter grid steps amortize the
    # ~11us per-step fixed I/O cost (552 steps at w240 -> 345 at w384)
    "p2r_w128": lambda: chain("paired2r", wc=128),
    "p2r_w320": lambda: chain("paired2r", wc=320),
    "p2r_w384": lambda: chain("paired2r", wc=384),
    "p2r_w384_pexp": lambda: chain("paired2r", ablate="pexp", wc=384),
    "p2r_w384_divnorm": lambda: chain("paired2r", ablate="divnorm",
                                      wc=384),
    # beyond the [128,384] default bound: two of the larger lane-aligned
    # divisors of 1920 (480/960 also qualify but sit between measured
    # points; fatter DMA per grid step; VMEM live-state grows linearly
    # with chunk width, so these may spill). wc=1920 fails the d<w check
    # in swin_strip_pallas, so that entry measures the unchunked
    # single-column fallback rather than a 1920-wide chunk.
    "p2r_w480": lambda: chain("paired2r", wc=480),
    "p2r_w640": lambda: chain("paired2r", wc=640),
    "p2r_w960": lambda: chain("paired2r", wc=960),
    "p2r_w1920": lambda: chain("paired2r", wc=1920),
    # superstrips on the rolled body (H=552 -> 69 window rows: rrows=3)
    "p2r_r3": lambda: chain("paired2r", rp=3),
    "p2r_w384_r3": lambda: chain("paired2r", wc=384, rp=3),
    "p2r_w384_r3_pexp": lambda: chain("paired2r", ablate="pexp", wc=384,
                                      rp=3),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    base = None
    for name in names:
        f = VARIANTS[name]()
        t0 = time.perf_counter()
        out = f(x)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            best = min(best, time.perf_counter() - t0)
        ms_blk = best / NBLK * 1e3
        if base is None:
            base = out
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - base.astype(jnp.float32))))
        print(f"{name:22s} {ms_blk:7.3f} ms/block  compile {t_compile:6.1f}s"
              f"  maxerr-vs-first {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
