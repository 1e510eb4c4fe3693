"""Measure the strip kernel's grid-step fixed cost: chunk width sweep.

Theory (docs/NEXT_STEPS.md I/O floor): per-grid-step fixed cost ~11us; at
552x1920 with 240-wide chunks the 2D grid has 69x8 = 552 steps, so ~3.2 ms
of the 12.3 ms fastmath block is step overhead. Wider chunks divide the
step count at identical DMA volume; the price is Mosaic compile time
(unrolled pair loops scale with chunk width) — one-time, cached.

Measures a 12-block jitted chain (alternating dc, the in-band truth
harness per docs/NEXT_STEPS.md) at the headline band shape.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=552)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--c", type=int, default=180)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--widths", default="0,480,640,960")
    args = ap.parse_args()

    from image_restoration_agent_tpu.ops.pallas_attention import \
        swin_strip_pallas
    from image_restoration_agent_tpu.ops.window_attention import \
        shift_attention_mask

    h, w, c, nh = args.h, args.w, args.c, args.heads
    ws = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)) * 0.1, jnp.bfloat16)
    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.bfloat16)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.bfloat16)
    bproj = jnp.zeros((c,), jnp.float32)
    rpb = jnp.asarray(rng.standard_normal((nh, ws * ws, ws * ws)) * 0.02,
                      jnp.float32)
    bank = shift_attention_mask(2 * ws, 2 * ws, ws, ws // 2)
    hidden = c * 2
    mlp = (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
           jnp.asarray(rng.standard_normal((c, hidden)) * 0.05,
                       jnp.bfloat16),
           jnp.zeros((hidden,), jnp.float32),
           jnp.asarray(rng.standard_normal((hidden, c)) * 0.05,
                       jnp.bfloat16),
           jnp.zeros((c,), jnp.float32))

    for wo in [int(v) for v in args.widths.split(",")]:
        wo_arg = wo or None

        def chain(x_, _wo=wo_arg):
            y = x_
            for i in range(args.blocks):
                dc = 0 if i % 2 == 0 else ws // 2
                y = swin_strip_pallas(
                    y, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
                    mask_bank=None if dc == 0 else bank,
                    num_heads=nh, ws=ws, dc=dc, mlp=mlp,
                    fastmath=True, wchunk_override=_wo)
            return y

        f = jax.jit(chain)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(x))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        per_block = min(ts) / args.blocks * 1e3
        print(f"wchunk={wo or 'auto':>5} : {min(ts) * 1e3:7.2f} ms chain, "
              f"{per_block:6.3f} ms/block (compile {compile_s:.0f}s)",
              flush=True)
        del out, f


if __name__ == "__main__":
    main()
