"""Component-level timing of the SwinIR-M bench path at headline shapes.

The axon-tunneled TPU has ~25 ms per-dispatch overhead, so each component is
looped ITERS times inside one jitted program (chained through a dependency)
and the per-iteration time is (t_loop - t_overhead) / ITERS.

Usage: python scripts/profile_swinir.py [--tile 256] [--batch 4]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 40


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


def loop(body):
    """Run body ITERS times inside one program, chaining the output."""
    def run(x):
        def step(carry, _):
            y = body(carry)
            return y.astype(carry.dtype).reshape(carry.shape), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out
    return jax.jit(run)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    from image_restoration_agent_tpu.ops.pallas_attention import (
        mlp_block_pallas, roll2d_pallas, swin_strip_pallas)
    from image_restoration_agent_tpu.ops.window_attention import (
        shift_attention_mask)
    from image_restoration_agent_tpu.models import build_model

    b, t, c, heads, ws = args.batch, args.tile, 180, 6, 8
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (b, t, t, c), dt)
    n = ws * ws

    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    wqkv = jax.random.normal(key, (c, 3 * c), dt) * 0.02
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jax.random.normal(key, (c, c), dt) * 0.02
    bproj = jnp.zeros((c,), jnp.float32)
    rpb = jax.random.normal(key, (heads, n, n), jnp.float32)

    # dispatch overhead: a trivial program
    f0 = jax.jit(lambda xx: xx + 1)
    t_over = timeit(f0, x)
    print(f"dispatch overhead: {t_over*1e3:.2f} ms")

    def report(name, f, xx):
        tt = (timeit(f, xx) - t_over) / ITERS
        print(f"{name}: {tt*1e3:.3f} ms/iter")
        return tt

    w1 = jax.random.normal(key, (c, 2 * c), dt) * 0.02
    b1 = jnp.zeros((2 * c,), jnp.float32)
    w2 = jax.random.normal(key, (2 * c, c), dt) * 0.02
    b2 = jnp.zeros((c,), jnp.float32)
    mlp_params = (lnw, lnb, w1, b1, w2, b2)

    t_attn = {}
    for mode in ("stacked", "paired", "paired2"):
        f = loop(lambda xx, m=mode: swin_strip_pallas(
            xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
            num_heads=heads, ws=ws, attn_mode=m))
        t_attn[mode] = report(f"attn strip [{mode}]", f, x)

    f = loop(lambda xx: swin_strip_pallas(
        xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
        num_heads=heads, ws=ws, attn_mode="paired", mlp=mlp_params))
    t_fused = report("full block [paired+mlp fused]", f, x)

    f = loop(lambda xx: swin_strip_pallas(
        xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
        num_heads=heads, ws=ws, attn_mode="paired2", mlp=mlp_params))
    t_fused2 = report("full block [paired2+mlp fused]", f, x)

    f = loop(lambda xx: swin_strip_pallas(
        xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
        num_heads=heads, ws=ws, dc=-4, mask_bank=jnp.asarray(
            shift_attention_mask(2 * ws, 2 * ws, ws, ws // 2)
            .reshape(2, 2, n, n)),
        attn_mode="paired2", mlp=mlp_params))
    t_fused2_shift = report("full block [paired2+mlp fused, shift]", f, x)

    bank = jnp.asarray(shift_attention_mask(2 * ws, 2 * ws, ws, ws // 2)
                       .reshape(2, 2, n, n))
    f = loop(lambda xx: swin_strip_pallas(
        xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
        num_heads=heads, ws=ws, dc=-4, mask_bank=bank))
    t_shift = report("attn strip [stacked+shift]", f, x)

    f = loop(lambda xx: swin_strip_pallas(
        xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
        num_heads=heads, ws=ws, dc=-4, mask_bank=bank,
        attn_mode="paired", mlp=mlp_params))
    t_fused_shift = report("full block [paired+mlp fused, shift]", f, x)
    x2d = x.reshape(-1, c)
    f = loop(lambda xx: mlp_block_pallas(xx, lnw, lnb, w1, b1, w2, b2))
    t_mlp = report("mlp half-block", f, x2d)

    wc = jax.random.normal(key, (3, 3, c, c), dt) * 0.02
    f = loop(lambda xx: jax.lax.conv_general_dilated(
        xx, wc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    t_conv = report("3x3 conv 180->180", f, x)

    f = loop(lambda xx: roll2d_pallas(xx, 4, ws=8))
    t_roll = report("roll2d", f, x)

    # raw matmul reference at qkv shape
    rows = b * t * t
    xm = jax.random.normal(key, (rows, c), dt)
    f = loop(lambda xx: (xx @ wqkv).astype(dt)[:, :c])
    t_qkv = report(f"raw qkv matmul ({rows}x{c} @ {c}x{3*c})", f, xm)

    # full model
    model = build_model("swinir_sr_x4")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t, t, 3)))
    params = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
    xin = jax.random.uniform(key, (b, t, t, 3), dt)
    fm = jax.jit(lambda xx: model.apply(params, xx))
    t_model = timeit(fm, xin) - t_over
    print(f"full model fwd (b={b}, {t}x{t}): {t_model*1e3:.2f} ms")

    est = (18 * t_fused + 18 * t_fused_shift + 7 * t_conv)
    print(f"sum-of-parts (fused blocks): plain18={18*t_fused*1e3:.1f} "
          f"shift18={18*t_fused_shift*1e3:.1f} "
          f"conv7={7*t_conv*1e3:.1f} "
          f"=> est {est*1e3:.1f} ms vs model {t_model*1e3:.1f} ms")
    mp = b * t * t / 1e6
    print(f"model-only throughput: {mp/t_model:.3f} MP/s")
    # FLOP accounting per attn half-block
    flops_attn = rows * (4 * c * c + 2 * n * c) * 2
    flops_mlp = rows * (4 * c * c) * 2
    flops_conv = rows * 9 * c * c * 2
    print(f"attn eff: {flops_attn/t_attn['stacked']/1e12:.1f} TF/s | "
          f"mlp: {flops_mlp/t_mlp/1e12:.1f} | conv: {flops_conv/t_conv/1e12:.1f}")


if __name__ == "__main__":
    main()
