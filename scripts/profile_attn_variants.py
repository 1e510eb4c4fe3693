"""Microbenchmark attention/MLP half-block variants at bench shapes.

Times each variant ITERS times inside one program on the live TPU.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


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
    def run(x):
        def step(carry, _):
            y = body(carry)
            return y.astype(carry.dtype).reshape(carry.shape), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out
    return jax.jit(run)


def main():
    from image_restoration_agent_tpu.ops.pallas_attention import (
        swin_strip_pallas, wmsa_pallas)
    from image_restoration_agent_tpu.ops.window_attention import (
        window_attention, window_partition, window_reverse)

    b, t, c, heads, ws = 4, 256, 180, 6, 8
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (b, t, t, c), dt)
    n = ws * ws
    hd = c // heads

    lnw = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    wqkv = jax.random.normal(key, (c, 3 * c), dt) * 0.02
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jax.random.normal(key, (c, c), dt) * 0.02
    bproj = jnp.zeros((c,), jnp.float32)
    rpb = jax.random.normal(key, (heads, n, n), jnp.float32)
    table = jax.random.normal(key, ((2 * ws - 1) ** 2, heads), jnp.float32)

    f0 = jax.jit(lambda xx: xx + 1)
    t_over = timeit(f0, x)

    def report(name, body, xx=x):
        f = loop(body)
        tt = (timeit(f, xx) - t_over) / ITERS
        print(f"{name}: {tt*1e3:.3f} ms")
        return tt

    # A: current fused strip kernel
    report("A strip[stacked]", lambda xx: swin_strip_pallas(
        xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
        num_heads=heads, ws=ws, attn_mode="stacked"))

    # B: XLA LN+qkv -> wmsa_pallas core -> XLA proj
    def variant_b(xx):
        xf = xx.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb).astype(dt)
        yw = window_partition(y, ws).reshape(-1, n, c)
        qkv = yw @ wqkv + bqkv.astype(dt)
        out = wmsa_pallas(qkv, rpb, None, num_heads=heads, g=8)
        out = out @ wproj + bproj.astype(dt)
        return xx + window_reverse(out.reshape(-1, ws, ws, c), ws, t, t)
    report("B xla-matmul + wmsa_pallas core", variant_b)

    # C: full XLA half-block
    def variant_c(xx):
        xf = xx.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb).astype(dt)
        yw = window_partition(y, ws).reshape(-1, n, c)
        qkv = yw @ wqkv + bqkv.astype(dt)
        out = window_attention(qkv, heads, table, ws, None)
        out = out @ wproj + bproj.astype(dt)
        return xx + window_reverse(out.reshape(-1, ws, ws, c), ws, t, t)
    report("C full XLA half-block", variant_c)

    # D: XLA everything with batched-einsum attention core shaped for MXU
    def variant_d(xx):
        xf = xx.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb).astype(dt)
        yw = window_partition(y, ws).reshape(-1, n, c)  # (nWB, 64, C)
        qkv = yw @ wqkv + bqkv.astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        nwb = q.shape[0]
        # heads to batch: (nWB*heads, 64, hd)
        qh = q.reshape(nwb, n, heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(nwb, n, heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(nwb, n, heads, hd).transpose(0, 2, 1, 3)
        lg = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                        preferred_element_type=jnp.float32) * hd ** -0.5
        lg = lg + rpb[None]
        p = jax.nn.softmax(lg, axis=-1).astype(dt)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, vh)
        out = o.transpose(0, 2, 1, 3).reshape(nwb, n, c)
        out = out @ wproj + bproj.astype(dt)
        return xx + window_reverse(out.reshape(-1, ws, ws, c), ws, t, t)
    report("D XLA einsum-core half-block", variant_d)

    # MLP variants
    w1 = jax.random.normal(key, (c, 2 * c), dt) * 0.02
    b1 = jnp.zeros((2 * c,), jnp.float32)
    w2 = jax.random.normal(key, (2 * c, c), dt) * 0.02
    b2 = jnp.zeros((c,), jnp.float32)

    from image_restoration_agent_tpu.ops.pallas_attention import (
        mlp_block_pallas)
    x2d = x.reshape(-1, c)
    report("MLP pallas", lambda xx: mlp_block_pallas(
        xx, lnw, lnb, w1, b1, w2, b2), x2d)

    def mlp_xla(xx):
        xf = xx.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb).astype(dt)
        y = y @ w1 + b1.astype(dt)
        y = jax.nn.gelu(y, approximate=False)
        y = y @ w2 + b2.astype(dt)
        return xx + y
    report("MLP xla", mlp_xla, x2d)


if __name__ == "__main__":
    main()
