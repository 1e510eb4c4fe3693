"""Per-component Restormer profile on the live TPU (VERDICT r2 #2:
'profile first').

Times each piece of a TransformerBlock at every U-level's serving shape
(tile 256 / batch B), using chained-scan timing (defeats per-call tunnel
overhead and any execution caching).

Usage: python scripts/profile_restormer.py [--batch 8] [--tile 256]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from image_restoration_agent_tpu.models.restormer import (  # noqa: E402
    GDFN, MDTABlock, TransformerBlock)
from image_restoration_agent_tpu.models.common import (  # noqa: E402
    Conv, DWConv, RestormerLayerNorm)
from image_restoration_agent_tpu.ops.mdta import mdta_attention  # noqa: E402


def timed(tag, module_or_fn, x, params=None, n=40, extra_args=()):
    if params is not None:
        fn = lambda xx: module_or_fn.apply(params, xx, *extra_args)  # noqa: E731
    else:
        fn = module_or_fn

    def chain(xx):
        def body(c, _):
            y = fn(c)
            if isinstance(y, tuple):
                y = y[0]
            # keep the carry shape: project back if shapes differ
            if y.shape != c.shape:
                y = jnp.broadcast_to(
                    jnp.mean(y, axis=-1, keepdims=True), c.shape)
            return y.astype(c.dtype), None
        y, _ = jax.lax.scan(body, xx, None, length=n)
        # scalar fetch: block_until_ready does not reliably wait over the
        # axon tunnel for pure-XLA programs; fetching a scalar does
        return jnp.float32(y.reshape(-1)[0])

    cj = jax.jit(chain)
    float(cj(x))
    t0 = time.perf_counter()
    float(cj(x))
    dt = (time.perf_counter() - t0 - 0.033) / n
    print(f"  {tag:34s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--tile", type=int, default=256)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    levels = [  # (dim, heads, spatial) per U-level at tile 256
        (48, 1, args.tile),
        (96, 2, args.tile // 2),
        (192, 4, args.tile // 4),
        (384, 8, args.tile // 8),
        (96, 1, args.tile),   # decoder level-1 runs at 2*dim full res
    ]
    total_block = 0.0
    for dim, heads, sp in levels:
        x = jax.random.normal(key, (args.batch, sp, sp, dim), jnp.bfloat16)
        print(f"level dim={dim} heads={heads} {sp}x{sp} b={args.batch}:",
              flush=True)

        blk = TransformerBlock(num_heads=heads)
        pb = blk.init(key, x)
        t_blk = timed("TransformerBlock", blk, x, pb)
        total_block += t_blk

        attn = MDTABlock(num_heads=heads)
        pa = attn.init(key, x)
        timed("MDTABlock (qkv+dw+attn+proj)", attn, x, pa)

        ffn = GDFN()
        pf = ffn.init(key, x)
        timed("GDFN", ffn, x, pf)

        ln = RestormerLayerNorm()
        pl_ = ln.init(key, x)
        timed("LayerNorm", ln, x, pl_)

        qkv = Conv(dim * 3, kernel=1, use_bias=False)
        pq = qkv.init(key, x)
        timed("qkv 1x1 conv", qkv, x, pq)

        x3 = jax.random.normal(key, (args.batch, sp, sp, dim * 3),
                               jnp.bfloat16)
        dw = DWConv(kernel=3, use_bias=False)
        pd = dw.init(key, x3)
        timed("qkv dwconv 3x3", dw, x3, pd)

        temp = jnp.ones((heads,), jnp.float32)
        timed("mdta core (l2norm+2 einsum+softmax)",
              lambda q: mdta_attention(q, q, q, temp, heads), x)
    print(f"\nsum of TransformerBlock times (1 block/level): "
          f"{total_block*1e3:.2f} ms")


if __name__ == "__main__":
    main()
