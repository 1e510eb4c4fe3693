"""Profile DehazeFormer-B on TPU: where does serving time go?

Answers (before any kernel work — round-2 lesson: profile first):
1. total forward time at a dehaze serving size,
2. attention share: forward with use_attn forced off everywhere
   (attn_ratio=0) vs the real config — the delta bounds what ANY
   window-attention fusion can save,
3. the XLA-vs-wmsa_pallas split for the attention core itself.

Reference contract being profiled: DehazeFormer whole-image serving
(AgentApp/model_service/dehazing/DehazeFormer/model_serving.py:70-160).
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, n=5):
    fn(*a)[1].block_until_ready() if isinstance(fn(*a), tuple) else None
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--variant", default="b")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from image_restoration_agent_tpu.models.dehazeformer import (
        _VARIANTS, DehazeFormer)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = dict(_VARIANTS[args.variant])
    h = w = args.size
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)), dt)

    results = {}
    for name, extra in [
        ("full", {}),
        ("noattn", {"attn_ratio": (0, 0, 0, 0, 0)}),
    ]:
        model = DehazeFormer(**{**cfg, **extra})
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3), dt))
        params = jax.tree.map(lambda a: a.astype(dt), params)
        fwd = jax.jit(lambda p_, x_: model.apply(p_, x_))
        t = timeit(fwd, params, x)
        results[name] = t
        print(f"{name:8s} {t * 1e3:8.2f} ms", flush=True)

    att = results["full"] - results["noattn"]
    print(f"attention share (incl. partition/reverse/pads): "
          f"{att * 1e3:.2f} ms = {att / results['full']:.0%} of "
          f"{results['full'] * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
