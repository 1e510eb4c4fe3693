"""Round-5 kernel lab: pair-fused Swin strip kernel on hardware.

Measures the fused block-PAIR kernel (swin_pair_strip_pallas: two full
Swin blocks per invocation, intermediates VMEM-resident) against the
round-4 sequential paired2r chain at the headline band shape
(1, 552, 1920, 180) bf16, via the 12-block jitted-chain protocol from
docs/NEXT_STEPS.md (standalone single-kernel timings overstate ~3x).

Numerics: the pair chain must be bit-identical to the sequential chain
with the REAL RSTB frame sequence (dc = 0, -s, +s, -s, ... ending frame
-s; the pair kernel takes dc1 = 0 then +s and always emits frame -s).

Usage: python scripts/lab_r5.py [variant ...]
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
    swin_pair_strip_pallas, swin_strip_pallas)
from image_restoration_agent_tpu.ops.window_attention import (
    shift_attention_mask)

NBLK = 12
c, heads, ws = 180, 6, 8
H, W = 552, 1920
s = ws // 2

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, H, W, c), dtype=np.float32), jnp.bfloat16)
mb = jnp.asarray(
    shift_attention_mask(2 * ws, 2 * ws, ws, s).reshape(2, 2, 64, 64))


def make_blk(seed):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    lnw = jnp.ones((c,)) + jax.random.normal(ks[0], (c,)) * 0.02
    lnb = jax.random.normal(ks[0], (c,)) * 0.02
    wqkv = jax.random.normal(ks[1], (c, 3 * c), jnp.bfloat16) * 0.02
    bqkv = jax.random.normal(ks[1], (3 * c,)) * 0.02
    wproj = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * 0.02
    bproj = jax.random.normal(ks[2], (c,)) * 0.02
    rpb = jax.random.normal(ks[3], (heads, 64, 64)) * 0.02
    ln2w = jnp.ones((c,)) + jax.random.normal(ks[4], (c,)) * 0.02
    ln2b = jax.random.normal(ks[4], (c,)) * 0.02
    w1 = jax.random.normal(ks[5], (c, 2 * c), jnp.bfloat16) * 0.02
    b1 = jax.random.normal(ks[5], (2 * c,)) * 0.02
    w2 = jax.random.normal(ks[5], (2 * c, c), jnp.bfloat16) * 0.02
    b2 = jax.random.normal(ks[5], (c,)) * 0.02
    return (lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
            ln2w, ln2b, w1, b1, w2, b2)


BLKS = [make_blk(i) for i in range(NBLK)]


def seq_one(xx, blk, dc, shifted, ablate=""):
    (lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
     ln2w, ln2b, w1, b1, w2, b2) = blk
    return swin_strip_pallas(
        xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
        mask_bank=mb if shifted else None, num_heads=heads, ws=ws, dc=dc,
        mlp=(ln2w, ln2b, w1, b1, w2, b2), attn_mode="paired2r",
        fastmath=True, ablate=ablate)


def chain_seq(ablate=""):
    """Real RSTB frame chain: dc = 0, -s, +s, -s, ... final frame -s."""
    @jax.jit
    def run(xx):
        frame = 0
        for i in range(NBLK):
            shifted = i % 2 == 1
            req = -s if shifted else 0
            xx = seq_one(xx, BLKS[i], req - frame, shifted, ablate)
            frame = req
        return xx

    return run


def chain_pair(r_unroll=4, wc=None):
    @jax.jit
    def run(xx):
        for p in range(NBLK // 2):
            xx = swin_pair_strip_pallas(
                xx, BLKS[2 * p], BLKS[2 * p + 1], mb, num_heads=heads,
                ws=ws, dc1=0 if p == 0 else s, r_unroll=r_unroll,
                wchunk_override=wc)
        return xx

    return run


VARIANTS = {
    "seq_frames": chain_seq,
    # round-5 softmax structure probes (see NEXT_STEPS round-5 notes):
    # packexp = live-lane packed softmax (2x fewer exp2, bit-identical);
    # bf16exp = half-precision transcendental probe
    "seq_packexp": lambda: chain_seq("packexp"),
    "seq_bf16exp": lambda: chain_seq("bf16exp"),
    "pair_ur4": lambda: chain_pair(4),
    "pair_ur0": lambda: chain_pair(0),
    "pair_ur2": lambda: chain_pair(2),
    "pair_w240": lambda: chain_pair(4, wc=240),
    "pair_w128": lambda: chain_pair(4, wc=128),
}


def main():
    names = sys.argv[1:] or ["seq_frames", "pair_ur4"]
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
