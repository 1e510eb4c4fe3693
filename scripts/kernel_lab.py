"""Experimental variants of the Swin strip kernel, measured on the live TPU.

Each variant is a full attention half-block over (B, H, W, C) with strip
grid; ablations gut specific stages to locate cost:
- stacked  : current production design (per-window dots, 6-way concats)
- noattn   : qkv + windowize but attention replaced by copy (isolates core)
- nownd    : no windowize loop (operates on raw strip rows; wrong result,
             right cost)
- paired   : 2 windows per dot group; strip-wide masked K/V precompute;
             128-aligned per-head softmax slices
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _lab_kernel(x_ref, lnw_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                bq_ref, bk_ref, bv_ref, wproj_ref, bproj_ref,
                rpbq_ref, hmask_ref, out_ref,
                xw_ref, q_ref, k_ref, v_ref, attn_ref, km_ref, vm_ref,
                lg_ref, p_ref, *,
                num_heads, head_dim, nwin, ws, mode, eps=1e-5):
    c = num_heads * head_dim
    n = ws * ws
    scale = head_dim ** -0.5
    rows = x_ref[0, 0]  # (ws, W, C)

    # windowize
    if mode == "nownd":
        xw_ref[:] = rows.reshape(nwin * n, c)
    else:
        for wi in range(nwin):
            slab = rows[:, wi * ws:(wi + 1) * ws, :]
            xw_ref[wi * n:(wi + 1) * n, :] = slab.reshape(n, c)

    # LN
    if mode == "base_noln":
        y = xw_ref[:]
    else:
        xf = xw_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        y = ((y * lnw_ref[:][None, :] + lnb_ref[:][None, :])
             .astype(xw_ref.dtype))

    # qkv
    if mode == "base_noqkv":
        q_ref[:] = y
        k_ref[:] = y
        v_ref[:] = y
    else:
        for dst, w_ref, b_ref2 in ((q_ref, wq_ref, bq_ref),
                                   (k_ref, wk_ref, bk_ref),
                                   (v_ref, wv_ref, bv_ref)):
            dst[:] = (jax.lax.dot_general(
                y, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                + b_ref2[:][None, :]).astype(dst.dtype)

    if mode in ("noattn", "nownd", "base_noln", "base_noqkv",
                "base_noproj"):
        attn_ref[:] = q_ref[:]
    elif mode == "stacked":
        for wi in range(nwin):
            q = q_ref[wi * n:(wi + 1) * n, :]
            k = k_ref[wi * n:(wi + 1) * n, :]
            v = v_ref[wi * n:(wi + 1) * n, :]
            km = jnp.concatenate(
                [k * hmask_ref[h][None, :] for h in range(num_heads)], axis=0)
            lg = jax.lax.dot_general(
                q, km, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            lg = lg + rpbq_ref[:]
            ps = []
            for h in range(num_heads):
                blk = lg[:, h * n:(h + 1) * n]
                mx = jnp.max(blk, axis=1, keepdims=True)
                e = jnp.exp(blk - mx)
                ps.append(e / jnp.sum(e, axis=1, keepdims=True))
            p = jnp.concatenate(ps, axis=1).astype(v.dtype)
            vm = jnp.concatenate(
                [v * hmask_ref[h][None, :] for h in range(num_heads)], axis=0)
            out_w = jax.lax.dot_general(
                p, vm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_ref[wi * n:(wi + 1) * n, :] = out_w.astype(attn_ref.dtype)
    elif mode == "paired":
        npair = nwin // 2
        m = 2 * n  # 128 rows per pair
        # strip-wide masked K/V: km_ref viewed (npair, heads, 2n, c)
        kmv = km_ref.reshape(npair, num_heads, m, c)
        vmv = vm_ref.reshape(npair, num_heads, m, c)
        k_all = k_ref[:].reshape(npair, m, c)
        v_all = v_ref[:].reshape(npair, m, c)
        for h in range(num_heads):
            hm = hmask_ref[h][None, None, :]
            kmv[:, h] = k_all * hm
            vmv[:, h] = v_all * hm
        for p_i in range(npair):
            q2 = q_ref[p_i * m:(p_i + 1) * m, :]       # (128, C)
            km2 = km_ref[p_i * num_heads * m:(p_i + 1) * num_heads * m, :]
            vm2 = vm_ref[p_i * num_heads * m:(p_i + 1) * num_heads * m, :]
            lg = jax.lax.dot_general(
                q2, km2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (128, 6*128)
            lg = lg + rpbq_ref[:]  # rpbq pre-tiled (128, 6*128) w/ cross -inf
            ps = []
            for h in range(num_heads):
                blk = lg[:, h * m:(h + 1) * m]  # 128-aligned lane slice
                mx = jnp.max(blk, axis=1, keepdims=True)
                e = jnp.exp(blk - mx)
                ps.append(e / jnp.sum(e, axis=1, keepdims=True))
            p2 = jnp.concatenate(ps, axis=1).astype(q2.dtype)
            out_w = jax.lax.dot_general(
                p2, vm2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_ref[p_i * m:(p_i + 1) * m, :] = out_w.astype(attn_ref.dtype)

    elif mode in ("paired_staged", "paired_nokm"):
        # stage A: all logits dots into a strip-wide scratch; stage B: one
        # 6-slice softmax over the whole strip; stage C: all AV dots.
        npair = nwin // 2
        m = 2 * n
        if mode == "paired_staged":
            kmv = km_ref.reshape(npair, num_heads, m, c)
            vmv = vm_ref.reshape(npair, num_heads, m, c)
            k_all = k_ref[:].reshape(npair, m, c)
            v_all = v_ref[:].reshape(npair, m, c)
            for h in range(num_heads):
                hm = hmask_ref[h][None, None, :]
                kmv[:, h] = k_all * hm
                vmv[:, h] = v_all * hm
        for p_i in range(npair):
            q2 = q_ref[p_i * m:(p_i + 1) * m, :]
            km2 = km_ref[p_i * num_heads * m:(p_i + 1) * num_heads * m, :]
            lg_ref[p_i * m:(p_i + 1) * m, :] = jax.lax.dot_general(
                q2, km2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale \
                + rpbq_ref[:]
        for h in range(num_heads):
            blk = lg_ref[:, h * m:(h + 1) * m]
            mx = jnp.max(blk, axis=1, keepdims=True)
            e = jnp.exp(blk - mx)
            p_ref[:, h * m:(h + 1) * m] = \
                (e / jnp.sum(e, axis=1, keepdims=True)).astype(p_ref.dtype)
        for p_i in range(npair):
            vm2 = vm_ref[p_i * num_heads * m:(p_i + 1) * num_heads * m, :]
            ov = jax.lax.dot_general(
                p_ref[p_i * m:(p_i + 1) * m, :], vm2,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_ref[p_i * m:(p_i + 1) * m, :] = ov.astype(attn_ref.dtype)
    elif mode == "paired_perhead":
        # q/k/v in head-major 32-padded layout (cp = heads*32); per pair,
        # per head: one (128,32)x(32,128) logits dot + full-row softmax on
        # the native (128,128) tile + one (128,128)x(128,32) AV dot.
        npair = nwin // 2
        m = 2 * n
        hp = 32
        for p_i in range(npair):
            for h in range(num_heads):
                qh = q_ref[p_i * m:(p_i + 1) * m, h * hp:(h + 1) * hp]
                kh = k_ref[p_i * m:(p_i + 1) * m, h * hp:(h + 1) * hp]
                vh = v_ref[p_i * m:(p_i + 1) * m, h * hp:(h + 1) * hp]
                lg = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                lg = lg + rpbq_ref[:, h * m:(h + 1) * m]
                mx = jnp.max(lg, axis=1, keepdims=True)
                e = jnp.exp(lg - mx)
                p2 = (e / jnp.sum(e, axis=1, keepdims=True)).astype(qh.dtype)
                ov = jax.lax.dot_general(
                    p2, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                attn_ref[p_i * m:(p_i + 1) * m,
                         h * hp:(h + 1) * hp] = ov.astype(attn_ref.dtype)

    if mode == "base_noproj":
        res = attn_ref[:]
    else:
        proj = jax.lax.dot_general(
            attn_ref[:], wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bproj_ref[:][None, :]
        res = (proj + xw_ref[:].astype(jnp.float32)).astype(out_ref.dtype)
    if mode == "nownd":
        out_ref[0, 0] = res.reshape(ws, nwin * ws, c)
    else:
        for wi in range(nwin):
            out_ref[0, 0, :, wi * ws:(wi + 1) * ws, :] = \
                res[wi * n:(wi + 1) * n, :].reshape(ws, ws, c)


@functools.partial(jax.jit, static_argnames=("num_heads", "ws", "mode"))
def lab_strip(x, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
              num_heads=6, ws=8, mode="stacked"):
    b, h, w, c = x.shape
    n = ws * ws
    hd = c // num_heads
    nwin = w // ws
    strips = b * (h // ws)

    head_mask = np.zeros((num_heads, c), np.float32)
    for hh in range(num_heads):
        head_mask[hh, hh * hd:(hh + 1) * hd] = 1.0
    hmask = jnp.asarray(head_mask, dtype=x.dtype)

    if mode in ("paired", "paired_staged", "paired_nokm",
                "paired_perhead"):
        # (128, 6*128) bias: tile rpb per (query window, key window) with
        # -1e9 on cross quadrants
        m = 2 * n
        neg = jnp.full((n, n), -1e9, jnp.float32)
        blocks = []
        for hh in range(num_heads):
            top = jnp.concatenate([rpb[hh], neg], axis=1)      # (n, 2n)
            bot = jnp.concatenate([neg, rpb[hh]], axis=1)
            blocks.append(jnp.concatenate([top, bot], axis=0))  # (2n, 2n)
        rpbq = jnp.concatenate(blocks, axis=1)  # (2n, heads*2n)
        sc_km = pltpu.VMEM((nwin // 2 * num_heads * m, c), x.dtype) \
            if mode in ("paired", "paired_staged", "paired_nokm") \
            else pltpu.VMEM((8, 128), x.dtype)
    else:
        rpbq = jnp.transpose(rpb.astype(jnp.float32), (1, 0, 2)) \
            .reshape(n, num_heads * n)
        sc_km = pltpu.VMEM((8, 128), x.dtype)  # dummy

    # perhead layout: reorder qkv columns / proj rows per head, pad to 32
    hp = -(-hd // 32) * 32 if mode == "paired_perhead" else hd
    cp = num_heads * hp

    def pad_cols(wmat, bvec):
        pw, pb = [], []
        for hh in range(num_heads):
            pw.append(wmat[:, hh * hd:(hh + 1) * hd])
            pb.append(bvec[hh * hd:(hh + 1) * hd])
            if hp > hd:
                pw.append(jnp.zeros((c, hp - hd), wmat.dtype))
                pb.append(jnp.zeros((hp - hd,), bvec.dtype))
        return jnp.concatenate(pw, axis=1), jnp.concatenate(pb)

    if mode == "paired_perhead":
        wq_a, bq_a = pad_cols(wqkv[:, :c], bqkv[:c])
        wk_a, bk_a = pad_cols(wqkv[:, c:2 * c], bqkv[c:2 * c])
        wv_a, bv_a = pad_cols(wqkv[:, 2 * c:], bqkv[2 * c:])
        pr = []
        for hh in range(num_heads):
            pr.append(wproj[hh * hd:(hh + 1) * hd])
            if hp > hd:
                pr.append(jnp.zeros((hp - hd, c), wproj.dtype))
        wp_a = jnp.concatenate(pr, axis=0)
    else:
        wq_a, bq_a = wqkv[:, :c], bqkv[:c]
        wk_a, bk_a = wqkv[:, c:2 * c], bqkv[c:2 * c]
        wv_a, bv_a = wqkv[:, 2 * c:], bqkv[2 * c:]
        wp_a = wproj

    if mode in ("paired_staged", "paired_nokm"):
        sc_lg = pltpu.VMEM((nwin * n, num_heads * 2 * n), jnp.float32)
        sc_p = pltpu.VMEM((nwin * n, num_heads * 2 * n), x.dtype)
    else:
        sc_lg = pltpu.VMEM((8, 128), jnp.float32)
        sc_p = pltpu.VMEM((8, 128), x.dtype)

    xs = x.reshape(strips, 1, ws, w, c)

    def rep(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _lab_kernel, num_heads=num_heads, head_dim=hd, nwin=nwin, ws=ws,
        mode=mode)

    out = pl.pallas_call(
        kernel,
        grid=(strips,),
        in_specs=[
            pl.BlockSpec((1, 1, ws, w, c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((c,)), rep((c,)),
            rep((c, cp)), rep((c, cp)), rep((c, cp)),
            rep((cp,)), rep((cp,)), rep((cp,)),
            rep((cp, c)), rep((c,)),
            rep(tuple(rpbq.shape)),
            rep((num_heads, c)),
        ],
        out_specs=pl.BlockSpec((1, 1, ws, w, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((strips, 1, ws, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nwin * n, c), x.dtype),
            pltpu.VMEM((nwin * n, cp), x.dtype),
            pltpu.VMEM((nwin * n, cp), x.dtype),
            pltpu.VMEM((nwin * n, cp), x.dtype),
            pltpu.VMEM((nwin * n, cp), x.dtype),
            sc_km,
            sc_km,
            sc_lg,
            sc_p,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, lnw.astype(jnp.float32), lnb.astype(jnp.float32),
      wq_a.astype(x.dtype), wk_a.astype(x.dtype), wv_a.astype(x.dtype),
      bq_a.astype(jnp.float32), bk_a.astype(jnp.float32),
      bv_a.astype(jnp.float32),
      wp_a.astype(x.dtype), bproj.astype(jnp.float32),
      rpbq, hmask)
    return out.reshape(b, h, w, c)


def main():
    b, t, c, heads, ws = 4, 256, 180, 6, 8
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

    f0 = jax.jit(lambda xx: xx + 1)
    t_over = timeit(f0, x)

    # correctness: paired vs stacked
    o_s = lab_strip(x, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb, mode="stacked")
    for m in ("paired", "paired_staged", "paired_perhead"):
        o_p = lab_strip(x, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb, mode=m)
        err = jnp.max(jnp.abs(o_s.astype(jnp.float32)
                              - o_p.astype(jnp.float32)))
        print(f"{m} vs stacked max err: {err:.5f}")

    for mode in ("stacked", "noattn", "nownd", "paired",
                 "paired_staged", "paired_perhead",
                 "base_noln", "base_noqkv", "base_noproj", "paired_nokm"):
        f = loop(lambda xx, m=mode: lab_strip(
            xx, lnw, lnb, wqkv, bqkv, wproj, bproj, rpb, mode=m))
        tt = (timeit(f, x) - t_over) / ITERS
        print(f"lab[{mode}]: {tt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
