"""Fused Pallas TPU kernel for windowed multi-head self-attention.

Why: the XLA path materializes (nWB, heads, N, head_dim) tensors whose minor
dim (head_dim = 30 for SwinIR-M) pads to 128 lanes — every intermediate
becomes a 4x-bloated HBM round-trip (~17 ms per SwinIR-M block vs ~1 ms
roofline). This kernel keeps a block of windows VMEM-resident and measures
~2x faster than both the XLA einsum path and a naive per-head-slicing
kernel.

Design (benchmarked against alternatives on v5e — see git history):
- NO per-head lane slicing: head h's logits use the full-width dot
  ``(q * head_mask_h) @ k^T`` (masked channels contribute zero), so every
  MXU operand keeps C in lanes at its natural offset. Unaligned 30-channel
  lane slices cost more in relayouts than the 6x redundant K contraction.
- Staged per window-pair: all head logits -> one batched f32 softmax over
  (2*heads*N, N) -> all AV dots, shortening dependency chains so Mosaic
  overlaps MXU and VPU work.
- Relative-position bias (+ shifted-window mask) added in-kernel from VMEM
  constants; HBM traffic = qkv in + out once.

Layout contract: qkv is (nWB, N, 3C), packed [q | k | v] like a torch qkv
Linear, windows ordered image-major then row-major (window w's shift-mask
group is w mod nW). rpb is (heads, N, N) f32; mask is (nW, N, N) f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qkv_ref, rpb_ref, hmask_ref, wmask_ref, out_ref, lg_ref, *,
            num_heads, head_dim, g, pair, use_wmask):
    c = num_heads * head_dim
    n = qkv_ref.shape[1]
    scale = head_dim ** -0.5
    for w0 in range(0, g, pair):
        wins = range(w0, min(w0 + pair, g))
        # stage 1: all head logits for `pair` windows into f32 scratch
        for wi, w in enumerate(wins):
            q3 = qkv_ref[w]
            q = q3[:, :c]
            k = q3[:, c:2 * c]
            for h in range(num_heads):
                qm = q * hmask_ref[h][None, :]
                lg = jax.lax.dot_general(
                    qm, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                lg = lg + rpb_ref[h]
                if use_wmask:
                    lg = lg + wmask_ref[w]
                lg_ref[(wi * num_heads + h) * n:(wi * num_heads + h + 1) * n,
                       :] = lg
        # stage 2: one batched softmax
        allg = lg_ref[: len(list(wins)) * num_heads * n, :]
        m = jnp.max(allg, axis=-1, keepdims=True)
        p = jnp.exp(allg - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_ref.dtype)
        # stage 3: AV per window-head, accumulated full width
        for wi, w in enumerate(wins):
            v = qkv_ref[w][:, 2 * c:]
            acc = jnp.zeros((n, c), jnp.float32)
            for h in range(num_heads):
                vm = v * hmask_ref[h][None, :]
                acc = acc + jax.lax.dot_general(
                    p[(wi * num_heads + h) * n:(wi * num_heads + h + 1) * n,
                      :], vm,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[w] = acc.astype(out_ref.dtype)


def _block_kernel(xw_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, rpb_ref, hmask_ref, wmask_ref, out_ref,
                  y_ref, qkv_ref, attn_ref, lg_ref, *,
                  num_heads, head_dim, g, pair, use_wmask, eps=1e-5):
    """Fused Swin attention half-block: LN -> qkv -> window MHSA -> proj ->
    +residual, one grid step per g windows, everything VMEM-resident."""
    c = num_heads * head_dim
    n = xw_ref.shape[1]
    scale = head_dim ** -0.5

    # stage 0: LayerNorm all g windows into y_ref (g*n, C)
    x_all = xw_ref[:].reshape(g * n, c)
    xf = x_all.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * lnw_ref[:][None, :] + lnb_ref[:][None, :]
    y_ref[:] = y.astype(y_ref.dtype)

    # stage 1: one big qkv matmul for the whole block
    qkv_ref[:] = (jax.lax.dot_general(
        y_ref[:], wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bqkv_ref[:][None, :]).astype(qkv_ref.dtype)

    # stage 2: window attention (same staged design as wmsa_pallas)
    for w0 in range(0, g, pair):
        wins = range(w0, min(w0 + pair, g))
        for wi, w in enumerate(wins):
            q = qkv_ref[w * n:(w + 1) * n, :c]
            k = qkv_ref[w * n:(w + 1) * n, c:2 * c]
            for h in range(num_heads):
                qm = q * hmask_ref[h][None, :]
                lg = jax.lax.dot_general(
                    qm, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                lg = lg + rpb_ref[h]
                if use_wmask:
                    lg = lg + wmask_ref[w]
                lg_ref[(wi * num_heads + h) * n:
                       (wi * num_heads + h + 1) * n, :] = lg
        allg = lg_ref[: len(list(wins)) * num_heads * n, :]
        m = jnp.max(allg, axis=-1, keepdims=True)
        p = jnp.exp(allg - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv_ref.dtype)
        for wi, w in enumerate(wins):
            v = qkv_ref[w * n:(w + 1) * n, 2 * c:]
            acc = jnp.zeros((n, c), jnp.float32)
            for h in range(num_heads):
                vm = v * hmask_ref[h][None, :]
                acc = acc + jax.lax.dot_general(
                    p[(wi * num_heads + h) * n:
                      (wi * num_heads + h + 1) * n, :], vm,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            attn_ref[w * n:(w + 1) * n, :] = acc.astype(attn_ref.dtype)

    # stage 3: output projection + residual for the whole block
    proj = jax.lax.dot_general(
        attn_ref[:], wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj_ref[:][None, :]
    out_ref[:] = (proj.reshape(g, n, c)
                  + xw_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "g", "interpret"))
def wmsa_block_pallas(xw, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                      rpb, mask=None, num_heads: int = 6, g: int = 8,
                      interpret: bool = False):
    """Fused LN + qkv + window-MHSA + proj + residual.

    Args:
        xw: (nWB, N, C) pre-norm window features (the block shortcut).
        ln_scale/ln_bias: (C,) LayerNorm affine (eps 1e-5).
        wqkv: (C, 3C), bqkv: (3C,) — torch-order packed q|k|v.
        wproj: (C, C), bproj: (C,).
        rpb: (heads, N, N) f32; mask optional (nW, N, N) f32.

    Returns:
        (nWB, N, C) = xw + proj(attn(LN(xw))).
    """
    nwb, n, c = xw.shape
    hd = c // num_heads
    assert nwb % g == 0, (nwb, g)
    pair = 2 if g % 2 == 0 else 1

    head_mask = np.zeros((num_heads, c), np.float32)
    for h in range(num_heads):
        head_mask[h, h * hd:(h + 1) * hd] = 1.0
    hmask = jnp.asarray(head_mask, dtype=xw.dtype)

    use_wmask = mask is not None
    if use_wmask:
        nw = mask.shape[0]
        assert nwb % nw == 0 and nw % g == 0, (nwb, nw, g)
        wmask_arg = mask.astype(jnp.float32)
        wmask_spec = pl.BlockSpec((g, n, n), lambda i: (i % (nw // g), 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        wmask_arg = jnp.zeros((1, n, n), jnp.float32)
        wmask_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _block_kernel, num_heads=num_heads, head_dim=hd, g=g, pair=pair,
        use_wmask=use_wmask)

    def rep(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(nwb // g,),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((c,)), rep((c,)),
            rep((c, 3 * c)), rep((3 * c,)),
            rep((c, c)), rep((c,)),
            rep((num_heads, n, n)),
            rep((num_heads, c)),
            wmask_spec,
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwb, n, c), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * n, c), xw.dtype),            # y (post-LN)
            pltpu.VMEM((g * n, 3 * c), xw.dtype),        # qkv
            pltpu.VMEM((g * n, c), xw.dtype),            # attn out
            pltpu.VMEM((pair * num_heads * n, n), jnp.float32),  # logits
        ],
        interpret=interpret,
    )(xw, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      wqkv.astype(xw.dtype), bqkv.astype(jnp.float32),
      wproj.astype(xw.dtype), bproj.astype(jnp.float32),
      rpb.astype(jnp.float32), hmask, wmask_arg)


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7): Mosaic has
    no erf lowering, and this is far below bf16 resolution."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _strip_kernel(a_ref, b_ref, lnw_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                  bq_ref, bk_ref, bv_ref, wproj_ref, bproj_ref,
                  rpbq_ref, hmask_ref, wmask_ref, out_ref,
                  xw_ref, q_ref, k_ref, v_ref, attn_ref, *,
                  num_heads, head_dim, nwin, ws, dc, mask_mode,
                  attn_mode="stacked", eps=1e-5):
    """Strip-I/O fused Swin half-block with the cyclic roll folded into its
    reads: the two s-row input refs (modular index maps, like roll2d_pallas)
    assemble one ws-row strip of the ROLLED tensor; columns rotate in VMEM.
    Then LN -> qkv -> window attention -> proj -> +residual, written back in
    the rolled frame — the caller tracks frames and never materializes a
    rolled copy in HBM.

    Attention is head-stacked and QUERY-major: logits = q @ [k_h]^T over all
    heads at once — one (N, C) x (C, H*N) dot whose MXU N-dim is H*N (384
    for SwinIR-M) instead of the half-utilized 64-lane key-major layout; AV
    contracts the stacked (H*N) columns against stacked values.

    mask_mode: 0 = none, 1 = full per-window mask (wmask (nwin, N, N)),
    2 = edge bank (wmask (2, N, N): [interior-or-row-edge, col-edge] — the
    row-edge choice is made by the index map, the col edge statically by
    window position). Bank mode exists because a whole-image canvas has
    O(HW) windows but only 4 distinct cyclic-shift mask patterns.
    """
    c = num_heads * head_dim
    n = ws * ws
    w = a_ref.shape[3]
    scale = head_dim ** -0.5

    # assemble the (ws, W, C) strip of the rolled tensor
    rows = jnp.concatenate([a_ref[0, 0], b_ref[0, 0]], axis=0)
    if dc < 0:
        rows = jnp.concatenate([rows[:, -dc:], rows[:, :-dc]], axis=1)
    elif dc > 0:
        rows = jnp.concatenate([rows[:, w - dc:], rows[:, :w - dc]], axis=1)

    # windowize into scratch (nwin*n, C)
    for wi in range(nwin):
        slab = rows[:, wi * ws:(wi + 1) * ws, :]
        xw_ref[wi * n:(wi + 1) * n, :] = slab.reshape(n, c)

    # LN all windows
    xf = xw_ref[:].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * lnw_ref[:][None, :] + lnb_ref[:][None, :]).astype(xw_ref.dtype)

    # separate q/k/v projections for the whole strip: three aligned
    # (nwin*N, C) scratches — no unaligned 3C column slicing per window
    for dst, w_ref, b_ref2 in ((q_ref, wq_ref, bq_ref),
                               (k_ref, wk_ref, bk_ref),
                               (v_ref, wv_ref, bv_ref)):
        dst[:] = (jax.lax.dot_general(
            y, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b_ref2[:][None, :]).astype(dst.dtype)

    hp = q_ref.shape[1] // num_heads  # padded head width
    for wi in range(nwin):
        q = q_ref[wi * n:(wi + 1) * n, :]
        k = k_ref[wi * n:(wi + 1) * n, :]
        v = v_ref[wi * n:(wi + 1) * n, :]
        if mask_mode == 1:
            wm = wmask_ref[wi]
        elif mask_mode == 2:
            wm = wmask_ref[1 if wi == nwin - 1 else 0]
        if attn_mode == "perhead":
            # per-head 32-padded dots: the qkv weights were column-reordered
            # and zero-padded per head at trace time, so q/k/v are already
            # (N, H*32) head-major — aligned 32-lane slices, true-FLOP
            # (64,32)x(32,64) dots instead of masked 180-wide contractions
            outs = []
            for h in range(num_heads):
                qh = q[:, h * hp:(h + 1) * hp]
                kh = k[:, h * hp:(h + 1) * hp]
                vh = v[:, h * hp:(h + 1) * hp]
                lg = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                lg = lg + rpbq_ref[:, h * n:(h + 1) * n]
                if mask_mode:
                    lg = lg + wm
                mx = jnp.max(lg, axis=1, keepdims=True)
                e = jnp.exp(lg - mx)
                p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v.dtype)
                outs.append(jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            out_w = jnp.concatenate(outs, axis=1)  # (N, H*32) head-major
            attn_ref[wi * n:(wi + 1) * n, :] = out_w.astype(attn_ref.dtype)
            continue
        km = jnp.concatenate(
            [k * hmask_ref[h][None, :] for h in range(num_heads)], axis=0)
        # query-major logits, all heads stacked in lanes: lg[i, h*N+j]
        lg = jax.lax.dot_general(
            q, km, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        lg = lg + rpbq_ref[:]
        # softmax over keys = within each head's lane block
        ps = []
        for h in range(num_heads):
            blk = lg[:, h * n:(h + 1) * n]
            if mask_mode:
                blk = blk + wm
            mx = jnp.max(blk, axis=1, keepdims=True)
            e = jnp.exp(blk - mx)
            ps.append(e / jnp.sum(e, axis=1, keepdims=True))
        p = jnp.concatenate(ps, axis=1).astype(v.dtype)  # (N, H*N)
        vm = jnp.concatenate(
            [v * hmask_ref[h][None, :] for h in range(num_heads)], axis=0)
        out_w = jax.lax.dot_general(
            p, vm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, C) = sum of heads
        attn_ref[wi * n:(wi + 1) * n, :] = out_w.astype(attn_ref.dtype)

    # projection + residual, then de-windowize back to the strip
    proj = jax.lax.dot_general(
        attn_ref[:], wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj_ref[:][None, :]
    res = (proj + xw_ref[:].astype(jnp.float32)).astype(out_ref.dtype)
    for wi in range(nwin):
        out_ref[0, 0, :, wi * ws:(wi + 1) * ws, :] = \
            res[wi * n:(wi + 1) * n, :].reshape(ws, ws, c)


def _strip_kernel_paired(*args, num_heads, head_dim, nwin, ws, dc, chunk,
                         rrows=1, ccols=1, s0=0, g2=False, fuse_mlp=False,
                         ablate="", wnd="slab", fastmath=False,
                         r_unroll=1, interpret=False, eps=1e-5):
    """Paired-window strip kernel: 2 windows per MXU dot group.

    Measured ~1.4x faster than the per-window 'stacked' design on v5e: the
    query dim fills a full 128-row MXU tile (2 windows x 64 tokens) with the
    cross-window logits killed by a -1e9 additive bias, key/value masked
    stacks are built strip-wide in 6 vector ops (instead of 6 concats per
    window), and the softmax runs once per chunk over 128-lane-aligned head
    blocks. The attention scale is folded into wq at trace time; rpb and
    shift masks are fused into one per-pair bias constant
    (bias_ref[0, row, is_last_pair], row-edge variant via index map).

    ``rrows`` (superstrips): process R window-rows per grid step. The
    measured per-grid-step fixed cost is ~11us (the pure-I/O ablation runs
    at 1.46 ms for 128 steps — 12x off DMA roofline), so fewer, fatter
    steps amortize it. Input = 2R s-row group refs (modular index maps
    keep the folded roll); bias gains a per-row dimension so the
    row-edge mask variant lands on the image's true last window-row only.

    ``g2`` (paired2 mode): heads processed in groups of TWO via
    block-diagonal (2m, 2*hp) key/value stacks — contraction width drops
    from C (every head's logit paying the full 180-wide masked contraction,
    a ~6x FLOP amplification) to 2*hp=64, cutting attention-core FLOPs
    ~2.8x while keeping (m, 2m, 64) MXU-friendly dot shapes. Requires the
    q/k/v weights pre-reordered head-major and zero-padded to hp=32 per
    head (and wproj row-reordered to match) at trace time.

    ``ccols`` (column-chunked full-canvas mode): 2 when the caller runs a
    2D grid (row-strips x column-chunks) over a canvas wider than one
    chunk with a roll. The column part of the folded cyclic roll then
    spans chunk boundaries, so the kernel receives one full chunk plus an
    8-col boundary SLIVER per row group (4 x refs ordered [r0_chunk,
    r1_chunk, r0_sliver, r1_sliver], modular index maps in sliver units)
    and slices the rolled window at static offset ``s0``. The sliver
    (instead of a second full chunk) keeps shifted-block read traffic at
    ~1.03x instead of 2x. This keeps the Mosaic program (and its compile
    time) at single-chunk width while the grid covers the whole image —
    the untiled path that removes the tile-overlap redundancy of tiled
    serving.
    """
    nx = 2 * rrows * ccols
    xrefs = args[:nx]
    (lnw_ref, lnb_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
     wproj_ref, bproj_ref, bias_ref, hmask_ref) = args[nx:nx + 12]
    rest = args[nx + 12:]
    if fuse_mlp:
        (ln2w_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref, xw_ref, q_ref, k_ref, v_ref, attn_ref,
         km_ref, vm_ref, lg_ref, p_ref) = rest
    else:
        (out_ref, xw_ref, q_ref, k_ref, v_ref, attn_ref,
         km_ref, vm_ref, lg_ref, p_ref) = rest
    c = num_heads * head_dim
    n = ws * ws
    m = 2 * n
    w = xrefs[0].shape[3]
    npair_row = nwin // 2
    npair = rrows * npair_row
    twin = rrows * nwin
    hp = q_ref.shape[1] // num_heads  # padded head width (g2: 32)
    ngr = num_heads // 2

    if ccols == 2:
        # column-chunked with a roll: ONE full chunk + an 8-col boundary
        # sliver per row group (the cyclic roll only needs |dc| <= 8
        # columns past the chunk edge, so fetching a second full chunk
        # would double read traffic for nothing); slice the rolled window
        # at static offset s0
        ch = jnp.concatenate([r[0, 0] for r in xrefs[:2 * rrows]], axis=0)
        sl = jnp.concatenate([r[0, 0] for r in xrefs[2 * rrows:]], axis=0)
        both = jnp.concatenate([ch, sl] if dc < 0 else [sl, ch], axis=1)
        rows = both[:, s0:s0 + w, :]
    else:
        rows = jnp.concatenate([r[0, 0] for r in xrefs], axis=0)
        if dc < 0:
            rows = jnp.concatenate([rows[:, -dc:], rows[:, :-dc]], axis=1)
        elif dc > 0:
            rows = jnp.concatenate([rows[:, w - dc:], rows[:, :w - dc]],
                                   axis=1)

    for wg in range(twin):
        rr, wi = wg // nwin, wg % nwin
        if wnd == "rows":
            # per-spatial-row 2D stores: each is an aligned (ws, C) tile
            # move, no 3D reshape for Mosaic to lower
            for r in range(ws):
                xw_ref[wg * n + r * ws:wg * n + (r + 1) * ws, :] = \
                    rows[rr * ws + r, wi * ws:(wi + 1) * ws, :]
        else:
            slab = rows[rr * ws:(rr + 1) * ws, wi * ws:(wi + 1) * ws, :]
            xw_ref[wg * n:(wg + 1) * n, :] = slab.reshape(n, c)

    if ablate == "nownd":  # perf probe: DMA + roll assembly only
        out_ref[0, 0] = (rows.astype(jnp.float32) + 1.0) \
            .astype(out_ref.dtype)
        return
    if ablate == "minimal":  # perf probe: I/O + windowize only
        res = xw_ref[:].astype(jnp.float32) + 1.0
        res = res.astype(out_ref.dtype)
        for wg in range(twin):
            rr, wi = wg // nwin, wg % nwin
            if wnd == "rows":
                for r in range(ws):
                    out_ref[0, 0, rr * ws + r,
                            wi * ws:(wi + 1) * ws, :] = \
                        res[wg * n + r * ws:wg * n + (r + 1) * ws, :]
            else:
                out_ref[0, 0, rr * ws:(rr + 1) * ws,
                        wi * ws:(wi + 1) * ws, :] = \
                    res[wg * n:(wg + 1) * n, :].reshape(ws, ws, c)
        return

    if ablate == "noln":  # perf probe: skip LayerNorms (wrong numerics)
        y = xw_ref[:]
    else:
        xf = xw_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        y = (y * lnw_ref[:][None, :]
             + lnb_ref[:][None, :]).astype(xw_ref.dtype)

    for dst, w_ref, b_ref2 in ((q_ref, wq_ref, bq_ref),
                               (k_ref, wk_ref, bk_ref),
                               (v_ref, wv_ref, bv_ref)):
        dst[:] = (jax.lax.dot_general(
            y, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b_ref2[:][None, :]).astype(dst.dtype)

    if g2 == "rolled" and fastmath:
        # register-fused rolled body: the fori_loop makes lowering/compile
        # O(1) in strip width (the unrolled fused path below costs ~110s of
        # client-side lowering at the 1920-wide headline), while keeping the
        # unrolled fused path's structure — block-diagonal 2-head k/v stacks
        # built as register VALUES (no km/vm scratch stores at traced
        # offsets, which is what made the original rolled mode slower) and
        # clamp-softmax in registers between the two dots. Logits arrive
        # pre-scaled by log2(e) exactly as in the unrolled fastmath path.
        zblk = jnp.zeros((m, hp), k_ref.dtype)

        def one_pair(g):
            col_last = (g % npair_row) == npair_row - 1
            # superstrips (rrows > 1): the bias row variant follows the
            # pair's window-row within the step (static when unrolled,
            # dynamic VMEM index inside the fori body otherwise)
            rr = (g // npair_row) if rrows > 1 else 0
            kp = k_ref[pl.ds(g * m, m), :]
            vp = v_ref[pl.ds(g * m, m), :]
            qp = q_ref[pl.ds(g * m, m), :]
            for gr in range(ngr):
                k0 = kp[:, 2 * gr * hp:(2 * gr + 1) * hp]
                k1 = kp[:, (2 * gr + 1) * hp:(2 * gr + 2) * hp]
                km2 = jnp.concatenate(
                    [jnp.concatenate([k0, zblk], axis=1),
                     jnp.concatenate([zblk, k1], axis=1)], axis=0)
                v0 = vp[:, 2 * gr * hp:(2 * gr + 1) * hp]
                v1 = vp[:, (2 * gr + 1) * hp:(2 * gr + 2) * hp]
                vm2 = jnp.concatenate(
                    [jnp.concatenate([v0, zblk], axis=1),
                     jnp.concatenate([zblk, v1], axis=1)], axis=0)
                q2 = qp[:, 2 * gr * hp:(2 * gr + 2) * hp]
                lg = jax.lax.dot_general(
                    q2, km2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                b0 = bias_ref[0, rr, 0, :, 2 * gr * m:(2 * gr + 2) * m]
                b1 = bias_ref[0, rr, 1, :, 2 * gr * m:(2 * gr + 2) * m]
                lg = lg + jnp.where(col_last, b1, b0)
                if "packexp" in ablate:
                    # round-5 probe: live-lane packed softmax. The pair's
                    # (m, 2m) logits are HALF dead (-1e9 cross-window
                    # quadrants from the block-diagonal 2-window packing
                    # that sizes the MXU dots); pack the four live (n, n)
                    # diagonal blocks into one dense (m, m) tile so exp2
                    # and normalization touch live lanes only — 2x fewer
                    # VPU transcendentals for lane-rotate assembly cost.
                    # Bit-identical: dead lanes contribute exp2(-1e9) = 0.0
                    # to the sums either way.
                    nh = m // 2
                    lg0, lg1 = lg[:, :m], lg[:, m:]
                    u = jnp.concatenate([
                        jnp.concatenate([lg0[:nh, :nh], lg0[nh:, nh:]],
                                        axis=1),
                        jnp.concatenate([lg1[:nh, :nh], lg1[nh:, nh:]],
                                        axis=1)], axis=0)
                    eu = jnp.exp2(jnp.minimum(u, 86.56))
                    pu = jnp.concatenate(
                        [eu[:, :nh] * (1.0 / jnp.sum(eu[:, :nh], axis=1,
                                                     keepdims=True)),
                         eu[:, nh:] * (1.0 / jnp.sum(eu[:, nh:], axis=1,
                                                     keepdims=True))],
                        axis=1).astype(vm2.dtype)
                    znn = jnp.zeros((nh, nh), vm2.dtype)
                    pa, pb = pu[:nh], pu[nh:]
                    p01 = jnp.concatenate([
                        jnp.concatenate(
                            [jnp.concatenate([pa[:, :nh], znn], 1),
                             jnp.concatenate([znn, pa[:, nh:]], 1)], 0),
                        jnp.concatenate(
                            [jnp.concatenate([pb[:, :nh], znn], 1),
                             jnp.concatenate([znn, pb[:, nh:]], 1)], 0)],
                        axis=1)
                    ov = jax.lax.dot_general(
                        p01, vm2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    attn_ref[pl.ds(g * m, m),
                             2 * gr * hp:(2 * gr + 2) * hp] = \
                        ov.astype(attn_ref.dtype)
                    continue
                if "pexp" in ablate:
                    # perf probe: polynomial exp2 — round/cubic-poly the
                    # fraction, build 2^int via the f32 exponent field
                    xc = jnp.clip(lg, -100.0, 86.56)
                    xi = jnp.floor(xc + 0.5)
                    fr = xc - xi
                    p2f = 1.0 + fr * (0.69314718
                                      + fr * (0.24022651
                                              + fr * 0.05550411))
                    ex = jax.lax.bitcast_convert_type(
                        (xi.astype(jnp.int32) + 127) << 23, jnp.float32)
                    e = p2f * ex
                elif "bf16exp" in ablate:
                    # perf probe: half-precision transcendental — measures
                    # whether the VPU rates bf16 exp2 above f32 (softmax
                    # weights only need ~8 relative bits before a bf16 AV
                    # dot anyway; sums stay f32)
                    e = jnp.exp2(jnp.minimum(lg, 86.56)
                                 .astype(jnp.bfloat16)).astype(jnp.float32)
                else:
                    e = jnp.exp2(jnp.minimum(lg, 86.56))
                if "divnorm" in ablate:
                    # probe: broadcast-divide normalization (the pre-r4
                    # default; m*2m divides per pair)
                    p01 = jnp.concatenate(
                        [e[:, :m] / jnp.sum(e[:, :m], axis=1,
                                            keepdims=True),
                         e[:, m:] / jnp.sum(e[:, m:], axis=1,
                                            keepdims=True)],
                        axis=1).astype(vm2.dtype)
                else:
                    # reciprocal-multiply normalization: 128 divides per
                    # (m,1) sum instead of m*2m broadcast divs — measured
                    # 11.325 vs 11.454 ms/block at the w384 headline
                    # geometry, bit-identical at the bf16 output
                    # (scripts/lab_r4.py p2r_w384 vs p2r_w384_recip)
                    p01 = jnp.concatenate(
                        [e[:, :m] * (1.0 / jnp.sum(e[:, :m], axis=1,
                                                   keepdims=True)),
                         e[:, m:] * (1.0 / jnp.sum(e[:, m:], axis=1,
                                                   keepdims=True))],
                        axis=1).astype(vm2.dtype)
                ov = jax.lax.dot_general(
                    p01, vm2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                attn_ref[pl.ds(g * m, m),
                         2 * gr * hp:(2 * gr + 2) * hp] = \
                    ov.astype(attn_ref.dtype)

        # partial unroll: U pair bodies per fori_loop iteration restore the
        # cross-pair software pipelining a 1-pair body denies Mosaic, while
        # keeping lowering/compile O(U) instead of O(npair); r_unroll<=0 =
        # full unroll (npair is chunk-bounded: <=15 at the headline's 240-
        # wide column chunks, <=24 at the 384 non-chunked cap — measured
        # 13.2 ms/block vs 14.5 unrolled-paired2 AND 1.1s vs 205s lowering)
        uu = npair if r_unroll <= 0 else max(1, min(r_unroll, npair))

        if uu >= npair:
            # full unroll: a static Python loop keeps every index (incl.
            # the superstrip bias row rr) static for Mosaic
            for g_t in range(npair):
                one_pair(g_t)
        else:
            def pair_body(it, carry):
                for u in range(uu):
                    one_pair(it * uu + u)
                return carry

            jax.lax.fori_loop(0, npair // uu, pair_body, 0)
            for g_t in range(npair - npair % uu, npair):  # static tail
                one_pair(g_t)
        g2 = None
    if g2 == "rolled":
        # fori_loop over pairs: compile time independent of npair (the
        # unrolled loops below multiply Mosaic compile time with strip
        # width — 185s vs 5s measured at W=256; prohibitive at
        # whole-image W). Two rolled phases around ONE batched softmax
        # (per-pair softmax costs ~20% runtime in VPU batching), chunked
        # so the lg/p scratches stay at `chunk` pairs.
        zblk = jnp.zeros((m, hp), km_ref.dtype)
        nchunk = -(-npair // chunk)

        def chunk_body(ci, carry):
            p0 = ci * chunk

            def qk_body(pi, carry2):
                g = p0 + pi
                col_last = (g % npair_row) == npair_row - 1
                kp = k_ref[pl.ds(g * m, m), :]
                vp = v_ref[pl.ds(g * m, m), :]
                for gr in range(ngr):
                    base = gr * 2 * m
                    h0, h1 = 2 * gr, 2 * gr + 1
                    km_ref[pl.ds(pi * ngr * 2 * m + base, m), :hp] = \
                        kp[:, h0 * hp:(h0 + 1) * hp]
                    km_ref[pl.ds(pi * ngr * 2 * m + base, m), hp:] = zblk
                    km_ref[pl.ds(pi * ngr * 2 * m + base + m, m), :hp] = \
                        zblk
                    km_ref[pl.ds(pi * ngr * 2 * m + base + m, m), hp:] = \
                        kp[:, h1 * hp:(h1 + 1) * hp]
                    vm_ref[pl.ds(pi * ngr * 2 * m + base, m), :hp] = \
                        vp[:, h0 * hp:(h0 + 1) * hp]
                    vm_ref[pl.ds(pi * ngr * 2 * m + base, m), hp:] = zblk
                    vm_ref[pl.ds(pi * ngr * 2 * m + base + m, m), :hp] = \
                        zblk
                    vm_ref[pl.ds(pi * ngr * 2 * m + base + m, m), hp:] = \
                        vp[:, h1 * hp:(h1 + 1) * hp]
                qp = q_ref[pl.ds(g * m, m), :]
                for gr in range(ngr):
                    q2 = qp[:, 2 * gr * hp:(2 * gr + 2) * hp]
                    km2 = km_ref[pl.ds(pi * ngr * 2 * m + gr * 2 * m,
                                       2 * m), :]
                    lg = jax.lax.dot_general(
                        q2, km2, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    b0 = bias_ref[0, 0, 0, :, 2 * gr * m:(2 * gr + 2) * m]
                    b1 = bias_ref[0, 0, 1, :, 2 * gr * m:(2 * gr + 2) * m]
                    lg_ref[pl.ds(pi * m, m),
                           2 * gr * m:(2 * gr + 2) * m] = \
                        lg + jnp.where(col_last, b1, b0)
                return carry2

            jax.lax.fori_loop(0, chunk, qk_body, 0)
            for hh in range(num_heads):
                blk = lg_ref[:, hh * m:(hh + 1) * m]
                mx = jnp.max(blk, axis=1, keepdims=True)
                e = jnp.exp(blk - mx)
                p_ref[:, hh * m:(hh + 1) * m] = \
                    (e / jnp.sum(e, axis=1, keepdims=True)) \
                    .astype(p_ref.dtype)

            def av_body(pi, carry2):
                g = p0 + pi
                for gr in range(ngr):
                    vm2 = vm_ref[pl.ds(pi * ngr * 2 * m + gr * 2 * m,
                                       2 * m), :]
                    ov = jax.lax.dot_general(
                        p_ref[pl.ds(pi * m, m),
                              2 * gr * m:(2 * gr + 2) * m], vm2,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    attn_ref[pl.ds(g * m, m),
                             2 * gr * hp:(2 * gr + 2) * hp] = \
                        ov.astype(attn_ref.dtype)
                return carry2

            jax.lax.fori_loop(0, chunk, av_body, 0)
            return carry

        jax.lax.fori_loop(0, nchunk, chunk_body, 0)
        g2 = None  # skip the staged paths below

    if ablate == "noattn":  # perf probe: dense-only (skip attention core)
        attn_ref[:] = v_ref[:]
        g2 = None
    if g2 is False and not interpret:
        kmv = km_ref.reshape(chunk, num_heads, m, c)
        vmv = vm_ref.reshape(chunk, num_heads, m, c)
    # NOTE (measured dead end, v5e): batching the per-pair logit/AV dots
    # into one 3D dot_general per head-group ("bdot") was byte-identical in
    # runtime (14.79 vs 14.81 ms at 552x1920) — the small 2D dots are not
    # the serialization bottleneck. Do not re-try.
    for p0 in ([] if g2 is None else range(0, npair, chunk)):
        cp_n = min(chunk, npair - p0)
        if g2:
            # block-diagonal 2-head stacks: rows [0:m) hold head 2g in
            # lanes [0:hp), rows [m:2m) hold head 2g+1 in lanes [hp:2hp);
            # the off-blocks are zeroed so a 2hp-wide contraction yields
            # exact per-head logits
            zblk = jnp.zeros((m, hp), km_ref.dtype)
            for pi in range(cp_n):
                kp = k_ref[(p0 + pi) * m:(p0 + pi + 1) * m, :]
                vp = v_ref[(p0 + pi) * m:(p0 + pi + 1) * m, :]
                for gr in range(ngr):
                    base = (pi * ngr + gr) * 2 * m
                    h0, h1 = 2 * gr, 2 * gr + 1
                    km_ref[base:base + m, :hp] = kp[:, h0 * hp:(h0 + 1) * hp]
                    km_ref[base:base + m, hp:] = zblk
                    km_ref[base + m:base + 2 * m, :hp] = zblk
                    km_ref[base + m:base + 2 * m, hp:] = \
                        kp[:, h1 * hp:(h1 + 1) * hp]
                    vm_ref[base:base + m, :hp] = vp[:, h0 * hp:(h0 + 1) * hp]
                    vm_ref[base:base + m, hp:] = zblk
                    vm_ref[base + m:base + 2 * m, :hp] = zblk
                    vm_ref[base + m:base + 2 * m, hp:] = \
                        vp[:, h1 * hp:(h1 + 1) * hp]
            if ablate == "asmonly":  # perf probe: km/vm assembly cost only
                attn_ref[p0 * m:(p0 + cp_n) * m, :] = \
                    v_ref[p0 * m:(p0 + cp_n) * m, :]
                continue
            if fastmath and ablate != "nosm":
                # fused pair-group path: qk dot -> clamp-softmax -> AV all
                # in registers per (pair, head-group); the (rows, heads*m)
                # logits and p matrices never round-trip through the lg/p
                # VMEM scratches (~5.8 MB/grid-step of VMEM traffic saved;
                # clamp-softmax needs no max pass so no cross-lane state
                # survives between stages)
                for pi in range(cp_n):
                    g = p0 + pi
                    rr = g // npair_row
                    sel = 1 if (g % npair_row) == npair_row - 1 else 0
                    for gr in range(ngr):
                        q2 = q_ref[g * m:(g + 1) * m,
                                   2 * gr * hp:(2 * gr + 2) * hp]
                        base = (pi * ngr + gr) * 2 * m
                        km2 = km_ref[base:base + 2 * m, :]
                        lg = jax.lax.dot_general(
                            q2, km2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) \
                            + bias_ref[0, rr, sel,
                                       :, 2 * gr * m:(2 * gr + 2) * m]
                        # logits arrive pre-scaled by log2(e) (folded into
                        # wq/bias at trace time): native exp2, no per-
                        # logit multiply; clamp = 60 * log2(e). (Measured
                        # dead end: feeding UNNORMALIZED e to the AV dot
                        # and normalizing the (m, hp) outputs via a
                        # block-diag ones dot — 14.22 vs 12.34 ms/block;
                        # the extra dot + output divides cost more than
                        # the lane reduces they replace.)
                        e = jnp.exp2(jnp.minimum(lg, 86.56))
                        if "divnorm" in ablate:
                            p01 = jnp.concatenate(
                                [e[:, :m] / jnp.sum(e[:, :m], axis=1,
                                                    keepdims=True),
                                 e[:, m:] / jnp.sum(e[:, m:], axis=1,
                                                    keepdims=True)],
                                axis=1).astype(vm_ref.dtype)
                        else:
                            # reciprocal-multiply normalization (r4
                            # default, matches the rolled body bit-exactly)
                            p01 = jnp.concatenate(
                                [e[:, :m] * (1.0 / jnp.sum(
                                    e[:, :m], axis=1, keepdims=True)),
                                 e[:, m:] * (1.0 / jnp.sum(
                                     e[:, m:], axis=1, keepdims=True))],
                                axis=1).astype(vm_ref.dtype)
                        vm2 = vm_ref[base:base + 2 * m, :]
                        ov = jax.lax.dot_general(
                            p01, vm2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        attn_ref[g * m:(g + 1) * m,
                                 2 * gr * hp:(2 * gr + 2) * hp] = \
                            ov.astype(attn_ref.dtype)
                continue
            for pi in range(cp_n):
                g = p0 + pi
                rr = g // npair_row
                sel = 1 if (g % npair_row) == npair_row - 1 else 0
                for gr in range(ngr):
                    q2 = q_ref[g * m:(g + 1) * m,
                               2 * gr * hp:(2 * gr + 2) * hp]
                    base = (pi * ngr + gr) * 2 * m
                    km2 = km_ref[base:base + 2 * m, :]
                    lg_ref[pi * m:(pi + 1) * m,
                           2 * gr * m:(2 * gr + 2) * m] = \
                        jax.lax.dot_general(
                            q2, km2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) \
                        + bias_ref[0, rr, sel,
                                   :, 2 * gr * m:(2 * gr + 2) * m]
        else:
            if interpret:
                # interpret mode cannot discharge writes through reshaped
                # refs; identical contents via per-(pair, head) 2D slices
                for pi in range(cp_n):
                    kp = k_ref[(p0 + pi) * m:(p0 + pi + 1) * m, :]
                    vp = v_ref[(p0 + pi) * m:(p0 + pi + 1) * m, :]
                    for h in range(num_heads):
                        hm = hmask_ref[h][None, :]
                        r0 = (pi * num_heads + h) * m
                        km_ref[r0:r0 + m, :] = kp * hm
                        vm_ref[r0:r0 + m, :] = vp * hm
            else:
                k_all = k_ref[p0 * m:(p0 + cp_n) * m, :].reshape(cp_n, m, c)
                v_all = v_ref[p0 * m:(p0 + cp_n) * m, :].reshape(cp_n, m, c)
                for h in range(num_heads):
                    hm = hmask_ref[h][None, None, :]
                    kmv[:cp_n, h] = k_all * hm
                    vmv[:cp_n, h] = v_all * hm
            for pi in range(cp_n):
                g = p0 + pi
                q2 = q_ref[g * m:(g + 1) * m, :]
                km2 = km_ref[pi * num_heads * m:(pi + 1) * num_heads * m, :]
                rr = g // npair_row
                sel = 1 if (g % npair_row) == npair_row - 1 else 0
                lg_ref[pi * m:(pi + 1) * m, :] = jax.lax.dot_general(
                    q2, km2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) \
                    + bias_ref[0, rr, sel]
        if ablate == "nosm":  # perf probe: skip softmax (wrong numerics)
            p_ref[:cp_n * m, :] = lg_ref[:cp_n * m, :].astype(p_ref.dtype)
        elif fastmath:
            # softmax without max-subtraction: logits clamped at 60 (bias
            # kills cross-window lanes at -1e9 -> exp underflows to 0);
            # exact softmax whenever max logit < 60, which LN'd q/k with
            # the 1/sqrt(hd) scale always satisfies in practice
            e = jnp.exp(jnp.minimum(lg_ref[:cp_n * m, :], 60.0))
            for h in range(num_heads):
                blk = e[:, h * m:(h + 1) * m]
                p_ref[:cp_n * m, h * m:(h + 1) * m] = \
                    (blk / jnp.sum(blk, axis=1, keepdims=True)) \
                    .astype(p_ref.dtype)
        else:
            for h in range(num_heads):
                blk = lg_ref[:cp_n * m, h * m:(h + 1) * m]
                mx = jnp.max(blk, axis=1, keepdims=True)
                e = jnp.exp(blk - mx)
                p_ref[:cp_n * m, h * m:(h + 1) * m] = \
                    (e / jnp.sum(e, axis=1, keepdims=True)) \
                    .astype(p_ref.dtype)
        if g2:
            for pi in range(cp_n):
                g = p0 + pi
                for gr in range(ngr):
                    base = (pi * ngr + gr) * 2 * m
                    vm2 = vm_ref[base:base + 2 * m, :]
                    ov = jax.lax.dot_general(
                        p_ref[pi * m:(pi + 1) * m,
                              2 * gr * m:(2 * gr + 2) * m], vm2,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    attn_ref[g * m:(g + 1) * m,
                             2 * gr * hp:(2 * gr + 2) * hp] = \
                        ov.astype(attn_ref.dtype)
        else:
            for pi in range(cp_n):
                g = p0 + pi
                vm2 = vm_ref[pi * num_heads * m:(pi + 1) * num_heads * m, :]
                ov = jax.lax.dot_general(
                    p_ref[pi * m:(pi + 1) * m, :], vm2,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                attn_ref[g * m:(g + 1) * m, :] = ov.astype(attn_ref.dtype)

    proj = jax.lax.dot_general(
        attn_ref[:], wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj_ref[:][None, :]
    res32 = proj + xw_ref[:].astype(jnp.float32)

    if fuse_mlp:
        # MLP half-block fused in: LN2 -> fc1 -> exact-erf GELU -> fc2 ->
        # +residual on the attention output, still VMEM-resident (saves the
        # inter-half-block HBM round trip and a kernel launch per block)
        if ablate == "noln":
            y2 = res32.astype(out_ref.dtype)
        else:
            mu2 = jnp.mean(res32, axis=-1, keepdims=True)
            var2 = jnp.mean(jnp.square(res32 - mu2), axis=-1, keepdims=True)
            y2 = (res32 - mu2) * jax.lax.rsqrt(var2 + eps)
            y2 = (y2 * ln2w_ref[:][None, :]
                  + ln2b_ref[:][None, :]).astype(out_ref.dtype)
        hdn = jax.lax.dot_general(
            y2, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[:][None, :]
        if fastmath:
            # tanh-approx GELU: measured free vs ~2.2 ms for exact-erf at
            # 552x1920 band; max abs error ~3e-3 = below bf16 rounding of
            # O(1) activations, so only enabled on the bf16 serving path
            hdn = 0.5 * hdn * (1.0 + jnp.tanh(
                0.7978845608 * (hdn + 0.044715 * hdn * hdn * hdn)))
        elif ablate == "gelusig":  # perf probe: sigmoid-approx GELU
            hdn = hdn * jax.lax.logistic(1.702 * hdn)
        elif ablate != "nogelu":  # nogelu: skip activation
            hdn = 0.5 * hdn * (1.0 + _erf_approx(hdn * (2.0 ** -0.5)))
        hdn = hdn.astype(out_ref.dtype)
        o2 = jax.lax.dot_general(
            hdn, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2_ref[:][None, :]
        res32 = res32 + o2

    res = res32.astype(out_ref.dtype)
    for wg in range(twin):
        rr, wi = wg // nwin, wg % nwin
        if wnd == "rows":
            for r in range(ws):
                out_ref[0, 0, rr * ws + r, wi * ws:(wi + 1) * ws, :] = \
                    res[wg * n + r * ws:wg * n + (r + 1) * ws, :]
        else:
            out_ref[0, 0, rr * ws:(rr + 1) * ws,
                    wi * ws:(wi + 1) * ws, :] = \
                res[wg * n:(wg + 1) * n, :].reshape(ws, ws, c)


def _paired_bias(rpb, mask_bank, num_heads, n):
    """(2, 2, 2n, heads*2n) bias constants for the paired kernel:
    [row_edge, is_last_pair] -> rpb tiled block-diagonally over the pair
    with -1e9 on cross-window quadrants, plus the cyclic-shift edge mask
    (interior / col-edge applied to the pair's second window)."""
    neg = jnp.full((n, n), -1e9, jnp.float32)
    rpb = rpb.astype(jnp.float32)

    def pair_block(h, mask_a, mask_b):
        top = jnp.concatenate([rpb[h] + mask_a, neg], axis=1)
        bot = jnp.concatenate([neg, rpb[h] + mask_b], axis=1)
        return jnp.concatenate([top, bot], axis=0)  # (2n, 2n)

    zero = jnp.zeros((n, n), jnp.float32)
    out = []
    for re_ in range(2):
        if mask_bank is None:
            interior = edge = zero
        else:
            interior = mask_bank[re_, 0].astype(jnp.float32)
            edge = mask_bank[re_, 1].astype(jnp.float32)
        normal = jnp.concatenate(
            [pair_block(h, interior, interior) for h in range(num_heads)],
            axis=1)
        last = jnp.concatenate(
            [pair_block(h, interior, edge) for h in range(num_heads)],
            axis=1)
        out.append(jnp.stack([normal, last]))
    return jnp.stack(out)  # (2, 2, 2n, heads*2n)


def strip_chunk_width(w: int, ws: int = 8) -> int | None:
    """Pick a column-chunk width for the 2D-grid full-canvas strip kernel:
    a divisor of ``w`` in [128, 384] holding an even number of ``ws``
    windows (the paired kernel needs even nwin). Returns None if ``w`` has
    no such divisor (callers should pad W, or fall back to tiling).

    Lane-aligned chunks (multiples of 128, the VPU lane count) measured
    fastest, largest first: at the 552x1920 headline band the fused block
    is 11.74 ms at w=384 vs 11.89 (240), 12.40 (320), 12.58 (128) —
    round-4 lab sweep, scripts/lab_r4.py."""
    cands = [d for d in range(128, 385, 2 * ws) if w % d == 0]
    if not cands:
        return None
    aligned = [d for d in cands if d % 128 == 0]
    if aligned:
        return max(aligned)
    return min(cands, key=lambda d: (abs(d - 256), -d))


def pad_width_for_strips(w: int, ws: int = 8) -> int:
    """Smallest W' >= w (multiple of ws) with a strip chunk divisor."""
    wp = -(-w // ws) * ws
    while strip_chunk_width(wp, ws) is None:
        wp += ws
    return wp


@functools.partial(jax.jit, static_argnames=("num_heads", "ws", "dc",
                                             "attn_mode", "rrows_pref",
                                             "chunk_pref", "ablate", "wnd",
                                             "fastmath", "r_unroll",
                                             "wchunk_override", "interpret"))
def swin_strip_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                      rpb, mask=None, num_heads: int = 6, ws: int = 8,
                      dc: int = 0, mask_bank=None,
                      attn_mode: str = "paired2",
                      mlp=None,
                      rrows_pref: int = 1, chunk_pref: int = 16,
                      ablate: str = "", wnd: str = "slab",
                      fastmath: bool = False, r_unroll: int = 0,
                      wchunk_override: int | None = None,
                      interpret: bool = False):
    """Fused Swin attention half-block over (B, H, W, C) directly, with an
    optional folded cyclic roll.

    Equivalent to ``roll2d(x, dc) |> partition |> wmsa_block |> reverse``,
    with windowizing AND the roll done in VMEM (one grid step per window-row
    strip of the output frame). H and W must be multiples of ws;
    dc in {0, +ws//2, -ws//2}.

    Masks (both optional, mutually exclusive; defined on the OUTPUT frame):
    - ``mask``: full (nW, N, N) shift mask for the (H, W) canvas,
    - ``mask_bank``: (2, 2, N, N) canonical cyclic-shift patterns indexed
      [is_last_window_row, is_last_window_col] — O(1) memory for any canvas
      (build with ``shift_attention_mask(2*ws, 2*ws, ws, ws//2)``).
    """
    b, h, w, c = x.shape
    s = ws // 2
    assert h % ws == 0 and w % ws == 0
    assert dc in (0, s, -s)
    assert mask is None or mask_bank is None
    nwin = w // ws
    n = ws * ws
    hd = c // num_heads
    rows_per_img = h // ws
    strips = b * rows_per_img
    groups = 2 * rows_per_img

    if attn_mode in ("paired2", "paired2r") and num_heads % 2 != 0:
        attn_mode = "paired"  # 2-head grouping needs even heads
    if attn_mode in ("paired", "paired2", "paired2r") and \
            (nwin % 2 != 0 or mask is not None):
        attn_mode = "stacked"  # pairing needs even windows; full-mask mode
        # (arbitrary per-window masks) stays on the stacked path

    # Column-chunked full-canvas mode: canvases wider than one chunk run a
    # 2D (row-strip, col-chunk) grid whose Mosaic program stays at chunk
    # width — compile time is that of a ~256-wide strip regardless of W.
    wchunk, ncols = w, 1
    if attn_mode in ("paired2", "paired2r") and (w > 384 or wchunk_override):
        d = wchunk_override or strip_chunk_width(w, ws)
        if d and d < w and w % d == 0 and (d // ws) % 2 == 0:
            wchunk, ncols = d, w // d

    head_mask = np.zeros((num_heads, c), np.float32)
    for hh in range(num_heads):
        head_mask[hh, hh * hd:(hh + 1) * hd] = 1.0
    hmask = jnp.asarray(head_mask, dtype=x.dtype)

    if attn_mode in ("paired", "paired2", "paired2r"):
        g2 = {"paired": False, "paired2": True,
              "paired2r": "rolled"}[attn_mode]
        m = 2 * n
        nwin_c = wchunk // ws
        # superstrip height: R window-rows per grid step amortize the
        # ~11us fixed per-step cost (see _strip_kernel_paired docstring).
        # Default 1: R>1 multiplies Mosaic compile time through the
        # unrolled pair loops (tracked; needs rolled fori_loop bodies)
        rrows = next(rr for rr in (rrows_pref, 4, 3, 2, 1)
                     if rr <= rrows_pref and rows_per_img % rr == 0)
        if ncols > 1 and g2 != "rolled":
            rrows = 1  # unrolled chunked body keeps single-row bias layout
        steps_per_img = rows_per_img // rrows
        nsteps = b * steps_per_img
        npair = rrows * (nwin_c // 2)
        twin = rrows * nwin_c
        # cap the softmax batch so the lg/p scratches stay ~<=40MB of VMEM
        # (matters at ws=16: HAT's windows make m=512, heads*m=3072)
        vmem_cap = max(1, int(40e6 // (m * num_heads * m * 6)))
        chunk = max(cc for cc in
                    range(1, min(chunk_pref, npair, vmem_cap) + 1)
                    if npair % cc == 0)
        if g2 == "rolled":
            # one pair per chunk measured FASTER than chunked softmax
            # (5.24 vs 5.65 ms at W=256): the traced-offset km/vm stores
            # cost more than the softmax batching saves
            chunk = 1
        # fastmath g2: fold log2(e) into the logit scale (q weights and
        # bias) so the kernel's clamp-softmax uses native exp2 without a
        # per-logit multiply; the exact path keeps natural-log logits
        # (applies to both the unrolled g2 path and the register-fused
        # rolled body, which share the clamp-exp2 softmax)
        log2e = 1.4426950408889634 if (fastmath and g2) else 1.0
        bias2 = _paired_bias(rpb, mask_bank, num_heads, n) * log2e
        interior, row_edge = bias2[0], bias2[1]
        if ncols > 1:
            # (4, rrows, 2, m, H*m): leading index = 2*is_row_edge +
            # is_col_edge chosen by the (i, j) map; the col-edge sel slot
            # only exists in the last column chunk's blocks, and the
            # row-edge pattern only on the step's last window-row
            int_pair = jnp.stack([interior[0], interior[0]])
            rowe_pair = jnp.stack([row_edge[0], row_edge[0]])
            bias = jnp.stack([
                jnp.stack([int_pair] * rrows),
                jnp.stack([interior] * rrows),
                jnp.stack([int_pair] * (rrows - 1) + [rowe_pair]),
                jnp.stack([interior] * (rrows - 1) + [row_edge]),
            ])

            def bias_idx(i, j):
                re_ = ((i % steps_per_img) + 1) // steps_per_img
                ce_ = (j + 1) // ncols
                return (2 * re_ + ce_, 0, 0, 0, 0)

            bias_spec = pl.BlockSpec(
                (1, rrows, 2, m, num_heads * m),
                bias_idx if mask_bank is not None
                else (lambda i, j: (0, 0, 0, 0, 0)),
                memory_space=pltpu.VMEM)
        else:
            # (step-type, row-in-step, col-variant, m, H*m): the row-edge
            # mask applies only to the LAST row of the LAST step per image
            bias = jnp.stack([
                jnp.stack([interior] * rrows),
                jnp.stack([interior] * (rrows - 1) + [row_edge]),
            ])
            bias_spec = pl.BlockSpec(
                (1, rrows, 2, m, num_heads * m),
                (lambda i: ((((i % steps_per_img) + 1) // steps_per_img),
                            0, 0, 0, 0))
                if mask_bank is not None else (lambda i: (0, 0, 0, 0, 0)),
                memory_space=pltpu.VMEM)

        xg = x.reshape(b * groups, 1, s, w, c)
        d0 = -dc // s if dc else 0

        def idxp(off):
            def f(i):
                img, r = i // steps_per_img, i % steps_per_img
                return (img * groups + (2 * rrows * r + off) % groups,
                        0, 0, 0, 0)
            return f

        if ncols > 1:
            ccols = 2 if dc else 1
            # the cyclic roll only needs |dc| columns past the chunk edge:
            # fetch the boundary as an 8-col sliver ref instead of a second
            # full chunk (shifted-block read traffic 2x -> ~1.03x)
            svw = 8
            assert abs(dc) <= svw, (dc, svw)
            s0 = (-dc) if dc < 0 else (svw - dc if dc > 0 else 0)
            nsl = w // svw      # canvas width in sliver units
            spc = wchunk // svw  # sliver units per chunk

            def idxc(roff):
                def f(i, j):
                    img, r = i // steps_per_img, i % steps_per_img
                    return (img * groups
                            + (2 * rrows * r + d0 + roff) % groups,
                            0, 0, j, 0)
                return f

            def idxs(roff):
                def f(i, j):
                    img, r = i // steps_per_img, i % steps_per_img
                    blk = ((j + 1) * spc) % nsl if dc < 0 \
                        else (j * spc - 1) % nsl
                    return (img * groups
                            + (2 * rrows * r + d0 + roff) % groups,
                            0, 0, blk, 0)
                return f

            in_maps = [idxc(jj) for jj in range(2 * rrows)] \
                + ([idxs(jj) for jj in range(2 * rrows)] if dc else [])
            in_widths = [wchunk] * (2 * rrows) \
                + ([svw] * (2 * rrows) if dc else [])
            out_spec = pl.BlockSpec((1, 1, rrows * ws, wchunk, c),
                                    lambda i, j: (i, 0, 0, j, 0),
                                    memory_space=pltpu.VMEM)
            grid = (nsteps, ncols)
        else:
            ccols, s0 = 1, 0
            in_maps = [idxp(d0 + jj) for jj in range(2 * rrows)]
            in_widths = [w] * len(in_maps)
            out_spec = pl.BlockSpec((1, 1, rrows * ws, w, c),
                                    lambda i: (i, 0, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
            grid = (nsteps,)

        def repp(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda *_: (0,) * nd,
                                memory_space=pltpu.VMEM)

        scale = hd ** -0.5
        if g2:
            # head-major 32-padded q/k/v columns + row-matched proj (the
            # perhead trick): in-kernel slices become aligned 32-lane blocks
            hp2 = -(-hd // 32) * 32
            cp2 = num_heads * hp2

            def pad_cols_g2(wmat, bvec):
                pw, pb = [], []
                for hh in range(num_heads):
                    pw.append(wmat[:, hh * hd:(hh + 1) * hd])
                    pb.append(bvec[hh * hd:(hh + 1) * hd])
                    if hp2 > hd:
                        pw.append(jnp.zeros((c, hp2 - hd), wmat.dtype))
                        pb.append(jnp.zeros((hp2 - hd,), bvec.dtype))
                return jnp.concatenate(pw, axis=1), jnp.concatenate(pb)

            wq_a, bq_a = pad_cols_g2(wqkv[:, :c] * (scale * log2e),
                                     bqkv[:c] * (scale * log2e))
            wk_a, bk_a = pad_cols_g2(wqkv[:, c:2 * c], bqkv[c:2 * c])
            wv_a, bv_a = pad_cols_g2(wqkv[:, 2 * c:], bqkv[2 * c:])
            prj = []
            for hh in range(num_heads):
                prj.append(wproj[hh * hd:(hh + 1) * hd])
                if hp2 > hd:
                    prj.append(jnp.zeros((hp2 - hd, c), wproj.dtype))
            wp_a = jnp.concatenate(prj, axis=0)
        else:
            hp2, cp2 = hd, c
            wq_a, bq_a = wqkv[:, :c] * scale, bqkv[:c] * scale
            wk_a, bk_a = wqkv[:, c:2 * c], bqkv[c:2 * c]
            wv_a, bv_a = wqkv[:, 2 * c:], bqkv[2 * c:]
            wp_a = wproj
        kernel = functools.partial(
            _strip_kernel_paired, num_heads=num_heads, head_dim=hd,
            nwin=nwin_c, ws=ws, dc=dc, chunk=chunk, rrows=rrows,
            ccols=ccols, s0=s0, g2=g2,
            fuse_mlp=mlp is not None, ablate=ablate, wnd=wnd,
            fastmath=fastmath, r_unroll=r_unroll, interpret=interpret)
        mlp_specs, mlp_args = [], []
        if mlp is not None:
            ln2w, ln2b, w1, b1, w2, b2 = mlp
            hidden = w1.shape[1]
            mlp_specs = [repp((c,)), repp((c,)),
                         repp((c, hidden)), repp((hidden,)),
                         repp((hidden, c)), repp((c,))]
            mlp_args = [ln2w.astype(jnp.float32), ln2b.astype(jnp.float32),
                        w1.astype(x.dtype), b1.astype(jnp.float32),
                        w2.astype(x.dtype), b2.astype(jnp.float32)]
        kv_rows = (chunk * num_heads * m) if not g2 \
            else (chunk * (num_heads // 2) * 2 * m)
        kv_cols = c if not g2 else 2 * hp2
        in_specs = [pl.BlockSpec((1, 1, s, iw, c), im,
                                 memory_space=pltpu.VMEM)
                    for im, iw in zip(in_maps, in_widths)]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs + [
                repp((c,)), repp((c,)),
                repp((c, cp2)), repp((c, cp2)), repp((c, cp2)),
                repp((cp2,)), repp((cp2,)), repp((cp2,)),
                repp((cp2, c)), repp((c,)),
                bias_spec,
                repp((num_heads, c)),
            ] + mlp_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nsteps, 1, rrows * ws, w, c), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((twin * n, c), x.dtype),     # xw
                pltpu.VMEM((twin * n, cp2), x.dtype),   # q
                pltpu.VMEM((twin * n, cp2), x.dtype),   # k
                pltpu.VMEM((twin * n, cp2), x.dtype),   # v
                pltpu.VMEM((twin * n, cp2), x.dtype),   # attn
                pltpu.VMEM((kv_rows, kv_cols), x.dtype),  # km
                pltpu.VMEM((kv_rows, kv_cols), x.dtype),  # vm
                pltpu.VMEM((chunk * m, num_heads * m), jnp.float32),  # lg
                pltpu.VMEM((chunk * m, num_heads * m), x.dtype),      # p
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                # grid steps are independent: lets Mosaic overlap each
                # step's DMA with neighboring steps' compute (measured:
                # without this the strip DMA (~6ms/MP) serializes after
                # compute instead of hiding under it)
                dimension_semantics=("parallel",) * len(grid)),
            interpret=interpret,
        )(*([xg] * len(in_maps)),
          ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
          wq_a.astype(x.dtype), wk_a.astype(x.dtype), wv_a.astype(x.dtype),
          bq_a.astype(jnp.float32), bk_a.astype(jnp.float32),
          bv_a.astype(jnp.float32),
          wp_a.astype(x.dtype), bproj.astype(jnp.float32),
          bias, hmask, *mlp_args)
        return out.reshape(b, h, w, c)

    # perhead mode: fold head padding into the weights — reorder qkv output
    # columns to (head, padded-32) and zero-fill, reorder proj input rows to
    # match. No in-kernel repacking; dots become aligned (N,32)x(32,N).
    hp = hd if attn_mode == "stacked" else -(-hd // 32) * 32
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

    # query-major rel-pos bias: rpbq[i, h*N+j] = rpb[h, i, j]
    rpbq = jnp.transpose(rpb.astype(jnp.float32), (1, 0, 2)) \
        .reshape(n, num_heads * n)

    if mask is not None:
        mask_mode = 1
        mask4 = mask.astype(jnp.float32).reshape(rows_per_img, nwin, n, n)
        wmask_spec = pl.BlockSpec(
            (1, nwin, n, n), lambda i: (i % rows_per_img, 0, 0, 0),
            memory_space=pltpu.VMEM)
        wmask_arg = mask4
    elif mask_bank is not None:
        mask_mode = 2
        wmask_arg = mask_bank.astype(jnp.float32)  # (2, 2, n, n)
        wmask_spec = pl.BlockSpec(
            (1, 2, n, n),
            lambda i: (((i % rows_per_img) + 1) // rows_per_img, 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        mask_mode = 0
        wmask_arg = jnp.zeros((1, 1, n, n), jnp.float32)
        wmask_spec = pl.BlockSpec((1, 1, n, n), lambda i: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)

    # s-row input groups; output strip r of image img reads groups
    # (2r + d0, 2r + d0 + 1) mod groups where d0 = -dc/s
    xg = x.reshape(b * groups, 1, s, w, c)
    d0 = -dc // s if dc else 0

    def idx(off):
        def f(i):
            img, r = i // rows_per_img, i % rows_per_img
            return (img * groups + (2 * r + off) % groups, 0, 0, 0, 0)
        return f

    wqkv_x = wqkv.astype(x.dtype)
    bqkv_f = bqkv.astype(jnp.float32)
    if attn_mode == "perhead":
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
        wq_a, bq_a = wqkv_x[:, :c], bqkv_f[:c]
        wk_a, bk_a = wqkv_x[:, c:2 * c], bqkv_f[c:2 * c]
        wv_a, bv_a = wqkv_x[:, 2 * c:], bqkv_f[2 * c:]
        wp_a = wproj

    def kernel(a_ref, b_ref, lnw, lnb, wq, wk, wv, bq, bk, bv, wp, bp,
               rpbq_ref, hm, wmt, out_ref, xw_s, q_s, k_s, v_s, attn_s):
        _strip_kernel(a_ref, b_ref, lnw, lnb, wq, wk, wv, bq, bk, bv, wp,
                      bp, rpbq_ref, hm, wmt[0], out_ref,
                      xw_s, q_s, k_s, v_s, attn_s,
                      num_heads=num_heads, head_dim=hd, nwin=nwin, ws=ws,
                      dc=dc, mask_mode=mask_mode, attn_mode=attn_mode)

    def rep(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(strips,),
        in_specs=[
            pl.BlockSpec((1, 1, s, w, c), idx(d0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, w, c), idx(d0 + 1),
                         memory_space=pltpu.VMEM),
            rep((c,)), rep((c,)),
            rep((c, cp)), rep((c, cp)), rep((c, cp)),
            rep((cp,)), rep((cp,)), rep((cp,)),
            rep((cp, c)), rep((c,)),
            rep((n, num_heads * n)),
            rep((num_heads, c)),
            wmask_spec,
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
        ],
        # f32 strips at W=256/C=180 push scoped VMEM past the 16MB
        # default limit; v5e has headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xg, xg, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      wq_a.astype(x.dtype), wk_a.astype(x.dtype), wv_a.astype(x.dtype),
      bq_a.astype(jnp.float32), bk_a.astype(jnp.float32),
      bv_a.astype(jnp.float32),
      wp_a.astype(x.dtype), bproj.astype(jnp.float32),
      rpbq, hmask, wmask_arg)
    res = out.reshape(b, h, w, c)
    if mlp is not None:
        # stacked fallback keeps the full-block contract: apply the MLP
        # half-block as a second kernel
        ln2w, ln2b, w1, b1, w2, b2 = mlp
        tok = mlp_block_pallas(res.reshape(-1, c), ln2w, ln2b, w1, b1,
                               w2, b2, interpret=interpret)
        res = tok.reshape(b, h, w, c)
    return res


def _mlp_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, *, eps=1e-5):
    """Fused transformer MLP half-block: LN -> fc1 -> exact GELU -> fc2 ->
    +residual, rowwise over a block of tokens."""
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * lnw_ref[:][None, :] + lnb_ref[:][None, :]).astype(x.dtype)
    h = jax.lax.dot_general(y, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
        + b1_ref[:][None, :]
    # exact-erf GELU (torch F.gelu default), erf via A&S approximation
    h = 0.5 * h * (1.0 + _erf_approx(h * (2.0 ** -0.5)))
    h = h.astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
        + b2_ref[:][None, :]
    out_ref[:] = (o + xf).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows_per_block", "interpret"))
def mlp_block_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2,
                     rows_per_block: int = 1024, interpret: bool = False):
    """Fused LN + MLP + residual over (T, C) tokens.

    T must be a multiple of rows_per_block (callers pass window batches
    whose sizes are powers of two).
    """
    t, c = x.shape
    hidden = w1.shape[1]
    rb = rows_per_block
    while t % rb != 0:
        rb //= 2
    assert rb >= 8, (t, rows_per_block)

    def rep(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _mlp_kernel,
        grid=(t // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            rep((c,)), rep((c,)),
            rep((c, hidden)), rep((hidden,)),
            rep((hidden, c)), rep((c,)),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        interpret=interpret,
    )(x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
      w1.astype(x.dtype), b1.astype(jnp.float32),
      w2.astype(x.dtype), b2.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("num_heads", "g", "interpret"))
def wmsa_pallas(qkv: jnp.ndarray, rpb: jnp.ndarray,
                mask: jnp.ndarray | None = None, num_heads: int = 6,
                g: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Fused window MHSA.

    Args:
        qkv: (nWB, N, 3C) packed projections.
        rpb: (heads, N, N) relative-position bias (pre-gathered).
        mask: optional (nW, N, N) additive shift mask; window w uses
            mask[w % nW]; requires nWB % nW == 0 and nW % g == 0.
        num_heads: head count.
        g: windows per kernel program (must divide nWB).

    Returns:
        (nWB, N, C).
    """
    nwb, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    assert nwb % g == 0, (nwb, g)
    pair = 2 if g % 2 == 0 else 1

    head_mask = np.zeros((num_heads, c), np.float32)
    for h in range(num_heads):
        head_mask[h, h * hd:(h + 1) * hd] = 1.0
    hmask = jnp.asarray(head_mask, dtype=qkv.dtype)

    use_wmask = mask is not None
    if use_wmask:
        nw = mask.shape[0]
        assert nwb % nw == 0 and nw % g == 0, (nwb, nw, g)
        wmask_arg = mask.astype(jnp.float32)
        wmask_spec = pl.BlockSpec((g, n, n), lambda i: (i % (nw // g), 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        wmask_arg = jnp.zeros((1, n, n), jnp.float32)
        wmask_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, num_heads=num_heads, head_dim=hd, g=g, pair=pair,
        use_wmask=use_wmask)

    return pl.pallas_call(
        kernel,
        grid=(nwb // g,),
        in_specs=[
            pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            wmask_spec,
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwb, n, c), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((pair * num_heads * n, n), jnp.float32)],
        interpret=interpret,
    )(qkv, rpb.astype(jnp.float32), hmask, wmask_arg)


def _roll_kernel(a_ref, b_ref, out_ref, *, s, w, dc):
    """Assemble one ws-row output strip of a 2D circular roll from the two
    s-row input groups that contain its rows, rotating columns by dc."""
    rows = jnp.concatenate([a_ref[0, 0], b_ref[0, 0]], axis=0)  # (ws, W, C)
    if dc < 0:  # out[:, j] = in[:, j - dc]
        rot = jnp.concatenate([rows[:, -dc:], rows[:, :-dc]], axis=1)
    else:
        rot = jnp.concatenate([rows[:, w - dc:], rows[:, :w - dc]], axis=1)
    out_ref[0, 0] = rot


@functools.partial(jax.jit, static_argnames=("shift", "ws", "interpret"))
def roll2d_pallas(x, shift: int, ws: int = 8, interpret: bool = False):
    """Circular roll of (B, H, W, C) by (shift, shift) on (H, W) — the Swin
    shift. |shift| must be ws/2; H, W multiples of ws. XLA lowers jnp.roll
    to slice+concat materializations measured ~3x slower than HBM
    round-trip; this kernel reads exactly the s-row groups each output
    strip needs (network_swinir.py's torch.roll equivalent)."""
    b, h, w, c = x.shape
    s = ws // 2
    assert shift in (s, -s) and h % ws == 0 and w % ws == 0
    rows = h // ws
    groups = 2 * rows
    xg = x.reshape(b * groups, 1, s, w, c)

    # output strip r of image i needs input groups (2r+d0, 2r+d0+1) mod
    # groups, where d0 = +1 for roll -s and -1 for roll +s
    d0 = 1 if shift < 0 else -1

    def idx(off):
        def f(i):
            img, r = i // rows, i % rows
            return (img * groups + (2 * r + off) % groups, 0, 0, 0, 0)
        return f

    out = pl.pallas_call(
        functools.partial(_roll_kernel, s=s, w=w, dc=shift),
        grid=(b * rows,),
        in_specs=[
            pl.BlockSpec((1, 1, s, w, c), idx(d0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, w, c), idx(d0 + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ws, w, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * rows, 1, ws, w, c), x.dtype),
        # full-canvas widths push the strip blocks past the 16MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xg, xg)
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Pair-fused strip kernel: TWO consecutive Swin blocks (unshifted+shifted)
# per invocation (round-5). The intermediate activations never leave VMEM:
# block A's output strips are kept in a 2-slot ring scratch (ybuf) and
# block B (the shifted block) assembles its rolled strips from the ring —
# one HBM read + one HBM write per block PAIR instead of two of each, and
# one grid step per strip row instead of 2*ncols. The cyclic-shift wrap
# rows/cols resolve without cross-row recompute because the canonical Swin
# edge masks make the two wrapped segments of a window mutually invisible:
# the wrapped segment is fed zeros and its (discarded) outputs are patched
# from a dedicated zwrap scratch computed when its true source strip was
# live. Ref contract: the same two-block sequence the reference serves per
# RSTB (AgentApp/model_service/denoising/SwinIR/model_serving.py:148-166,
# network_swinir.py SwinTransformerBlock pairs).


def _fastmath_block_core(rows, wrefs, b0v, b1v, xw_ref, q_ref, k_ref,
                         v_ref, attn_ref, *, num_heads, hp, nwin, ws,
                         r_unroll, eps=1e-5):
    """One FULL Swin block (LN1 -> WMSA -> proj -> +res -> LN2 -> MLP ->
    +res) on an assembled (ws, nwin*ws, C) strip VALUE, bf16 fastmath
    semantics: clamp-exp2 softmax with log2(e) pre-folded into wq/bias,
    reciprocal-multiply normalization, tanh-GELU — the register-fused
    rolled body of `_strip_kernel_paired` (g2="rolled", fastmath)
    restructured to consume a VMEM value so the pair kernel can run it
    twice per strip. b0v/b1v are the (m, heads*m) bias constants for
    normal / last-pair windows. Returns the (nwin*n, C) block output."""
    (lnw_ref, lnb_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
     wproj_ref, bproj_ref, ln2w_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
     b2_ref) = wrefs
    c = xw_ref.shape[1]
    n = ws * ws
    m = 2 * n
    npair = nwin // 2
    ngr = num_heads // 2

    for wg in range(nwin):
        xw_ref[wg * n:(wg + 1) * n, :] = \
            rows[:, wg * ws:(wg + 1) * ws, :].reshape(n, c)

    xf = xw_ref[:].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * lnw_ref[:][None, :] + lnb_ref[:][None, :]).astype(xw_ref.dtype)

    for dst, w_ref, b_ref2 in ((q_ref, wq_ref, bq_ref),
                               (k_ref, wk_ref, bk_ref),
                               (v_ref, wv_ref, bv_ref)):
        dst[:] = (jax.lax.dot_general(
            y, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b_ref2[:][None, :]).astype(dst.dtype)

    zblk = jnp.zeros((m, hp), k_ref.dtype)

    def one_pair(g):
        col_last = g == npair - 1
        kp = k_ref[pl.ds(g * m, m), :]
        vp = v_ref[pl.ds(g * m, m), :]
        qp = q_ref[pl.ds(g * m, m), :]
        for gr in range(ngr):
            k0 = kp[:, 2 * gr * hp:(2 * gr + 1) * hp]
            k1 = kp[:, (2 * gr + 1) * hp:(2 * gr + 2) * hp]
            km2 = jnp.concatenate(
                [jnp.concatenate([k0, zblk], axis=1),
                 jnp.concatenate([zblk, k1], axis=1)], axis=0)
            v0 = vp[:, 2 * gr * hp:(2 * gr + 1) * hp]
            v1 = vp[:, (2 * gr + 1) * hp:(2 * gr + 2) * hp]
            vm2 = jnp.concatenate(
                [jnp.concatenate([v0, zblk], axis=1),
                 jnp.concatenate([zblk, v1], axis=1)], axis=0)
            q2 = qp[:, 2 * gr * hp:(2 * gr + 2) * hp]
            lg = jax.lax.dot_general(
                q2, km2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            b0 = b0v[:, 2 * gr * m:(2 * gr + 2) * m]
            b1 = b1v[:, 2 * gr * m:(2 * gr + 2) * m]
            lg = lg + jnp.where(col_last, b1, b0)
            e = jnp.exp2(jnp.minimum(lg, 86.56))
            p01 = jnp.concatenate(
                [e[:, :m] * (1.0 / jnp.sum(e[:, :m], axis=1,
                                           keepdims=True)),
                 e[:, m:] * (1.0 / jnp.sum(e[:, m:], axis=1,
                                           keepdims=True))],
                axis=1).astype(vm2.dtype)
            ov = jax.lax.dot_general(
                p01, vm2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_ref[pl.ds(g * m, m), 2 * gr * hp:(2 * gr + 2) * hp] = \
                ov.astype(attn_ref.dtype)

    uu = npair if r_unroll <= 0 else max(1, min(r_unroll, npair))
    if uu >= npair:
        for g_t in range(npair):
            one_pair(g_t)
    else:
        def pair_body(it, carry):
            for u in range(uu):
                one_pair(it * uu + u)
            return carry

        jax.lax.fori_loop(0, npair // uu, pair_body, 0)
        for g_t in range(npair - npair % uu, npair):
            one_pair(g_t)

    proj = jax.lax.dot_general(
        attn_ref[:], wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj_ref[:][None, :]
    res32 = proj + xw_ref[:].astype(jnp.float32)

    mu2 = jnp.mean(res32, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(res32 - mu2), axis=-1, keepdims=True)
    y2 = (res32 - mu2) * jax.lax.rsqrt(var2 + eps)
    y2 = (y2 * ln2w_ref[:][None, :]
          + ln2b_ref[:][None, :]).astype(xw_ref.dtype)
    hdn = jax.lax.dot_general(
        y2, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:][None, :]
    hdn = 0.5 * hdn * (1.0 + jnp.tanh(
        0.7978845608 * (hdn + 0.044715 * hdn * hdn * hdn)))
    hdn = hdn.astype(xw_ref.dtype)
    o2 = jax.lax.dot_general(
        hdn, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:][None, :]
    return (res32 + o2).astype(xw_ref.dtype)


def _strip_kernel_pairfused(x0_ref, x1_ref, *args, num_heads, hp, nwin_c,
                            J, ws, S, spb, dc1, r_unroll, eps=1e-5):
    """Grid step i (= band*spb + ib, ib in 0..S): compute block A on strip
    ib into the ybuf ring, block B on the ROLLED strip ib-1 assembled from
    the ring, and write block B's output (frame -s) to out strip ib-1.
    ib==0 seeds the zwrap scratch (the wrapped bottom segment of rolled
    strip S-1, whose source y_0[:s] is only live now); ib==S emits the
    wrap strip with its bottom patched from zwrap."""
    wa = args[:16]
    bias1_ref = args[16]
    wb = args[17:33]
    bias2_ref = args[33]
    (out_ref, xw_ref, q_ref, k_ref, v_ref, attn_ref, ybuf_ref,
     zwrap_ref) = args[34:]
    c = xw_ref.shape[1]
    n = ws * ws
    s = ws // 2
    W = nwin_c * ws
    Wt = J * W
    i = pl.program_id(0)
    ib = i % spb
    si = ib % 2          # ybuf slot receiving y_ib
    sp = (ib + 1) % 2    # slot holding y_{ib-1}
    # rolled strip S-1 (computed at ib==S, seeded at ib==0) is the
    # image's last window row -> row-edge mask variant
    re = jnp.logical_or(ib == 0, ib == spb - 1)

    core = functools.partial(
        _fastmath_block_core, xw_ref=xw_ref, q_ref=q_ref, k_ref=k_ref,
        v_ref=v_ref, attn_ref=attn_ref, num_heads=num_heads, hp=hp,
        nwin=nwin_c, ws=ws, r_unroll=r_unroll, eps=eps)

    b1a = bias1_ref[:, :]
    b2i = jnp.where(re, bias2_ref[1, 0], bias2_ref[0, 0])
    b2e = jnp.where(re, bias2_ref[1, 1], bias2_ref[0, 1])

    def xcols(ref, q):
        """Stored-frame columns of x for output chunk q of block A."""
        if dc1 == 0:
            return ref[0, 0, :, q * W:(q + 1) * W, :]
        # dc1 == s (input in frame -s): chunk q needs stored cols
        # [qW-s, (q+1)W-s); aligned ws-wide halo load then value-slice
        if q == 0:
            a = ref[0, 0, :, Wt - ws:Wt, :]
            bpart = ref[0, 0, :, 0:W, :]
            both = jnp.concatenate([a, bpart], axis=1)
        else:
            both = ref[0, 0, :, q * W - ws:(q + 1) * W, :]
        return both[:, ws - s:W + ws - s, :]

    def ycols(rowsel, q):
        """(len, W+ws, C) slab of ybuf rows covering chunk q's rolled
        columns [qW+s, (q+1)W+s) after the [s:W+s] value-slice."""
        if q == J - 1:
            a = ybuf_ref[rowsel, pl.ds(q * W, W), :]
            bpart = ybuf_ref[rowsel, pl.ds(0, ws), :]
            return jnp.concatenate([a, bpart], axis=1)
        return ybuf_ref[rowsel, pl.ds(q * W, W + ws), :]

    @pl.when(ib < S)
    def _y_sweep():
        for q in range(J):
            rows = jnp.concatenate(
                [xcols(x0_ref, q), xcols(x1_ref, q)], axis=0)
            res = core(rows, wa, b1a, b1a)
            for wi in range(nwin_c):
                ybuf_ref[pl.ds(si * ws, ws),
                         pl.ds(q * W + wi * ws, ws), :] = \
                    res[wi * n:(wi + 1) * n, :].reshape(ws, ws, c)

    # block B sweep runs every step: at ib==0 it produces the zwrap
    # segment (top rows zeroed), at ib==S the wrap strip's top segment
    # (bottom rows zeroed); zeros (not stale VMEM) feed the wrapped
    # segment so NaNs can never leak into a valid row's softmax sum.
    for q in range(J):
        top = ycols(pl.ds(sp * ws + s, s), q)
        top = jnp.where(ib >= 1, top, jnp.zeros_like(top))
        bot = ycols(pl.ds(si * ws, s), q)
        bot = jnp.where(ib < S, bot, jnp.zeros_like(bot))
        rows_z = jnp.concatenate([top, bot], axis=0)[:, s:W + s, :]
        res = core(rows_z, wb, b2i, b2e if q == J - 1 else b2i)
        for wi in range(nwin_c):
            blkv = res[wi * n:(wi + 1) * n, :].reshape(ws, ws, c)
            out_ref[0, 0, 0:ws,
                    q * W + wi * ws:q * W + (wi + 1) * ws, :] = blkv

            @pl.when(ib == 0)
            def _seed_zwrap(blkv=blkv, q=q, wi=wi):
                zwrap_ref[0:s,
                          q * W + wi * ws:q * W + (wi + 1) * ws, :] = \
                    blkv[s:ws, :, :]

    @pl.when(ib == spb - 1)
    def _patch_wrap():
        out_ref[0, 0, s:ws, :, :] = zwrap_ref[:, :, :]


def _g2_pack(wqkv, bqkv, wproj, c, num_heads, hd, qscale):
    """Head-major 32-padded q/k/v columns + row-matched proj (the g2
    layout): in-kernel per-head slices become aligned 32-lane blocks.
    ``qscale`` (attention scale x log2(e)) is folded into wq/bq."""
    hp2 = -(-hd // 32) * 32

    def pad_cols(wmat, bvec, scl=1.0):
        pw, pb = [], []
        for hh in range(num_heads):
            pw.append(wmat[:, hh * hd:(hh + 1) * hd] * scl)
            pb.append(bvec[hh * hd:(hh + 1) * hd] * scl)
            if hp2 > hd:
                pw.append(jnp.zeros((c, hp2 - hd), wmat.dtype))
                pb.append(jnp.zeros((hp2 - hd,), bvec.dtype))
        return jnp.concatenate(pw, axis=1), jnp.concatenate(pb)

    wq_a, bq_a = pad_cols(wqkv[:, :c], bqkv[:c], qscale)
    wk_a, bk_a = pad_cols(wqkv[:, c:2 * c], bqkv[c:2 * c])
    wv_a, bv_a = pad_cols(wqkv[:, 2 * c:], bqkv[2 * c:])
    prj = []
    for hh in range(num_heads):
        prj.append(wproj[hh * hd:(hh + 1) * hd])
        if hp2 > hd:
            prj.append(jnp.zeros((hp2 - hd, c), wproj.dtype))
    return hp2, (wq_a, bq_a), (wk_a, bk_a), (wv_a, bv_a), \
        jnp.concatenate(prj, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "ws", "dc1", "r_unroll", "wchunk_override", "interpret"))
def swin_pair_strip_pallas(x, blk_a, blk_b, mask_bank, *, num_heads,
                           ws: int = 8, dc1: int = 0, r_unroll: int = 4,
                           wchunk_override: int | None = None,
                           interpret: bool = False):
    """Fused PAIR of Swin blocks (unshifted block A, shifted block B) over
    (B, H, W, C): one kernel invocation per pair, intermediate activations
    VMEM-resident. Input may be pre-rolled (dc1 = +ws//2 un-rolls block
    A's reads, matching the RSTB frame chain); output is in frame -ws//2.
    blk_a/blk_b = (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, rpb,
    ln2w, ln2b, w1, b1, w2, b2); mask_bank is block B's canonical (2, 2,
    n, n) cyclic-shift bank. bf16 fastmath semantics only (the serving
    path); numerics are bit-identical to the sequential paired2r chain."""
    b, h, w, c = x.shape
    s = ws // 2
    n = ws * ws
    assert h % ws == 0 and w % ws == 0
    assert dc1 in (0, s)
    assert num_heads % 2 == 0
    S = h // ws
    spb = S + 1
    if w <= 384:
        wchunk = wchunk_override or w
    else:
        wchunk = wchunk_override or strip_chunk_width(w, ws)
    assert wchunk and w % wchunk == 0 and (wchunk // ws) % 2 == 0, \
        (w, wchunk)
    J = w // wchunk
    nwin_c = wchunk // ws
    hd = c // num_heads
    log2e = 1.4426950408889634
    m = 2 * n
    groups = 2 * S

    packed = []
    hp2 = None
    for (lnw, lnb, wqkv, bqkv, wproj, bproj, rpb,
         ln2w, ln2b, w1, b1, w2, b2), bank in (
            (blk_a, None), (blk_b, mask_bank)):
        hp2, (wq_a, bq_a), (wk_a, bk_a), (wv_a, bv_a), wp_a = _g2_pack(
            wqkv, bqkv, wproj, c, num_heads, hd, hd ** -0.5 * log2e)
        bias = _paired_bias(rpb, bank, num_heads, n) * log2e
        packed.append((
            [lnw.astype(jnp.float32), lnb.astype(jnp.float32),
             wq_a.astype(x.dtype), wk_a.astype(x.dtype),
             wv_a.astype(x.dtype),
             bq_a.astype(jnp.float32), bk_a.astype(jnp.float32),
             bv_a.astype(jnp.float32),
             wp_a.astype(x.dtype), bproj.astype(jnp.float32),
             ln2w.astype(jnp.float32), ln2b.astype(jnp.float32),
             w1.astype(x.dtype), b1.astype(jnp.float32),
             w2.astype(x.dtype), b2.astype(jnp.float32)],
            bias))
    cp2 = num_heads * hp2
    hidden = blk_a[9].shape[1]
    bias1 = packed[0][1][0, 0]                  # (m, heads*m), no mask
    bias2 = packed[1][1]                        # (2, 2, m, heads*m)

    xg = x.reshape(b * groups, 1, s, w, c)
    d0 = -dc1 // s

    def idx(off):
        def f(i):
            band, ib = i // spb, i % spb
            sloc = jnp.minimum(ib, S - 1)
            return (band * groups + (2 * sloc + d0 + off) % groups,
                    0, 0, 0, 0)
        return f

    def repp(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda *_: (0,) * nd,
                            memory_space=pltpu.VMEM)

    wspecs = [repp((c,)), repp((c,)),
              repp((c, cp2)), repp((c, cp2)), repp((c, cp2)),
              repp((cp2,)), repp((cp2,)), repp((cp2,)),
              repp((cp2, c)), repp((c,)),
              repp((c,)), repp((c,)),
              repp((c, hidden)), repp((hidden,)),
              repp((hidden, c)), repp((c,))]

    kernel = functools.partial(
        _strip_kernel_pairfused, num_heads=num_heads, hp=hp2,
        nwin_c=nwin_c, J=J, ws=ws, S=S, spb=spb, dc1=dc1,
        r_unroll=r_unroll)

    def out_idx(i):
        band, ib = i // spb, i % spb
        return (band * S + jnp.clip(ib - 1, 0, S - 1), 0, 0, 0, 0)

    out = pl.pallas_call(
        kernel,
        grid=(b * spb,),
        in_specs=[
            pl.BlockSpec((1, 1, s, w, c), idx(0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, w, c), idx(1),
                         memory_space=pltpu.VMEM),
        ] + wspecs + [repp((m, num_heads * m))] + wspecs + [
            repp((2, 2, m, num_heads * m))],
        out_specs=pl.BlockSpec((1, 1, ws, w, c), out_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * S, 1, ws, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nwin_c * n, c), x.dtype),     # xw
            pltpu.VMEM((nwin_c * n, cp2), x.dtype),   # q
            pltpu.VMEM((nwin_c * n, cp2), x.dtype),   # k
            pltpu.VMEM((nwin_c * n, cp2), x.dtype),   # v
            pltpu.VMEM((nwin_c * n, cp2), x.dtype),   # attn
            pltpu.VMEM((2 * ws, w, c), x.dtype),      # ybuf ring
            pltpu.VMEM((s, w, c), x.dtype),           # zwrap
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # carries through ybuf/zwrap REQUIRE sequential grid order
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xg, xg, *packed[0][0], bias1, *packed[1][0], bias2)
    return out.reshape(b, h, w, c)
