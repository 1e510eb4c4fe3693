"""Fused 3x3 convolution as row-strip MXU matmuls (Pallas, TPU).

Why: XLA's spatial convolution on TPU runs these restoration workloads far
off roofline — measured 14.8 ms for a 552x1920x180 SAME conv whose roofline
(read 365 MB + write 365 MB, 0.62 TFLOP) is ~3 ms, and 62.8 ms for the x4
head's final 2208x7680 64->3 conv (~5 ms roofline). Reference contract being
beaten: the KAIR SwinIR network served per tile by
AgentApp/model_service/denoising/SwinIR/model_serving.py:148-166.

Design: the canvas is processed on a (batch, row-strip, column-chunk) grid.
Each step computes an (R, CC) block of the output as 9 shifted
(R*CC, Cin) @ (Cin, Cout) dots accumulated in f32:

- halos come from six clamped-index side refs (1-row top/bottom bands and
  8-column left/right strips, 3x3 combinations with the center block), so
  the input is read once from HBM with no XLA slice copies and no im2col
  amplification; clamped edge blocks are zeroed in-kernel, reproducing SAME
  zero padding exactly,
- column chunking (CC <= ~1920) bounds the unrolled 9-tap loop's live
  slabs: at full 7680-wide canvases Mosaic's register allocator needs 146MB
  of spill slots and compilation fails,
- optional fused bias and LeakyReLU epilogues; pixel-shuffle is applied
  as an XLA op on the kernel output (see conv3x3_pallas docstring for why
  it cannot fuse in-kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_mask_taps(win, i, j, lnpre, w_ref, b_ref, res_ref, out_ref, *,
                  rrows, width, cout, act, nsteps, nchunks):
    """Optional fused input LayerNorm, then SAME-pad edge masking, then the
    tap loop. LN runs BEFORE masking: the conv zero-pads the LN *output*
    at canvas edges (LN(0) = ln_bias != 0)."""
    cin = win.shape[-1]
    if lnpre is not None:
        lnw, lnb = lnpre
        xf = win.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        win = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * lnw[:][None, None, :]
               + lnb[:][None, None, :]).astype(win.dtype)
    zrow = jnp.zeros((1, width + 2, cin), win.dtype)
    top = jnp.where(i == 0, zrow, win[0:1])
    bot = jnp.where(i == nsteps - 1, zrow, win[rrows + 1:rrows + 2])
    xp = jnp.concatenate([top, win[1:rrows + 1], bot], axis=0)
    zcol = jnp.zeros((rrows + 2, 1, cin), win.dtype)
    left = jnp.where(j == 0, zcol, xp[:, 0:1])
    right = jnp.where(j == nchunks - 1, zcol, xp[:, width + 1:width + 2])
    xp = jnp.concatenate([left, xp[:, 1:width + 1], right], axis=1)
    _taps_and_store(xp, w_ref, b_ref, res_ref, out_ref, rrows=rrows,
                    width=width, cout=cout, act=act)


def _taps_and_store(xp, w_ref, b_ref, res_ref, out_ref, *, rrows, width,
                    cout, act):
    """The 9 shifted dots + epilogues, from an assembled (R+2, W+2, Cin)
    window. Slab slicing stays inside the loop: hoisting all 9 shifted
    copies into a list materializes 9 x (R*CC, Cin) in VMEM at once and
    OOMs scoped vmem."""
    cin = xp.shape[-1]
    acc = jnp.zeros((rrows * width, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            slab = xp[dy:dy + rrows, dx:dx + width, :] \
                .reshape(rrows * width, cin)
            acc = acc + jax.lax.dot_general(
                slab, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    if b_ref is not None:
        acc = acc + b_ref[:][None, :].astype(jnp.float32)
    if act == "lrelu":  # torch nn.LeakyReLU default slope
        acc = jnp.where(acc >= 0, acc, 0.01 * acc)
    elif act == "lrelu2":  # negative_slope=0.2 (ESRGAN-style heads)
        acc = jnp.where(acc >= 0, acc, 0.2 * acc)
    if res_ref is not None:
        # fused residual: conv(x) + res in one pass (the separate XLA add
        # re-streams in+out+res through HBM — ~1.1GB per RSTB at band shape)
        acc = acc + res_ref[0].reshape(rrows * width, cout) \
            .astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype).reshape(rrows, width, cout)


def _conv3_kernel(tl, tc, tr, ml, mc, mr, bl, bc, br, w_ref, b_ref,
                  res_ref, out_ref, *, rrows, width, cout, act, nsteps,
                  nchunks, lnpre=None):
    i = pl.program_id(1)
    j = pl.program_id(2)

    def band(l_ref, c_ref, r_ref):
        return jnp.concatenate(
            [l_ref[0][:, 7:8, :], c_ref[0], r_ref[0][:, 0:1, :]], axis=1)

    win = jnp.concatenate([band(tl, tc, tr), band(ml, mc, mr),
                           band(bl, bc, br)], axis=0)  # (R+2, W+2) unmasked
    _ln_mask_taps(win, i, j, lnpre, w_ref, b_ref, res_ref, out_ref,
                  rrows=rrows, width=width, cout=cout, act=act,
                  nsteps=nsteps, nchunks=nchunks)


def _conv3_roll_kernel(mc, strip, band, corner, w_ref, b_ref, res_ref,
                       out_ref, *, rrows, width, cout, act, nsteps,
                       nchunks, off, lnpre=None):
    """Roll-fused variant: computes conv(roll(x, (-off, -off))) without the
    separate whole-canvas roll pass. The cyclic roll by ``off``
    (1 <= |off| <= 7) fits inside one 8-wide/8-tall extra block, so each
    step reads its (R, CC) center plus an 8-col strip, an 8-row band, and
    the 8x8 corner on the roll's side — all with modular index maps (the
    roll's wraparound IS the modular map). SAME zero padding lands at the
    rolled canvas edges via the same i/j edge masks as the unrolled
    kernel."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    if off > 0:  # halos on the bottom/right side
        mid = jnp.concatenate([mc[0], strip[0]], axis=1)      # (R, CC+8)
        edge = jnp.concatenate([band[0], corner[0]], axis=1)  # (8, CC+8)
        big = jnp.concatenate([mid, edge], axis=0)            # (R+8, CC+8)
        base = 0       # center block sits at rows/cols [0, ...)
    else:        # halos on the top/left side
        mid = jnp.concatenate([strip[0], mc[0]], axis=1)
        edge = jnp.concatenate([corner[0], band[0]], axis=1)
        big = jnp.concatenate([edge, mid], axis=0)
        base = 8       # center block sits at rows/cols [8, ...)
    win = big[base + off - 1:base + off + rrows + 1,
              base + off - 1:base + off + width + 1, :]
    _ln_mask_taps(win, i, j, lnpre, w_ref, b_ref, res_ref, out_ref,
                  rrows=rrows, width=width, cout=cout, act=act,
                  nsteps=nsteps, nchunks=nchunks)


_VMEM_BUDGET = 96 * 1024 * 1024
_MAX_CHUNK = 1920


def _strip_vmem(r, w, cin, cout, esize=2):
    """Scoped-VMEM estimate for one grid step: double-buffered input blocks
    (center + halo strips), the concatenated copy, the f32 accumulator, the
    weights, and the double-buffered output block. ``esize`` is the canvas
    element size in bytes (2 for bf16 serving, 4 for f32 pipelines — the
    DiffBIR VAE/ControlNet path runs f32 and needs half-size strips)."""
    inputs = 2 * ((r + 2) * (w + 16) * cin * esize)   # blocks, x2 pipeline
    scratch = 2 * ((r + 2) * (w + 2) * cin * esize)   # band + xp copies
    acc = r * w * cout * 4
    wts = 9 * cin * cout * esize
    out = 2 * (r * w * cout * esize)
    return inputs + scratch + acc + wts + out


_LIVE_BUDGET = 18 * 1024 * 1024


def _live_vmem(r, w, cin, cout, esize):
    """Register/spill-pressure proxy: the f32 accumulator plus the
    assembled (R+2, CC+2, Cin) window are live across the whole 9-tap
    loop. Measured bracketing: the bf16 headline step (r=8, cc=1920,
    c=180) compiles fine at 17.5M; an f32 (r=16, cc=512, cin=256,
    cout=512) step at 25.3M spills 144MB of vregs and blows the 128MB
    VMEM cap (DiffBIR cond_encoder)."""
    return r * w * cout * 4 + (r + 2) * (w + 16) * cin * esize


def _pick_grid(h, w, cin, cout, esize=2):
    """(rrows, col_chunk) or None. Column chunks are uniform (the wrapper
    zero-pads the canvas width up to n_chunks * col_chunk when needed).
    If no (r, full-chunk) combination fits the VMEM and live-state
    budgets, the chunk width is halved (down to 128) before giving up."""
    nch = -(-w // _MAX_CHUNK)
    while True:
        cc = -(-w // nch // 8) * 8
        for r in (16, 8):
            if h % r:
                continue
            if (_strip_vmem(r, cc, cin, cout, esize) <= _VMEM_BUDGET
                    and _live_vmem(r, cc, cin, cout, esize)
                    <= _LIVE_BUDGET):
                return r, cc
        if cc <= 128:
            return None
        nch *= 2


def conv3x3_supported(h: int, w: int, cin: int, cout: int,
                     shuffle: int = 1, esize: int = 2) -> bool:
    """Shapes the strip kernel handles with good MXU utilization."""
    if h % 8 != 0 or w % 8 != 0 or w < 128:
        return False
    if shuffle > 1 and cout % (shuffle * shuffle) != 0:
        return False
    return _pick_grid(h, w, cin, cout, esize) is not None


@functools.partial(jax.jit, static_argnames=("act", "shuffle", "interpret",
                                             "rrows", "roll"))
def conv3x3_pallas(x, w, b=None, act: str | None = None, shuffle: int = 1,
                   interpret: bool = False, rrows: int | None = None,
                   res=None, roll: int = 0, ln_pre=None):
    """SAME 3x3 conv (stride 1) with optional bias/activation/pixel-shuffle.

    Args:
        x: (B, H, W, Cin); H % 8 == 0, W % 8 == 0.
        w: (3, 3, Cin, Cout) (flax nn.Conv layout).
        b: optional (Cout,).
        act: None | "lrelu" (slope .01) | "lrelu2" (slope .2).
        shuffle: r >= 1; r > 1 applies pixel_shuffle(y, r) to the output.
        rrows: override the auto-picked rows-per-strip (benchmarking).
        res: optional (B, H, W, Cout) residual, fused as conv(x)+res
            (applied after act; mutually exclusive with shuffle > 1).
        roll: compute conv over the cyclically rolled canvas
            ``jnp.roll(x, (roll, roll), axis=(1, 2))`` without the separate
            whole-canvas roll pass (the Swin RSTB unroll). Fused in-kernel
            when the effective offset fits the halo blocks, else applied
            as an XLA roll first.
        ln_pre: optional (scale, bias), each (Cin,): fused input LayerNorm
            (eps 1e-5, over channels) — conv(LN(x)); the conv's SAME zero
            padding applies to the LN output, matching the unfused order.

    Returns:
        (B, H, W, Cout) or the shuffled shape above, dtype of x.

    The pixel-shuffle epilogue runs as an XLA op on the kernel's output:
    Mosaic cannot shape-cast the lane (channel) dimension, so neither the
    grouped-channel interleave nor the (R*W, C) -> (R, W, co, r, r) reshape
    lowers in-kernel (both were tried and failed in infer-vector-layout).
    The conv itself — the compute-bound part — stays in the kernel.
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    esize = jnp.dtype(x.dtype).itemsize
    picked = _pick_grid(h, wd, cin, cout, esize)
    assert picked is not None, (h, wd, cin, cout, esize)
    r, cc = picked
    if rrows is not None:
        r = rrows
    nsteps = h // r
    nchunks = -(-wd // cc)
    wp = nchunks * cc

    off = -roll
    fuse_roll = wp == wd and 1 <= abs(off) <= 7
    if roll and not fuse_roll:
        x = jnp.roll(x, (roll, roll), axis=(1, 2))
        off = 0
    fuse_roll = fuse_roll and off != 0

    xin = x if wp == wd else jnp.pad(x, ((0, 0), (0, 0), (0, wp - wd),
                                         (0, 0)))

    assert res is None or (shuffle == 1 and res.shape == (bsz, h, wd, cout))
    if res is not None and wp != wd:
        res = jnp.pad(res, ((0, 0), (0, 0), (0, wp - wd), (0, 0)))

    static = dict(rrows=r, width=cc, cout=cout, act=act, nsteps=nsteps,
                  nchunks=nchunks)
    have_b, have_res = b is not None, res is not None
    have_ln = ln_pre is not None
    nbase = 5 if fuse_roll else 10  # canvas refs + the weight ref

    def kern(*refs):
        base, refs = refs[:nbase - 1], refs[nbase - 1:]
        w_ = refs[0]
        refs = refs[1:]
        b_ = refs[0] if have_b else None
        refs = refs[1:] if have_b else refs
        r_ = refs[0] if have_res else None
        refs = refs[1:] if have_res else refs
        lnp = (refs[0], refs[1]) if have_ln else None
        out = refs[-1]
        if fuse_roll:
            _conv3_roll_kernel(*base, w_, b_, r_, out, off=off,
                               lnpre=lnp, **static)
        else:
            _conv3_kernel(*base, w_, b_, r_, out, lnpre=lnp, **static)

    ncb = cc // 8           # col index units for the 8-wide halo strips
    lastc = wp // 8 - 1
    nrb8 = h // 8

    def rtop(i):
        return jnp.maximum(i * r - 1, 0)

    def rbot(i):
        return jnp.minimum(i * r + r, h - 1)

    def cleft(j):
        return jnp.maximum(j * ncb - 1, 0)

    def cright(j):
        return jnp.minimum(j * ncb + ncb, lastc)

    if fuse_roll:
        rb8 = r // 8  # mid block row index in 8-row units times this
        ncbt = lastc + 1
        if off > 0:   # bottom/right halos
            cstrip = lambda bi, i, j: (bi, i, (j * ncb + ncb) % ncbt, 0)
            cband = lambda bi, i, j: (bi, (i * rb8 + rb8) % nrb8, j, 0)
            ccorn = lambda bi, i, j: (bi, (i * rb8 + rb8) % nrb8,
                                      (j * ncb + ncb) % ncbt, 0)
        else:         # top/left halos
            cstrip = lambda bi, i, j: (bi, i, (j * ncb - 1) % ncbt, 0)
            cband = lambda bi, i, j: (bi, (i * rb8 - 1) % nrb8, j, 0)
            ccorn = lambda bi, i, j: (bi, (i * rb8 - 1) % nrb8,
                                      (j * ncb - 1) % ncbt, 0)
        in_specs = [
            # center / 8-col strip / 8-row band / 8x8 corner; modular maps
            # implement the roll's wraparound
            pl.BlockSpec((1, r, cc, cin), lambda bi, i, j: (bi, i, j, 0)),
            pl.BlockSpec((1, r, 8, cin), cstrip),
            pl.BlockSpec((1, 8, cc, cin), cband),
            pl.BlockSpec((1, 8, 8, cin), ccorn),
            pl.BlockSpec((3, 3, cin, cout), lambda bi, i, j: (0, 0, 0, 0)),
        ]
    else:
        in_specs = [
            # top band: left strip / center / right strip
            pl.BlockSpec((1, 1, 8, cin), lambda bi, i, j: (bi, rtop(i), cleft(j), 0)),
            pl.BlockSpec((1, 1, cc, cin), lambda bi, i, j: (bi, rtop(i), j, 0)),
            pl.BlockSpec((1, 1, 8, cin), lambda bi, i, j: (bi, rtop(i), cright(j), 0)),
            # mid band
            pl.BlockSpec((1, r, 8, cin), lambda bi, i, j: (bi, i, cleft(j), 0)),
            pl.BlockSpec((1, r, cc, cin), lambda bi, i, j: (bi, i, j, 0)),
            pl.BlockSpec((1, r, 8, cin), lambda bi, i, j: (bi, i, cright(j), 0)),
            # bottom band
            pl.BlockSpec((1, 1, 8, cin), lambda bi, i, j: (bi, rbot(i), cleft(j), 0)),
            pl.BlockSpec((1, 1, cc, cin), lambda bi, i, j: (bi, rbot(i), j, 0)),
            pl.BlockSpec((1, 1, 8, cin), lambda bi, i, j: (bi, rbot(i), cright(j), 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda bi, i, j: (0, 0, 0, 0)),
        ]
    args = [xin] * (nbase - 1) + [w]
    if b is not None:
        in_specs.append(pl.BlockSpec((cout,), lambda bi, i, j: (0,)))
        args.append(b)
    if res is not None:
        in_specs.append(pl.BlockSpec((1, r, cc, cout),
                                     lambda bi, i, j: (bi, i, j, 0)))
        args.append(res)
    if ln_pre is not None:
        for p in ln_pre:
            in_specs.append(pl.BlockSpec((cin,), lambda bi, i, j: (0,)))
            args.append(p)

    y = pl.pallas_call(
        kern,
        grid=(bsz, nsteps, nchunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r, cc, cout),
                               lambda bi, i, j: (bi, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wp, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 32 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if wp != wd:
        y = jax.lax.slice_in_dim(y, 0, wd, axis=2)
    if shuffle > 1:
        from .pixel_shuffle import pixel_shuffle
        y = pixel_shuffle(y, shuffle)
    return y


def conv_after_shuffle_weights(w, r: int):
    """Transform conv weights so the conv runs before the pixel-shuffle.

    Identity: ``conv3x3(pixel_shuffle(x, r), w) ==
    pixel_shuffle(conv3x3(x, conv_after_shuffle_weights(w, r)), r)``.

    Derivation: the shuffled image's pixel (r*h+i, r*w+j) takes channel
    c = cidx*r^2 + i*r + j of plane pixel (h, w). A 3x3 tap at image offset
    (dy, dx) from output phase (i, j) lands on plane offset
    (dyp, dxp) = ((i+dy)//r, (j+dx)//r) at phase (a, b) =
    ((i+dy)%r, (j+dx)%r) — still within a 3x3 plane stencil for any r >= 1.
    Why it wins on TPU: the x4 head's post-shuffle 64->3 conv runs over
    r^2-times more MXU rows than the plane-space 64*r^2 -> 3*r^2 form, and
    the r*H x r*W intermediate (2.2GB at 2K x4) never hits HBM.

    Args:
        w: (k, k, Cin, Cout) weights (k odd) of the conv applied after the
            shuffle.
        r: the pixel-shuffle factor.
    Returns:
        (kp, kp, Cin * r^2, Cout * r^2) weights for the plane-space conv,
        where kp = 2 * ceil((k // 2) / r) + 1.
        (For bias use ``jnp.repeat(b, r * r)``.)
    """
    k, _, cin, cout = w.shape
    assert k % 2 == 1, k
    rad = k // 2
    radp = -(-rad // r)
    kp = 2 * radp + 1
    wp = jnp.zeros((kp, kp, cin * r * r, cout * r * r), w.dtype)
    for i in range(r):
        for j in range(r):
            for dy in range(-rad, rad + 1):
                for dx in range(-rad, rad + 1):
                    a, dyp = (i + dy) % r, (i + dy) // r
                    bb, dxp = (j + dx) % r, (j + dx) // r
                    wp = wp.at[dyp + radp, dxp + radp, a * r + bb::r * r,
                               i * r + j::r * r].set(w[dy + rad, dx + rad])
    return wp


def compose_conv_weights(wa, ba, wb, bb):
    """Weights/bias of ``conv_b(conv_a(x) + ba) + bb`` as ONE conv.

    Both convs are SAME/zero-padded, odd square kernels; the composite has
    kernel ka + kb - 1. Exact in the interior; within a (ka//2 + kb//2)-px
    border ring the zero padding semantics differ (the sequential form
    zero-pads the *intermediate*, and conv_a's bias is truncated by
    conv_b's padding there) — callers must patch the ring with the
    sequential path (see models/common.py fused_pixelshuffle_head).
    """
    ka, _, cin, cmid = wa.shape
    kb, _, _, cout = wb.shape
    waf = wa.astype(jnp.float32)
    wbf = wb.astype(jnp.float32)
    w = jnp.zeros((ka + kb - 1, ka + kb - 1, cin, cout), jnp.float32)
    for dy in range(kb):
        for dx in range(kb):
            w = w.at[dy:dy + ka, dx:dx + ka].add(
                jnp.einsum("ijcm,mo->ijco", waf, wbf[dy, dx]))
    b = (bb.astype(jnp.float32)
         + ba.astype(jnp.float32) @ wbf.sum(axis=(0, 1)))
    return w, b


def _conv3_pair_kernel(tl, tc, tr, ml, mc, mr, bl, bc, br, w1_ref, b1_ref,
                       w2_ref, b2_ref, out_ref, *, rrows, width, cmid,
                       cout, act_mid, nsteps, nchunks):
    """Two chained SAME 3x3 convs in one kernel: the mid tensor u lives in
    VMEM only (the unfused pair writes + re-reads it through HBM — 2.2GB
    at the 2K x4 head's second stage). Halos are 2px, served by full 8-row
    bands / 8-col strips / 8x8 corners with clamped index maps; both
    convs' SAME zero pads are applied by masking exactly where the
    separate convs would pad."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    cin = mc.shape[-1]

    top = jnp.concatenate([tl[0], tc[0], tr[0]], axis=1)   # (8, CC+16)
    mid = jnp.concatenate([ml[0], mc[0], mr[0]], axis=1)   # (R, CC+16)
    bot = jnp.concatenate([bl[0], bc[0], br[0]], axis=1)   # (8, CC+16)
    big = jnp.concatenate([top, mid, bot], axis=0)         # (R+16, CC+16)
    win = big[6:rrows + 10, 6:width + 10, :]               # (R+4, CC+4)

    # conv1's SAME pad: canvas rows [iR-2, iR) / [iR+R, iR+R+2) are zero
    # at the canvas edges
    z2r = jnp.zeros((2, width + 4, cin), win.dtype)
    wtop = jnp.where(i == 0, z2r, win[0:2])
    wbot = jnp.where(i == nsteps - 1, z2r, win[rrows + 2:rrows + 4])
    win = jnp.concatenate([wtop, win[2:rrows + 2], wbot], axis=0)
    z2c = jnp.zeros((rrows + 4, 2, cin), win.dtype)
    wl_ = jnp.where(j == 0, z2c, win[:, 0:2])
    wr_ = jnp.where(j == nchunks - 1, z2c, win[:, width + 2:width + 4])
    win = jnp.concatenate([wl_, win[:, 2:width + 2], wr_], axis=1)

    m1 = (rrows + 2) * (width + 2)
    acc1 = jnp.zeros((m1, cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            slab = win[dy:dy + rrows + 2, dx:dx + width + 2, :] \
                .reshape(m1, cin)
            acc1 = acc1 + jax.lax.dot_general(
                slab, w1_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc1 = acc1 + b1_ref[:][None, :].astype(jnp.float32)
    if act_mid == "lrelu":
        acc1 = jnp.where(acc1 >= 0, acc1, 0.01 * acc1)
    u = acc1.astype(win.dtype).reshape(rrows + 2, width + 2, cmid)

    # conv2's SAME pad: u rows/cols just outside the canvas are zero
    z1r = jnp.zeros((1, width + 2, cmid), u.dtype)
    utop = jnp.where(i == 0, z1r, u[0:1])
    ubot = jnp.where(i == nsteps - 1, z1r, u[rrows + 1:rrows + 2])
    u = jnp.concatenate([utop, u[1:rrows + 1], ubot], axis=0)
    z1c = jnp.zeros((rrows + 2, 1, cmid), u.dtype)
    ul = jnp.where(j == 0, z1c, u[:, 0:1])
    ur = jnp.where(j == nchunks - 1, z1c, u[:, width + 1:width + 2])
    u = jnp.concatenate([ul, u[:, 1:width + 1], ur], axis=1)

    acc2 = jnp.zeros((rrows * width, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            slab = u[dy:dy + rrows, dx:dx + width, :] \
                .reshape(rrows * width, cmid)
            acc2 = acc2 + jax.lax.dot_general(
                slab, w2_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc2 = acc2 + b2_ref[:][None, :].astype(jnp.float32)
    out_ref[0] = acc2.astype(out_ref.dtype).reshape(rrows, width, cout)


@functools.partial(jax.jit, static_argnames=("act_mid", "interpret"))
def conv3x3_pair_pallas(x, w1, b1, w2, b2, act_mid: str | None = None,
                        interpret: bool = False):
    """y = conv3x3(act_mid(conv3x3(x, w1) + b1), w2) + b2, SAME padding,
    fused into one Pallas kernel (the intermediate never hits HBM).

    Used for the x4 SR head tail: last upsample conv composed with the
    plane-space conv_last (conv_after_shuffle_weights). Requires
    H % 8 == 0, W % 8 == 0, W >= 128.
    """
    bsz, h, wd, cin = x.shape
    cmid = w1.shape[-1]
    cout = w2.shape[-1]
    r = 8
    assert h % r == 0 and wd % 8 == 0 and wd >= 128, (h, wd)
    # narrower chunks than the single-conv kernel: conv2's nine
    # (R*CC, cmid) slabs must fit Mosaic's register budget (CC=1920 at
    # cmid=256 spills 135MB and fails to compile)
    nch = -(-wd // 960)
    cc = -(-wd // nch // 8) * 8
    wp = nch * cc
    xin = x if wp == wd else jnp.pad(x, ((0, 0), (0, 0), (0, wp - wd),
                                         (0, 0)))
    nsteps = h // r
    nrb8 = h // 8
    ncb = cc // 8
    ncbt = wp // 8

    kern = functools.partial(
        _conv3_pair_kernel, rrows=r, width=cc, cmid=cmid, cout=cout,
        act_mid=act_mid, nsteps=nsteps, nchunks=nch)

    def rt(i):
        return jnp.maximum(i * (r // 8) - 1, 0)

    def rb(i):
        return jnp.minimum(i * (r // 8) + r // 8, nrb8 - 1)

    def cl(j):
        return jnp.maximum(j * ncb - 1, 0)

    def cr(j):
        return jnp.minimum(j * ncb + ncb, ncbt - 1)

    in_specs = [
        pl.BlockSpec((1, 8, 8, cin), lambda bi, i, j: (bi, rt(i), cl(j), 0)),
        pl.BlockSpec((1, 8, cc, cin), lambda bi, i, j: (bi, rt(i), j, 0)),
        pl.BlockSpec((1, 8, 8, cin), lambda bi, i, j: (bi, rt(i), cr(j), 0)),
        pl.BlockSpec((1, r, 8, cin), lambda bi, i, j: (bi, i, cl(j), 0)),
        pl.BlockSpec((1, r, cc, cin), lambda bi, i, j: (bi, i, j, 0)),
        pl.BlockSpec((1, r, 8, cin), lambda bi, i, j: (bi, i, cr(j), 0)),
        pl.BlockSpec((1, 8, 8, cin), lambda bi, i, j: (bi, rb(i), cl(j), 0)),
        pl.BlockSpec((1, 8, cc, cin), lambda bi, i, j: (bi, rb(i), j, 0)),
        pl.BlockSpec((1, 8, 8, cin), lambda bi, i, j: (bi, rb(i), cr(j), 0)),
        pl.BlockSpec((3, 3, cin, cmid), lambda bi, i, j: (0, 0, 0, 0)),
        pl.BlockSpec((cmid,), lambda bi, i, j: (0,)),
        pl.BlockSpec((3, 3, cmid, cout), lambda bi, i, j: (0, 0, 0, 0)),
        pl.BlockSpec((cout,), lambda bi, i, j: (0,)),
    ]
    y = pl.pallas_call(
        kern,
        grid=(bsz, nsteps, nch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r, cc, cout),
                               lambda bi, i, j: (bi, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wp, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 32 * 1024 * 1024),
        interpret=interpret,
    )(*([xin] * 9 + [w1, b1, w2, b2]))
    if wp != wd:
        y = jax.lax.slice_in_dim(y, 0, wd, axis=2)
    return y
