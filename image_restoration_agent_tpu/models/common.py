"""Shared Flax layers for the restoration zoo (NHWC, torch-compatible math).

Weight-conversion convention: torch Conv2d kernels (O, I, kh, kw) transpose to
flax (kh, kw, I, O); Linear weights (O, I) transpose to (I, O). Depthwise
convs use feature_group_count == channels with torch's (C, 1, kh, kw) kernel
reshaped to (kh, kw, 1, C).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv3x3 import (compose_conv_weights, conv3x3_pallas,
                           conv3x3_supported, conv_after_shuffle_weights)
from ..ops.layernorm import layer_norm_2d, layer_norm_bias_free, layer_norm_with_bias
from ..ops.pixel_shuffle import pixel_shuffle

# Dispatch mode for the fused 3x3 strip kernel (ops/conv3x3.py):
# "auto" = Pallas on TPU when the shape qualifies, XLA otherwise;
# "off" = always XLA; "interpret" = Pallas in interpret mode on any
# backend (tests only). Explicit setter, not an env var, so the choice
# is visible in code and can't silently diverge across jit caches.
_CONV3X3_MODE = "auto"


def set_conv3x3_mode(mode: str) -> None:
    global _CONV3X3_MODE
    assert mode in ("auto", "off", "interpret"), mode
    _CONV3X3_MODE = mode


class _FastConv3x3(nn.Module):
    """Param-compatible stand-in for Conv's inner nn.Conv (same child name
    "Conv_0", param names "kernel"/"bias") that runs conv3x3_pallas with
    fused bias/activation/pixel-shuffle."""

    features: int
    use_bias: bool
    act: str | None
    shuffle: int
    interpret: bool = False

    @nn.compact
    def __call__(self, x, res=None, roll=0, ln_pre=None):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, cin, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return conv3x3_pallas(x, w, b, act=self.act, shuffle=self.shuffle,
                              interpret=self.interpret, res=res, roll=roll,
                              ln_pre=ln_pre)


class LNParams(nn.Module):
    """Declares nn.LayerNorm-compatible params ({scale, bias} under this
    module's name) and returns them, so a downstream op can fuse the
    normalization (e.g. conv3x3_pallas(ln_pre=...)) without changing the
    checkpoint param tree."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


def layer_norm_lanes(x, scale, bias, eps=1e-5):
    """nn.LayerNorm equivalent over the last axis (f32 math)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)) \
        .astype(x.dtype)


class _ConvP(nn.Module):
    features: int
    cin: int

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return w, b


class ConvParams(nn.Module):
    """Declares Conv-compatible params (child "Conv_0" with kernel/bias of
    a 3x3 conv) and returns them, so a fused op can consume them without
    changing the checkpoint param tree."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        return _ConvP(self.features, self.cin, name="Conv_0")()


def conv3x3_xla(x, w, b):
    """Plain SAME zero-padded conv + bias on the XLA path."""
    r = w.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(r, r), (r, r)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)[None, None, None, :]


def _shuffle_chain_perm(cout: int, rs) -> "np.ndarray":
    """Channel permutation turning the chained pixel_shuffle(r_0)..(r_k)
    into ONE depth-to-space: perm[(i*R + j)*cout + c] = source channel of
    the composite conv output that the sequential chain would place at
    spatial offset (i, j), channel c (R = prod(rs))."""
    import numpy as np

    r_tot = 1
    for r in rs:
        r_tot *= r
    x = np.arange(cout * r_tot * r_tot).reshape(1, 1, 1, -1)
    for r in rs:
        _, h, w, crr = x.shape
        c = crr // (r * r)
        x = x.reshape(h, w, c, r, r)
        x = np.moveaxis(x, (-3, -2, -1), (-1, -4, -2))
        x = x.reshape(1, h * r, w * r, c)
    return x[0].reshape(-1)


def fused_pixelshuffle_head(x, stages, wl, bl, rs, seq_head,
                            packed: bool = False):
    """The whole pixel-shuffle SR head as ONE plane-space conv + shuffles.

    The head after conv_before_upsample's LeakyReLU is entirely linear:
    ``conv_0 -> shuffle(r_0) -> conv_1 -> shuffle(r_1) -> ... -> conv_last``
    (reference SwinIR ``Upsample`` has no activations between stages —
    network_swinir.py:572 + conv_last, served by AgentApp/model_service/
    denoising/SwinIR/model_serving.py). Folding every conv in front of the
    shuffles via conv_after_shuffle_weights and composing them collapses
    the wide intermediates (64*r^2 channels at r*H x r*W — 2.2 GB of HBM
    round trips at the 2K x4 headline) into one small (5, 5, Cin, Cout*R^2)
    conv at base resolution: measured ~60 ms -> ~6 ms per 552x1920 band.

    Zero-padding semantics of the composed conv differ from the sequential
    form in a thin border ring (the sequential form zero-pads each
    intermediate), so the ring is recomputed with ``seq_head`` on 4 thin
    border strips and pasted — the result is exact everywhere.

    Args:
        x: (B, H, W, C) input (post conv_before_upsample activation).
        stages: [(w_i, b_i)] per upsample-stage conv, one per entry of rs.
        wl, bl: conv_last weights.
        rs: pixel-shuffle factor per stage (e.g. [2, 2] for x4).
        seq_head: callable (B, h, w, C) -> (B, h*R, w*R, Cout) computing
            the sequential head (used for the border strips).
        packed: emit ``(B, H*R, W*R*Cout)`` with channels interleaved into
            the minor axis (row-major identical bytes to the NHWC output,
            so a host-side reshape view is free). Skips the expensive
            channels-last device transpose: the packed d2s needs only ONE
            middle-axis swap.
    """
    w, b = wl.astype(jnp.float32), bl.astype(jnp.float32)
    for (wi, bi), r in zip(reversed(stages), reversed(rs)):
        w = conv_after_shuffle_weights(w, r)
        b = jnp.repeat(b, r * r)
        w, b = compose_conv_weights(wi, bi, w, b)

    # fold the chained-shuffle channel order into the conv weights so the
    # whole chain becomes ONE depth-to-space transpose (measured: chained
    # r=2 shuffles after a materialized producer cost ~60 ms at the 2K x4
    # headline band; one permuted transpose ~26 ms; the barrier keeps XLA
    # from fusing the transpose into the conv epilogue)
    cout = wl.shape[-1]
    r_tot = 1
    for r in rs:
        r_tot *= r
    perm = _shuffle_chain_perm(cout, rs)
    w, b = w[..., perm], b[perm]

    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1),
        [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b.astype(jnp.float32)[None, None, None, :].astype(y.dtype)
    y = jax.lax.optimization_barrier(y)
    bsz, hh, ww, _ = y.shape
    if packed:
        # (B,H,W, i, j*cout) -> (B, H, i, W, j*cout): one axis swap, minor
        # dim untouched
        y = y.reshape(bsz, hh, ww, r_tot, r_tot * cout)
        y = y.transpose(0, 1, 3, 2, 4).reshape(
            bsz, hh * r_tot, ww * r_tot * cout)
    else:
        y = y.reshape(bsz, hh, ww, r_tot, r_tot, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            bsz, hh * r_tot, ww * r_tot, cout)

    # border ring: divergence is bounded by the composite kernel radius
    # (w.shape[0] // 2 plane px); recompute a 4-px plane ring sequentially
    s = r_tot
    ring, ctx = 4, 12  # plane px; ctx >= ring + composite radius
    h, wd = x.shape[1], x.shape[2]
    def pk(z):  # pack an NHWC strip (free byte-wise reshape)
        return z.reshape(z.shape[0], z.shape[1], -1) if packed else z

    if h <= ctx or wd <= ctx:
        return pk(seq_head(x))
    ro = ring * s
    rc = ro * cout if packed else ro  # ring width on y's column axis
    top = pk(seq_head(x[:, :ctx])[:, :ro])
    bot = pk(seq_head(x[:, -ctx:])[:, -ro:])
    left = pk(seq_head(x[:, :, :ctx])[:, :, :ro])
    right = pk(seq_head(x[:, :, -ctx:])[:, :, -ro:])
    y = y.at[:, :ro].set(top.astype(y.dtype))
    y = y.at[:, -ro:].set(bot.astype(y.dtype))
    y = y.at[:, :, :rc].set(left.astype(y.dtype))
    y = y.at[:, :, -rc:].set(right.astype(y.dtype))
    return y


def upsample_tail(x, w1, b1, wl, bl, r):
    """Final pixel-shuffle head stage: upsample conv + pixel_shuffle(r) +
    conv_last, with both convs in plane space (the conv_last runs
    pre-shuffle via conv_after_shuffle_weights: r^2 fewer MXU rows and no
    shuffled-intermediate HBM round trip).

    MEASURED DEAD END: routing both convs through the single fused
    conv3x3_pair_pallas regresses the 2K x4 headline 1.971 -> 1.801 MP/s —
    register pressure forces narrow 960-col chunks and the in-kernel
    chain pipelines worse than two separate kernel launches. Keep the two
    separate Pallas convs.

    Ref contract: network_swinir.py Upsample + conv_last
    (AgenticIR/executor/denoising/tools/SwinIR/models/network_swinir.py:572,
    served by AgentApp/model_service/denoising/SwinIR/model_serving.py).
    """
    mode = _CONV3X3_MODE
    bsz, h, wd, cin = x.shape
    cmid = w1.shape[-1]
    fast = (
        mode != "off" and x.ndim == 4
        and (mode == "interpret" or jax.default_backend() == "tpu")
        and conv3x3_supported(h, wd, cin, cmid, esize=x.dtype.itemsize)
        and conv3x3_supported(h, wd, cmid, wl.shape[-1] * r * r,
                              esize=x.dtype.itemsize)
    )
    if fast:
        interp = mode == "interpret"
        y = conv3x3_pallas(x, w1, b1, interpret=interp)
        w2 = conv_after_shuffle_weights(wl, r)
        b2 = jnp.repeat(bl, r * r)
        y = conv3x3_pallas(y, w2, b2, interpret=interp)
        return pixel_shuffle(y, r)

    def conv(z, w, b):
        y = jax.lax.conv_general_dilated(
            z, w.astype(z.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(y.dtype)[None, None, None, :]

    y = pixel_shuffle(conv(x, w1, b1), r)
    return conv(y, wl, bl)


class _ConvAfterShuffleInner(nn.Module):
    """Param-compatible with Conv's inner nn.Conv ("kernel"/"bias" of the
    post-shuffle conv); computes pixel_shuffle(x, r) -> conv3x3 either
    directly (fallback) or in plane space via conv_after_shuffle_weights
    (fast path: r^2 fewer MXU rows and the r*H x r*W pre-conv intermediate
    never hits HBM)."""

    features: int
    r: int
    act: str | None
    fast: bool
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        r = self.r
        cin = x.shape[-1] // (r * r)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.fast:
            wp = conv_after_shuffle_weights(w, r)
            bp = jnp.repeat(b, r * r)
            y = conv3x3_pallas(x, wp, bp, act=self.act,
                               interpret=self.interpret)
            return pixel_shuffle(y, r)
        y = pixel_shuffle(x, r)
        y = jax.lax.conv_general_dilated(
            y, w.astype(y.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + b.astype(y.dtype)[None, None, None, :]
        if self.act == "lrelu":
            y = nn.leaky_relu(y, negative_slope=0.01)
        elif self.act == "lrelu2":
            y = nn.leaky_relu(y, negative_slope=0.2)
        return y


class ConvAfterShuffle(nn.Module):
    """pixel_shuffle(x, r) followed by a 3x3 conv (torch SAME semantics).

    Drop-in for ``pixel_shuffle + Conv`` at the end of pixel-shuffle
    upsample heads; the param tree matches Conv's ("Conv_0" child with the
    post-shuffle conv's kernel/bias shapes), so weight converters are
    unaffected by the plane-space optimization.
    """

    features: int
    r: int
    act: str | None = None

    @nn.compact
    def __call__(self, x):
        mode = _CONV3X3_MODE
        bsz, h, wd, cpre = x.shape
        fast = (
            mode != "off" and x.ndim == 4
            and (mode == "interpret" or jax.default_backend() == "tpu")
            and conv3x3_supported(h, wd, cpre, self.features * self.r ** 2,
                                  esize=x.dtype.itemsize)
        )
        return _ConvAfterShuffleInner(
            self.features, self.r, self.act, fast,
            interpret=(mode == "interpret"), name="Conv_0")(x)


class Conv(nn.Module):
    """Conv2d with explicit symmetric zero padding (torch semantics).

    act/shuffle are fused epilogues: act in {None, "lrelu" (slope .01),
    "lrelu2" (slope .2)}; shuffle r > 1 appends pixel_shuffle(y, r). On TPU,
    3x3/stride-1/ungrouped convs at qualifying shapes run the strip-matmul
    Pallas kernel (measured ~5x over XLA's TPU conv at serving shapes);
    everything else takes the XLA path with the same epilogues applied
    unfused, so call sites are backend-independent.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    groups: int = 1
    act: str | None = None
    shuffle: int = 1

    @nn.compact
    def __call__(self, x, res=None, roll=0, ln_pre=None):
        mode = _CONV3X3_MODE
        fast = (
            mode != "off"
            and self.kernel == 3 and self.stride == 1 and self.groups == 1
            and x.ndim == 4
            and (mode == "interpret" or jax.default_backend() == "tpu")
            and conv3x3_supported(x.shape[1], x.shape[2], x.shape[3],
                                  self.features, self.shuffle,
                                  esize=x.dtype.itemsize)
        )
        if fast:
            return _FastConv3x3(
                self.features, self.use_bias, self.act, self.shuffle,
                interpret=(mode == "interpret"), name="Conv_0")(x, res,
                                                                roll,
                                                                ln_pre)
        if ln_pre is not None:
            x = layer_norm_lanes(x, *ln_pre)
        if roll:
            x = jnp.roll(x, (roll, roll), axis=(1, 2))
        p = (self.kernel - 1) // 2
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=self.use_bias,
            feature_group_count=self.groups,
        )(x)
        if self.act == "lrelu":
            y = nn.leaky_relu(y, negative_slope=0.01)
        elif self.act == "lrelu2":
            y = nn.leaky_relu(y, negative_slope=0.2)
        if self.shuffle > 1:
            y = pixel_shuffle(y, self.shuffle)
        if res is not None:
            y = y + res
        return y


class DWConv(nn.Module):
    """Depthwise conv (groups == channels)."""

    kernel: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        p = (self.kernel - 1) // 2
        return nn.Conv(
            c,
            (self.kernel, self.kernel),
            padding=[(p, p), (p, p)],
            use_bias=self.use_bias,
            feature_group_count=c,
        )(x)


class LayerNorm2d(nn.Module):
    """NAFNet-style LayerNorm over channels at each pixel (eps=1e-6)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm_2d(x, w, b, self.eps)


class RestormerLayerNorm(nn.Module):
    """Restormer LayerNorm (eps=1e-5), bias-free or with-bias."""

    bias_free: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        if self.bias_free:
            return layer_norm_bias_free(x, w)
        b = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm_with_bias(x, w, b)
