"""SwinIR in Flax/NHWC (rebuild of SwinIR/models/network_swinir.py).

Structure: conv_first -> [RSTB x D] (each: [SwinTransformerBlock x d] + conv +
residual) -> conv_after_body + residual -> task head (pixel-shuffle upsample
for SR, plain conv for denoise/JPEG). Window attention with relative position
bias and alternating shifted windows.

TPU-first design notes:
- tensors stay (B, H, W, C); window partition/reverse are reshapes XLA folds
  away (the reference round-trips (B, HW, C) <-> (B, C, H, W) every block),
- shifted-window masks are trace-time numpy constants (the reference computes
  them on-device per forward for non-train sizes),
- attention runs as (B*nW, heads, N, N) batched matmuls on the MXU with fp32
  accumulation; N = window_size^2 = 64 keeps logits tiny and VMEM-resident.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_attention import (mlp_block_pallas, roll2d_pallas,
                                    strip_chunk_width, swin_strip_pallas,
                                    wmsa_block_pallas, wmsa_pallas)
from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from ..ops.window_attention import (
    relative_position_index,
    shift_attention_mask,
    window_attention,
    window_partition,
    window_reverse,
)
from .common import (Conv, ConvParams, LNParams, conv3x3_xla,
                     fused_pixelshuffle_head, upsample_tail)
from .registry import ModelSpec, register_model

RGB_MEAN = (0.4488, 0.4371, 0.4040)  # DIV2K mean (network_swinir.py:716)


def _resolve_impl(impl: str) -> str:
    if impl == "auto":
        return "pallas_block" if jax.default_backend() == "tpu" else "xla"
    return impl


def _pallas_supported(ws: int, tokens: int) -> bool:
    """The fused Pallas paths assume an even window (roll2d splits rows into
    ws//2 groups) and a token count divisible by 8 (mlp_block_pallas row
    blocking) — window_size=7 configs (swinir_jpeg_40) must use XLA."""
    return ws % 2 == 0 and tokens % 8 == 0


class WindowAttentionLayer(nn.Module):
    """Pre-norm windowed attention half-block: LN -> qkv -> MHSA -> proj,
    returning ``xw + proj(attn(LN(xw)))`` (the residual is inside).

    Parameters are raw tensors (qkv_kernel/..., norm_scale/...) so the same
    checkpoint drives all three backends:
    - "xla": einsum attention (CPU-friendly),
    - "pallas": fused attention kernel (ops/pallas_attention.wmsa_pallas),
    - "pallas_block": everything — LN, qkv matmul, attention, projection,
      residual — in one VMEM-resident kernel (wmsa_block_pallas); kills the
      per-block layout copies and LN/qkv/proj HBM round trips that profile
      as ~2/3 of SwinIR-M block time.
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, xw, mask, dc: int = 0, mask_bank=None, mlp=None):
        # xw: (nWB, N, C), pre-norm (the block shortcut); dc/mask_bank/mlp
        # only apply on the 4D strip-kernel path (folded roll + edge-mask
        # bank + fused MLP half-block)
        ws = self.window_size
        n = ws * ws
        c = self.dim
        impl = _resolve_impl(self.attention_impl)
        if impl in ("pallas", "pallas_block") and not _pallas_supported(
                ws, int(np.prod(xw.shape[:-1]))):
            impl = "xla"

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        norm_scale = self.param("norm_scale", nn.initializers.ones, (c,))
        norm_bias = self.param("norm_bias", nn.initializers.zeros, (c,))
        qkv_kernel = self.param("qkv_kernel",
                                nn.initializers.lecun_normal(), (c, 3 * c))
        qkv_b = self.param("qkv_bias_p", nn.initializers.zeros, (3 * c,)) \
            if self.qkv_bias else jnp.zeros((3 * c,), xw.dtype)
        proj_kernel = self.param("proj_kernel",
                                 nn.initializers.lecun_normal(), (c, c))
        proj_b = self.param("proj_bias_p", nn.initializers.zeros, (c,))

        if impl == "pallas_block":
            idx = jnp.asarray(relative_position_index(ws).reshape(-1))
            rpb = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
            if xw.ndim == 4:  # (B, H, W, C): strip kernel, no partition
                fm = xw.dtype == jnp.bfloat16
                return swin_strip_pallas(
                    xw, norm_scale, norm_bias, qkv_kernel, qkv_b,
                    proj_kernel, proj_b, rpb, mask,
                    num_heads=self.num_heads, ws=ws, dc=dc,
                    mask_bank=mask_bank, mlp=mlp,
                    # bf16 serving: register-fused ROLLED pair bodies
                    # (paired2r) — bit-identical to paired2 fastmath,
                    # measured ~1.2 ms/block faster AND lowering drops
                    # 205s -> ~1s (the round-3 driver-bench timeout);
                    # tanh-GELU + clamp-softmax error below bf16 rounding.
                    # f32 (tests/parity) keeps exact erf on paired2.
                    attn_mode="paired2r" if fm else "paired2",
                    fastmath=fm)
            nwb = xw.shape[0]
            nw = 1 if mask is None else mask.shape[0]
            g = next(gg for gg in (8, 4, 2, 1)
                     if nwb % gg == 0 and nw % gg == 0)
            return wmsa_block_pallas(
                xw, norm_scale, norm_bias, qkv_kernel, qkv_b,
                proj_kernel, proj_b, rpb, mask, num_heads=self.num_heads,
                g=g)

        # unfused paths: LN + matmuls in XLA, attention per impl
        xf = xw.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * norm_scale
             + norm_bias).astype(xw.dtype)
        qkv = y @ qkv_kernel.astype(y.dtype) + qkv_b.astype(y.dtype)
        if impl == "pallas":
            idx = jnp.asarray(relative_position_index(ws).reshape(-1))
            rpb = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
            nwb = xw.shape[0]
            nw = 1 if mask is None else mask.shape[0]
            g = next(gg for gg in (8, 4, 2, 1)
                     if nwb % gg == 0 and nw % gg == 0)
            out = wmsa_pallas(qkv, rpb.astype(jnp.float32), mask,
                              num_heads=self.num_heads, g=g)
        else:
            out = window_attention(qkv, self.num_heads, table, ws, mask)
        return xw + out @ proj_kernel.astype(out.dtype) \
            + proj_b.astype(out.dtype)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 2.0
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, in_frame: int = 0):
        """Returns (y, out_frame). On the strip-kernel path the cyclic roll
        is folded into the kernel's reads and the output stays in the
        rolled frame (out_frame = -shift); the caller (RSTB) chains frames
        through the block sequence and unrolls once per RSTB. Elsewhere
        frames are always 0."""
        b, h, w, c = x.shape
        ws = self.window_size
        # If the (padded) feature map is not larger than one window, no shift
        # (reference SwinTransformerBlock.__init__:205-208).
        shift = 0 if min(h, w) <= ws else self.shift_size

        impl = _resolve_impl(self.attention_impl)
        if impl in ("pallas", "pallas_block") and not _pallas_supported(
                ws, b * h * w):
            impl = "xla"

        # The attention half-block (LN -> attn -> proj -> +residual) runs on
        # raw (rolled, windowed) features; LN is pixelwise so it commutes
        # with roll/partition. Wide canvases need a column-chunk divisor
        # (the 2D-grid untiled path); without one, fall back to the
        # partition path (wide 1D strips are a measured dead end).
        strip = impl == "pallas_block" and h % ws == 0 and w % ws == 0 \
            and (w <= 384 or strip_chunk_width(w, ws) is not None)
        attn = WindowAttentionLayer(self.dim, ws, self.num_heads,
                                    attention_impl=impl, name="attn")

        # MLP half-block params: raw tensors shared across backends.
        hidden = int(self.dim * self.mlp_ratio)
        n2_scale = self.param("norm2_scale", nn.initializers.ones, (c,))
        n2_bias = self.param("norm2_bias", nn.initializers.zeros, (c,))
        w1 = self.param("fc1_kernel", nn.initializers.lecun_normal(),
                        (c, hidden))
        b1 = self.param("fc1_bias", nn.initializers.zeros, (hidden,))
        w2 = self.param("fc2_kernel", nn.initializers.lecun_normal(),
                        (hidden, c))
        b2 = self.param("fc2_bias", nn.initializers.zeros, (c,))

        out_frame = 0
        if strip:
            # strip kernel: windowizing happens in VMEM, no partition copy;
            # roll folded into the kernel's reads; shift masks via the
            # 4-pattern edge bank (O(1) memory for any canvas size); the
            # MLP half-block fused into the same kernel
            req_frame = -shift
            dc = req_frame - in_frame
            bank = None
            if shift > 0:
                bank_np = shift_attention_mask(2 * ws, 2 * ws, ws, shift)
                bank = jnp.asarray(
                    bank_np.reshape(2, 2, ws * ws, ws * ws))
            x = attn(x, None, dc=dc, mask_bank=bank,
                     mlp=(n2_scale, n2_bias, w1, b1, w2, b2))
            return x, req_frame
        else:
            assert in_frame == 0, "frames only flow on the strip path"
            y = x
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask_np = shift_attention_mask(h, w, ws, shift)
            mask = None if mask_np is None else jnp.asarray(mask_np)
            yw = window_partition(y, ws).reshape(-1, ws * ws, c)
            yw = attn(yw, mask)
            y = window_reverse(yw.reshape(-1, ws, ws, c), ws, h, w)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            x = y

        if impl == "pallas_block":
            x2d = x.reshape(-1, c)
            out = mlp_block_pallas(x2d, n2_scale, n2_bias, w1, b1, w2, b2)
            return out.reshape(b, h, w, c), out_frame

        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * n2_scale
             + n2_bias).astype(x.dtype)
        y = y @ w1.astype(y.dtype) + b1.astype(y.dtype)
        y = nn.gelu(y, approximate=False)
        y = y @ w2.astype(y.dtype) + b2.astype(y.dtype)
        return x + y, out_frame


class RSTB(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 2.0
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        res = x
        frame = 0
        for i in range(self.depth):
            x, frame = SwinBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                attention_impl=self.attention_impl,
                name=f"block{i}")(x, frame)
        # the RSTB unroll (undoing the folded shift frame) fuses into the
        # conv's index maps — no whole-canvas roll pass (ops/conv3x3.py)
        return Conv(self.dim, kernel=3, name="conv")(x, res=res,
                                                     roll=-frame)


class SwinIR(nn.Module):
    """Args mirror the reference constructor (network_swinir.py:618-705)."""

    img_channels: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    upscale: int = 1
    img_range: float = 1.0
    upsampler: str = ""          # "pixelshuffle" | "pixelshuffledirect" | ""
    patch_norm: bool = True
    num_feat: int = 64           # head width for the pixelshuffle upsampler
    attention_impl: str = "auto"  # window attention backend
    unshuffle_scale: int = 0     # DiffBIR stage-1: pixel-unshuffle input by 8
    # emit (B, H*s, W*s*3) with RGB interleaved into the minor axis
    # (byte-identical to NHWC row-major: host reshape view is free; skips
    # the channels-last device transpose). pixelshuffle upsampler only.
    packed_output: bool = False

    @nn.compact
    def __call__(self, x):
        # dtype-matched: an f32 constant here would silently promote the
        # whole network to f32 under bf16 inference
        mean = jnp.asarray(RGB_MEAN, dtype=x.dtype).reshape(1, 1, 1, 3)
        if self.img_channels == 3:
            x = (x - mean) * self.img_range
        inp = x
        if self.unshuffle_scale > 1:
            x = pixel_unshuffle(x, self.unshuffle_scale)

        feat = Conv(self.embed_dim, kernel=3, name="conv_first")(x)

        y = feat
        if self.patch_norm:
            y = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(y)
        for i, (d, h) in enumerate(zip(self.depths, self.num_heads)):
            y = RSTB(self.embed_dim, d, h, self.window_size,
                     self.mlp_ratio, attention_impl=self.attention_impl,
                     name=f"layer{i}")(y)
        # trailing LayerNorm fused into conv_after_body (param path "norm"
        # unchanged; see LNParams)
        ln = LNParams(self.embed_dim, name="norm")()
        y = Conv(self.embed_dim, kernel=3, name="conv_after_body")(
            y, res=feat, ln_pre=ln)

        if self.upsampler == "pixelshuffle":
            y = Conv(self.num_feat, kernel=3, act="lrelu",
                     name="conv_before_upsample")(y)
            s = self.upscale
            rs = []
            while s > 1:
                rs.append(3 if s % 3 == 0 else 2)
                s //= rs[-1]
            if rs:
                # the whole (linear) head as one composed plane-space conv
                # + shuffles, border ring recomputed sequentially — see
                # common.fused_pixelshuffle_head
                stages = [ConvParams(self.num_feat * r * r, self.num_feat,
                                     name=f"upsample{stage}")()
                          for stage, r in enumerate(rs)]
                wl, bl = ConvParams(self.img_channels, self.num_feat,
                                    name="conv_last")()

                def seq_head(z):
                    for (w, b), r in zip(stages[:-1], rs[:-1]):
                        z = conv3x3_xla(z, w, b)
                        z = pixel_shuffle(z, r)
                    return upsample_tail(z, *stages[-1], wl, bl, rs[-1])

                y = fused_pixelshuffle_head(y, stages, wl, bl, rs, seq_head,
                                            packed=self.packed_output)
            else:
                y = Conv(self.img_channels, kernel=3, name="conv_last")(y)
        elif self.upsampler == "pixelshuffledirect":
            y = Conv(self.img_channels * self.upscale ** 2, kernel=3,
                     shuffle=self.upscale, name="upsample_direct")(y)
        elif self.upsampler == "nearest+conv":
            # Real-SR / DiffBIR stage-1 head: nearest x2 + conv (+lrelu)
            # stages, then conv_hr + conv_last.
            y = Conv(self.num_feat, kernel=3, act="lrelu",
                     name="conv_before_upsample")(y)
            s, stage = self.upscale, 0
            while s > 1:
                b, hh, ww, cc = y.shape
                y = jax.image.resize(y, (b, 2 * hh, 2 * ww, cc),
                                     method="nearest")
                y = Conv(self.num_feat, kernel=3, act="lrelu2",
                         name=f"conv_up{stage}")(y)
                s //= 2
                stage += 1
            y = Conv(self.num_feat, kernel=3, act="lrelu2",
                     name="conv_hr")(y)
            y = Conv(self.img_channels, kernel=3, name="conv_last")(y)
        else:  # denoising / JPEG artifact removal: global residual
            y = Conv(self.img_channels, kernel=3, name="conv_last")(y) + x

        if self.packed_output:
            assert self.upsampler == "pixelshuffle" and y.ndim == 3, \
                "packed_output supports the pixelshuffle head only"
            if self.img_channels == 3:
                mean_row = jnp.tile(mean.reshape(3), y.shape[2] // 3)
                y = y / self.img_range + mean_row[None, None, :]
            return y
        if self.img_channels == 3:
            y = y / self.img_range + mean
        return y


# Classical 4x SR ("SwinIR-M": embed 180, six 6-deep RSTBs, window 8).
register_model(ModelSpec(
    name="swinir_sr_x4",
    build=lambda **kw: SwinIR(**kw),
    subtasks=("super-resolution",),
    scale=4,
    pad_multiple=8, pad_mode="extra", pad_kind="symmetric",
    tile=None, tile_overlap=32, band_mode=True,
    config=dict(embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                window_size=8, upscale=4, upsampler="pixelshuffle"),
))

# Lightweight 4x SR.
register_model(ModelSpec(
    name="swinir_lightweight_sr_x4",
    build=lambda **kw: SwinIR(**kw),
    subtasks=("super-resolution",),
    scale=4,
    pad_multiple=8, pad_mode="extra", pad_kind="symmetric",
    tile=256, tile_overlap=32,
    config=dict(embed_dim=60, depths=(6,) * 4, num_heads=(6,) * 4,
                window_size=8, upscale=4, upsampler="pixelshuffledirect"),
))

# Color denoising (noise 15/50 share the arch; weights differ).
for _sigma in (15, 50):
    register_model(ModelSpec(
        name=f"swinir_denoise_{_sigma}",
        build=lambda **kw: SwinIR(**kw),
        subtasks=("denoising",),
        pad_multiple=8, pad_mode="extra", pad_kind="symmetric",
        tile=None,
        config=dict(embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                    window_size=8, upsampler=""),
    ))

# JPEG artifact removal (window 7, grayscale-capable; we serve color).
register_model(ModelSpec(
    name="swinir_jpeg_40",
    build=lambda **kw: SwinIR(**kw),
    subtasks=("jpeg compression artifact removal",),
    pad_multiple=7, pad_mode="extra", pad_kind="symmetric",
    tile=None,
    config=dict(embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                window_size=7, upsampler="", img_range=255.0),
))

# Tiny CPU-testable config.
register_model(ModelSpec(
    name="swinir_tiny",
    build=lambda **kw: SwinIR(**kw),
    subtasks=("super-resolution",),
    scale=4,
    pad_multiple=8, pad_mode="extra", pad_kind="symmetric",
    tile=None,
    config=dict(embed_dim=16, depths=(2, 2), num_heads=(2, 2),
                window_size=8, upscale=4, upsampler="pixelshuffle",
                num_feat=16),
))
