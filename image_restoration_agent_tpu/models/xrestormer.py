"""X-Restormer in Flax/NHWC (rebuild of xrestormer/archs/xrestormer_arch.py).

Each TransformerBlock runs four sub-stages: MDTA channel attention + gated
FFN, then OCAB windowed spatial cross-attention + gated FFN
(xrestormer_arch.py TransformerBlock:244-262). OCAB: queries from 8x8
windows, keys/values from overlapping 12x12 windows (unfold stride 8, pad 2)
with a BotNet-style decomposed relative position embedding
(RelPosEmb:48-73). Same 4-level U-shape as Restormer.

TPU note: the unfold becomes conv_general_dilated_patches (one strided
patch-extract op); the rel-pos gather tables are trace-time constants, so
the rel_to_abs shuffle of the reference is replaced by two einsums over
pre-gathered tables (mathematically identical, no data-dependent reshapes).
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import Conv, RestormerLayerNorm
from .registry import ModelSpec, register_model
from ..ops.restormer_fused import fused_mode, gdfn_block_pallas, \
    mdta_block_pallas
from .restormer import (Downsample, GDFN, GDFNParams, MDTABlock,
                        MDTAParams, Upsample, _LNP, use_fused_blocks)


@functools.lru_cache(maxsize=32)
def _relpos_gather_index(ws: int, owin: int) -> np.ndarray:
    """idx[q, k] = k - q + (owin - 1): index into a (2*owin - 1) table.

    Matches the reference rel_to_abs arithmetic (xrestormer_arch.py:24-46):
    out[i, k] = table[k - i + r - 1] with r = owin.
    """
    q = np.arange(ws)[:, None]
    k = np.arange(owin)[None, :]
    return (k - q + owin - 1).astype(np.int32)


class OCAB(nn.Module):
    """Overlapping cross-attention block."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    dim_head: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        owin = int(ws * self.overlap_ratio) + ws
        pad = (owin - ws) // 2
        inner = self.dim_head * self.num_heads
        nh, nw = h // ws, w // ws

        qkv = Conv(inner * 3, kernel=1, use_bias=self.use_bias,
                   name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # queries: plain ws x ws windows -> (b*nW, ws*ws, inner)
        qw = q.reshape(b, nh, ws, nw, ws, inner).transpose(0, 1, 3, 2, 4, 5)
        qw = qw.reshape(b * nh * nw, ws * ws, inner)

        # keys/values: overlapping owin x owin windows (torch Unfold:
        # zero pad, stride ws)
        def unfold(t):
            tp = jnp.pad(t, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            patches = jax.lax.conv_general_dilated_patches(
                tp.transpose(0, 3, 1, 2),  # NCHW
                filter_shape=(owin, owin), window_strides=(ws, ws),
                padding="VALID")
            # (b, C*owin*owin, nh, nw), feature order (c, i, j) — c major,
            # same as torch Unfold.
            patches = patches.reshape(b, inner, owin * owin, nh, nw)
            return patches.transpose(0, 3, 4, 2, 1).reshape(
                b * nh * nw, owin * owin, inner)

        kw, vw = unfold(k), unfold(v)

        # split heads
        def heads(t):
            n = t.shape[1]
            return t.reshape(-1, n, self.num_heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qw), heads(kw), heads(vw)  # (B*, H, N, d)
        attn = jnp.einsum("whnd,whmd->whnm", qh * self.dim_head ** -0.5, kh,
                          preferred_element_type=jnp.float32)

        # decomposed relative position bias
        rel_h = self.param("rel_height",
                           nn.initializers.normal(self.dim_head ** -0.5),
                           (2 * owin - 1, self.dim_head))
        rel_w = self.param("rel_width",
                           nn.initializers.normal(self.dim_head ** -0.5),
                           (2 * owin - 1, self.dim_head))
        idx = jnp.asarray(_relpos_gather_index(ws, owin))
        rw = rel_w[idx]  # (ws, owin, d): table row for (y_q, j_k)
        rh = rel_h[idx]  # (ws, owin, d): for (x_q, i_k)
        # q as (B*, heads, xq, yq, d); the reference applies the scale to q
        # before the rel-pos product too.
        qs = (qh * self.dim_head ** -0.5).reshape(
            -1, self.num_heads, ws, ws, self.dim_head)
        bias_w = jnp.einsum("whxyd,yjd->whxyj", qs, rw.astype(qs.dtype),
                            preferred_element_type=jnp.float32)
        bias_h = jnp.einsum("whxyd,xid->whxyi", qs, rh.astype(qs.dtype),
                            preferred_element_type=jnp.float32)
        bias = bias_w[:, :, :, :, None, :] + bias_h[:, :, :, :, :, None]
        bias = bias.reshape(-1, self.num_heads, ws * ws, owin * owin)
        attn = attn + bias.astype(attn.dtype)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whnm,whmd->whnd", attn, vh.astype(attn.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, nh, nw, ws, ws, inner)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, inner)
        return Conv(self.dim, kernel=1, use_bias=self.use_bias,
                    name="project_out")(out)


class XTransformerBlock(nn.Module):
    dim: int
    window_size: int
    overlap_ratio: float
    num_channel_heads: int
    num_spatial_heads: int
    spatial_dim_head: int
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_ln: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = int(c * self.expansion)
        fused = (use_fused_blocks(x, 3 * c)
                 and use_fused_blocks(x, hidden * 2))
        interp = fused_mode() == "interpret"

        def fused_gdfn(x, ln_name, ffn_name):
            ln = _LNP(c, self.bias_free_ln, name=ln_name)()
            wi, bi, wd, bd, wo, bo = GDFNParams(
                c, self.expansion, self.use_bias, name=ffn_name)()
            return gdfn_block_pallas(x, ln, wi, bi, wd, bd, wo, bo,
                                     fastmath=x.dtype == jnp.bfloat16,
                                     interpret=interp)

        if fused:
            ln1 = _LNP(c, self.bias_free_ln, name="norm1")()
            wq, bq, wd, bd, wp, bp, temp = MDTAParams(
                c, self.num_channel_heads, self.use_bias,
                name="channel_attn")()
            x = mdta_block_pallas(x, ln1, wq, bq, wd, bd, wp, bp, temp,
                                  num_heads=self.num_channel_heads,
                                  interpret=interp)
            x = fused_gdfn(x, "norm2", "channel_ffn")
        else:
            x = x + MDTABlock(self.num_channel_heads, self.use_bias,
                              name="channel_attn")(
                RestormerLayerNorm(self.bias_free_ln, name="norm1")(x))
            x = x + GDFN(self.expansion, self.use_bias, name="channel_ffn")(
                RestormerLayerNorm(self.bias_free_ln, name="norm2")(x))
        x = x + OCAB(self.dim, self.window_size, self.overlap_ratio,
                     self.num_spatial_heads, self.spatial_dim_head,
                     self.use_bias, name="spatial_attn")(
            RestormerLayerNorm(self.bias_free_ln, name="norm3")(x))
        if fused:
            x = fused_gdfn(x, "norm4", "spatial_ffn")
        else:
            x = x + GDFN(self.expansion, self.use_bias, name="spatial_ffn")(
                RestormerLayerNorm(self.bias_free_ln, name="norm4")(x))
        return x


class XRestormer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    channel_heads: Sequence[int] = (1, 2, 4, 8)
    spatial_heads: Sequence[int] = (2, 2, 3, 4)
    overlap_ratio: Sequence[float] = (0.5, 0.5, 0.5, 0.5)
    window_size: int = 8
    spatial_dim_head: int = 16
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    bias_free_ln: bool = False
    scale: int = 1

    @nn.compact
    def __call__(self, x):
        if self.scale > 1:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * self.scale, w * self.scale, c),
                                 method="bilinear")
        d = self.dim

        def stage(y, level, count, name):
            for i in range(count):
                y = XTransformerBlock(
                    y.shape[-1], self.window_size, self.overlap_ratio[level],
                    self.channel_heads[level], self.spatial_heads[level],
                    self.spatial_dim_head, self.ffn_expansion_factor,
                    self.use_bias, self.bias_free_ln,
                    name=f"{name}{i}")(y)
            return y

        e1_in = Conv(d, kernel=3, use_bias=self.use_bias,
                     name="patch_embed")(x)
        e1 = stage(e1_in, 0, self.num_blocks[0], "encoder_level1_")
        e2 = stage(Downsample(name="down1_2")(e1), 1, self.num_blocks[1],
                   "encoder_level2_")
        e3 = stage(Downsample(name="down2_3")(e2), 2, self.num_blocks[2],
                   "encoder_level3_")
        latent = stage(Downsample(name="down3_4")(e3), 3,
                       self.num_blocks[3], "latent_")

        y = Upsample(name="up4_3")(latent)
        y = Conv(d * 4, kernel=1, use_bias=self.use_bias,
                 name="reduce_chan_level3")(jnp.concatenate([y, e3], -1))
        y = stage(y, 2, self.num_blocks[2], "decoder_level3_")
        y = Upsample(name="up3_2")(y)
        y = Conv(d * 2, kernel=1, use_bias=self.use_bias,
                 name="reduce_chan_level2")(jnp.concatenate([y, e2], -1))
        y = stage(y, 1, self.num_blocks[1], "decoder_level2_")
        y = Upsample(name="up2_1")(y)
        y = jnp.concatenate([y, e1], -1)
        y = stage(y, 0, self.num_blocks[0], "decoder_level1_")
        y = stage(y, 0, self.num_refinement_blocks, "refinement_")
        return Conv(self.out_channels, kernel=3, use_bias=self.use_bias,
                    name="output")(y) + x


register_model(ModelSpec(
    name="xrestormer",
    build=lambda **kw: XRestormer(**kw),
    subtasks=("super-resolution", "denoising", "dehazing",
              "motion deblurring", "deraining"),
    pad_multiple=64,  # window 8 at the deepest (1/8-res) level
    pad_kind="reflect",
    tile=256, tile_overlap=32,
    config=dict(),
))

register_model(ModelSpec(
    name="xrestormer_tiny",
    build=lambda **kw: XRestormer(**kw),
    subtasks=("denoising",),
    pad_multiple=64, pad_kind="reflect",
    tile=None,
    config=dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                channel_heads=(1, 1, 1, 1), spatial_heads=(1, 1, 1, 1),
                spatial_dim_head=8, ffn_expansion_factor=2.0),
))
