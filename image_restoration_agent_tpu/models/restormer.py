"""Restormer in Flax/NHWC (rebuild of Restormer/basicsr/models/archs/restormer_arch.py).

4-level U-shape of TransformerBlocks: MDTA transposed channel attention
(ops/mdta.py) + gated-dconv FFN with exact GELU (ops/gates.py), pixel-
unshuffle downs / pixel-shuffle ups, refinement stage, global residual.

TPU notes: MDTA's big contractions are (C_h, HW) x (HW, C_h) matmuls over the
flattened spatial axis — MXU-bound with fp32 accumulation; everything else is
1x1/depthwise convs that XLA fuses.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.gates import gated_gelu
from ..ops.mdta import mdta_attention
from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from ..ops.restormer_fused import (fused_mode, gdfn_block_pallas,
                                   mdta_block_pallas,
                                   restormer_fused_supported)
from .common import Conv, DWConv, RestormerLayerNorm
from .registry import ModelSpec, register_model


class _RawConv(nn.Module):
    """Param holder producing the same child tree as Conv/DWConv
    (child "Conv_0" with kernel/bias) without computing — lets a fused
    kernel consume raw weights from an unchanged checkpoint layout."""

    shape: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = (self.param("bias", nn.initializers.zeros, (self.shape[-1],))
             if self.use_bias else None)
        return w, b


class _ConvP(nn.Module):
    shape: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        return _RawConv(self.shape, self.use_bias, name="Conv_0")()


class _LNP(nn.Module):
    """RestormerLayerNorm-compatible param holder -> (scale[, bias])."""

    dim: int
    bias_free: bool

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        if self.bias_free:
            return (w,)
        return (w, self.param("bias", nn.initializers.zeros, (self.dim,)))


class MDTAParams(nn.Module):
    """MDTABlock-compatible param tree, returned raw for the fused kernel."""

    dim: int
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        c = self.dim
        wq, bq = _ConvP((1, 1, c, 3 * c), self.use_bias, name="qkv")()
        wd, bd = _ConvP((3, 3, 1, 3 * c), self.use_bias,
                        name="qkv_dwconv")()
        temp = self.param("temperature", nn.initializers.ones,
                          (self.num_heads,))
        wp, bp = _ConvP((1, 1, c, c), self.use_bias, name="project_out")()
        return wq, bq, wd, bd, wp, bp, temp


class GDFNParams(nn.Module):
    """GDFN-compatible param tree, returned raw for the fused kernel."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        c = self.dim
        hidden = int(c * self.expansion)
        wi, bi = _ConvP((1, 1, c, hidden * 2), self.use_bias,
                        name="project_in")()
        wd, bd = _ConvP((3, 3, 1, hidden * 2), self.use_bias,
                        name="dwconv")()
        wo, bo = _ConvP((1, 1, hidden, c), self.use_bias,
                        name="project_out")()
        return wi, bi, wd, bd, wo, bo


def use_fused_blocks(x, ftot: int) -> bool:
    """Route x + block(LN(x)) through the fused Pallas kernels?"""
    mode = fused_mode()
    if mode == "off" or x.ndim != 4:
        return False
    if mode == "auto" and jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    return restormer_fused_supported(h, w, c, ftot)


class MDTABlock(nn.Module):
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        qkv = Conv(c * 3, kernel=1, use_bias=self.use_bias, name="qkv")(x)
        qkv = DWConv(kernel=3, use_bias=self.use_bias, name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        temp = self.param("temperature", nn.initializers.ones, (self.num_heads,))
        out = mdta_attention(q, k, v, temp, self.num_heads)
        return Conv(c, kernel=1, use_bias=self.use_bias, name="project_out")(out)


class GDFN(nn.Module):
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = int(c * self.expansion)
        y = Conv(hidden * 2, kernel=1, use_bias=self.use_bias, name="project_in")(x)
        y = DWConv(kernel=3, use_bias=self.use_bias, name="dwconv")(y)
        y = gated_gelu(y)
        return Conv(c, kernel=1, use_bias=self.use_bias, name="project_out")(y)


class TransformerBlock(nn.Module):
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_ln: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = int(c * self.expansion)
        if (use_fused_blocks(x, 3 * c)
                and use_fused_blocks(x, hidden * 2)):
            interp = fused_mode() == "interpret"
            ln1 = _LNP(c, self.bias_free_ln, name="norm1")()
            wq, bq, wd, bd, wp, bp, temp = MDTAParams(
                c, self.num_heads, self.use_bias, name="attn")()
            x = mdta_block_pallas(x, ln1, wq, bq, wd, bd, wp, bp, temp,
                                  num_heads=self.num_heads,
                                  interpret=interp)
            ln2 = _LNP(c, self.bias_free_ln, name="norm2")()
            wi, bi, wdw, bdw, wo, bo = GDFNParams(
                c, self.expansion, self.use_bias, name="ffn")()
            return gdfn_block_pallas(x, ln2, wi, bi, wdw, bdw, wo, bo,
                                     fastmath=x.dtype == jnp.bfloat16,
                                     interpret=interp)
        y = RestormerLayerNorm(bias_free=self.bias_free_ln, name="norm1")(x)
        x = x + MDTABlock(self.num_heads, self.use_bias, name="attn")(y)
        y = RestormerLayerNorm(bias_free=self.bias_free_ln, name="norm2")(x)
        return x + GDFN(self.expansion, self.use_bias, name="ffn")(y)


class Downsample(nn.Module):
    """conv 3x3 C -> C/2, then pixel-unshuffle(2): C -> 2C at half res."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv(c // 2, kernel=3, use_bias=False, name="conv")(x)
        return pixel_unshuffle(y, 2)


class Upsample(nn.Module):
    """conv 3x3 C -> 2C, then pixel-shuffle(2): C -> C/2 at double res."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv(c * 2, kernel=3, use_bias=False, name="conv")(x)
        return pixel_shuffle(y, 2)


class Restormer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    bias_free_ln: bool = False  # LayerNorm_type == "BiasFree"
    dual_pixel_task: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.dim

        def stage(y, level, count, name):
            for i in range(count):
                y = TransformerBlock(
                    self.heads[level], self.ffn_expansion_factor,
                    self.use_bias, self.bias_free_ln,
                    name=f"{name}{i}")(y)
            return y

        e1_in = Conv(d, kernel=3, use_bias=self.use_bias, name="patch_embed")(x)
        e1 = stage(e1_in, 0, self.num_blocks[0], "encoder_level1_")
        e2 = stage(Downsample(name="down1_2")(e1), 1, self.num_blocks[1],
                   "encoder_level2_")
        e3 = stage(Downsample(name="down2_3")(e2), 2, self.num_blocks[2],
                   "encoder_level3_")
        latent = stage(Downsample(name="down3_4")(e3), 3, self.num_blocks[3],
                       "latent_")

        y = Upsample(name="up4_3")(latent)
        y = jnp.concatenate([y, e3], axis=-1)
        y = Conv(d * 4, kernel=1, use_bias=self.use_bias, name="reduce_chan_level3")(y)
        y = stage(y, 2, self.num_blocks[2], "decoder_level3_")

        y = Upsample(name="up3_2")(y)
        y = jnp.concatenate([y, e2], axis=-1)
        y = Conv(d * 2, kernel=1, use_bias=self.use_bias, name="reduce_chan_level2")(y)
        y = stage(y, 1, self.num_blocks[1], "decoder_level2_")

        y = Upsample(name="up2_1")(y)
        y = jnp.concatenate([y, e1], axis=-1)  # stays at 2*dim (no reduce)
        y = stage(y, 0, self.num_blocks[0], "decoder_level1_")
        y = stage(y, 0, self.num_refinement_blocks, "refinement_")

        if self.dual_pixel_task:
            y = y + Conv(d * 2, kernel=1, use_bias=self.use_bias, name="skip_conv")(e1_in)
            return Conv(self.out_channels, kernel=3, use_bias=self.use_bias,
                        name="output")(y)
        return Conv(self.out_channels, kernel=3, use_bias=self.use_bias,
                    name="output")(y) + x


register_model(ModelSpec(
    name="restormer",
    build=lambda **kw: Restormer(**kw),
    subtasks=("denoising", "motion deblurring", "defocus deblurring", "deraining"),
    pad_multiple=8,
    pad_kind="reflect",
    # whole-image forward (the reference Restormer services default to
    # tile=None and only tile when the canvas is large —
    # AgentApp/model_service/motion_deblurring/Restormer/model_serving.py);
    # measured 2.70 vs 1.86 MP/s tiled-256 at 720p. Canvases beyond
    # max_size fall back to the tile grid to bound activation memory.
    tile=None, tile_overlap=32,
    max_size=1536, fallback_tile=256,
    whole_pad_multiple=64,
    config=dict(),
))

register_model(ModelSpec(
    name="restormer_tiny",  # CPU-testable configuration
    build=lambda **kw: Restormer(**kw),
    subtasks=("denoising",),
    pad_multiple=8,
    pad_kind="reflect",
    tile=None,
    config=dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                heads=(1, 1, 2, 2), ffn_expansion_factor=2.0),
))
