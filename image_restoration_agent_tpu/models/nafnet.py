"""NAFNet in Flax/NHWC (rebuild of X-Restormer/xrestormer/archs/NAFNet_arch.py).

Blocks: LayerNorm2d -> 1x1 expand -> depthwise 3x3 -> SimpleGate -> simplified
channel attention (global pool + 1x1) -> 1x1, plus a SimpleGate FFN; each
branch scaled by a zero-initialized per-channel beta/gamma. U-shape with
stride-2 2x2 conv downs and (1x1 conv, no bias) + pixel-shuffle ups.

TPU notes: all convs are NHWC so XLA tiles them onto the MXU directly; the
SCA global average pool is a spatial mean (one reduction, fused).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..core.resize import resize_bicubic_torch
from ..ops.gates import simple_gate
from ..ops.pixel_shuffle import pixel_shuffle
from .common import Conv, DWConv, LayerNorm2d
from .registry import ModelSpec, register_model


class NAFBlock(nn.Module):
    dw_expand: int = 2
    ffn_expand: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        dw = c * self.dw_expand

        y = LayerNorm2d(name="norm1")(x)
        y = Conv(dw, kernel=1, name="conv1")(y)
        y = DWConv(kernel=3, name="conv2")(y)
        y = simple_gate(y)
        # Simplified channel attention: global average pool + 1x1.
        sca = jnp.mean(y, axis=(-3, -2), keepdims=True)
        sca = Conv(dw // 2, kernel=1, name="sca_conv")(sca)
        y = y * sca
        y = Conv(c, kernel=1, name="conv3")(y)
        beta = self.param("beta", nn.initializers.zeros, (c,))
        x = x + y * beta

        y = LayerNorm2d(name="norm2")(x)
        y = Conv(c * self.ffn_expand, kernel=1, name="conv4")(y)
        y = simple_gate(y)
        y = Conv(c, kernel=1, name="conv5")(y)
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return x + y * gamma


class NAFNet(nn.Module):
    """Args mirror the reference constructor (NAFNet_arch.py NAFNet)."""

    img_channels: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    scale: int = 1

    @nn.compact
    def __call__(self, x):
        if self.scale > 1:
            x = resize_bicubic_torch(x, float(self.scale))
        b, h, w, _ = x.shape
        pad = 2 ** len(self.enc_blk_nums)
        ph, pw = (-h) % pad, (-w) % pad
        if ph or pw:  # zero pad bottom/right (reference check_image_size)
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        inp = x

        y = Conv(self.width, kernel=3, name="intro")(x)
        skips = []
        chan = self.width
        for li, num in enumerate(self.enc_blk_nums):
            for bi in range(num):
                y = NAFBlock(name=f"enc{li}_blk{bi}")(y)
            skips.append(y)
            y = Conv(chan * 2, kernel=2, stride=2, name=f"down{li}")(y)
            chan *= 2

        for bi in range(self.middle_blk_num):
            y = NAFBlock(name=f"mid_blk{bi}")(y)

        for li, num in enumerate(self.dec_blk_nums):
            y = Conv(chan * 2, kernel=1, use_bias=False, name=f"up{li}")(y)
            y = pixel_shuffle(y, 2)
            chan //= 2
            y = y + skips[-(li + 1)]
            for bi in range(num):
                y = NAFBlock(name=f"dec{li}_blk{bi}")(y)

        y = Conv(self.img_channels, kernel=3, name="ending")(y)
        y = y + inp
        return y[:, : h, : w, :]


register_model(ModelSpec(
    name="nafnet_small",
    build=lambda **kw: NAFNet(**kw),
    subtasks=("denoising",),
    pad_multiple=1,  # model pads internally to 2^len(enc)
    tile=None,
    config=dict(width=16, middle_blk_num=1,
                enc_blk_nums=(1, 1, 1), dec_blk_nums=(1, 1, 1)),
))

register_model(ModelSpec(
    name="nafnet",
    build=lambda **kw: NAFNet(**kw),
    subtasks=("denoising", "motion deblurring"),
    pad_multiple=1,
    tile=None,
    config=dict(width=32, middle_blk_num=12,
                enc_blk_nums=(2, 2, 4, 8), dec_blk_nums=(2, 2, 2, 2)),
))
