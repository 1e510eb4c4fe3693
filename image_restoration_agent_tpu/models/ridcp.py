"""RIDCP VQ-codebook dehazing in Flax/NHWC
(rebuild of RIDCP_dehazing/basicsr/archs/dehaze_vq_weight_arch.py).

HQ codebook prior dehazing: a multi-scale conv+Swin encoder maps the hazy
image to 1/4-res features; a VectorQuantizer snaps them to the nearest
codebook entries (optionally re-weighting distances with the HQ-prior weight
table, d * exp(alpha * w) — VectorQuantizer.forward:93-101); a conv decoder
reconstructs from codes; a parallel residual decoder re-injects encoder
detail, aligning the code-decoder features to it at each scale with DCNv2
warp blocks (WarpBlock:241 — the reference's only CUDA op, rebuilt in
ops/dcn.py) and the mean-ratio fusion ``x + x_vq * (mean(x)/mean(x_vq))``.

Pre-activation GroupNorm(32) ResBlocks throughout; in_conv follows torch's
kernel-4/(1,1)-padding exactly (H -> H-1, floored back by the stride-2
convs), so converted checkpoints reproduce the reference bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dcn import modulated_deform_conv
from .common import Conv
from .registry import ModelSpec, register_model
from .swinir import RSTB

CHANNEL_BY_RES = {8: 256, 16: 256, 32: 256, 64: 256, 128: 128, 256: 64,
                  512: 32}


class GNResBlock(nn.Module):
    """Pre-activation GroupNorm(32) ResBlock (ridcp_utils.py ResBlock)."""

    out_ch: int
    act: str = "leakyrelu"

    def _act(self, x):
        if self.act == "silu":
            return nn.silu(x)
        return nn.leaky_relu(x, negative_slope=0.2)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        groups = min(32, c)
        y = nn.GroupNorm(num_groups=groups, epsilon=1e-6, name="gn1")(x)
        y = self._act(y)
        y = Conv(self.out_ch, kernel=3, name="c1")(y)
        y = nn.GroupNorm(num_groups=min(32, self.out_ch), epsilon=1e-6,
                         name="gn2")(y)
        y = self._act(y)
        y = Conv(self.out_ch, kernel=3, name="c2")(y)
        return x + y


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantization with optional HQ-prior reweighting."""

    n_embed: int
    embed_dim: int
    use_weight: bool = True
    weight_alpha: float = 1.0

    @nn.compact
    def __call__(self, z):  # (B, H, W, D)
        codebook = self.param("codebook", nn.initializers.normal(1.0),
                              (self.n_embed, self.embed_dim))
        b, h, w, d = z.shape
        flat = z.reshape(-1, d).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        dist = (jnp.sum(flat ** 2, axis=1, keepdims=True)
                + jnp.sum(cb ** 2, axis=1)
                - 2.0 * flat @ cb.T)
        if self.use_weight:
            prior = self.param("hq_weight", nn.initializers.zeros,
                               (self.n_embed,))
            dist = dist * jnp.exp(self.weight_alpha * prior)
        idx = jnp.argmin(dist, axis=1)
        zq = jnp.take(codebook, idx, axis=0).reshape(b, h, w, d)
        return zq.astype(z.dtype), idx.reshape(b, h, w)


class WarpBlock(nn.Module):
    """DCNv2 feature alignment of code-decoder features to the residual
    stream (dehaze_vq_weight_arch.py WarpBlock:241)."""

    channels: int
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x_vq, x_residual):
        c = self.channels
        feat = Conv(c, kernel=3, name="offset_feat")(
            jnp.concatenate([x_vq, x_residual], axis=-1))
        raw = Conv(3 * self.deformable_groups * 9, kernel=3,
                   name="conv_offset")(feat)
        o1, o2, m = jnp.split(raw, 3, axis=-1)
        # DCNv2Pack concatenates (o1, o2) verbatim and the CUDA kernel then
        # reads the result with (group, tap, [dy, dx]) nesting
        # (deform_conv_cuda_kernel.cu:216-225) — so the trained checkpoint's
        # o1 holds BOTH dy and dx for the first half of the groups, not
        # "all dy". Pass the same concatenated layout through.
        off = jnp.concatenate([o1, o2], axis=-1)
        mask = nn.sigmoid(m)
        w = self.param("dcn_kernel", nn.initializers.normal(0.02),
                       (3, 3, c, c))
        bvar = self.param("dcn_bias", nn.initializers.zeros, (c,))
        return modulated_deform_conv(
            x_vq, off, mask, w, bvar, kernel=3,
            deformable_groups=self.deformable_groups)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class RIDCP(nn.Module):
    """Single-scale-codebook configuration (the released RIDCP model):
    codebook at 1/4 res with 1024 x 512 entries, depth 2."""

    n_embed: int = 1024
    embed_dim: int = 512
    max_depth: int = 2
    gt_res: int = 256
    use_weight: bool = True
    weight_alpha: float = 1.0
    use_warp: bool = True
    swin_blocks: int = 4
    swin_depth: int = 6
    swin_heads: int = 8
    act: str = "silu"  # VQWeightDehazeNet act_type default (SiLU ResBlocks)
    channels: Optional[dict] = None

    @nn.compact
    def __call__(self, x):
        cq = self.channels or CHANNEL_BY_RES
        res0 = self.gt_res

        # ---------------- encoder ----------------
        # exact torch semantics: kernel 4 with (1, 1) padding loses one
        # row/col (H -> H-1); the stride-2 convs floor it back so every
        # later shape matches the reference bit-for-bit
        y = nn.Conv(cq[res0], (4, 4), padding=[(1, 1), (1, 1)],
                    name="in_conv")(x)
        res = res0
        for i in range(self.max_depth):
            out_ch = cq[res // 2]
            y = Conv(out_ch, kernel=3, stride=2, name=f"enc{i}_down")(y)
            y = GNResBlock(out_ch, act=self.act, name=f"enc{i}_res0")(y)
            y = GNResBlock(out_ch, act=self.act, name=f"enc{i}_res1")(y)
            res //= 2
        for i in range(self.swin_blocks):
            y = RSTB(cq[res], self.swin_depth, self.swin_heads, 8,
                     mlp_ratio=4.0, name=f"enc_swin{i}")(y)
        enc_feats = y

        # ---------------- quantize ----------------
        feat_to_quant = Conv(self.embed_dim, kernel=1, name="before_quant")(y)
        z_quant, indices = VectorQuantizer(
            self.n_embed, self.embed_dim, self.use_weight,
            self.weight_alpha, name="quantize")(feat_to_quant)
        y = Conv(cq[res], kernel=3, name="after_quant")(z_quant)

        # ---------------- code decoder ----------------
        code_outputs = []
        dres = res
        for i in range(self.max_depth):
            out_ch = cq[dres * 2]
            y = _up2(y)
            y = Conv(out_ch, kernel=3, name=f"dec{i}_conv")(y)
            y = GNResBlock(out_ch, act=self.act, name=f"dec{i}_res0")(y)
            y = GNResBlock(out_ch, act=self.act, name=f"dec{i}_res1")(y)
            code_outputs.append(y)
            dres *= 2
        out_img = Conv(3, kernel=3, name="out_conv")(y)

        # ---------------- residual decoder with DCN warp ----------------
        r = enc_feats
        rres = res
        for i in range(self.max_depth):
            out_ch = cq[rres * 2]
            r = _up2(r)
            r = Conv(out_ch, kernel=3, name=f"resid{i}_conv")(r)
            r = GNResBlock(out_ch, act=self.act, name=f"resid{i}_res0")(r)
            r = GNResBlock(out_ch, act=self.act, name=f"resid{i}_res1")(r)
            if self.use_warp:
                warped = WarpBlock(out_ch, name=f"warp{i}")(
                    code_outputs[i], r)
                ratio = jnp.mean(r) / (jnp.mean(warped) + 1e-8)
                r = r + warped * ratio
            else:
                r = r + code_outputs[i]
            rres *= 2
        out_residual = Conv(3, kernel=3, name="residual_conv")(r)
        return out_residual


register_model(ModelSpec(
    name="ridcp",
    build=lambda **kw: RIDCP(**kw),
    subtasks=("dehazing",),
    pad_multiple=8, pad_kind="reflect",
    tile=None,  # whole image below max_size, engine falls back to tiling
    max_size=1500, fallback_tile=240,  # model_services.yaml:53 / test_tile
    config=dict(weight_alpha=-21.25),
))

register_model(ModelSpec(
    name="ridcp_tiny",
    build=lambda **kw: RIDCP(**kw),
    subtasks=("dehazing",),
    pad_multiple=8, pad_kind="reflect",
    tile=None,
    config=dict(n_embed=32, embed_dim=16, swin_blocks=1, swin_depth=1,
                swin_heads=2,
                channels={256: 8, 128: 12, 64: 16, 32: 16, 16: 16, 8: 16}),
))
