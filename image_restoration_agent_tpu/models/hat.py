"""HAT (Hybrid Attention Transformer) in Flax/NHWC
(rebuild of HAT/hat/archs/hat_arch.py).

Each RHAG = [HAB x depth] + one OCAB + conv, with a residual. A HAB is a
Swin-style shifted-window attention block plus a parallel channel-attention
conv branch scaled by conv_scale (hat_arch.py HAB:199-306:
``x = shortcut + attn_x + conv_x * conv_scale``). OCAB cross-attends 16x16
query windows against 24x24 overlapping key/value windows with a
(ws+owin-1)^2 relative-position-bias table (hat_arch.py OCAB:352-441,
calculate_rpi_oca:896-919). SR head identical to SwinIR's pixelshuffle
path, with the DIV2K mean normalization.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.window_attention import (
    shift_attention_mask, window_attention, window_partition, window_reverse,
)
from .common import (Conv, ConvParams, LNParams, conv3x3_xla,
                     fused_pixelshuffle_head, upsample_tail)
from .registry import ModelSpec, register_model
from .swinir import RGB_MEAN, WindowAttentionLayer


@functools.lru_cache(maxsize=16)
def rpi_oca(ws: int, owin: int) -> np.ndarray:
    """(ws*ws, owin*owin) index into the (ws+owin-1)^2 bias table.

    Reproduces the reference calculate_rpi_oca (hat_arch.py:896-919)
    EXACTLY, including its negative raw indices: the reference shifts by
    ``ws - owin + 1`` (not the ``ws - 1`` that would keep indices
    non-negative) and relies on torch's negative-index wraparound when
    gathering from the bias table. Trained weights bake in that indexing,
    so we reproduce it with an explicit modulo.
    """
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    co = co.reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(owin), np.arange(owin),
                              indexing="ij"))
    ce = ce.reshape(2, -1)
    rel = ce[:, None, :] - co[:, :, None]  # (2, ws*ws, owin*owin)
    rel = rel.transpose(1, 2, 0) + (ws - owin + 1)
    rel[:, :, 0] *= ws + owin - 1
    raw = rel.sum(-1)
    return np.mod(raw, (ws + owin - 1) ** 2).astype(np.int32)


class ChannelAttentionConv(nn.Module):
    """CAB: conv-gelu-conv + RCAN channel attention (hat_arch.py:40-74)."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30

    @nn.compact
    def __call__(self, x):
        y = Conv(self.num_feat // self.compress_ratio, kernel=3,
                 name="c1")(x)
        y = nn.gelu(y, approximate=False)
        y = Conv(self.num_feat, kernel=3, name="c2")(y)
        a = jnp.mean(y, axis=(1, 2), keepdims=True)
        a = Conv(self.num_feat // self.squeeze_factor, kernel=1,
                 name="ca1")(a)
        a = nn.relu(a)
        a = Conv(self.num_feat, kernel=1, name="ca2")(a)
        return y * nn.sigmoid(a)


class HAB(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 2.0
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        shift = 0 if min(h, w) <= ws else self.shift_size

        # WindowAttentionLayer is the fused pre-norm half-block
        # x + proj(attn(LN(x))): its internal LN plays hat_arch.py's norm1
        # for the attention branch. The CAB branch needs the SAME norm1
        # output, so it keeps a parameter copy ("norm1") that conversion
        # fills from the same torch tensor (hat_rules, multi-match).
        n1 = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        conv_x = ChannelAttentionConv(self.dim, self.compress_ratio,
                                      self.squeeze_factor,
                                      name="conv_block")(n1)

        from ..models.swinir import _pallas_supported, _resolve_impl
        from ..ops.pallas_attention import roll2d_pallas, strip_chunk_width

        impl = _resolve_impl(self.attention_impl)
        strip = (impl == "pallas_block" and h % ws == 0 and w % ws == 0
                 and _pallas_supported(ws, b * h * w)
                 and (w <= 384 or strip_chunk_width(w, ws) is not None))
        attn = WindowAttentionLayer(self.dim, ws, self.num_heads,
                                    attention_impl=impl, name="attn")
        if strip:
            # strip kernel with the roll folded into its reads (no
            # partition/reverse HBM copies, one roll instead of two);
            # no fused MLP — the CAB branch adds in between
            bank = None
            if shift > 0:
                bank_np = shift_attention_mask(2 * ws, 2 * ws, ws, shift)
                bank = jnp.asarray(bank_np.reshape(2, 2, ws * ws, ws * ws))
            y = attn(x, None, dc=-shift, mask_bank=bank)
            if shift > 0:
                y = roll2d_pallas(y, shift, ws=ws)
        else:
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
        x = y + conv_x * self.conv_scale

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class OCAB(nn.Module):
    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        owin = int(ws * self.overlap_ratio) + ws
        pad = (owin - ws) // 2
        hd = c // self.num_heads
        nh, nw = h // ws, w // ws

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * c, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        qw = window_partition(q, ws).reshape(-1, ws * ws, c)

        def unfold(t):
            tp = jnp.pad(t, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            p = jax.lax.conv_general_dilated_patches(
                tp.transpose(0, 3, 1, 2), filter_shape=(owin, owin),
                window_strides=(ws, ws), padding="VALID")
            p = p.reshape(b, c, owin * owin, nh, nw)
            return p.transpose(0, 3, 4, 2, 1).reshape(
                b * nh * nw, owin * owin, c)

        kw, vw = unfold(k), unfold(v)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads,
                             hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qw), heads(kw), heads(vw)
        attn = jnp.einsum("whnd,whmd->whnm", qh * hd ** -0.5, kh,
                          preferred_element_type=jnp.float32)
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((ws + owin - 1) ** 2, self.num_heads))
        idx = jnp.asarray(rpi_oca(ws, owin).reshape(-1))
        bias = table[idx].reshape(ws * ws, owin * owin,
                                  self.num_heads).transpose(2, 0, 1)
        attn = jax.nn.softmax(attn + bias[None].astype(attn.dtype), axis=-1)
        out = jnp.einsum("whnm,whmd->whnd", attn, vh.astype(attn.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(-1, ws, ws, c)
        out = window_reverse(out, ws, h, w)
        x = nn.Dense(c, name="proj")(out) + shortcut

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, name="fc2")(y)
        return x + y


class RHAG(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    overlap_ratio: float = 0.5
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 2.0
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.depth):
            x = HAB(self.dim, self.num_heads, self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    compress_ratio=self.compress_ratio,
                    squeeze_factor=self.squeeze_factor,
                    conv_scale=self.conv_scale, mlp_ratio=self.mlp_ratio,
                    attention_impl=self.attention_impl,
                    name=f"hab{i}")(x)
        x = OCAB(self.dim, self.window_size, self.overlap_ratio,
                 self.num_heads, self.mlp_ratio, name="ocab")(x)
        return Conv(self.dim, kernel=3, name="conv")(x, res=res)


class HAT(nn.Module):
    img_channels: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6,) * 6
    num_heads: Sequence[int] = (6,) * 6
    window_size: int = 16
    overlap_ratio: float = 0.5
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 2.0
    upscale: int = 4
    num_feat: int = 64
    img_range: float = 1.0
    attention_impl: str = "auto"
    # (B, H*s, W*s*3) packed-RGB output; see swinir.SwinIR.packed_output
    packed_output: bool = False

    @nn.compact
    def __call__(self, x):
        # dtype-matched to avoid promoting the net to f32 (see swinir.py)
        mean = jnp.asarray(RGB_MEAN, dtype=x.dtype).reshape(1, 1, 1, 3)
        x = (x - mean) * self.img_range

        feat = Conv(self.embed_dim, kernel=3, name="conv_first")(x)
        # patch_norm=True in the reference (hat_arch.py HAT.__init__)
        y = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(feat)
        for i, (d, h) in enumerate(zip(self.depths, self.num_heads)):
            y = RHAG(self.embed_dim, d, h, self.window_size,
                     self.overlap_ratio, self.compress_ratio,
                     self.squeeze_factor, self.conv_scale, self.mlp_ratio,
                     self.attention_impl, name=f"layer{i}")(y)
        ln = LNParams(self.embed_dim, name="norm")()
        y = Conv(self.embed_dim, kernel=3, name="conv_after_body")(
            y, res=feat, ln_pre=ln)

        y = Conv(self.num_feat, kernel=3, act="lrelu",
                 name="conv_before_upsample")(y)
        s = self.upscale
        rs = []
        while s > 1:
            rs.append(3 if s % 3 == 0 else 2)
            s //= rs[-1]
        if rs:
            # the whole linear head as one composed plane-space conv (see
            # common.fused_pixelshuffle_head)
            stages = [ConvParams(self.num_feat * r * r, self.num_feat,
                                 name=f"upsample{stage}")()
                      for stage, r in enumerate(rs)]
            wl, bl = ConvParams(self.img_channels, self.num_feat,
                                name="conv_last")()

            def seq_head(z):
                for (w, b), r in zip(stages[:-1], rs[:-1]):
                    z = pixel_shuffle(conv3x3_xla(z, w, b), r)
                return upsample_tail(z, *stages[-1], wl, bl, rs[-1])

            y = fused_pixelshuffle_head(y, stages, wl, bl, rs, seq_head,
                                        packed=self.packed_output)
        else:
            y = Conv(self.img_channels, kernel=3, name="conv_last")(y)
        if self.packed_output:
            assert y.ndim == 3, "packed_output needs the fused head"
            mean_row = jnp.tile(mean.reshape(3), y.shape[2] // 3)
            return y / self.img_range + mean_row[None, None, :]
        return y / self.img_range + mean


register_model(ModelSpec(
    name="hat_sr_x4",
    build=lambda **kw: HAT(**kw),
    subtasks=("super-resolution",),
    scale=4,
    pad_multiple=16, pad_mode="extra", pad_kind="symmetric",
    tile=256, tile_overlap=32,
    config=dict(),
))

register_model(ModelSpec(
    name="hat_tiny",
    build=lambda **kw: HAT(**kw),
    subtasks=("super-resolution",),
    scale=4,
    pad_multiple=8, pad_mode="extra", pad_kind="symmetric",
    tile=None,
    config=dict(embed_dim=16, depths=(1, 1), num_heads=(2, 2),
                window_size=8, upscale=4, num_feat=16,
                compress_ratio=2, squeeze_factor=8),
))
